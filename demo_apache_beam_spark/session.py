"""SparkSession factory tuned for the engine.

Local mode is the test bed (``local[$SPARK_GRAFT_CPUS]``); the same config
block is what we would ship to a multi-executor cluster, where
``spark.sql.shuffle.partitions`` scales with total cores and AQE re-plans
shuffles at runtime. Session timezone is pinned to UTC so timestamp semantics
match the DuckDB oracle (naive-UTC parquet timestamps).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Config applied to every session the engine creates. Safe to apply on an
#: existing session for the SQL-conf subset (driver-provided sessions).
ENGINE_SQL_CONF: dict[str, str] = {
    "spark.sql.shuffle.partitions": os.environ.get("SPARK_GRAFT_CPUS", "32"),
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    # testdata timestamps are TIMESTAMP(MICROS, isAdjustedToUTC=false);
    # read them as plain instants (raw micros), not TIMESTAMP_NTZ
    "spark.sql.parquet.inferTimestampNTZ.enabled": "false",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Parquet scans: vectorized reader + pushdown are on by default; keep
    # files splittable at ~128MB so a 100 TB table yields ~800k tasks, not 8.
    "spark.sql.files.maxPartitionBytes": "134217728",
}


def get_spark(app_name: str = "demo-apache-beam-spark", cpus: int | str | None = None) -> SparkSession:
    """Create (or fetch) a SparkSession with the engine's config."""
    cpus = cpus or os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
    )
    for k, v in ENGINE_SQL_CONF.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def apply_engine_conf(spark: SparkSession) -> SparkSession:
    """Apply the runtime-settable SQL conf to an externally created session
    (e.g. the driver's). Static conf (driver memory, master) is left alone."""
    for k, v in ENGINE_SQL_CONF.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # static conf on a running session — keep existing value
    return spark
