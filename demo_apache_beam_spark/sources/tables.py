"""Parquet table loaders (the engine's canonical scan — SURVEY.md §2.1 S1).

``spark.read.parquet`` gives vectorized columnar scans with predicate
pushdown and column pruning; downstream operators must keep projections
narrow so pruning reaches the scan (check ``ReadSchema`` in
``df.explain("formatted")``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schemas import ALL_TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one table. Schema comes from parquet footers (exact, no
    inference cost); declared schemas in ``schemas.py`` document the shape.

    Timestamp physical encodings have varied across testdata generations,
    so both are normalized to plain ``TimestampType`` whose stored micros
    equal the file's values — exactly DuckDB's reading of the same file
    under a UTC session, so oracle comparisons stay bit-identical:

    - TIMESTAMP(MICROS, isAdjustedToUTC=false): Spark 4 infers
      ``TIMESTAMP_NTZ`` by default, which ``unix_micros`` / windowing
      reject; disabling ``inferTimestampNTZ`` reads the raw micros as a
      plain instant, no value conversion. Predicates against timestamp
      literals still push to the parquet reader for row-group pruning.
    - TIMESTAMP(NANOS): illegal for Spark's reader; read as long nanos
      (``spark.sql.legacy.parquet.nanosAsLong``) and converted with
      integer ``DIV 1000`` — DuckDB's truncating ns→µs conversion. Plain
      ``/ 1000`` would round through double and corrupt the microsecond.

    The session timezone is pinned UTC here (not only in ``session.py``)
    because driver-owned sessions call straight into query functions.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(table_path(sf_dir, name))
    for field in df.schema.fields:
        if isinstance(field.dataType, T.LongType) and _is_timestamp_col(name, field.name):
            df = df.withColumn(
                field.name, F.timestamp_micros(F.expr(f"`{field.name}` DIV 1000"))
            )
        elif isinstance(field.dataType, T.TimestampNTZType):
            # Defensive: if NTZ inference was somehow re-enabled, reinterpret
            # under the UTC session (identity on the stored micros).
            df = df.withColumn(field.name, F.col(field.name).cast(T.TimestampType()))
    return df


#: Columns the driver wrote as TIMESTAMP(NANOS). Matched by name so the
#: conversion is explicit and auditable; long columns not listed here
#: (event_id, keys, …) are never touched.
_NANOS_TS_COLUMNS = {
    "events": {"ts"},
    "orders": {"o_orderdate"},
    "lineitem": {"l_shipdate"},
}


def _is_timestamp_col(table: str, col: str) -> bool:
    return col in _NANOS_TS_COLUMNS.get(table, set())


def spread(df: DataFrame) -> DataFrame:
    """Widen a narrow scan to full cluster parallelism before CPU-heavy
    per-row work (regex tokenization, hashing).

    Small inputs arrive as 1-2 file splits (``maxPartitionBytes`` sizes
    splits by bytes, not by compute), which strands a 32-core executor on
    2 tasks. One round-robin shuffle of the raw rows buys full-width CPU
    for everything downstream. No-op when the scan is already at least as
    wide as the cluster — large inputs at the 100 TB design point never
    repartition here.
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in ALL_TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for the SQL surface."""
    for name in ALL_TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
