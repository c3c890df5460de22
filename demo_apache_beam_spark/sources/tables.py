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


def load_table(
    spark: SparkSession, sf_dir: str, name: str, keep_raw_nanos: bool = False
) -> DataFrame:
    """Scan one table. Schema comes from parquet footers (exact, no
    inference cost); declared schemas in ``schemas.py`` document the shape.

    Parquet TIMESTAMP(NANOS) columns (the driver writes ``events.ts`` /
    ``orders.o_orderdate`` / ``lineitem.l_shipdate`` via pandas, nanosecond
    unit) are illegal for Spark's reader; we read them as long nanos
    (``spark.sql.legacy.parquet.nanosAsLong``) and convert with integer
    ``DIV 1000`` — exactly DuckDB's truncating ns→µs conversion, so oracle
    comparisons stay bit-identical. Plain ``/ 1000`` would round through
    double and corrupt the microsecond for epoch-nanos magnitudes.

    ``keep_raw_nanos`` additionally exposes each converted column's raw
    long as ``<name>__ns``: predicates on the *converted* timestamp are
    expressions the parquet reader can't evaluate (only ``IsNotNull``
    pushes), while plain comparisons on the raw long push all the way
    into the scan for row-group pruning — the difference between reading
    a time slice and reading 100 TB. Unused, the column is pruned away.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(table_path(sf_dir, name))
    for field in df.schema.fields:
        if isinstance(field.dataType, T.LongType) and _is_timestamp_col(name, field.name):
            if keep_raw_nanos:
                df = df.withColumn(f"{field.name}__ns", F.col(field.name))
            df = df.withColumn(
                field.name, F.timestamp_micros(F.expr(f"`{field.name}` DIV 1000"))
            )
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
