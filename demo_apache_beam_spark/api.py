"""User-facing SQL surface — open the warehouse and run free-form SQL.

The reference has no interactive query layer (each query is a compiled
program — SURVEY.md §3); this engine exposes one because Spark gives it
for free and it is how a reference user would actually migrate: register
the tables once, then every query they run today is a ``spark.sql`` call
away, with the same session conventions (UTC, AQE, nanos-safe timestamp
loading) the registry queries use.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .schemas import ALL_TABLES
from .sources.tables import register_views


def register_tables(spark: SparkSession, sf_dir: str) -> list[str]:
    """Register every warehouse table as a temp view (nanos-safe loaders,
    not bare ``spark.read.parquet`` — events.ts needs the conversion).
    Returns the registered names."""
    register_views(spark, sf_dir)
    return list(ALL_TABLES)


def sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    """One-shot: register the warehouse (idempotent) and run ``query``
    through Catalyst — predicate pushdown, AQE, broadcast selection and
    all other registry-query optimizations apply unchanged."""
    register_tables(spark, sf_dir)
    return spark.sql(query)
