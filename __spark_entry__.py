"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over ``demo_apache_beam_spark.queries`` — the engine's query
registry pairs every Spark query with its DuckDB oracle SQL.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from demo_apache_beam_spark import queries as _registry  # noqa: E402
from demo_apache_beam_spark.session import apply_engine_conf  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (UserScore: per-user lifetime score totals) on
    /root/testdata/sf0.001; driver checks rows>0."""
    apply_engine_conf(spark)
    return _registry.REGISTRY["user_score"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle for each SQL-expressible query."""
    return _registry.oracle_sql()
