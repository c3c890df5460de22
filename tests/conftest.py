"""Shared test fixtures: one SparkSession per test session, small-SF data.

The parity helper mirrors the driver's t2 check: run the Spark query and the
DuckDB oracle on the same parquet tables, sort columns by name and rows by
value, and require exact equality (the driver hashes values — exact match
here predicts a hash match there).
"""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd
import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

SF_SMALL = "/root/testdata/sf0.001"
SF_MEDIUM = "/root/testdata/sf0.01"

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="session")
def spark():
    from demo_apache_beam_spark.session import get_spark

    spark = get_spark("tests", cpus=os.environ.get("SPARK_GRAFT_CPUS", "8"))
    yield spark
    spark.stop()


def duck_with_views(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """Fresh DuckDB connection with the driver's table views registered."""
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def canonical(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, rows by all values — order-insensitive form."""
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df.reset_index(drop=True)


def assert_parity(spark, name: str, sf_dir: str = SF_SMALL) -> None:
    """Run one registry query against its oracle and require exact equality."""
    from demo_apache_beam_spark.queries import REGISTRY

    spec = REGISTRY[name]
    assert spec.oracle, f"{name} has no oracle (rows-only query)"
    got = canonical(spec.fn(spark, sf_dir).toPandas())
    con = duck_with_views(sf_dir)
    try:
        want = canonical(con.execute(spec.oracle).fetchdf())
    finally:
        con.close()
    assert list(got.columns) == list(want.columns), (
        f"{name}: column mismatch {list(got.columns)} vs {list(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: row count {len(got)} vs {len(want)}"
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)
