"""Mirror of the driver's t2 gate: every oracle-backed query in the registry
must match its DuckDB oracle exactly (row count, columns, values)."""

from __future__ import annotations

import pytest

from conftest import SF_SMALL, assert_parity


def _oracle_names():
    from demo_apache_beam_spark.queries import REGISTRY

    return [n for n, s in REGISTRY.items() if s.oracle]


@pytest.mark.parametrize("name", _oracle_names())
def test_parity(spark, name):
    assert_parity(spark, name, SF_SMALL)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"user_key", "total_score"}


def test_registry_consistency():
    import __spark_entry__ as e

    q, o = e.queries(), e.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) > 0


def test_approx_user_cardinality_error_bound(spark):
    """HLL++ estimates must land within a loose multiple of the configured
    2% relative error of the exact per-team cardinality."""
    from demo_apache_beam_spark.queries import REGISTRY

    approx = {
        r["team"]: r["approx_users"]
        for r in REGISTRY["approx_user_cardinality"].fn(spark, SF_SMALL).collect()
    }
    exact = {
        r["team"]: r["n_users"]
        for r in REGISTRY["distinct_users_per_team"].fn(spark, SF_SMALL).collect()
    }
    assert set(approx) == set(exact)
    for team, n in exact.items():
        assert abs(approx[team] - n) <= max(2, 0.1 * n), (team, approx[team], n)
