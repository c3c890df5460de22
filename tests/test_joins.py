"""asof_join edge semantics (the oracle-parity test covers the bulk
behavior against DuckDB's ASOF LEFT JOIN at sf0.01)."""

from __future__ import annotations

from pyspark.sql import functions as F


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_asof_join_basic_and_no_match(spark):
    from demo_apache_beam_spark.operators.joins import asof_join

    left = _df(
        spark,
        [(1, 100, "a"), (1, 205, "b"), (2, 50, "c")],
        "k long, ts long, tag string",
    )
    right = _df(
        spark,
        [(1, 90, 9.0), (1, 200, 8.0), (1, 300, 7.0), (3, 10, 1.0)],
        "k long, ts long, px double",
    )
    out = {
        (r["k"], r["ts"]): (r["ts_right"], r["px_right"])
        for r in asof_join(left, right, on=["k"]).collect()
    }
    assert out == {
        (1, 100): (90, 9.0),   # latest right ≤ 100
        (1, 205): (200, 8.0),  # 300 is in the future → excluded
        (2, 50): (None, None),  # key has no right rows at all → LEFT NULLs
    }


def test_asof_join_tie_is_inclusive(spark):
    """A right row at exactly the left timestamp matches (r.ts <= l.ts)."""
    from demo_apache_beam_spark.operators.joins import asof_join

    left = _df(spark, [(1, 100)], "k long, ts long")
    right = _df(spark, [(1, 100, 5.0), (1, 99, 4.0)], "k long, ts long, px double")
    [row] = asof_join(left, right, on=["k"]).collect()
    assert (row["ts_right"], row["px_right"]) == (100, 5.0)


def test_asof_join_carried_columns_come_from_one_row(spark):
    """All carried right columns must come from the SAME matched row, not a
    per-column max."""
    from demo_apache_beam_spark.operators.joins import asof_join

    left = _df(spark, [(1, 100)], "k long, ts long")
    right = _df(
        spark,
        [(1, 50, 1.0, "x"), (1, 80, None, "y")],
        "k long, ts long, px double, src string",
    )
    [row] = asof_join(left, right, on=["k"]).collect()
    # matched row is ts=80: its px is NULL and must NOT fall back to ts=50's
    assert row["ts_right"] == 80
    assert row["src_right"] == "y"
    assert row["px_right"] is None


def test_asof_join_plan_single_shuffle(spark):
    """The sort-merge formulation shuffles once on the key — no cartesian /
    range-join explosion in the plan."""
    from demo_apache_beam_spark.operators.joins import asof_join

    left = spark.range(100).select(
        (F.col("id") % 5).alias("k"), F.col("id").alias("ts")
    )
    right = spark.range(100).select(
        (F.col("id") % 5).alias("k"), (F.col("id") * 2).alias("ts"),
        F.rand(1).alias("v"),
    )
    plan = asof_join(left, right, on=["k"])._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # a single exchange feeds the window sort
    assert plan.count("Exchange hashpartitioning") == 1
