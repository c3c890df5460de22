"""Misra-Gries heavy hitters: the mergeable-summary guarantees must hold
under any partitioning, and a planted skew key must surface exactly."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from demo_apache_beam_spark.operators.sketches import heavy_hitters
from demo_apache_beam_spark.sources.tables import load_table


def _check_bounds(result, truth, n, k):
    got = dict(result)
    assert len(got) <= k - 1
    bound = 2 * n / k
    for item, true_count in truth.items():
        if true_count > bound:
            assert item in got, f"{item} (freq {true_count} > {bound}) missing"
    for item, lo in got.items():
        true_count = truth.get(item, 0)
        assert lo <= true_count, (item, lo, true_count)
        assert true_count - lo <= bound, (item, lo, true_count)


@pytest.mark.parametrize("parts", [1, 16])
def test_heavy_hitters_bounds_on_events(spark, parts):
    """count_lo <= true <= count_lo + 2N/k, and every item above 2N/k is
    reported — under both a single partition and a 16-way split (the
    sketch is order-dependent, the GUARANTEES are not)."""
    ev = load_table(spark, "/root/testdata/sf0.001", "events").select(
        F.col("user_id").cast("string").alias("user_id")
    )
    truth = {
        r["user_id"]: r["n"]
        for r in ev.groupBy("user_id").agg(F.count("*").alias("n")).collect()
    }
    n = sum(truth.values())
    k = 16
    result = heavy_hitters(ev.repartition(parts), "user_id", k=k)
    _check_bounds(result, truth, n, k)


def test_heavy_hitters_planted_skew_key_is_top(spark):
    """A key holding half the stream must come back first with a tight
    lower bound (>= true - 2N/k)."""
    rows = [("hot",)] * 500 + [(f"u{i}",) for i in range(500)]
    df = spark.createDataFrame(rows, "item string").repartition(8)
    result = heavy_hitters(df, "item", k=10)
    assert result[0][0] == "hot"
    assert result[0][1] >= 500 - 2 * 1000 / 10


def test_heavy_hitters_weighted(spark):
    """Weighted frequency (bytes-per-key style): the guarantee is over
    total WEIGHT, including weights far above 1 (exercises the batched
    decrement loop)."""
    rows = [("big", 10_000)] + [(f"k{i}", 7) for i in range(300)]
    df = spark.createDataFrame(rows, "item string, w long").repartition(4)
    truth = {"big": 10_000, **{f"k{i}": 7 for i in range(300)}}
    n = sum(truth.values())
    k = 8
    result = heavy_hitters(df, "item", k=k, weight_col="w")
    _check_bounds(result, truth, n, k)
    assert result[0][0] == "big"


def test_heavy_hitters_rejects_k_below_two(spark):
    df = spark.createDataFrame([("a",)], "item string")
    with pytest.raises(ValueError):
        heavy_hitters(df, "item", k=1)
