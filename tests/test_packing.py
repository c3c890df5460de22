"""Sequential shard packing: the distributed two-pass prefix sum must equal
the single-reducer global-window formulation exactly."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from conftest import SF_SMALL
from demo_apache_beam_spark.operators.packing import sequential_pack


def _reference(df, order_col, weight_col, budget):
    w = Window.orderBy(order_col).rowsBetween(Window.unboundedPreceding, -1)
    prior = F.coalesce(F.sum(weight_col).over(w), F.lit(0))
    return df.withColumn("shard_id", F.floor(prior / F.lit(float(budget))))


def test_pack_equals_global_window_on_documents(spark):
    from demo_apache_beam_spark.sources.tables import load_table

    docs = load_table(spark, SF_SMALL, "documents").select("doc_id", "n_chars")
    got = sequential_pack(docs, "doc_id", "n_chars", 5000, num_partitions=7)
    want = _reference(docs, "doc_id", "n_chars", 5000)
    g = {r["doc_id"]: r["shard_id"] for r in got.collect()}
    w = {r["doc_id"]: r["shard_id"] for r in want.collect()}
    assert g == w
    # multiple shards actually produced, and every shard is non-empty
    shards = sorted(set(g.values()))
    assert len(shards) > 1
    assert shards == list(range(len(shards)))


def test_pack_budget_boundaries(spark):
    rows = [(1, 5), (2, 5), (3, 5)]
    df = spark.createDataFrame(rows, "k int, w int")
    got = {
        r["k"]: r["shard_id"]
        for r in sequential_pack(df, "k", "w", 5, num_partitions=2).collect()
    }
    # exclusive prefix sums 0,5,10 -> shards 0,1,2 (exact multiples roll over)
    assert got == {1: 0, 2: 1, 3: 2}


def test_pack_row_larger_than_budget(spark):
    rows = [(1, 12), (2, 1)]
    df = spark.createDataFrame(rows, "k int, w int")
    got = {
        r["k"]: r["shard_id"]
        for r in sequential_pack(df, "k", "w", 5, num_partitions=2).collect()
    }
    # row 1 starts shard 0 (straddles 0-2); row 2 starts at prior=12 -> shard 2
    assert got == {1: 0, 2: 2}


def test_pack_rejects_bad_budget(spark):
    df = spark.createDataFrame([(1, 1)], "k int, w int")
    with pytest.raises(ValueError):
        sequential_pack(df, "k", "w", 0)


def test_pack_property_random_weights_and_partition_counts(spark):
    """Distributed prefix-sum shard assignment must equal the sequential
    reference for arbitrary weights, budgets, and bucket counts — the
    regression surface of the range-boundary drift bug (two passes
    disagreeing on bucket membership)."""
    import random

    from demo_apache_beam_spark.operators.packing import sequential_pack

    rng = random.Random(1234)
    for trial in range(4):
        n = rng.choice([7, 200, 1003])
        budget = rng.choice([1, 17, 5000])
        nparts = rng.choice([1, 3, 8, 64])
        ids = rng.sample(range(10 * n), n)  # sparse, unordered ids
        weights = [rng.randint(0, 50) for _ in ids]
        df = spark.createDataFrame(
            list(zip(ids, weights)), "k long, w long"
        ).repartition(5)  # arrival layout unrelated to key order
        got = {
            r["k"]: r["shard_id"]
            for r in sequential_pack(
                df, "k", "w", budget, num_partitions=nparts
            ).collect()
        }
        acc = 0
        for k, w in sorted(zip(ids, weights)):
            assert got[k] == acc // budget, (trial, n, budget, nparts, k)
            acc += w
        assert len(got) == n


def test_pack_string_order_col(spark):
    """Non-numeric order columns (approxQuantile can't handle them) must
    pack via the sampled-sort boundary fallback, matching the sequential
    reference exactly."""
    rows = [(f"doc-{i:05d}", (i * 37) % 11 + 1) for i in range(400)]
    df = spark.createDataFrame(rows, "k string, w long")
    got = {
        r["k"]: r["shard_id"]
        for r in sequential_pack(df, "k", "w", 50, num_partitions=5).collect()
    }
    acc = 0
    for k, w in sorted(rows):
        assert got[k] == acc // 50, (k, got[k], acc)
        acc += w


def test_keyed_prefix_sum_equals_per_key_reference(spark):
    """Range-bucketed per-key prefix sum must equal the single-task
    Window.partitionBy(key) formulation exactly — including keys whose
    runs straddle many range buckets."""
    import random

    from demo_apache_beam_spark.operators.packing import (
        keyed_exclusive_prefix_sum,
    )

    rng = random.Random(77)
    rows = [
        (f"src{i % 5}", i, rng.randint(0, 40)) for i in rng.sample(range(3000), 900)
    ]
    df = spark.createDataFrame(rows, "src string, k long, w long").repartition(7)
    for nparts in (1, 4, 16):
        got = {
            (r["src"], r["k"]): r["prior"]
            for r in keyed_exclusive_prefix_sum(
                df, "src", "k", "w", num_partitions=nparts
            ).collect()
        }
        acc: dict = {}
        for src, k, w in sorted(rows, key=lambda r: (r[0], r[1])):
            assert got[(src, k)] == acc.get(src, 0), (nparts, src, k)
            acc[src] = acc.get(src, 0) + w
        assert len(got) == len(rows)


def test_keyed_prefix_sum_single_key_matches_sequential_pack_prior(spark):
    """With one key the keyed variant degenerates to the global prefix sum."""
    from demo_apache_beam_spark.operators.packing import (
        keyed_exclusive_prefix_sum,
    )

    rows = [(1, i, (i * 13) % 9 + 1) for i in range(200)]
    df = spark.createDataFrame(rows, "g int, k long, w long")
    got = {
        r["k"]: r["prior"]
        for r in keyed_exclusive_prefix_sum(
            df, "g", "k", "w", num_partitions=6
        ).collect()
    }
    acc = 0
    for _, k, w in sorted(rows, key=lambda r: r[1]):
        assert got[k] == acc
        acc += w


def test_keyed_prefix_sum_rejects_high_cardinality_keys(spark):
    """The driver folds O(keys x buckets) offset rows; high-cardinality
    keys must fail loudly with a pointer to Window.partitionBy, not
    silently collect millions of rows."""
    from pyspark.sql import functions as F2

    from demo_apache_beam_spark.operators.packing import (
        keyed_exclusive_prefix_sum,
    )

    df = spark.range((1 << 20) + 5).select(
        F2.col("id").alias("k"), F2.col("id").alias("o"), F2.lit(1).alias("w")
    )
    with pytest.raises(ValueError, match="Window.partitionBy"):
        keyed_exclusive_prefix_sum(df, "k", "o", "w", num_partitions=1)


def test_keyed_prefix_sum_non_string_key_types(spark):
    """Offsets join back on NATIVE key types — boolean and awkward keys
    must produce correct priors, never silent NULL-offset misses (the
    failure mode of a stringified map lookup, where Python str(True)
    and Spark's CAST 'true' disagree)."""
    from demo_apache_beam_spark.operators.packing import (
        keyed_exclusive_prefix_sum,
    )

    rows = [(i % 2 == 0, i, i % 5 + 1) for i in range(200)]
    df = spark.createDataFrame(rows, "k boolean, o long, w long")
    got = {
        (r["k"], r["o"]): r["prior"]
        for r in keyed_exclusive_prefix_sum(
            df, "k", "o", "w", num_partitions=6
        ).collect()
    }
    acc: dict = {}
    for k, o, w in sorted(rows, key=lambda r: r[1]):
        assert got[(k, o)] == acc.get(k, 0), (k, o)
        acc[k] = acc.get(k, 0) + w
    assert None not in {v for v in got.values()}


def test_pack_timestamp_order_col(spark):
    import datetime as dt

    base = dt.datetime(2020, 1, 1)
    rows = [(base + dt.timedelta(seconds=i), i % 7 + 1) for i in range(300)]
    df = spark.createDataFrame(rows, "t timestamp, w long")
    got = {
        r["t"]: r["shard_id"]
        for r in sequential_pack(df, "t", "w", 40, num_partitions=4).collect()
    }
    acc = 0
    for t, w in sorted(rows):
        assert got[t] == acc // 40, (t, got[t], acc)
        acc += w


# ---------------------------------------------------------------------------
# Histogram sequence packing (Kosec et al. 2021 shape)
# ---------------------------------------------------------------------------


def _pack_reference(rows, capacity):
    """Sequential reference: drive histogram_pack directly, then map each
    row via rank-within-length (ordered by id) through the events."""
    from demo_apache_beam_spark.operators.packing import histogram_pack

    hist = {}
    for _id, ln in rows:
        hist[ln] = hist.get(ln, 0) + 1
    _, events = histogram_pack(sorted(hist.items()), capacity)
    by_len = {}
    for _id, ln in sorted(rows, key=lambda r: (r[1], r[0])):
        by_len.setdefault(ln, []).append(_id)
    assign = {}
    for length, rank_start, pack_start, m in events:
        ids = by_len[length][rank_start : rank_start + m]
        for i, _id in enumerate(ids):
            assign[_id] = pack_start + i
    return assign


def test_pack_by_length_equals_reference_and_invariants(spark):
    from demo_apache_beam_spark.operators.packing import pack_by_length

    cap = 64
    rows = [(i, 1 + (i * 37) % cap) for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, len long")
    out = pack_by_length(df, "len", "doc_id", cap, num_partitions=7)
    got = {r["doc_id"]: (r["len"], r["pack_id"]) for r in out.collect()}

    # exactly-once
    assert set(got) == {i for i, _ in rows}
    # per-pack load within capacity; pack ids contiguous from 0
    load = {}
    for _id, (ln, p) in got.items():
        load[p] = load.get(p, 0) + ln
    assert max(load.values()) <= cap
    assert set(load) == set(range(len(load)))
    # matches the sequential reference exactly
    ref = _pack_reference(rows, cap)
    assert {i: p for i, (_, p) in got.items()} == ref
    # padding beats the naive one-doc-per-pack layout by a wide margin
    total = sum(ln for _, ln in rows)
    assert len(load) * cap - total < len(rows) * cap - total

    # deterministic under repartitioning
    out2 = pack_by_length(
        df.repartition(11, "doc_id"), "len", "doc_id", cap, num_partitions=3
    )
    got2 = {r["doc_id"]: r["pack_id"] for r in out2.collect()}
    assert got2 == ref


def test_histogram_pack_guards():
    from demo_apache_beam_spark.operators.packing import histogram_pack

    with pytest.raises(ValueError):
        histogram_pack([(1, 1)], 0)
    with pytest.raises(ValueError):
        histogram_pack([(0, 1)], 8)
    with pytest.raises(ValueError):
        histogram_pack([(9, 1)], 8)
    with pytest.raises(ValueError):
        histogram_pack([(3, 0)], 8)
    with pytest.raises(ValueError, match="duplicate"):
        histogram_pack([(5, 3), (5, 2)], 10)


def test_doc_context_packing_fill_efficiency(spark):
    """On the real documents fixture the packed layout must fill >=90%
    of every-window capacity (measured ~97-98%) and respect capacity."""
    from demo_apache_beam_spark.queries import REGISTRY

    out = REGISTRY["doc_context_packing"].fn(spark, SF_SMALL)
    rows = out.collect()
    load = {}
    for r in rows:
        load[r["pack_id"]] = load.get(r["pack_id"], 0) + r["len_eff"]
    assert max(load.values()) <= 256
    total = sum(r["len_eff"] for r in rows)
    fill = total / (len(load) * 256)
    assert fill >= 0.90, fill
    assert len({r["doc_id"] for r in rows}) == len(rows)
