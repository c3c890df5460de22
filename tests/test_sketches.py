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


def test_heavy_hitters_bigint_key(spark):
    """A non-string item column (bigint user ids — the canonical
    top-talkers key) must stringify JVM-side, not trip an Arrow type
    mismatch inside mapInPandas; bounds hold on the stringified keys."""
    rows = [(7,)] * 400 + [(i,) for i in range(200)]
    df = spark.createDataFrame(rows, "item bigint").repartition(4)
    truth = {"7": 401, **{str(i): 1 for i in range(200) if i != 7}}
    k = 10
    result = heavy_hitters(df, "item", k=k)
    _check_bounds(result, truth, sum(truth.values()), k)
    assert result[0][0] == "7"


def test_heavy_hitters_rejects_k_below_two(spark):
    df = spark.createDataFrame([("a",)], "item string")
    with pytest.raises(ValueError):
        heavy_hitters(df, "item", k=1)


def test_streaming_heavy_hitters_bounds_and_replay(spark, tmp_path):
    """Micro-batched sketching: the folded store view satisfies the 3N/k
    streaming bound vs exact counts over everything streamed, and a
    replayed epoch is a bit-identical no-op (merge-on-read + epoch
    partitions)."""
    import os

    from demo_apache_beam_spark.streaming.sketches import (
        make_heavy_hitters_ingest,
        read_heavy_hitters,
        start_heavy_hitters_stream,
    )

    store = str(tmp_path / "store")
    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)

    # three batches with one global hot key and per-batch noise keys
    batches = []
    for b in range(3):
        rows = [("hot",)] * 200 + [(f"b{b}_u{i}",) for i in range(150)]
        batches.append(rows)
    truth: dict = {}
    for rows in batches:
        for (item,) in rows:
            truth[item] = truth.get(item, 0) + 1
    n = sum(truth.values())
    k = 12

    q = start_heavy_hitters_stream(
        spark, in_dir, store, str(tmp_path / "chk"), "item", k=k
    )
    try:
        for b, rows in enumerate(batches):
            spark.createDataFrame(rows, "item string").coalesce(1).write.parquet(
                f"{tmp_path}/stage_{b}"
            )
            part = next(
                f for f in os.listdir(f"{tmp_path}/stage_{b}")
                if f.endswith(".parquet")
            )
            os.rename(f"{tmp_path}/stage_{b}/{part}", f"{in_dir}/b{b}.parquet")
            q.processAllAvailable()
    finally:
        q.stop()

    result = read_heavy_hitters(spark, store, k=k)
    got = dict(result)
    bound = 3 * n / k
    assert result[0][0] == "hot"
    assert got["hot"] <= truth["hot"] <= got["hot"] + bound
    for item, lo in got.items():
        true_count = truth.get(item, 0)
        assert lo <= true_count <= lo + bound, (item, lo, true_count)

    # Replay contract, tested through the ingest factory directly with a
    # DETERMINISTIC physical order (replay fidelity = same data, same
    # order — which recovery gets by re-reading the same source files;
    # the stream above can coalesce file batches differently run to run,
    # so it is checked for bounds, not bit-equality).
    store2 = str(tmp_path / "store2")
    ingest = make_heavy_hitters_ingest(spark, store2, "item", k=k)
    dfs = [
        spark.createDataFrame(rows, "item string").coalesce(1)
        for rows in batches
    ]
    for b, df in enumerate(dfs):
        ingest(df, b)
    before = read_heavy_hitters(spark, store2, k=k)
    ingest(dfs[1], 1)  # redeliver epoch 1: partition overwrite, no merge
    assert read_heavy_hitters(spark, store2, k=k) == before
    got2 = dict(before)
    assert got2["hot"] <= truth["hot"] <= got2["hot"] + bound


def test_cms_strided_keys_do_not_collapse(spark):
    """Regression for the low-bits degeneracy: bucket = knuth32(x) % w
    is an affine bijection of x mod w, so ids allocated in strides of
    w (sharded/partition-prefixed id spaces) would ALL share one cell
    in every row and every estimate would absorb the full stream.
    With high-bit buckets the eps*N band must hold on exactly that
    adversarial id layout."""
    from demo_apache_beam_spark.operators.sketches import cms_estimates

    w = 64
    # 96 distinct keys, all congruent mod 64, uniform 10 occurrences
    rows = [(64 * (i % 96),) for i in range(960)]
    df = spark.createDataFrame(rows, "user_id long")
    got = {r["user_id"]: r for r in cms_estimates(df, "user_id", w=w).collect()}
    assert len(got) == 96
    n = len(rows)
    bound = 2 * n / w
    for r in got.values():
        assert r["n_cms"] >= r["n_true"]
        assert r["n_cms"] - r["n_true"] <= bound, (dict(r.asDict()), bound)


def test_cms_estimates_never_undercount_and_bound_overestimate(spark):
    """Count-Min invariants on the registry query over real events:
    n_cms >= n_true for every user (min over d counters can never
    undercount), and the worst overestimate stays within 2N/w — the
    standard eps*N band (w=64, d=4 drives the failure probability
    well below this fixture's size)."""
    from conftest import SF_SMALL
    from demo_apache_beam_spark.queries import REGISTRY

    rows = REGISTRY["user_cms_estimates"].fn(spark, SF_SMALL).collect()
    assert rows
    n_total = sum(r["n_true"] for r in rows)
    bound = 2 * n_total / 64
    for r in rows:
        assert r["n_cms"] >= r["n_true"], r
        assert r["n_cms"] - r["n_true"] <= bound, (r, bound)


def test_streaming_histogram_store_equals_batch_and_replays(spark, tmp_path):
    """The merged epoch-histogram store must equal BIT-FOR-BIT the batch
    histogram over everything streamed (fixed-bin counts merge exactly),
    the quantile readout must match a sequential Python reference, and a
    redelivered epoch is a no-op."""
    import os

    from demo_apache_beam_spark.streaming.histograms import (
        batch_value_histogram,
        histogram_quantile_readout,
        make_histogram_ingest,
        read_histogram_store,
        start_histogram_stream,
    )

    batches = []
    for b in range(3):
        rows = [("web", float((i * 7) % 130)) for i in range(b * 40, b * 40 + 90)]
        rows += [("app", float((i * 13) % 700)) for i in range(b * 30, b * 30 + 70)]
        batches.append(rows)
    all_rows = [r for rows in batches for r in rows]

    store = str(tmp_path / "store")
    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    q = start_histogram_stream(
        spark, in_dir, store, str(tmp_path / "chk"), "k", "v",
        bin_width=10.0, n_bins=64,
    )
    try:
        for b, rows in enumerate(batches):
            spark.createDataFrame(rows, "k string, v double").coalesce(
                1
            ).write.parquet(f"{tmp_path}/stage_{b}")
            part = next(
                f for f in os.listdir(f"{tmp_path}/stage_{b}")
                if f.endswith(".parquet")
            )
            os.rename(f"{tmp_path}/stage_{b}/{part}", f"{in_dir}/b{b}.parquet")
            q.processAllAvailable()
    finally:
        q.stop()

    batch_df = spark.createDataFrame(all_rows, "k string, v double")
    want_hist = sorted(
        tuple(r)
        for r in batch_value_histogram(batch_df, "k", "v").collect()
    )
    got_hist = sorted(
        tuple(r) for r in read_histogram_store(spark, store, "k").collect()
    )
    assert got_hist == want_hist

    got_ro = {
        r["k"]: (r["n_events"], r["p50_ub"], r["p90_ub"], r["p99_ub"])
        for r in histogram_quantile_readout(
            read_histogram_store(spark, store, "k"), "k"
        ).collect()
    }
    # sequential reference: first bin right-edge whose cum count >= q*n
    import collections

    bins: dict = collections.defaultdict(collections.Counter)
    for k, v in all_rows:
        bins[k][min(int(v // 10), 63)] += 1
    for k, ctr in bins.items():
        n = sum(ctr.values())
        expect = [n]
        for qq in (0.5, 0.9, 0.99):
            cum = 0
            for b in sorted(ctr):
                cum += ctr[b]
                if cum >= qq * n:
                    expect.append((b + 1) * 10.0)
                    break
        assert got_ro[k] == tuple(expect), (k, got_ro[k], expect)

    # redelivery: same epoch, same rows -> partition overwrite, no-op
    store2 = str(tmp_path / "store2")
    ingest = make_histogram_ingest(spark, store2, "k", "v")
    dfs = [
        spark.createDataFrame(rows, "k string, v double").coalesce(1)
        for rows in batches
    ]
    for b, df in enumerate(dfs):
        ingest(df, b)
    before = sorted(
        tuple(r) for r in read_histogram_store(spark, store2, "k").collect()
    )
    assert before == want_hist
    ingest(dfs[2], 2)  # redeliver epoch 2
    after = sorted(
        tuple(r) for r in read_histogram_store(spark, store2, "k").collect()
    )
    assert after == before


def test_streaming_cms_store_equals_batch_sketch(spark, tmp_path):
    """The summed epoch-cell store must equal BIT-FOR-BIT the batch CMS
    over everything streamed (cell counts merge exactly), store-backed
    estimates must equal the batch operator's, and a redelivered epoch
    is a no-op."""
    import os

    from demo_apache_beam_spark.operators.sketches import (
        cms_estimates,
        cms_hash_structs,
    )
    from demo_apache_beam_spark.streaming.cms import (
        cms_store_estimates,
        make_cms_ingest,
        read_cms_store,
        start_cms_stream,
    )

    batches = [
        [(int(j),) for j in range(b * 50, b * 50 + 150)] for b in range(3)
    ]
    all_rows = [r for rows in batches for r in rows]

    store = str(tmp_path / "store")
    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    q = start_cms_stream(
        spark, in_dir, store, str(tmp_path / "chk"), "user_id"
    )
    try:
        for b, rows in enumerate(batches):
            spark.createDataFrame(rows, "user_id long").coalesce(
                1
            ).write.parquet(f"{tmp_path}/stage_{b}")
            part = next(
                f for f in os.listdir(f"{tmp_path}/stage_{b}")
                if f.endswith(".parquet")
            )
            os.rename(f"{tmp_path}/stage_{b}/{part}", f"{in_dir}/b{b}.parquet")
            q.processAllAvailable()
    finally:
        q.stop()

    batch_df = spark.createDataFrame(all_rows, "user_id long")
    # store cells == batch-built cells bit-for-bit
    want_cells = sorted(
        tuple(r)
        for r in batch_df.select(
            F.explode(cms_hash_structs(F.col("user_id"))).alias("x")
        )
        .select("x.i", "x.h")
        .groupBy("i", "h")
        .count()
        .collect()
    )
    got_cells = sorted(
        tuple(r) for r in read_cms_store(spark, store).collect()
    )
    assert got_cells == want_cells

    # store-backed estimates == batch operator estimates
    keys = batch_df.distinct()
    got_est = {
        r["user_id"]: r["n_cms"]
        for r in cms_store_estimates(spark, store, keys, "user_id").collect()
    }
    want_est = {
        r["user_id"]: r["n_cms"]
        for r in cms_estimates(batch_df, "user_id").collect()
    }
    assert got_est == want_est

    # a key NEVER seen in the stream whose cells include an empty one
    # must report the zero-cell minimum (0), not a positive count from
    # an inner join that silently dropped the empty cells. All
    # candidate ids are hashed in ONE job (a per-candidate collect
    # loop here ran hundreds of Spark jobs and dominated the suite's
    # wall time); the probe picked is the same lowest-id candidate the
    # old sequential scan chose.
    seen_cells = {(r[0], r[1]) for r in got_cells}
    cand_cells = (
        spark.range(10_000, 11_002)
        .select(F.col("id").alias("user_id"))
        .select(
            "user_id",
            F.explode(cms_hash_structs(F.col("user_id"))).alias("x"),
        )
        .select("user_id", "x.i", "x.h")
        .collect()
    )
    unseen_ids = {
        r["user_id"]
        for r in cand_cells
        if (r["i"], r["h"]) not in seen_cells
    }
    probe_unseen = min(unseen_ids) if unseen_ids else None
    if probe_unseen is not None:
        est = cms_store_estimates(
            spark, store,
            spark.createDataFrame([(probe_unseen,)], "user_id long"),
            "user_id",
        ).collect()
        assert len(est) == 1 and est[0]["n_cms"] == 0, est

    # redelivery: same epoch -> partition overwrite, no-op
    store2 = str(tmp_path / "store2")
    ingest = make_cms_ingest(spark, store2, "user_id")
    dfs = [
        spark.createDataFrame(rows, "user_id long").coalesce(1)
        for rows in batches
    ]
    for b, df in enumerate(dfs):
        ingest(df, b)
    before = sorted(tuple(r) for r in read_cms_store(spark, store2).collect())
    assert before == want_cells
    ingest(dfs[0], 0)  # redeliver epoch 0
    after = sorted(tuple(r) for r in read_cms_store(spark, store2).collect())
    assert after == before


def test_streaming_kmv_store_equals_batch_sketch(spark, tmp_path):
    """The KMV epoch store re-ranked on read must equal BIT-FOR-BIT the
    batch sketch over everything streamed (bottom-k of bottom-ks is the
    union's bottom-k — no streaming error term), and estimates off the
    store must match the batch estimates; a redelivered epoch is a
    bit-identical no-op."""
    import os

    from demo_apache_beam_spark.operators.sketches import (
        kmv_pair_estimates,
        kmv_sketches,
    )
    from demo_apache_beam_spark.streaming.kmv import (
        make_kmv_ingest,
        read_kmv_store,
        start_kmv_stream,
    )

    k = 16
    batches = []
    for b in range(3):
        rows = [("a", f"u{i}") for i in range(b * 60, b * 60 + 120)]
        rows += [("b", f"u{i}") for i in range(b * 60 + 60, b * 60 + 150)]
        batches.append(rows)
    all_rows = [r for rows in batches for r in rows]

    store = str(tmp_path / "store")
    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    q = start_kmv_stream(
        spark, in_dir, store, str(tmp_path / "chk"), "key", "item", k=k
    )
    try:
        for b, rows in enumerate(batches):
            spark.createDataFrame(rows, "key string, item string").coalesce(
                1
            ).write.parquet(f"{tmp_path}/stage_{b}")
            part = next(
                f for f in os.listdir(f"{tmp_path}/stage_{b}")
                if f.endswith(".parquet")
            )
            os.rename(f"{tmp_path}/stage_{b}/{part}", f"{in_dir}/b{b}.parquet")
            q.processAllAvailable()
    finally:
        q.stop()

    batch_df = spark.createDataFrame(all_rows, "key string, item string")
    want_sk = sorted(
        (r["key"], r["hx"], r["rk"], r["f"])
        for r in kmv_sketches(batch_df, "key", "item", k=k).collect()
    )
    got_sk = sorted(
        (r["key"], r["hx"], r["rk"], r["f"])
        for r in read_kmv_store(spark, store, "key", k=k).collect()
    )
    assert got_sk == want_sk

    want_est = sorted(
        tuple(r)
        for r in kmv_pair_estimates(
            kmv_sketches(batch_df, "key", "item", k=k), "key", k=k
        ).collect()
    )
    got_est = sorted(
        tuple(r)
        for r in kmv_pair_estimates(
            read_kmv_store(spark, store, "key", k=k), "key", k=k
        ).collect()
    )
    assert got_est == want_est

    # redelivery: same epoch, same rows → partition overwrite, store
    # unchanged. Driven through the ingest factory on its own store so
    # the epoch↔batch mapping is pinned (the stream above may coalesce
    # files into epochs differently; the merge is exact either way).
    store2 = str(tmp_path / "store2")
    ingest = make_kmv_ingest(spark, store2, "key", "item", k=k)
    dfs = [
        spark.createDataFrame(rows, "key string, item string").coalesce(1)
        for rows in batches
    ]
    for b, df in enumerate(dfs):
        ingest(df, b)
    before = sorted(
        (r["key"], r["hx"], r["rk"], r["f"])
        for r in read_kmv_store(spark, store2, "key", k=k).collect()
    )
    assert before == want_sk
    ingest(dfs[1], 1)  # redeliver epoch 1
    after = sorted(
        (r["key"], r["hx"], r["rk"], r["f"])
        for r in read_kmv_store(spark, store2, "key", k=k).collect()
    )
    assert after == before


def test_cms_full_range_keys_no_overflow(spark):
    """64-bit keys (xxhash64-scale, negative included) must sketch
    without tripping the ANSI long-overflow on the cell hash's row
    multiplier — the pmod-2^32 reduction is the identity for in-range
    keys (existing oracles bit-unchanged) and the overflow fix for the
    rest. Estimates keep the no-underestimate contract."""
    from pyspark.sql import functions as F

    from demo_apache_beam_spark.operators.sketches import cms_estimates

    df = (
        spark.range(200)
        .select(F.xxhash64(F.col("id") % 7).alias("k"))
    )
    est = cms_estimates(df, "k")
    rows = est.collect()
    assert len(rows) == 7
    assert all(r["n_cms"] >= r["n_true"] for r in rows)
