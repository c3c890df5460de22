"""Z-order layout (operators/layout.py): the clustering property that makes
multi-column min-max skipping work — each output file's span in EVERY
interleaved dimension is a fraction of the global span, unlike a
single-column sort which only localizes its own column."""

from __future__ import annotations

import glob

import duckdb
from pyspark.sql import functions as F

from conftest import SF_SMALL
from demo_apache_beam_spark.operators.layout import zorder_layout
from demo_apache_beam_spark.queries import REGISTRY
from demo_apache_beam_spark.sources.tables import load_table

N_FILES = 8


def _per_file_span_ratio(path: str, col: str) -> float:
    """mean(per-file max-min) / global(max-min) over the parquet files."""
    con = duckdb.connect()
    files = sorted(glob.glob(f"{path}/part-*.parquet"))
    assert len(files) > 1, files
    spans = []
    lo, hi = None, None
    for f in files:
        mn, mx = con.execute(f"SELECT min({col}), max({col}) FROM '{f}'").fetchone()
        spans.append(mx - mn)
        lo = mn if lo is None else min(lo, mn)
        hi = mx if hi is None else max(hi, mx)
    con.close()
    return (sum(spans) / len(spans)) / (hi - lo)


def _events_with_z(spark):
    ev = load_table(spark, SF_SMALL, "events").select(
        "event_id", "user_id", (F.unix_micros("ts") / 1000).cast("long").alias("ts_ms")
    )
    z = REGISTRY["events_zorder_index"].fn(spark, SF_SMALL)
    return ev.join(z, "event_id")


def test_zorder_localizes_both_dimensions(spark, tmp_path):
    """Range-partitioning on the Morton key must shrink the per-file span
    of BOTH interleaved columns well below the global span."""
    out = str(tmp_path / "z")
    zorder_layout(_events_with_z(spark), "zval", N_FILES).write.parquet(out)
    assert _per_file_span_ratio(out, "user_id") < 0.75
    assert _per_file_span_ratio(out, "ts_ms") < 0.75


def test_single_column_sort_does_not(spark, tmp_path):
    """Baseline: the same data range-partitioned on time alone leaves the
    user_id span at ~full width per file — the gap Z-order closes."""
    out = str(tmp_path / "t")
    df = _events_with_z(spark)
    df.repartitionByRange(N_FILES, F.col("ts_ms")).sortWithinPartitions(
        "ts_ms"
    ).write.parquet(out)
    assert _per_file_span_ratio(out, "ts_ms") < 0.5  # its own column: tight
    assert _per_file_span_ratio(out, "user_id") > 0.9  # everyone else: no help


def test_compact_files_reduces_file_count_and_preserves_rows(spark, tmp_path):
    """50 tiny appended files compact to the byte-budgeted count with
    identical content; with sort_col the rewrite also restores range
    clustering (per-file spans shrink)."""
    from demo_apache_beam_spark.operators.layout import compact_files

    path = str(tmp_path / "t")
    # simulate 50 micro-batch appends
    for i in range(50):
        spark.range(i * 100, (i + 1) * 100).selectExpr(
            "id", "id % 97 AS k"
        ).coalesce(1).write.mode("append").parquet(path)
    before = set(glob.glob(f"{path}/part-*.parquet"))
    assert len(before) == 50
    expect = {(r["id"], r["k"]) for r in spark.read.parquet(path).collect()}

    n = compact_files(spark, path, target_file_bytes=1 << 20, sort_col="id")
    after = glob.glob(f"{path}/part-*.parquet")
    assert len(after) == n < 10
    got = {(r["id"], r["k"]) for r in spark.read.parquet(path).collect()}
    assert got == expect
    if len(after) > 1:
        assert _per_file_span_ratio(path, "id") < 0.5  # clustering restored


def test_compact_files_preserves_partitioned_layout(spark, tmp_path):
    """A Hive-partitioned dataset must compact PER PARTITION: the k=v
    directories survive (partition pruning and the streaming stores'
    replay-by-partition-overwrite depend on them), every partition's
    file count drops, and the read-back — including the partition
    column — is unchanged. The old top-level-only listing summed 0
    bytes here and would have flattened the whole layout into one
    unpartitioned file set."""
    import os

    from demo_apache_beam_spark.operators.layout import compact_files

    path = str(tmp_path / "pt")
    for i in range(12):  # 12 appends x 3 partitions = 36 tiny files
        spark.range(i * 60, (i + 1) * 60).selectExpr(
            "id", "id % 3 AS _batch_id"
        ).coalesce(1).write.mode("append").partitionBy("_batch_id").parquet(path)
    parts = sorted(
        d for d in os.listdir(path) if d.startswith("_batch_id=")
    )
    assert parts == ["_batch_id=0", "_batch_id=1", "_batch_id=2"]
    assert all(
        len(glob.glob(f"{path}/{d}/part-*.parquet")) == 12 for d in parts
    )
    expect = {(r["id"], r["_batch_id"]) for r in spark.read.parquet(path).collect()}

    compact_files(spark, path, target_file_bytes=1 << 20, sort_col="id")

    assert sorted(
        d for d in os.listdir(path) if d.startswith("_batch_id=")
    ) == parts  # layout preserved
    for d in parts:
        assert len(glob.glob(f"{path}/{d}/part-*.parquet")) < 12
    got = {(r["id"], r["_batch_id"]) for r in spark.read.parquet(path).collect()}
    assert got == expect


class TestTrainingShuffle:
    def test_deterministic_and_dense(self, spark):
        from demo_apache_beam_spark.operators.layout import training_shuffle

        df = spark.range(0, 1000).withColumnRenamed("id", "doc_id")
        a = training_shuffle(df, n_shards=8, seed=7).collect()
        b = training_shuffle(df, n_shards=8, seed=7).collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))
        # positions are dense 0..m-1 within every shard
        by_shard = {}
        for r in a:
            by_shard.setdefault(r["shard"], []).append(r["pos"])
        assert set(by_shard) <= set(range(8))
        for positions in by_shard.values():
            assert sorted(positions) == list(range(len(positions)))

    def test_seed_changes_order(self, spark):
        from demo_apache_beam_spark.operators.layout import training_shuffle

        df = spark.range(0, 500).withColumnRenamed("id", "doc_id")
        a = {r["doc_id"]: (r["shard"], r["pos"]) for r in training_shuffle(df, seed=1).collect()}
        b = {r["doc_id"]: (r["shard"], r["pos"]) for r in training_shuffle(df, seed=2).collect()}
        assert a != b

    def test_shards_balanced(self, spark):
        from demo_apache_beam_spark.operators.layout import training_shuffle

        df = spark.range(0, 4096).withColumnRenamed("id", "doc_id")
        counts = [
            r["c"]
            for r in training_shuffle(df, n_shards=16, seed=3)
            .groupBy("shard")
            .agg(__import__("pyspark").sql.functions.count("*").alias("c"))
            .collect()
        ]
        assert len(counts) == 16
        # uniform hash: every shard within 3x sqrt-N noise of the mean
        mean = 4096 / 16
        assert all(abs(c - mean) < 4 * (mean ** 0.5) for c in counts)

    def test_large_shard_counts_fully_populated(self, spark):
        """Regression: a 2-hex-digit key capped shards at 256, starving
        every shard id above it; 48 key bits must populate all of them."""
        from demo_apache_beam_spark.operators.layout import training_shuffle

        df = spark.range(0, 20000).withColumnRenamed("id", "doc_id")
        shards = {
            r["shard"]
            for r in training_shuffle(df, n_shards=512, seed=5)
            .select("shard")
            .distinct()
            .collect()
        }
        assert len(shards) == 512
        # non-power-of-16 count shows no systematic step imbalance
        from pyspark.sql import functions as F

        counts = [
            r["c"]
            for r in training_shuffle(df, n_shards=96, seed=5)
            .groupBy("shard")
            .agg(F.count("*").alias("c"))
            .collect()
        ]
        mean = 20000 / 96
        assert len(counts) == 96
        assert all(abs(c - mean) < 5 * (mean ** 0.5) for c in counts)


def test_temperature_mixture_rebalances_languages(spark):
    """α=0.3 sampling: the rarest language keeps ~all its docs (rate
    clamps at 1), the most common is downsampled hardest, and realized
    per-language sampling rates order INVERSELY to corpus frequency."""
    from demo_apache_beam_spark.queries import REGISTRY
    from demo_apache_beam_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    docs = load_table(spark, sf, "documents")
    n_by_lang = {
        r["lang"]: r["n"]
        for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    out = REGISTRY["doc_temperature_mixture"].fn(spark, sf).collect()
    kept_by_lang: dict = {}
    q_by_lang: dict = {}
    for r in out:
        kept_by_lang[r["lang"]] = kept_by_lang.get(r["lang"], 0) + 1
        q_by_lang[r["lang"]] = r["q_mix"]
    assert set(kept_by_lang) <= set(n_by_lang)
    # mixture weights normalize
    assert abs(sum(q_by_lang.values()) - 1.0) < 1e-4
    rates = {l: kept_by_lang.get(l, 0) / n for l, n in n_by_lang.items()}
    langs_by_freq = sorted(n_by_lang, key=n_by_lang.get)
    rare, common = langs_by_freq[0], langs_by_freq[-1]
    if n_by_lang[common] > 2 * n_by_lang[rare]:
        assert rates[rare] > rates[common]
    # overall budget: about half the corpus (hash threshold is exact in
    # expectation; allow generous slack at this tiny SF)
    total = sum(n_by_lang.values())
    assert 0.3 * total <= len(out) <= 0.75 * total


def test_erase_rows_flat_and_partitioned(spark, tmp_path):
    """The erasure rewrite must drop exactly the requested subjects'
    rows, keep every other row's values intact, preserve a Hive
    partition layout, and survive a request set derived from the
    dataset being rewritten (checkpoint-before-delete)."""
    import os

    from pyspark.sql import functions as F

    from demo_apache_beam_spark.operators.layout import erase_rows

    rows = [(i, i % 10, f"v{i}") for i in range(500)]
    df = spark.createDataFrame(rows, "user_id long, part int, payload string")

    # flat dataset; request ids DERIVED FROM THE DATASET ITSELF
    flat = str(tmp_path / "flat")
    df.coalesce(2).write.parquet(flat)
    src = spark.read.parquet(flat)
    req = src.filter(F.col("user_id") % 7 == 0).select("user_id")
    res = erase_rows(spark, flat, req, "user_id")
    expect_gone = {i for i in range(500) if i % 7 == 0}
    assert res == {
        "rows_before": 500,
        "rows_erased": len(expect_gone),
        "rows_after": 500 - len(expect_gone),
    }
    kept = {r["user_id"]: r["payload"] for r in spark.read.parquet(flat).collect()}
    assert set(kept) == set(range(500)) - expect_gone
    assert all(kept[i] == f"v{i}" for i in kept)

    # Hive-partitioned dataset: layout must survive, and partitions with
    # no matching ids must NOT be rewritten (ids 3 -> part=3, 488 ->
    # part=8; every other partition's files must be untouched)
    part = str(tmp_path / "part")
    df.write.partitionBy("part").parquet(part)
    listing_before = {
        d: sorted(os.listdir(f"{part}/{d}"))
        for d in os.listdir(part)
        if d.startswith("part=")
    }
    req2 = spark.createDataFrame([(3,), (488,)], "uid long")
    res2 = erase_rows(spark, part, req2, "user_id", id_col="uid")
    assert res2["rows_erased"] == 2 and res2["rows_after"] == 498
    dirs = {d for d in os.listdir(part) if d.startswith("part=")}
    assert dirs == {f"part={i}" for i in range(10)}
    for d, files in listing_before.items():
        if d in ("part=3", "part=8"):
            continue
        assert sorted(os.listdir(f"{part}/{d}")) == files, d
    left = spark.read.parquet(part)
    assert left.count() == 498
    assert left.filter(F.col("user_id").isin(3, 488)).count() == 0

    # erasing by the partition column is directory deletion, not a
    # rewrite — must be rejected before any mutation
    import pytest

    with pytest.raises(ValueError, match="partition column"):
        erase_rows(spark, part, req2, "part", id_col="uid")
    assert spark.read.parquet(part).count() == 498


def test_streaming_erasure_equals_batch_and_replays(spark, tmp_path):
    """Tombstones applied per epoch must leave the dataset equal to one
    batch erase of the union, and a redelivered epoch must not rewrite
    a single file (deletion is naturally convergent)."""
    import os

    from demo_apache_beam_spark.streaming.erasure import (
        make_erasure_ingest,
        start_erasure_stream,
    )

    rows = [(i, i % 6, f"v{i}") for i in range(600)]
    df = spark.createDataFrame(rows, "user_id long, part int, payload string")
    data = str(tmp_path / "data")
    df.write.partitionBy("part").parquet(data)

    epochs = [[(1,), (7,)], [(13,), (599,)], [(1,), (200,)]]  # 1 repeats
    gone = {1, 7, 13, 599, 200}

    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    q = start_erasure_stream(
        spark, in_dir, data, str(tmp_path / "chk"), "user_id",
        schema="user_id long",
    )
    try:
        for b, chunk in enumerate(epochs):
            spark.createDataFrame(chunk, "user_id long").coalesce(
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

    left = spark.read.parquet(data)
    assert left.count() == 600 - len(gone)
    kept = {r["user_id"] for r in left.collect()}
    assert kept == set(range(600)) - gone

    # redelivery: same tombstones again -> zero matches -> NO rewrite;
    # every partition's file listing must be byte-for-byte untouched
    listing = {
        d: sorted(os.listdir(f"{data}/{d}"))
        for d in os.listdir(data)
        if d.startswith("part=")
    }
    ingest = make_erasure_ingest(spark, data, "user_id")
    ingest(spark.createDataFrame(epochs[1], "user_id long"), 99)
    after = {
        d: sorted(os.listdir(f"{data}/{d}"))
        for d in os.listdir(data)
        if d.startswith("part=")
    }
    assert after == listing
    assert spark.read.parquet(data).count() == 600 - len(gone)


def test_erase_rows_multi_matches_audit(spark, tmp_path):
    """Multi-table erasure execute == the user_erasure_audit dry run
    (VERDICT r7 item 3): per table, rows_erased must equal exactly the
    rows_affected the audit counted (identity keys user_id / c_custkey /
    o_custkey), a re-run audit over the rewritten tables must count
    zero, and no requested subject may survive anywhere — on flat
    copies AND with the events table Hive-partitioned."""
    import os
    import shutil

    from demo_apache_beam_spark.operators.layout import erase_rows_multi

    def copy_sf(dst, partitioned_events):
        os.makedirs(dst)
        for t in ("events", "customer", "orders"):
            src = f"{SF_SMALL}/{t}.parquet"
            out = f"{dst}/{t}.parquet"
            if t == "events" and partitioned_events:
                load_table(spark, SF_SMALL, t).write.partitionBy(
                    "event_type"
                ).parquet(out)
            elif os.path.isdir(src):
                shutil.copytree(src, out)
            else:
                shutil.copy(src, out)

    for partitioned in (False, True):
        sf = str(tmp_path / ("sf_part" if partitioned else "sf_flat"))
        copy_sf(sf, partitioned)
        audit = {
            r["table_name"]: (r["rows_affected"], r["subjects"])
            for r in REGISTRY["user_erasure_audit"].fn(spark, sf).collect()
        }
        assert audit["events"][0] > 0  # non-degenerate at this SF
        ids = (
            load_table(spark, sf, "events")
            .filter(
                ((F.col("user_id") % F.lit(1000)) * F.lit(2654435761))
                % F.lit(1000)
                < F.lit(12)
            )
            .select("user_id")
        )
        res = erase_rows_multi(
            spark,
            ids,
            {
                "events": (f"{sf}/events.parquet", "user_id"),
                "customer": (f"{sf}/customer.parquet", "c_custkey"),
                "orders": (f"{sf}/orders.parquet", "o_custkey"),
            },
            id_col="user_id",
        )
        for t in ("events", "customer", "orders"):
            assert res[t]["rows_erased"] == audit[t][0], (partitioned, t)
            assert (
                res[t]["rows_after"] == res[t]["rows_before"] - audit[t][0]
            ), (partitioned, t)
        # the audit over the rewritten tables finds nothing left to erase
        spark.catalog.clearCache()
        audit_after = {
            r["table_name"]: r["rows_affected"]
            for r in REGISTRY["user_erasure_audit"].fn(spark, sf).collect()
        }
        assert audit_after == {"events": 0, "customer": 0, "orders": 0}, partitioned
        if partitioned:
            # the Hive layout survived the per-partition rewrite
            dirs = {
                d
                for d in os.listdir(f"{sf}/events.parquet")
                if d.startswith("event_type=")
            }
            assert dirs, "partition layout lost"


def test_erase_rows_propagates_to_ivm_store(spark, tmp_path):
    """Right-to-erasure composed with IVM (VERDICT r11 item 1, the
    'erased subject survives inside materialized views' hole): erase a
    subject from the SOURCE table with erase_rows, propagate with
    erase_from_ivm_store, and the store's sides, view, and maintained
    aggregate must no longer carry the subject — the erasure audit
    (semi-join count against the view) reads ZERO. The LEFT OUTER store
    erases through its inner store + unmatched set; erasing by a
    right-side-only column there is rejected loudly (it would need the
    recompute the algebra avoids)."""
    import os

    import pytest
    from pyspark.sql import functions as F

    from demo_apache_beam_spark.operators.ivm import (
        apply_join_increment,
        apply_left_join_increment,
        erase_from_ivm_store,
        read_aggregate_view,
        read_join_view,
        read_left_join_view,
    )
    from demo_apache_beam_spark.operators.layout import erase_rows

    src = str(tmp_path / "facts")
    dim = str(tmp_path / "dim")
    spark.createDataFrame(
        [(i, i % 5, float(i)) for i in range(40)], "fact_id long, uid long, v double"
    ).write.parquet(src)
    spark.createDataFrame(
        [(u, f"seg{u % 2}") for u in range(5)], "uid long, seg string"
    ).write.parquet(dim)

    group = ["seg"]
    partials = lambda: [  # noqa: E731
        F.count(F.lit(1)).alias("n_p"),
        F.sum(F.col("v").cast("decimal(18,6)")).alias("s_p"),
    ]
    merges = [F.sum("n_p").alias("n"), F.sum("s_p").cast("double").alias("s")]

    store = str(tmp_path / "ivm")
    facts = spark.read.parquet(src)
    dims = spark.read.parquet(dim)
    for cond, d in (
        (F.col("fact_id") < 20, dims),
        (F.col("fact_id") >= 20, dims.limit(0)),
    ):
        apply_join_increment(
            spark,
            store,
            facts.filter(cond),
            d,
            on="uid",
            agg=(group, partials()),
        )

    subject = spark.createDataFrame([(3,)], "uid long")
    # 1. source-table erasure (the r11 state of the art)
    stats = erase_rows(spark, src, subject, key_col="uid")
    assert stats["rows_erased"] == 8
    # ... the subject SURVIVES in the materialized view — the hole
    assert read_join_view(spark, store).filter(F.col("uid") == 3).count() > 0
    # 2. propagation closes it
    res = erase_from_ivm_store(
        spark, store, subject, "uid", on="uid", agg=(group, partials())
    )
    assert res["view"] == 8 and res["left"] == 8 and res["right"] == 1
    view = read_join_view(spark, store)
    assert view.filter(F.col("uid") == 3).count() == 0  # audit reads zero
    # maintained aggregate == recompute over the post-erasure view
    got = {
        r["seg"]: (r["n"], round(r["s"], 6))
        for r in read_aggregate_view(
            spark, store, group, merges, drop_zero_col="n"
        ).collect()
    }
    want = {
        r["seg"]: (r["n"], round(r["s"], 6))
        for r in view.groupBy("seg")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("v").cast("decimal(18,6)")).cast("double").alias("s"),
        )
        .collect()
    }
    assert got == want

    # LEFT OUTER store: subject erased from inner AND unmatched
    lstore = str(tmp_path / "ivm_left")
    apply_left_join_increment(
        spark,
        lstore,
        spark.read.parquet(src).limit(0).unionByName(
            spark.createDataFrame(
                [(100, 3, 1.0), (101, 4, 2.0)], "fact_id long, uid long, v double"
            )
        ),
        dims.limit(0),
        on="uid",
    )
    apply_left_join_increment(
        spark,
        lstore,
        spark.createDataFrame([(102, 4, 3.0)], "fact_id long, uid long, v double"),
        spark.createDataFrame([(4, "segX")], "uid long, seg string"),
        on="uid",
    )
    before = read_left_join_view(spark, lstore)
    assert before.filter(F.col("uid") == 3).count() == 1  # unmatched row
    res = erase_from_ivm_store(spark, lstore, subject, "uid", on="uid")
    assert res["unmatched"] == 1
    after = read_left_join_view(spark, lstore)
    assert after.filter(F.col("uid") == 3).count() == 0
    assert after.filter(F.col("uid") == 4).count() == 2  # others untouched
    with pytest.raises(ValueError, match="RIGHT-side"):
        erase_from_ivm_store(
            spark,
            lstore,
            spark.createDataFrame([("segX",)], "seg string"),
            "seg",
            on="uid",
        )


def test_erase_rows_multi_reaches_stacked_ivm_stores(spark, tmp_path):
    """ONE erase_rows_multi call removes a subject from the source
    tables AND from a STACKED (view-of-view) three-table IVM store —
    both pairwise levels listed as ivm_stores entries: the inner
    (orders⋈lines) level erases by the subject column it carries as a
    left attribute; the outer (customer⋈view) level erases by its join
    key, which also scrubs the accumulated view-delta RIGHT side. The
    post-erase audit reads zero at every level."""
    from pyspark.sql import functions as F

    from demo_apache_beam_spark.operators.ivm import (
        apply_join_increment,
        read_join_view,
    )
    from demo_apache_beam_spark.operators.layout import erase_rows_multi

    cust_src = str(tmp_path / "cust")
    ord_src = str(tmp_path / "ord")
    spark.createDataFrame(
        [(c, f"seg{c % 2}") for c in range(6)], "ckey long, seg string"
    ).write.parquet(cust_src)
    spark.createDataFrame(
        [(o, o % 6, float(o)) for o in range(30)],
        "okey long, ckey long, amt double",
    ).write.parquet(ord_src)

    store = str(tmp_path / "stack")
    cust = spark.read.parquet(cust_src)
    orders = spark.read.parquet(ord_src)
    lines = spark.createDataFrame(
        [(o, f"l{o}") for o in range(30)], "okey long, line string"
    )
    for cond, cmod in (
        (F.col("okey") < 15, 0),
        (F.col("okey") >= 15, 1),
    ):
        dv = apply_join_increment(
            spark, f"{store}/ol", orders.filter(cond), lines.filter(cond),
            on="okey",
        )
        apply_join_increment(
            spark, f"{store}/col",
            cust.filter(F.col("ckey") % 2 == cmod),
            dv, on="ckey",
        )

    subject = spark.createDataFrame([(3,)], "uid long")
    res = erase_rows_multi(
        spark,
        subject,
        targets={
            "customer": (cust_src, "ckey"),
            "orders": (ord_src, "ckey"),
        },
        id_col="uid",
        ivm_stores={
            "stack_inner": {
                "store_path": f"{store}/ol", "key_col": "ckey", "on": "okey",
            },
            "stack_outer": {
                "store_path": f"{store}/col", "key_col": "ckey", "on": "ckey",
            },
        },
    )
    assert res["customer"]["rows_erased"] == 1
    assert res["orders"]["rows_erased"] == 5
    assert res["stack_inner"]["view"] == 5 and res["stack_inner"]["left"] == 5
    assert res["stack_outer"]["left"] == 1
    assert res["stack_outer"]["right"] == 5  # accumulated view-delta side
    # audit reads zero at every level
    for p, col in (
        (cust_src, "ckey"), (ord_src, "ckey"),
        (f"{store}/ol/view", "ckey"), (f"{store}/col/view", "ckey"),
    ):
        assert spark.read.parquet(p).filter(F.col(col) == 3).count() == 0
    # other subjects untouched in the outer view
    assert read_join_view(spark, f"{store}/col").filter(
        F.col("ckey") == 2
    ).count() > 0


def test_store_catalog_discovers_stores_for_erasure(spark, tmp_path):
    """Persisted store catalog (r13, VERDICT r12 item 2): dependencies
    recorded at store-BUILD time make one-call erasure complete BY
    CONSTRUCTION — a subject erased via erase_rows_multi(store_catalog=)
    vanishes from a store the caller never named; re-recording a store
    upserts (no duplicate rows); an explicit ivm_stores entry overrides
    a catalog entry of the same name; and a catalog-less legacy store
    still erases through the explicit dict alone."""
    from pyspark.sql import functions as F

    from demo_apache_beam_spark.operators.catalog import (
        build_agg_spec,
        catalog_entries,
        ivm_stores_from_catalog,
        record_store_dependency,
    )
    from demo_apache_beam_spark.operators.ivm import (
        apply_join_increment,
        read_aggregate_view,
        read_join_view,
    )
    from demo_apache_beam_spark.operators.layout import erase_rows_multi

    facts_src = str(tmp_path / "facts")
    spark.createDataFrame(
        [(i, i % 5, float(i)) for i in range(40)],
        "fact_id long, uid long, v double",
    ).write.parquet(facts_src)
    dims = spark.createDataFrame(
        [(u, f"seg{u % 2}") for u in range(5)], "uid long, seg string"
    )

    # store the CALLER NEVER NAMES in the erase call — built with a
    # maintained aggregate, recorded into the catalog at build time
    store = str(tmp_path / "ivm_store")
    agg_serialized = ("seg", "n_p", "v:s_p")
    apply_join_increment(
        spark,
        store,
        spark.read.parquet(facts_src),
        dims,
        on="uid",
        agg=build_agg_spec(*agg_serialized),
    )
    cat = str(tmp_path / "catalog")
    n = record_store_dependency(
        spark, cat, "facts_by_seg", store,
        source_tables=["facts"], key_col="uid", on="uid",
        agg_group=agg_serialized[0], agg_count=agg_serialized[1],
        agg_sums=agg_serialized[2],
    )
    assert n == 1
    # upsert: re-recording (a rebuild) does not duplicate
    assert record_store_dependency(
        spark, cat, "facts_by_seg", store,
        source_tables=["facts"], key_col="uid", on="uid",
        agg_group=agg_serialized[0], agg_count=agg_serialized[1],
        agg_sums=agg_serialized[2],
    ) == 1
    assert len(catalog_entries(spark, cat)) == 1

    # discovery builds the exact erase_from_ivm_store kwargs
    specs = ivm_stores_from_catalog(spark, cat, ["facts"])
    assert set(specs) == {"facts_by_seg"}
    assert specs["facts_by_seg"]["key_col"] == "uid"
    assert specs["facts_by_seg"]["agg"] is not None
    assert ivm_stores_from_catalog(spark, cat, ["unrelated"]) == {}

    subject = spark.createDataFrame([(3,)], "uid long")
    assert read_join_view(spark, store).filter(F.col("uid") == 3).count() > 0
    res = erase_rows_multi(
        spark,
        subject,
        targets={"facts": (facts_src, "uid")},
        id_col="uid",
        store_catalog=cat,  # NO ivm_stores dict — discovery only
    )
    assert res["facts"]["rows_erased"] == 8
    assert res["facts_by_seg"]["view"] == 8  # the un-named store erased
    assert read_join_view(spark, store).filter(F.col("uid") == 3).count() == 0
    # the maintained aggregate took the negative partials (spec came
    # from the catalog's serialized form)
    merged = read_aggregate_view(
        spark, store, ["seg"],
        [F.sum("n_p").alias("n")], drop_zero_col="n",
    )
    got = {r["seg"]: r["n"] for r in merged.collect()}
    want = {
        r["seg"]: r["n"]
        for r in read_join_view(spark, store)
        .groupBy("seg").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert got == want

    # explicit entry overrides the catalog's same-named one: point the
    # override at a second store; the catalog's store is NOT re-erased
    store2 = str(tmp_path / "ivm_store2")
    spark.createDataFrame(
        [(100, 2, 9.0)], "fact_id long, uid long, v double"
    ).write.parquet(str(tmp_path / "facts2"))
    apply_join_increment(
        spark, store2, spark.read.parquet(str(tmp_path / "facts2")),
        dims, on="uid",
    )
    res = erase_rows_multi(
        spark,
        spark.createDataFrame([(2,)], "uid long"),
        targets={"facts": (facts_src, "uid")},
        id_col="uid",
        store_catalog=cat,
        ivm_stores={
            "facts_by_seg": {  # same name, DIFFERENT store: caller wins
                "store_path": store2, "key_col": "uid", "on": "uid",
            }
        },
    )
    assert res["facts_by_seg"]["view"] == 1  # store2's single uid=2 row
    assert read_join_view(spark, store2).filter(F.col("uid") == 2).count() == 0
    # catalog store untouched by the override (still holds uid=2 rows
    # minus nothing: uid=2 was erased only from the SOURCE + store2)
    assert read_join_view(spark, store).filter(F.col("uid") == 2).count() > 0

    # catalog-less legacy path: explicit dict alone, no store_catalog
    res = erase_rows_multi(
        spark,
        spark.createDataFrame([(1,)], "uid long"),
        targets={"facts": (facts_src, "uid")},
        id_col="uid",
        ivm_stores={
            "legacy": {"store_path": store2, "key_col": "uid", "on": "uid"}
        },
    )
    assert "legacy" in res


def test_erase_subjects_cli_drains_queue_via_catalog(spark, tmp_path):
    """The DSR-drain CLI (r13): one cron-shaped invocation removes the
    queued subjects from the source tables AND from every catalog-
    recorded store over them; re-running the same queue is an erasure
    no-op; the JSON line reports exactly what each request touched."""
    import json
    import os
    import subprocess
    import sys

    from pyspark.sql import functions as F

    from demo_apache_beam_spark.operators.catalog import (
        record_store_dependency,
    )
    from demo_apache_beam_spark.operators.ivm import (
        apply_join_increment,
        read_join_view,
    )

    facts_src = str(tmp_path / "facts")
    spark.createDataFrame(
        [(i, i % 5, float(i)) for i in range(40)],
        "fact_id long, uid long, v double",
    ).write.parquet(facts_src)
    dims = spark.createDataFrame(
        [(u, f"seg{u % 2}") for u in range(5)], "uid long, seg string"
    )
    store = str(tmp_path / "ivm_store")
    apply_join_increment(
        spark, store, spark.read.parquet(facts_src), dims, on="uid"
    )
    cat = str(tmp_path / "catalog")
    record_store_dependency(
        spark, cat, "facts_by_seg", store,
        source_tables=["facts"], key_col="uid", on="uid",
    )
    queue = str(tmp_path / "dsr")
    spark.createDataFrame([(3,)], "user_id long").write.parquet(queue)

    def run():
        proc = subprocess.run(
            [sys.executable, "-m",
             "demo_apache_beam_spark.pipelines.erase_subjects",
             "--ids", queue, "--id-col", "user_id",
             "--target", f"facts:{facts_src}:uid",
             "--store-catalog", cat],
            capture_output=True, text=True, timeout=600,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        assert proc.returncode == 0, proc.stderr[-2000:]
        line = [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
        return json.loads(line)["targets"]

    out = run()
    assert out["facts"]["rows_erased"] == 8
    assert out["facts_by_seg"]["view"] == 8  # catalog-discovered store
    spark.catalog.refreshByPath(facts_src)  # rewritten out-of-band
    assert spark.read.parquet(facts_src).filter(F.col("uid") == 3).count() == 0
    spark.catalog.refreshByPath(os.path.join(store, "view"))
    assert read_join_view(spark, store).filter(F.col("uid") == 3).count() == 0

    # idempotent: the re-drained queue probes but rewrites nothing
    out = run()
    assert out["facts"]["rows_erased"] == 0
    assert out["facts_by_seg"]["view"] == 0


def test_store_catalog_discovers_dedup_stores(spark, tmp_path):
    """Catalog kinds beyond IVM (r13 — the VERDICT r12 item-2 wording
    was 'which IVM/dedup stores were built over which source tables'):
    dedup_exact and dedup_minhash stores recorded at build time are
    discovered by erase_rows_multi(store_catalog=), which captures the
    subject's doc rows BEFORE the source rewrite and drives each
    kind's erase wrapper with the recorded build params — one call
    scrubs the table, an IVM view, the exact-digest store, and the
    MinHash band store. Hamming stores are refused at record time
    (explicit-wrapper-only by design)."""
    import pytest
    from pyspark.sql import functions as F

    from demo_apache_beam_spark.operators.catalog import (
        record_store_dependency,
    )
    from demo_apache_beam_spark.operators.dedup import (
        content_key,
        incremental_exact_dedup,
        incremental_minhash_dedup,
    )
    from demo_apache_beam_spark.operators.ivm import (
        apply_join_increment,
        read_join_view,
    )
    from demo_apache_beam_spark.operators.layout import erase_rows_multi

    docs_src = str(tmp_path / "docs")
    rows = [
        (i, i % 5, " ".join(f"tok{i}_{j} w{i * 31 + j}" for j in range(12)))
        for i in range(25)
    ]
    spark.createDataFrame(
        rows, "doc_id long, uid long, text string"
    ).write.parquet(docs_src)
    docs = spark.read.parquet(docs_src)

    exact_store = str(tmp_path / "exact_store")
    incremental_exact_dedup(docs, exact_store, key_cols=("text",)).count()
    mh_store = str(tmp_path / "mh_store")
    incremental_minhash_dedup(
        docs, mh_store, id_col="doc_id", text_col="text",
        num_hashes=16, bands=4, shingle_n=2,
    ).count()
    ivm_store = str(tmp_path / "ivm_store")
    dims = spark.createDataFrame(
        [(u, f"seg{u % 2}") for u in range(5)], "uid long, seg string"
    )
    apply_join_increment(spark, ivm_store, docs.drop("text"), dims, on="uid")

    cat = str(tmp_path / "catalog")
    record_store_dependency(
        spark, cat, "docs_exact", exact_store,
        source_tables=["docs"], key_col="uid", on="",
        kind="dedup_exact", params={"key_cols": ["text"]},
    )
    record_store_dependency(
        spark, cat, "docs_minhash", mh_store,
        source_tables=["docs"], key_col="uid", on="",
        kind="dedup_minhash",
        params={"id_col": "doc_id", "text_col": "text",
                "num_hashes": 16, "bands": 4, "shingle_n": 2},
    )
    record_store_dependency(
        spark, cat, "docs_view", ivm_store,
        source_tables=["docs"], key_col="uid", on="uid",
    )
    with pytest.raises(ValueError, match="hamming|kind"):
        record_store_dependency(
            spark, cat, "nope", str(tmp_path / "x"),
            source_tables=["docs"], key_col="uid", on="",
            kind="dedup_hamming",
        )

    # the subject's digests, captured for the post-erase probe
    subj_digests = {
        r["_ck"]
        for r in docs.filter(F.col("uid") == 3)
        .select(content_key(["text"]).alias("_ck"))
        .collect()
    }
    assert len(subj_digests) == 5

    out = erase_rows_multi(
        spark,
        spark.createDataFrame([(3,)], "uid long"),
        targets={"docs": (docs_src, "uid")},
        id_col="uid",
        store_catalog=cat,
    )
    assert out["docs"]["rows_erased"] == 5
    assert out["docs_view"]["view"] == 5
    assert out["docs_exact"]["rows_erased"] == 5
    assert out["docs_minhash"]["rows_erased"] > 0

    # the subject is gone from table, view, and both fingerprint stores
    spark.catalog.refreshByPath(docs_src)
    assert spark.read.parquet(docs_src).filter(F.col("uid") == 3).count() == 0
    assert read_join_view(spark, ivm_store).filter(F.col("uid") == 3).count() == 0
    spark.catalog.refreshByPath(exact_store)
    store_digests = {
        r["_ck"] for r in spark.read.parquet(exact_store).collect()
    }
    assert not (store_digests & subj_digests)
    assert len(store_digests) == 20  # other subjects' digests intact
    spark.catalog.refreshByPath(mh_store)
    # the store holds bare (band_idx, band_hash) rows: recompute the
    # subject's band rows and require none survive, others intact
    from demo_apache_beam_spark.operators.dedup import (
        band_rows,
        minhash_signatures,
    )

    subj_bands = {
        (r["band_idx"], r["band_hash"])
        for r in band_rows(
            minhash_signatures(
                spark.createDataFrame(
                    [t for t in rows if t[1] == 3],
                    "doc_id long, uid long, text string",
                ),
                id_col="doc_id", text_col="text",
                num_hashes=16, shingle_n=2,
            ),
            id_col="doc_id", num_hashes=16, bands=4,
        ).select("band_idx", "band_hash").collect()
    }
    store_bands = {
        (r["band_idx"], r["band_hash"])
        for r in spark.read.parquet(mh_store).collect()
    }
    assert not (store_bands & subj_bands)
    assert store_bands  # other docs' band rows intact

    # idempotent: re-running the same request probes but removes nothing
    out = erase_rows_multi(
        spark,
        spark.createDataFrame([(3,)], "uid long"),
        targets={"docs": (docs_src, "uid")},
        id_col="uid",
        store_catalog=cat,
    )
    assert out["docs"]["rows_erased"] == 0
    assert out["docs_exact"]["rows_erased"] == 0
    assert out["docs_minhash"]["rows_erased"] == 0
