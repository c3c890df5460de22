"""DSIR importance weights, seeded-Laplace DP release, KMV overlap sketches.

Each operator is checked against an independent pure-Python reference on
synthetic inputs with controlled structure (planted domain shift, known
set overlap), not just the registry oracle — the oracle proves engine
parity, these prove the MATH."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from conftest import SF_SMALL

from demo_apache_beam_spark.operators.privacy import seeded_laplace_noise, seeded_uniform
from demo_apache_beam_spark.operators.selection import (
    dsir_importance_weights,
    hashed_ngram_features,
)
from demo_apache_beam_spark.operators.sketches import kmv_pair_estimates, kmv_sketches


# ---------------------------------------------------------------------------
# DSIR
# ---------------------------------------------------------------------------

def _bucket(feat: str) -> int:
    return int(hashlib.md5(feat.encode()).hexdigest()[:2], 16)


def _ref_features(text: str) -> list[int]:
    toks = text.split(" ")
    feats = list(toks)
    feats += [f"{a}_{b}" for a, b in zip(toks, toks[1:])]
    return [_bucket(f) for f in feats]


def _ref_weights(docs: list[tuple[int, str, bool]]) -> dict[int, float]:
    """Sequential DSIR: hashed uni+bigram multinomials, add-one smoothing
    over 256 buckets, per-bucket log-ratios rounded to 6 dp (half-even,
    matching the decimal cast), summed exactly per raw doc."""
    from decimal import ROUND_HALF_UP, Decimal

    ct: dict[int, int] = {}
    cr: dict[int, int] = {}
    per_doc: dict[int, dict[int, int]] = {}
    for doc_id, text, tgt in docs:
        tf: dict[int, int] = {}
        for b in _ref_features(text):
            tf[b] = tf.get(b, 0) + 1
        per_doc[doc_id] = tf
        sink = ct if tgt else cr
        for b, n in tf.items():
            sink[b] = sink.get(b, 0) + n
    t_tot, r_tot = sum(ct.values()), sum(cr.values())
    out = {}
    for doc_id, text, tgt in docs:
        if tgt:
            continue
        w = Decimal(0)
        for b, n in per_doc[doc_id].items():
            lam = math.log(
                ((ct.get(b, 0) + 1) * (r_tot + 256))
                / ((cr.get(b, 0) + 1) * (t_tot + 256))
            )
            # Spark's double→decimal cast rounds HALF_UP on the exact
            # binary value
            lam6 = Decimal(lam).quantize(
                Decimal("0.000001"), rounding=ROUND_HALF_UP
            )
            w += n * lam6
        out[doc_id] = float(w)
    return out


_DSIR_DOCS = [
    # target corpus: aquatic vocabulary
    (1, "whale shark reef coral whale", True),
    (2, "reef coral kelp shark tide", True),
    (3, "tide whale kelp coral reef", True),
    # raw pool: one aquatic look-alike, one mixed, two desert docs
    (10, "whale reef coral tide kelp", False),
    (11, "whale dune cactus reef sand", False),
    (12, "dune cactus sand mirage dune", False),
    (13, "sand mirage cactus dune sand", False),
]


def test_dsir_weights_match_sequential_reference(spark):
    df = spark.createDataFrame(
        [(d, t, g) for d, t, g in _DSIR_DOCS], "doc_id long, text string, is_target boolean"
    )
    got = {
        r["doc_id"]: r["weight"]
        for r in dsir_importance_weights(df).collect()
    }
    want = _ref_weights(_DSIR_DOCS)
    assert set(got) == set(want)
    for doc_id, w in want.items():
        assert got[doc_id] == pytest.approx(w, abs=1e-9), doc_id


def test_dsir_ranks_target_like_docs_first(spark):
    """The planted domain shift must order the raw pool: pure-aquatic >
    mixed > pure-desert."""
    df = spark.createDataFrame(_DSIR_DOCS, "doc_id long, text string, is_target boolean")
    got = {
        r["doc_id"]: r["weight"]
        for r in dsir_importance_weights(df).collect()
    }
    assert got[10] > got[11] > got[12]
    assert got[11] > got[13]


def test_hashed_features_single_token_doc_has_no_bigrams(spark):
    """sequence(1, 0) descends in Spark — a 1-token doc must contribute
    exactly one unigram feature, not a wrapped bigram."""
    df = spark.createDataFrame([(1, "solo")], "doc_id long, text string")
    rows = hashed_ngram_features(df).collect()
    assert len(rows) == 1
    assert rows[0]["tf"] == 1
    assert rows[0]["bucket"] == _bucket("solo")


# ---------------------------------------------------------------------------
# Seeded Laplace
# ---------------------------------------------------------------------------

def test_seeded_noise_is_deterministic_and_laplace_shaped(spark):
    """Same key → identical noise across evaluations; across many keys the
    draws look Laplace(b): mean |noise| ≈ b, hard bound b·ln(16⁶), and
    both signs occur."""
    n, scale = 4000, 3
    df = spark.range(n).select(F.col("id").cast("string").alias("k"))
    noise = seeded_laplace_noise(F.col("k"), scale, seed="t")
    a = [float(r["x"]) for r in df.select(noise.cast("double").alias("x")).collect()]
    b = [float(r["x"]) for r in df.select(noise.cast("double").alias("x")).collect()]
    assert a == b
    bound = scale * math.log(16**6) + 1e-9
    assert all(abs(x) <= bound for x in a)
    assert any(x > 0 for x in a) and any(x < 0 for x in a)
    mean_abs = sum(abs(x) for x in a) / n
    assert mean_abs == pytest.approx(scale, rel=0.1)
    # sign balance: P(positive) = 1/2
    assert sum(1 for x in a if x >= 0) / n == pytest.approx(0.5, abs=0.05)


def test_seeded_uniform_matches_hashlib(spark):
    df = spark.createDataFrame([("alpha",), ("beta",)], "k string")
    got = {
        r["k"]: r["u"]
        for r in df.select("k", seeded_uniform(F.col("k"), "s").alias("u")).collect()
    }
    for k in ("alpha", "beta"):
        v = int(hashlib.md5(f"s:{k}".encode()).hexdigest()[:6], 16)
        assert got[k] == (v + 0.5) / 16**6


# ---------------------------------------------------------------------------
# KMV
# ---------------------------------------------------------------------------

def _overlap_rows():
    """Two keys with |A|=600, |B|=500, |A∩B|=300; one tiny key (exact
    branch pairs)."""
    rows = []
    rows += [("a", i) for i in range(600)]
    rows += [("b", i) for i in range(300)]  # shared with a
    rows += [("b", 10_000 + i) for i in range(200)]
    rows += [("t", i) for i in range(5)]  # tiny, subset of a ∩ b? of a
    return rows


def test_kmv_estimates_known_overlap(spark):
    df = spark.createDataFrame(_overlap_rows(), "key string, item long")
    sk = kmv_sketches(df, "key", "item", k=64)
    est = {
        (r["key_a"], r["key_b"]): r
        for r in kmv_pair_estimates(sk, "key", k=64).collect()
    }
    ab = est[("a", "b")]
    # k=64 ⇒ σ(union) ≈ union/√(k−2) ≈ 13%; allow 3σ
    assert ab["union_est"] == pytest.approx(800, rel=0.4)
    assert ab["jaccard_est"] == pytest.approx(300 / 800, abs=0.2)
    assert ab["intersection_est"] == pytest.approx(300, rel=0.55)


def test_kmv_small_set_branch_is_exact(spark):
    """When the combined sketch holds under k hashes both sets were fully
    enumerated: union, Jaccard, and intersection are EXACT."""
    df = spark.createDataFrame(_overlap_rows(), "key string, item long")
    sk = kmv_sketches(df, "key", "item", k=2048)
    est = {
        (r["key_a"], r["key_b"]): r
        for r in kmv_pair_estimates(sk, "key", k=2048).collect()
    }
    at = est[("a", "t")]
    assert at["union_est"] == 600.0
    assert at["intersection_est"] == pytest.approx(5.0, abs=1e-6)
    ab = est[("a", "b")]
    assert ab["union_est"] == 800.0
    assert ab["jaccard_est"] == pytest.approx(300 / 800, abs=1e-6)
    assert ab["intersection_est"] == pytest.approx(300.0, abs=1e-4)


def test_kmv_sketch_size_capped(spark):
    df = spark.createDataFrame(_overlap_rows(), "key string, item long")
    sk = kmv_sketches(df, "key", "item", k=16)
    sizes = {
        r["key"]: r["n"]
        for r in sk.groupBy("key").agg(F.count("*").alias("n")).collect()
    }
    assert sizes["a"] == 16 and sizes["b"] == 16 and sizes["t"] == 5


def test_dsir_incremental_model_merge_is_exact(spark, tmp_path):
    """Persisted-model path: hist(epoch0) ⊕ hist(epoch1) must equal
    hist(epoch0 ∪ epoch1) exactly, and scoring a new increment from the
    merged persisted model must be BIT-IDENTICAL to the one-shot inline
    weights over everything — the property that lets a crawl pipeline
    fold each epoch in without rescanning history."""
    from demo_apache_beam_spark.operators.selection import (
        dsir_histograms,
        dsir_importance_weights,
        dsir_load_model,
        dsir_log_ratios,
        dsir_merge_models,
        dsir_save_model,
        dsir_score,
    )

    schema = "doc_id long, text string, is_target boolean"
    epoch0 = spark.createDataFrame(_DSIR_DOCS[:5], schema)
    epoch1 = spark.createDataFrame(_DSIR_DOCS[5:], schema)
    everything = spark.createDataFrame(_DSIR_DOCS, schema)

    merged = dsir_merge_models(
        dsir_histograms(epoch0), dsir_histograms(epoch1)
    )
    want_hist = {
        r["bucket"]: (r["ct"], r["cr"])
        for r in dsir_histograms(everything).collect()
    }
    got_hist = {r["bucket"]: (r["ct"], r["cr"]) for r in merged.collect()}
    assert got_hist == want_hist

    path = str(tmp_path / "model")
    dsir_save_model(merged, path)
    raw = everything.filter("NOT is_target").select("doc_id", "text")
    got = {
        r["doc_id"]: (r["n_feats"], r["weight"])
        for r in dsir_score(raw, dsir_log_ratios(dsir_load_model(spark, path))).collect()
    }
    want = {
        r["doc_id"]: (r["n_feats"], r["weight"])
        for r in dsir_importance_weights(everything).collect()
    }
    assert got == want


def test_user_level_dp_bounds_single_user_influence(spark):
    """Removing one user (however many events they had) must move the
    user-level release by at most cap + |Δnoise| — the sensitivity the
    Laplace scale is calibrated to. The hot user here has 1000 events;
    an event-level release would move by ~1000."""
    from demo_apache_beam_spark.operators.privacy import dp_noisy

    def release(rows):
        df = spark.createDataFrame(rows, "cell string, user_id long")
        per_user = df.groupBy("cell", "user_id").agg(
            F.count(F.lit(1)).alias("n")
        )
        cells = per_user.groupBy("cell").agg(
            F.sum(F.least(F.col("n"), F.lit(5))).alias("capped")
        )
        out = cells.select(
            "cell",
            dp_noisy(F.col("capped"), F.col("cell"), 5, "t").alias("rel"),
        ).collect()
        return {r["cell"]: r["rel"] for r in out}

    base = [("c", u) for u in range(50)]
    with_hot = base + [("c", 999)] * 1000
    a, b = release(base), release(with_hot)
    # same cell key → identical noise; difference is exactly the capped
    # contribution of the extra user
    assert abs(b["c"] - a["c"]) == pytest.approx(5.0, abs=1e-6)


def test_streaming_dsir_scoring_equals_batch(spark, tmp_path):
    """Scores streamed epoch-by-epoch from the persisted model must equal
    the batch scoring of everything streamed, bit-for-bit (pure per-doc
    function of text and the pinned model)."""
    import os

    from demo_apache_beam_spark.operators.selection import (
        dsir_histograms,
        dsir_load_model,
        dsir_log_ratios,
        dsir_save_model,
        dsir_score,
    )
    from demo_apache_beam_spark.streaming.selection import start_dsir_scoring_stream

    model_path = str(tmp_path / "model")
    dsir_save_model(
        dsir_histograms(
            spark.createDataFrame(
                _DSIR_DOCS, "doc_id long, text string, is_target boolean"
            )
        ),
        model_path,
    )

    epochs = [
        [(100, "whale reef coral"), (101, "dune sand")],
        [(102, "kelp tide whale shark"), (103, "mirage cactus dune")],
    ]
    in_dir = str(tmp_path / "in")
    out_path = str(tmp_path / "scores")
    os.makedirs(in_dir)
    q = start_dsir_scoring_stream(
        spark, in_dir, model_path, out_path, str(tmp_path / "chk")
    )
    try:
        for b, rows in enumerate(epochs):
            spark.createDataFrame(rows, "doc_id long, text string").coalesce(
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

    got = {
        r["doc_id"]: (r["n_feats"], r["weight"])
        for r in spark.read.parquet(out_path).collect()
    }
    every = spark.createDataFrame(
        [r for rows in epochs for r in rows], "doc_id long, text string"
    )
    want = {
        r["doc_id"]: (r["n_feats"], r["weight"])
        for r in dsir_score(
            every, dsir_log_ratios(dsir_load_model(spark, model_path))
        ).collect()
    }
    assert got == want


def test_leakage_safe_split_never_splits_a_cluster(spark):
    """Every near-dup cluster must land whole in one fold, folds must be
    non-degenerate, and the assignment must be reproducible."""
    from demo_apache_beam_spark.queries import REGISTRY

    sf = "/root/testdata/sf0.01"
    df = REGISTRY["corpus_leakage_safe_split"].fn(spark, sf)
    rows = df.collect()
    assert len(rows) > 500  # the near-dup fixture corpus incl. planted dups
    by_cluster: dict = {}
    for r in rows:
        by_cluster.setdefault(r["cluster_id"], set()).add(r["split"])
    assert all(len(s) == 1 for s in by_cluster.values())
    # at least one real (multi-doc) cluster exercised the constraint
    from collections import Counter

    sizes = Counter(r["cluster_id"] for r in rows)
    assert max(sizes.values()) >= 2
    shares = Counter(r["split"] for r in rows)
    assert set(shares) == {"train", "val", "test"}
    assert shares["train"] > shares["val"] and shares["train"] > shares["test"]
    again = {
        (r["doc_id"], r["split"])
        for r in REGISTRY["corpus_leakage_safe_split"].fn(spark, sf).collect()
    }
    assert again == {(r["doc_id"], r["split"]) for r in rows}


def test_cluster_best_keeps_true_argmax(spark):
    """dedup_cluster_best must pick, per cluster, exactly the member with
    the maximal quality logit (doc_id tie-break) — checked against an
    independent recomputation over the same corpus and clustering."""
    from demo_apache_beam_spark.queries import (
        REGISTRY,
        _MH_PORT_BANDS,
        _MH_PORT_K,
        _neardup_corpus,
        _quality_logit,
    )
    from demo_apache_beam_spark.operators.dedup import minhash_dedup_pairs
    from demo_apache_beam_spark.operators.graph import duplicate_clusters

    sf = "/root/testdata/sf0.01"
    got = {
        r["cluster_id"]: (r["kept_doc"], r["n_members"])
        for r in REGISTRY["dedup_cluster_best"].fn(spark, sf).collect()
    }

    corpus = _neardup_corpus(spark, sf)
    pairs = minhash_dedup_pairs(
        corpus, num_hashes=_MH_PORT_K, bands=_MH_PORT_BANDS, portable=True
    )
    clusters = {
        r["doc_id"]: r["cluster_id"]
        for r in duplicate_clusters(
            pairs.select("id_a", "id_b"), corpus.select("doc_id")
        ).collect()
    }
    score, _ = _quality_logit()
    scores = {
        r["doc_id"]: r["s"]
        for r in corpus.select("doc_id", score.alias("s")).collect()
    }
    want: dict = {}
    for doc, cl in clusters.items():
        cand = (scores[doc], doc)
        best = want.get(cl)
        # max score, then MIN doc id: compare (-score, doc)
        if best is None or (-cand[0], cand[1]) < (-best[0], best[1]):
            want[cl] = cand
    sizes: dict = {}
    for cl in clusters.values():
        sizes[cl] = sizes.get(cl, 0) + 1
    assert got == {cl: (doc, sizes[cl]) for cl, (s, doc) in want.items()}
    # the policy must differ from min-id on merit somewhere: at least one
    # multi-member cluster keeps a non-minimal doc_id (the suffixed copy
    # scores higher via the 0.01·n_tokens term when it survives banding)
    members: dict = {}
    for doc, cl in clusters.items():
        members.setdefault(cl, []).append(doc)
    multi = [cl for cl, docs in members.items() if len(docs) >= 2]
    assert multi
    assert any(got[cl][0] != min(members[cl]) for cl in multi)


def _write_docs(spark, path, rows):
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/documents.parquet")


def test_drift_report_zero_on_identical_epochs_positive_on_shift(spark, tmp_path):
    """JSD must be exactly 0 when the even/odd epochs carry identical
    text multisets, and strictly positive once one epoch's vocabulary
    shifts — with the shifted bucket surfacing in the drill-down."""
    from demo_apache_beam_spark.queries import REGISTRY

    same = []
    for i, text in enumerate(["whale reef coral", "dune sand mirage", "kelp tide"]):
        same.append((2 * i, text, "en", "s0", len(text)))
        same.append((2 * i + 1, text, "en", "s0", len(text)))
    d1 = str(tmp_path / "same")
    _write_docs(spark, d1, same)
    rows = REGISTRY["corpus_drift_report"].fn(spark, d1).collect()
    assert rows
    assert all(r["jsd_e6"] == 0.0 for r in rows)
    assert all(r["contrib_e6"] == 0.0 for r in rows)

    shifted = list(same)
    shifted[1] = (1, "plasma reactor tokamak plasma plasma", "en", "s0", 30)
    d2 = str(tmp_path / "shift")
    _write_docs(spark, d2, shifted)
    rows2 = REGISTRY["corpus_drift_report"].fn(spark, d2).collect()
    assert rows2[0]["jsd_e6"] > 0
    assert rows2[0]["contrib_e6"] > 0
    # descending drill-down
    contribs = [r["contrib_e6"] for r in rows2]
    assert contribs == sorted(contribs, reverse=True)


def test_laplace_rejects_non_integer_scale(spark):
    """A float scale would silently truncate to int (0.5 → 0 disables the
    mechanism) — it must be rejected loudly."""
    with pytest.raises(ValueError, match="positive integer"):
        seeded_laplace_noise(F.lit("k"), 0.5, seed="t")
    with pytest.raises(ValueError, match="positive integer"):
        seeded_laplace_noise(F.lit("k"), 0, seed="t")


def test_kmv_rollup_tracks_exact_distinct(spark):
    """The merged-daily-sketch estimate must sit within the KMV error
    band of the exact per-team distinct count (k=32 ⇒ σ ≈ 18%; allow
    3σ), and the exact small-set branch must be exact."""
    from demo_apache_beam_spark.queries import REGISTRY
    from demo_apache_beam_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.01"
    est = {
        r["team"]: r["approx_users"]
        for r in REGISTRY["user_kmv_rollup"].fn(spark, sf).collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in load_table(spark, sf, "events")
        .groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    assert set(est) == set(exact)
    for team, n in exact.items():
        if n < 32:
            assert est[team] == float(n), team
        else:
            assert est[team] == pytest.approx(n, rel=0.55), (team, est[team], n)


# ---------------------------------------------------------------------------
# Corpus drift: JSD operator + streaming monitor
# ---------------------------------------------------------------------------

def _py_hist(texts):
    """Pure-python hashed uni+bigram histogram (md5 2-hex buckets)."""
    hist: dict = {}
    for t in texts:
        toks = t.split(" ")
        feats = list(toks) + [f"{a}_{b}" for a, b in zip(toks, toks[1:])]
        for f_ in feats:
            b = int(hashlib.md5(f_.encode()).hexdigest()[:2], 16)
            hist[b] = hist.get(b, 0) + 1
    return hist


def _py_jsd(ha, hb, n_buckets=256):
    ta, tb = sum(ha.values()), sum(hb.values())
    out = 0.0
    for b in set(ha) | set(hb):
        ca1, cb1 = ha.get(b, 0) + 1, hb.get(b, 0) + 1
        ta_b, tb_b = ta + n_buckets, tb + n_buckets
        denom = ca1 * tb_b + cb1 * ta_b
        out += (ca1 / ta_b) * math.log(2.0 * ca1 * tb_b / denom)
        out += (cb1 / tb_b) * math.log(2.0 * cb1 * ta_b / denom)
    return out


def test_jsd_operator_matches_python_reference(spark):
    from demo_apache_beam_spark.operators.selection import (
        corpus_histogram,
        jsd_of_histograms,
    )

    texts_a = ["whale reef coral", "kelp tide whale", "reef shark coral kelp"]
    texts_b = ["dune sand mirage", "cactus dune sand", "mirage cactus heat dune"]
    df_a = spark.createDataFrame(list(enumerate(texts_a)), "doc_id long, text string")
    df_b = spark.createDataFrame(list(enumerate(texts_b)), "doc_id long, text string")
    row = jsd_of_histograms(
        corpus_histogram(df_a), corpus_histogram(df_b)
    ).collect()[0]
    ha, hb = _py_hist(texts_a), _py_hist(texts_b)
    assert row["n_a"] == sum(ha.values()) and row["n_b"] == sum(hb.values())
    assert abs(row["jsd"] - _py_jsd(ha, hb)) < 1e-9
    # JSD bounds: 0 <= jsd <= ln(2); disjoint corpora => clearly positive
    assert 0 < row["jsd"] < math.log(2) + 1e-12


def test_jsd_operator_consistent_with_drift_report_query(spark):
    """The factored operator must reproduce the registry query's total on
    the same doc-parity split of the fixture corpus."""
    from demo_apache_beam_spark.operators.selection import (
        corpus_histogram,
        jsd_of_histograms,
    )
    from demo_apache_beam_spark.queries import REGISTRY
    from demo_apache_beam_spark.sources.tables import load_table

    docs = load_table(spark, SF_SMALL, "documents")
    ha = corpus_histogram(docs.filter(F.col("doc_id") % 2 == 0))
    hb = corpus_histogram(docs.filter(F.col("doc_id") % 2 != 0))
    jsd = jsd_of_histograms(ha, hb).collect()[0]["jsd"]
    q = REGISTRY["corpus_drift_report"].fn(spark, SF_SMALL).collect()[0]
    assert abs(jsd * 1e6 - q["jsd_e6"]) < 1e-6


def test_streaming_drift_equals_batch_and_replays_idempotently(spark, tmp_path):
    import os

    from demo_apache_beam_spark.operators.selection import (
        corpus_histogram,
        jsd_of_histograms,
        load_histogram,
        save_histogram,
    )
    from demo_apache_beam_spark.streaming.drift import (
        make_drift_ingest,
        start_drift_stream,
    )

    ref_docs = spark.createDataFrame(
        [(0, "whale reef coral kelp"), (1, "tide whale shark reef")],
        "doc_id long, text string",
    )
    ref_path = str(tmp_path / "ref")
    save_histogram(corpus_histogram(ref_docs), ref_path)

    epochs = [
        [(100, "whale reef coral"), (101, "kelp tide whale")],     # in-dist
        [(102, "dune sand mirage"), (103, "cactus dune heat")],    # drifted
    ]
    in_dir = str(tmp_path / "in")
    out_path = str(tmp_path / "jsd")
    os.makedirs(in_dir)
    q = start_drift_stream(
        spark, in_dir, ref_path, out_path, str(tmp_path / "chk")
    )
    try:
        for b, rows in enumerate(epochs):
            spark.createDataFrame(rows, "doc_id long, text string").coalesce(
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

    got = {
        r["_batch_id"]: (r["n_a"], r["n_b"], r["jsd"])
        for r in spark.read.parquet(out_path).collect()
    }
    assert len(got) == 2
    ref = load_histogram(spark, ref_path)
    for b, rows in enumerate(epochs):
        epoch_df = spark.createDataFrame(rows, "doc_id long, text string")
        want = jsd_of_histograms(ref, corpus_histogram(epoch_df)).collect()[0]
        assert got[b] == (want["n_a"], want["n_b"], want["jsd"])
    # the drifted epoch must score strictly higher than the in-dist one
    assert got[1][2] > got[0][2]

    # replay: re-running an epoch's ingest rewrites identical rows
    ingest = make_drift_ingest(spark, ref_path, out_path)
    epoch0 = spark.createDataFrame(epochs[0], "doc_id long, text string")
    ingest(epoch0, 0)
    again = {
        r["_batch_id"]: (r["n_a"], r["n_b"], r["jsd"])
        for r in spark.read.parquet(out_path).collect()
    }
    assert again == got
