"""Retrieval operators: BM25, RRF fusion, Bloom pre-filter, BFS reach.

Each operator is checked against an INDEPENDENT reference computed here
(plain Python/numpy), not against its own algebra — the same discipline
as the graph and similarity suites. The registry-level DuckDB parity for
the four queries lives in test_oracle_parity.py's sweep.
"""

from __future__ import annotations

import math

import numpy as np
import pytest


# ---------------------------------------------------------------------------
# BM25
# ---------------------------------------------------------------------------

TOY_DOCS = [
    (0, "hash join hash join merge"),
    (1, "scan filter scan scan scan"),
    (2, "hash merge sort sort"),
    (3, "join join join join join join"),
    (4, "dup dup scan"),
]


def _bm25_reference(docs, queries, k1=1.2, b=0.75):
    """Plain-Python Lucene-variant BM25 — independent of the operator."""
    toks = {d: t.split(" ") for d, t in docs}
    n = len(toks)
    avgdl = sum(len(v) for v in toks.values()) / n
    df = {}
    for t in toks.values():
        for w in set(t):
            df[w] = df.get(w, 0) + 1
    out = {}
    for qid, terms in queries.items():
        scores = {}
        for d, t in toks.items():
            s = 0.0
            for term in terms:
                tf = t.count(term)
                if tf == 0:
                    continue
                idf = math.log(1.0 + (n - df[term] + 0.5) / (df[term] + 0.5))
                s += idf * (tf * (k1 + 1.0)) / (
                    tf + k1 * ((1.0 - b) + b * len(t) / avgdl)
                )
            if s != 0.0:
                scores[d] = round(s, 6)
        out[qid] = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
    return out


def test_bm25_matches_reference(spark):
    from demo_apache_beam_spark.operators.retrieval import bm25_rank

    docs = spark.createDataFrame(TOY_DOCS, "doc_id long, text string")
    qterms = spark.createDataFrame(
        [(1, "hash"), (1, "join"), (2, "dup"), (2, "scan")],
        "query_id long, term string",
    )
    got = bm25_rank(docs, qterms, topk=10).collect()
    want = _bm25_reference(
        TOY_DOCS, {1: ["hash", "join"], 2: ["dup", "scan"]}
    )
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(r)
    for qid, rows in by_q.items():
        rows.sort(key=lambda r: r["rank"])
        assert [(r["doc_id"], r["bm25"]) for r in rows] == want[qid]
        assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))


def test_rrf_fuse_matches_hand_computation(spark):
    from demo_apache_beam_spark.operators.retrieval import rrf_fuse

    leg_a = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (1, 12, 3)], "query_id long, doc_id long, rank int"
    )
    leg_b = spark.createDataFrame(
        [(1, 11, 1), (1, 13, 2)], "query_id long, doc_id long, rank int"
    )
    got = {
        r["doc_id"]: (r["rank"], r["rrf"])
        for r in rrf_fuse([leg_a, leg_b], k0=60, topk=10).collect()
    }
    # doc 11 appears in both legs: 1/62 + 1/61
    want = {
        11: round(1 / 62 + 1 / 61, 6),
        10: round(1 / 61, 6),
        13: round(1 / 62, 6),
        12: round(1 / 63, 6),
    }
    assert {d: s for d, (_, s) in got.items()} == want
    order = sorted(got.items(), key=lambda kv: kv[1][0])
    assert [d for d, _ in order] == [11, 10, 13, 12]


# ---------------------------------------------------------------------------
# Bloom pre-filter
# ---------------------------------------------------------------------------

def test_bloom_no_false_negatives_and_prunes(spark):
    """Every true member survives the pre-filter (structural property),
    non-members are mostly pruned, and the composed prefilter+exact-join
    equals the plain join."""
    from pyspark.sql import functions as F

    from demo_apache_beam_spark.operators.bloom import bloom_build, bloom_prefilter

    members = spark.range(0, 500).select(
        F.concat(F.lit("key_"), F.col("id")).alias("k")
    )
    # probe side: the 500 members plus 5000 strangers
    probe = spark.range(0, 5500).select(
        F.when(F.col("id") < 500, F.concat(F.lit("key_"), F.col("id")))
        .otherwise(F.concat(F.lit("other_"), F.col("id")))
        .alias("k")
    )
    bits = bloom_build(members, "k", m_bits=1 << 16, num_hashes=5)
    survivors = bloom_prefilter(probe, bits, "k", m_bits=1 << 16, num_hashes=5)
    n_surv = survivors.count()
    exact = survivors.join(members, "k").count()
    assert exact == 500  # no false negatives
    # fpr at 500 keys * 5 hashes in 65536 bits is well under 1% — allow 5%
    assert n_surv <= 500 + 0.05 * 5000
    # composed result == plain semi-join
    plain = probe.join(members, "k").count()
    assert exact == plain


def test_bloom_decontamination_equals_plain_antijoin(spark):
    """The registry query's Bloom path must be bit-identical to the
    plain broadcast anti-join on real data."""
    from conftest import SF_SMALL

    from pyspark.sql import functions as F

    from demo_apache_beam_spark.queries import REGISTRY
    from demo_apache_beam_spark.sources.tables import load_table

    got = sorted(
        r["doc_id"]
        for r in REGISTRY["decontaminated_corpus_bloom"].fn(spark, SF_SMALL).collect()
    )

    is_eval = (F.col("doc_id") * F.lit(2654435761)) % F.lit(1000) < 50
    docs = load_table(spark, SF_SMALL, "documents").select(
        "doc_id", F.split("text", " ").alias("toks")
    )
    sh = docs.filter(F.size("toks") >= 8).select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(toks) - 7),"
                "          p -> concat_ws(' ', slice(toks, p, 8)))"
            )
        ).alias("shingle"),
    )
    eval_sh = sh.filter(is_eval).select("shingle").distinct()
    contaminated = (
        sh.filter(~is_eval).join(eval_sh, "shingle").select("doc_id").distinct()
    )
    want = sorted(
        r["doc_id"]
        for r in load_table(spark, SF_SMALL, "documents")
        .filter(~is_eval)
        .select("doc_id")
        .join(contaminated, "doc_id", "left_anti")
        .collect()
    )
    assert got == want


# ---------------------------------------------------------------------------
# BFS distances
# ---------------------------------------------------------------------------

def test_bfs_distances_on_path_graph(spark):
    """Path 0-1-2-...-9 with seed {0}: dist(v) = v, capped at rounds."""
    from demo_apache_beam_spark.operators.graph import bfs_distances

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(9)], "src_id long, dst_id long"
    )
    seeds = spark.createDataFrame([(0,)], "id long")
    got = {
        r["id"]: r["dist"] for r in bfs_distances(edges, seeds, rounds=4).collect()
    }
    assert got == {0: 0, 1: 1, 2: 2, 3: 3, 4: 4}  # nodes beyond 4 hops absent


def test_bfs_distances_multi_seed_min(spark):
    """Two seeds on a path: every vertex takes the NEARER seed."""
    from demo_apache_beam_spark.operators.graph import bfs_distances

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(9)], "src_id long, dst_id long"
    )
    seeds = spark.createDataFrame([(0,), (9,)], "id long")
    got = {
        r["id"]: r["dist"] for r in bfs_distances(edges, seeds, rounds=4).collect()
    }
    want = {v: min(v, 9 - v) for v in range(10)}
    assert got == want


# ---------------------------------------------------------------------------
# Ranking-quality eval: recall@k / MRR@k / nDCG@k vs a hand-computed
# reference on a tiny fixture, plus the zero-hit row via the left join.
# ---------------------------------------------------------------------------


def test_ranking_eval_reference(spark):
    from demo_apache_beam_spark.operators.retrieval import ranking_eval

    k = 3
    # truth: per-query relevant sets
    truth_rows = [
        (1, 10), (1, 11), (1, 12),   # q1: three relevant
        (2, 20), (2, 21), (2, 22),   # q2: three relevant
        (3, 30), (3, 31), (3, 32),   # q3: three relevant (none retrieved)
    ]
    # cand: q1 perfect order; q2 one hit at rank 3; q3 zero hits
    cand_rows = [
        (1, 10, 1), (1, 11, 2), (1, 12, 3),
        (2, 99, 1), (2, 98, 2), (2, 20, 3),
        (3, 97, 1), (3, 96, 2), (3, 95, 3),
    ]
    truth = spark.createDataFrame(truth_rows, "query_id long, neighbor_id long")
    cand = spark.createDataFrame(
        cand_rows, "query_id long, neighbor_id long, rank_c int"
    )
    out = {
        r["query_id"]: r
        for r in ranking_eval(truth, cand, k=k).collect()
    }
    assert set(out) == {1, 2, 3}

    # the decimal(18,6) stable-sum cast rounds each DCG term to 6 dp
    def dterm(rank):
        return round(1.0 / math.log2(rank + 1.0), 6)

    idcg = sum(dterm(i) for i in range(1, k + 1))
    # q1: perfect
    assert out[1]["n_hits"] == 3
    assert out[1]["recall_at_3"] == 1.0
    assert out[1]["mrr_at_3"] == 1.0
    assert out[1]["ndcg_at_3"] == pytest.approx(1.0, abs=1e-9)
    # q2: single hit at rank 3
    assert out[2]["n_hits"] == 1
    assert out[2]["recall_at_3"] == pytest.approx(1 / 3)
    assert out[2]["mrr_at_3"] == pytest.approx(1 / 3)
    assert out[2]["ndcg_at_3"] == pytest.approx(dterm(3) / idcg, rel=1e-9)
    # q3: zero hits still emits a row, all-zero metrics
    assert out[3]["n_hits"] == 0
    assert out[3]["recall_at_3"] == 0.0
    assert out[3]["mrr_at_3"] == 0.0
    assert out[3]["ndcg_at_3"] == 0.0


def test_ranking_eval_undersized_truth_fails_loud(spark):
    """A query whose truth set has fewer than k rows (or none at all)
    must raise in-plan (ADVICE r10) — dividing by k would silently
    deflate recall/nDCG so they could never reach 1.0."""
    from demo_apache_beam_spark.operators.retrieval import ranking_eval

    cand = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (1, 12, 3), (2, 20, 1), (2, 21, 2), (2, 22, 3)],
        "query_id long, neighbor_id long, rank_c int",
    )
    # q2 has only 2 truth rows (< k=3)
    truth = spark.createDataFrame(
        [(1, 10), (1, 11), (1, 12), (2, 20), (2, 21)],
        "query_id long, neighbor_id long",
    )
    with pytest.raises(Exception, match="fewer than k"):
        ranking_eval(truth, cand, k=3).collect()
    # q2 missing from truth entirely: same failure
    truth_missing = spark.createDataFrame(
        [(1, 10), (1, 11), (1, 12)], "query_id long, neighbor_id long"
    )
    with pytest.raises(Exception, match="fewer than k"):
        ranking_eval(truth_missing, cand, k=3).collect()


def test_sq8_codes_reference(spark):
    """Codes match floor(127·x/‖x‖) computed by numpy, for every dim."""
    from demo_apache_beam_spark.operators.retrieval import sq8_codes

    rng = np.random.default_rng(7)
    vecs = [(i, [float(x) for x in rng.normal(size=5)]) for i in range(6)]
    emb = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    got = {
        (r["vec_id"], r["dim"]): r["code"] for r in sq8_codes(emb).collect()
    }
    for i, v in vecs:
        n = math.sqrt(sum(x * x for x in v))
        for d, x in enumerate(v, start=1):
            assert got[(i, d)] == math.floor(x / n * 127.0), (i, d)


def test_sq8_codes_zero_norm_raises(spark):
    from demo_apache_beam_spark.operators.retrieval import sq8_codes

    emb = spark.createDataFrame(
        [(1, [0.0, 0.0, 0.0])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(Exception, match="zero-norm"):
        sq8_codes(emb).collect()


def test_sq8_codes_null_and_inf_elements_raise(spark):
    from demo_apache_beam_spark.operators.retrieval import sq8_codes

    for vec in ([1.0, None, 2.0], [1.0, float("inf"), 2.0]):
        emb = spark.createDataFrame(
            [(1, vec)], "vec_id long, embedding array<double>"
        )
        with pytest.raises(Exception, match="sq8_codes"):
            sq8_codes(emb).collect()
