"""Lexical retrieval operators — BM25 ranking and reciprocal-rank fusion.

A training-data pipeline is also a retrieval pipeline: benchmark-leak
hunting, "more like this" corpus exploration, and hybrid (lexical +
embedding) candidate generation for curation all start from a ranked
search over the document table. These operators are the two standard
building blocks:

- :func:`bm25_rank` — Okapi BM25 with the Lucene idf variant
  (``ln(1 + (N - df + 0.5)/(df + 0.5))``, k1=1.2, b=0.75), expressed
  entirely as DataFrame aggregates and one broadcast join of the (tiny)
  query-term table against the corpus-sized posting table. The 100 TB
  cost is the tokenize+count scan, same as TF-IDF.
- :func:`rrf_fuse` — Reciprocal Rank Fusion (Cormack et al. 2009):
  ``score(d) = Σ_legs 1/(k0 + rank_leg(d))``. Rank lists in, one
  union + groupBy out; deterministic because the inputs carry integer
  ranks and IEEE addition of two doubles is commutative.

Both emit ranks over ROUNDED scores (6 dp) with doc-id tie-breaks, so a
DuckDB oracle computing the identical expressions agrees hash-for-hash
(the same discipline as ``tfidf_top_terms``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def bm25_rank(
    docs: DataFrame,
    query_terms: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    topk: int = 10,
) -> DataFrame:
    """Top-``topk`` documents per query by BM25.

    ``query_terms`` is a (query_id, term) table — literal and tiny
    (queries come from users/benchmarks, not from the corpus), so it
    broadcast-joins into the posting table; the corpus side is one
    tokenize scan feeding three partial aggregates (tf, dl, df) that all
    reuse the token exchange. Returns (query_id, rank, doc_id, bm25).
    """
    tok = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(text_col, " ")).alias("token"),
    )
    tf = tok.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    dl = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    df_ = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )

    q = query_terms.select("query_id", F.col("term").alias("token"))
    scored = (
        tf.join(F.broadcast(q), "token")
        .join(df_, "token")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "idf",
            F.log(
                F.lit(1.0)
                + (F.col("n_docs") - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5))
            ),
        )
        .withColumn(
            "w",
            F.col("idf")
            * (F.col("tf") * F.lit(k1 + 1.0))
            / (
                F.col("tf")
                + F.lit(k1)
                * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
            ),
        )
    )
    per_doc = scored.groupBy("query_id", "doc_id").agg(
        F.round(F.sum("w"), 6).alias("bm25")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("bm25"), F.asc("doc_id"))
    return (
        per_doc.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= topk)
        .select("query_id", "rank", "doc_id", "bm25")
    )


def rrf_fuse(
    legs: list[DataFrame],
    k0: int = 60,
    topk: int = 10,
) -> DataFrame:
    """Fuse per-query rank lists — each leg is (query_id, doc_id, rank)
    with rank starting at 1 — into (query_id, rank, doc_id, rrf).

    Docs missing from a leg simply contribute nothing for that leg (the
    standard RRF convention). The fused score of ≤2 legs is an exact
    IEEE sum regardless of combine order (addition of two doubles is
    commutative), so the ranking is fully deterministic.
    """
    u = legs[0].select("query_id", "doc_id", "rank")
    for leg in legs[1:]:
        u = u.unionByName(leg.select("query_id", "doc_id", "rank"))
    fused = u.groupBy("query_id", "doc_id").agg(
        F.round(
            F.sum(F.lit(1.0) / (F.lit(float(k0)) + F.col("rank"))), 6
        ).alias("rrf")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("rrf"), F.asc("doc_id"))
    return (
        fused.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= topk)
        .select("query_id", "rank", "doc_id", "rrf")
    )
