"""Similarity search over embedding columns (``array<float>``).

Two tiers, per the standard ANN playbook:

- **Brute-force cosine top-k** — the exact baseline: broadcast the query
  set, one pass over the corpus, per-query top-k via window rank. Cost
  O(N·Q·d) FLOPs but a *single scan, zero shuffles of the corpus* (the
  only shuffle is the rank's partition-by-query over N·Q score rows —
  keep Q modest or pre-aggregate with a partial top-k).
- **LSH-bucketed cosine** — the scale path: random-hyperplane signatures
  (Charikar SimHash for angles) bucket the corpus; each query probes its
  own bucket (+ optional multi-probe flips) and scores only that bucket.
  Signature build is one broadcast-join pass; search cost drops by ~2^bits.

Scoring is pure array expressions (``zip_with`` + ``aggregate``) over
double-cast arrays — JVM-side, no Python. An IVF variant would swap the
hyperplane bucketing for nearest-centroid assignment; the plan shape
(bucket equi-join then exact re-rank) is identical.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _as_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def dot_col(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def norm_col(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v))


def cosine_col(a: Column, b: Column) -> Column:
    """Sequential-order dot & norms in double — deterministic for a fixed
    array order, and reproducible by any engine that folds left-to-right."""
    return dot_col(a, b) / (norm_col(a) * norm_col(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact cosine top-k: broadcast-cross-join queries × corpus, rank.

    Output: (query_id, neighbor_id, cosine, rank), self-matches excluded,
    ties broken by neighbor id for full determinism.
    """
    q = queries.select(
        F.col(query_id_col), _as_double(F.col(vec_col)).alias("_qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("_cv")
    )
    scored = c.join(F.broadcast(q), F.col(query_id_col) != F.col("neighbor_id")).select(
        query_id_col,
        "neighbor_id",
        cosine_col(F.col("_qv"), F.col("_cv")).alias("cosine"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


# ---------------------------------------------------------------------------
# Random-hyperplane LSH
# ---------------------------------------------------------------------------

def hyperplanes(dim: int, num_planes: int = 12, seed: int = 42):
    """Deterministic pseudo-random unit-free hyperplanes (xorshift-style
    LCG on (seed, plane, coord) — no RNG state, reproducible anywhere)."""
    planes = []
    for p in range(num_planes):
        row = []
        for d in range(dim):
            # splitmix64-ish scramble of the (seed, p, d) triple
            x = (seed * 0x9E3779B97F4A7C15 + p * 0xBF58476D1CE4E5B9 + d * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
            x ^= x >> 30
            x = (x * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
            x ^= x >> 27
            row.append((x / 2**64) * 2.0 - 1.0)  # uniform [-1, 1)
        planes.append(row)
    return planes


def signature_col(vec: Column, planes: list[list[float]]) -> Column:
    """Bit b of the signature = sign(plane_b · vec)."""
    sig = F.lit(0).cast("long")
    for b, plane in enumerate(planes):
        plane_arr = F.array(*[F.lit(v) for v in plane])
        bit = F.when(dot_col(plane_arr, vec) >= 0, F.expr(f"CAST(1 AS BIGINT) << {b}")).otherwise(
            F.lit(0).cast("long")
        )
        sig = sig + bit
    return sig


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    num_planes: int = 12,
    dim: int | None = None,
    multiprobe_bits: int = 1,
) -> DataFrame:
    """Approximate top-k: bucket equi-join on the hyperplane signature,
    exact cosine re-rank inside the probed buckets.

    ``multiprobe_bits`` ≥ 1 also probes buckets at Hamming distance 1
    (flip each of the first ``multiprobe_bits`` bits) — the standard
    recall knob without re-hashing. At 100 TB the corpus side is written
    bucketed-by-signature once and every query stream joins against it
    shuffle-free.
    """
    if dim is None:
        dim = len(corpus.select(vec_col).first()[0])
    planes = hyperplanes(dim, num_planes)

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("_cv")
    ).withColumn("_sig", signature_col(F.col("_cv"), planes))

    q = queries.select(
        F.col(query_id_col), _as_double(F.col(vec_col)).alias("_qv")
    ).withColumn("_sig0", signature_col(F.col("_qv"), planes))
    probe_sigs = F.array(
        F.col("_sig0"),
        *[
            F.col("_sig0").bitwiseXOR(F.lit(1 << b).cast("long"))
            for b in range(max(0, multiprobe_bits))
        ],
    )
    q = q.withColumn("_sig", F.explode(F.array_distinct(probe_sigs)))

    scored = c.join(F.broadcast(q), "_sig").filter(
        F.col(query_id_col) != F.col("neighbor_id")
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.select(
            query_id_col,
            "neighbor_id",
            cosine_col(F.col("_qv"), F.col("_cv")).alias("cosine"),
        )
        .dropDuplicates([query_id_col, "neighbor_id"])
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
