"""Deduplication operators — exact, n-gram Jaccard, MinHash+LSH, SimHash.

The training-data-pipeline workhorses, designed Spark-first for ~100 TB
corpora:

- **exact**: hash-groupBy on a content key; one shuffle on the 16-byte
  digest (never on the raw text), min-id winner, semi-join back.
- **n-gram Jaccard**: blocked self-join — candidate pairs only within a
  blocking key, never the quadratic cross product.
- **MinHash+LSH**: shingle → k minhashes (one explode + k min-aggregates,
  all map-side combinable) → band → bucket equi-join. The classic
  near-dup pipeline (Broder '97; the MapReduce formulation is public
  knowledge), expressed as three DataFrame stages.
- **SimHash**: 64 sign-sums as aggregate expressions (no 64× row blowup),
  Hamming-distance candidates via 16-bit band bucketing + ``bit_count``.

Everything is built-in expressions (xxhash64, explode, groupBy) — no
Python UDFs — so the only costs are the shuffles the algorithms require.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import tokens_col

# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------

def content_key(cols: tuple[str, ...] | list[str]) -> Column:
    """16-byte digest of the concatenated key columns (separator-framed so
    ("ab","c") ≠ ("a","bc")). Shuffling the digest instead of document text
    cuts exact-dedup shuffle volume by ~1000× on prose."""
    return F.md5(F.concat_ws("\x1f", *[F.col(c) for c in cols]))


def dedup_exact(df: DataFrame, key_cols=("text",), id_col: str = "doc_id") -> DataFrame:
    """Keep the minimum-id row of every exact-duplicate group.

    Plan: project (digest, id) → partial min → shuffle on digest → final
    min → broadcast/shuffle semi-join back on the unique id. The wide
    document payload crosses the wire only for surviving rows.
    """
    keep = (
        df.select(content_key(key_cols).alias("_ck"), F.col(id_col))
        .groupBy("_ck")
        .agg(F.min(id_col).alias(id_col))
        .select(id_col)
    )
    return df.join(keep, id_col, "left_semi")


# ---------------------------------------------------------------------------
# n-gram Jaccard near-dup (blocked pairwise)
# ---------------------------------------------------------------------------

def token_set_col(text_col: str = "text") -> Column:
    return F.array_distinct(tokens_col(text_col))


def jaccard_pairs(
    df: DataFrame,
    block_cols: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.6,
) -> DataFrame:
    """Pairwise token-set Jaccard within blocking groups.

    Blocking bounds the join fan-out: pairs are generated per block key via
    an equi-join (shuffle on the block key), so cost is Σ|block|², not N².
    Block keys should cap group size at the data's skew profile (e.g.
    lang × length-bucket); AQE's skew-join split handles stragglers.
    Output: (id_a, id_b, jaccard) with id_a < id_b, jaccard ≥ threshold.
    """
    sets = df.select(
        F.col(id_col), *[F.col(c) for c in block_cols], token_set_col(text_col).alias("_ts")
    )
    a = sets.alias("a")
    b = sets.alias("b")
    cond = (F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
    for c in block_cols:
        cond = cond & (F.col(f"a.{c}") == F.col(f"b.{c}"))
    inter = F.size(F.array_intersect(F.col("a._ts"), F.col("b._ts")))
    union = F.size(F.array_union(F.col("a._ts"), F.col("b._ts")))
    return (
        a.join(b, cond)
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            (inter / union).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= F.lit(threshold))
    )


# ---------------------------------------------------------------------------
# MinHash + LSH near-dup
# ---------------------------------------------------------------------------

def _toks_sql(text_col: str) -> str:
    return f"regexp_extract_all(lower({text_col}), '[a-z0-9]+', 0)"


def shingles_col(text_col: str = "text", n: int = 3) -> Column:
    """Distinct token n-gram shingles (word shingling; Broder-style).
    Texts shorter than n tokens get an empty array (``sequence(1, 0)``
    would be a *descending* sequence in Spark, so guard explicitly)."""
    toks = _toks_sql(text_col)
    return F.array_distinct(
        F.expr(
            f"CASE WHEN size({toks}) >= {n} THEN "
            f"transform(sequence(1, size({toks}) - {n - 1}), "
            f"i -> concat_ws(' ', slice({toks}, i, {n}))) "
            f"ELSE CAST(array() AS ARRAY<STRING>) END"
        )
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 32,
    shingle_n: int = 3,
) -> DataFrame:
    """k seeded-xxhash64 minima per document = the MinHash signature.

    One explode of distinct shingles, then k ``min`` aggregates — Catalyst
    plans partial mins before the shuffle on the id, so network volume is
    k longs per document regardless of document size.
    """
    exploded = df.select(
        F.col(id_col), F.explode(shingles_col(text_col, shingle_n)).alias("_sh")
    )
    mins = [
        F.min(F.xxhash64(F.concat(F.lit(f"{i}|"), F.col("_sh")))).alias(f"mh{i}")
        for i in range(num_hashes)
    ]
    return exploded.groupBy(id_col).agg(*mins)


def lsh_candidate_pairs(
    signatures: DataFrame,
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
) -> DataFrame:
    """Band the signature (r = k/bands rows per band), bucket on the band
    hash, emit within-bucket pairs. The only join is an equi-join on
    (band_idx, band_hash) — LSH's point is exactly that this is
    shuffle-friendly at petabyte scale."""
    rows_per_band = num_hashes // bands
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_idx"),
                F.xxhash64(
                    *[F.col(f"mh{b * rows_per_band + r}") for r in range(rows_per_band)]
                ).alias("band_hash"),
            )
            for b in range(bands)
        ]
    )
    banded = signatures.select(
        F.col(id_col), F.explode(band_structs).alias("band")
    ).select(id_col, "band.band_idx", "band.band_hash")
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .distinct()
    )


def minhash_dedup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    verify_threshold: float = 0.5,
) -> DataFrame:
    """Full near-dup pipeline: signatures → LSH candidates → exact shingle
    Jaccard verification of candidates only. Output: (id_a, id_b, jaccard)."""
    sigs = minhash_signatures(df, id_col, text_col, num_hashes, shingle_n)
    cands = lsh_candidate_pairs(sigs, id_col, num_hashes, bands)
    sh = df.select(F.col(id_col), shingles_col(text_col, shingle_n).alias("_sh"))
    inter = F.size(F.array_intersect(F.col("a._sh"), F.col("b._sh")))
    union = F.size(F.array_union(F.col("a._sh"), F.col("b._sh")))
    return (
        cands.join(sh.alias("a"), cands.id_a == F.col(f"a.{id_col}"))
        .join(sh.alias("b"), cands.id_b == F.col(f"b.{id_col}"))
        .select("id_a", "id_b", (inter / union).alias("jaccard"))
        .filter(F.col("jaccard") >= F.lit(verify_threshold))
    )


# ---------------------------------------------------------------------------
# SimHash near-dup
# ---------------------------------------------------------------------------

def simhash_signatures(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """64-bit SimHash per document (Charikar '02): each token votes ±1 on
    every bit of its 64-bit hash; the fingerprint takes the sign.

    Shape: explode to (id, token) rows, then 64 conditional-sum aggregates
    — constant 64 longs of state per document, no row blowup, fully
    map-side combinable.
    """
    toks = df.select(F.col(id_col), F.explode(tokens_col(text_col)).alias("_t"))
    toks = toks.withColumn("_h", F.xxhash64("_t"))
    bit_sums = [
        F.sum(
            F.when(F.expr(f"(_h >> {i}) & 1 = 1"), F.lit(1)).otherwise(F.lit(-1))
        ).alias(f"b{i}")
        for i in range(64)
    ]
    agg = toks.groupBy(id_col).agg(*bit_sums)
    fingerprint = None
    for i in range(64):
        term = F.when(F.col(f"b{i}") > 0, F.expr(f"CAST(1 AS BIGINT) << {i}")).otherwise(
            F.lit(0).cast("long")
        )
        fingerprint = term if fingerprint is None else fingerprint + term
    return agg.select(F.col(id_col), fingerprint.alias("simhash"))


def simhash_near_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 8,
    num_bands: int = 4,
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance.

    Candidates come from equality on any of ``num_bands`` equal-width bands
    of the 64-bit fingerprint (pigeonhole: a pair within Hamming ≤
    num_bands-1 must agree on ≥1 band; beyond that, recall is
    probabilistic). Narrower bands (more of them) raise recall *and* raise
    candidate volume — at corpus scale pick num_bands ≈ max_hamming+1 and
    let the exact ``bit_count`` filter clean up. Output: (id_a, id_b,
    hamming).
    """
    band_bits = 64 // num_bands
    band_mask = (1 << band_bits) - 1
    sigs = simhash_signatures(df, id_col, text_col)
    bands = F.array(
        *[
            F.struct(
                F.lit(i).alias("band_idx"),
                F.expr(f"(simhash >> {band_bits * i}) & {band_mask}").alias("band_val"),
            )
            for i in range(num_bands)
        ]
    )
    banded = sigs.select(F.col(id_col), F.col("simhash"), F.explode(bands).alias("band")).select(
        id_col, "simhash", "band.band_idx", "band.band_val"
    )
    a, b = banded.alias("a"), banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))).alias("hamming"),
        )
        .distinct()
    )
    return pairs.filter(F.col("hamming") <= F.lit(max_hamming))
