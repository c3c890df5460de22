"""Importance-resampling data selection (DSIR) over hashed n-gram features.

The data-selection stage of a training pipeline: given a small TARGET
corpus that looks like what the model should train on (curated sources)
and a large RAW pool (the crawl), score every raw document by how much
more likely its hashed n-gram bag is under the target distribution than
under the raw distribution, and keep the top-weighted documents. This is
the estimator of Xie et al. 2023, "Data Selection for Language Models
via Importance Resampling" (DSIR): bag-of-hashed-n-grams multinomials
with add-one smoothing, importance weight

    log w(x) = Σ_buckets  tf_b(x) · ln( p_target(b) / p_raw(b) )

Spark-first shape (and why it holds at 100 TB):

- Features are built SCAN-SIDE (split → explode, plus an adjacent-pair
  slice transform for bigrams — no window shuffle) and immediately
  collapsed to per-document term frequencies by one partial-aggregating
  ``groupBy`` (map-side combine shrinks the shuffle by the within-doc
  repetition factor).
- Hash-bucketing caps the model size by construction: both class
  histograms are ≤ ``16^hex_chars`` rows however large the corpus, so
  the log-ratio table is always broadcastable — the scoring join never
  shuffles the corpus, only the per-doc feature rows on ``doc_id``
  (which the feature groupBy already partitioned).
- Per-bucket log ratios are rounded to 6 decimal places and accumulated
  as exact ``tf × decimal`` products, so the document weight is
  combine-order independent and engine-portable (the ``stable_sum``
  discipline).
- The hash is md5 (prefix → bucket id), the engine-portable family used
  by the near-dup oracles; a DuckDB oracle can replay the entire
  pipeline bit-for-bit, smoothing and all.

The deterministic top-k head (``orderBy … limit``) plans as
``TakeOrderedAndProject`` — per-partition heads then one k-row merge,
no global sort. DSIR's Gumbel-top-k sampling variant is the same plan
with seeded-hash Gumbel noise added to the weight before ranking.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .aggregate import STABLE_DECIMAL

#: Adjacent word pairs; guarded because Spark's sequence(1, 0) DESCENDS —
#: a 1-token doc must contribute no bigrams, not a wrapped pair.
_BIGRAMS_EXPR = (
    "CASE WHEN size(_toks) >= 2 THEN "
    "  transform(sequence(1, size(_toks) - 1),"
    "            i -> concat(_toks[i - 1], '_', _toks[i])) "
    "ELSE array() END"
)


def hashed_ngram_features(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    hex_chars: int = 2,
    bigrams: bool = True,
) -> DataFrame:
    """Per-document hashed n-gram term frequencies.

    Output: ``(<id_col>, bucket int, tf long)`` with
    ``bucket = int(md5(feature)[:hex_chars], 16)`` over word unigrams
    (whitespace split) and, when ``bigrams``, ``w1_w2`` adjacent pairs.
    """
    toks = df.select(id_col, F.split(text_col, " ").alias("_toks"))
    feats = toks.select(id_col, F.explode("_toks").alias("_feat"))
    if bigrams:
        feats = feats.unionAll(
            toks.select(id_col, F.explode(F.expr(_BIGRAMS_EXPR)).alias("_feat"))
        )
    bucket = F.conv(F.substring(F.md5("_feat"), 1, hex_chars), 16, 10).cast("int")
    return (
        feats.select(id_col, bucket.alias("bucket"))
        .groupBy(id_col, "bucket")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def dsir_importance_weights(
    docs: DataFrame,
    is_target: F.Column | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    hex_chars: int = 2,
    bigrams: bool = True,
) -> DataFrame:
    """DSIR importance weight for every RAW (non-target) document.

    ``is_target`` marks the reference-corpus rows (defaults to a column
    named ``is_target``). Output: ``(<id_col>, n_feats long, weight
    double)`` where weight = Σ tf_b · round6(ln(p_t(b)/p_r(b))) with
    add-one smoothing over the full ``16^hex_chars`` bucket space.
    """
    if is_target is None:
        is_target = F.col("is_target")
    n_buckets = 16 ** hex_chars

    tagged = docs.select(
        F.col(id_col), F.col(text_col), is_target.alias("_tgt")
    )
    feats = hashed_ngram_features(
        tagged, id_col=id_col, text_col=text_col,
        hex_chars=hex_chars, bigrams=bigrams,
    ).join(tagged.select(id_col, "_tgt"), id_col)

    # class histograms: ≤ n_buckets rows each, whatever the corpus size
    hist = feats.groupBy("bucket").agg(
        F.sum(F.when(F.col("_tgt"), F.col("tf")).otherwise(0)).alias("ct"),
        F.sum(F.when(~F.col("_tgt"), F.col("tf")).otherwise(0)).alias("cr"),
    )
    tot = hist.agg(
        F.sum("ct").alias("t_tot"), F.sum("cr").alias("r_tot")
    )
    # one ln of an exact-integer ratio, rounded once to 6 dp:
    # ln(p_t/p_r) = ln( (ct+1)(R+B) / ((cr+1)(T+B)) )
    lam = (
        hist.crossJoin(F.broadcast(tot))
        .select(
            "bucket",
            F.log(
                ((F.col("ct") + 1) * (F.col("r_tot") + F.lit(n_buckets)))
                .cast("double")
                / ((F.col("cr") + 1) * (F.col("t_tot") + F.lit(n_buckets)))
                .cast("double")
            )
            .cast(STABLE_DECIMAL)
            .alias("lam"),
        )
    )
    return (
        feats.filter(~F.col("_tgt"))
        .join(F.broadcast(lam), "bucket")
        .groupBy(id_col)
        .agg(
            F.sum("tf").alias("n_feats"),
            F.sum(F.col("tf") * F.col("lam")).cast("double").alias("weight"),
        )
    )
