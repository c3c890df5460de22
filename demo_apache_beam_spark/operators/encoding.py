"""Categorical feature encoding — leakage-safe out-of-fold target encoding.

Target encoding replaces a categorical value with the mean of a target
variable over rows sharing it — the standard high-cardinality-categorical
move in tabular ML prep. Done naively it leaks: a row's own target
contributes to its own feature. The out-of-fold (OOF) form assigns each
row a deterministic fold and encodes it with the mean computed over
every OTHER fold — the complement mean — so no row sees itself
(Micci-Barreca 2001, "A preprocessing scheme for high-cardinality
categorical attributes", SIGKDD Explorations 3(1)).

The complement mean needs no per-fold re-scan: with per-(category, fold)
partial sums/counts ``(s, c)`` and per-category totals ``(st, ct)``,

    oof_mean(category, fold) = (st − s) / (ct − c)

— two aggregations (the second over the first's dim-sized output) and
one join back. Sums go through the exact-decimal ``stable_sum`` cast so
the encoding is bit-identical across partitionings and engines; the one
double division happens after the exact subtraction.

At 100 TB: one scan with partial aggregation into |categories|·folds
rows, a driver-free second agg over those, and a broadcast join back —
the encoding table is dimension-sized by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def target_encode_oof(
    df: DataFrame,
    cat_col: str,
    target_col: str,
    fold_col: str,
    out_col: str = "te_value",
) -> DataFrame:
    """Add ``out_col`` = out-of-fold target mean of ``target_col`` per
    ``cat_col``: the mean over every fold EXCEPT the row's own
    ``fold_col``. Rows whose category occurs only in their own fold get
    NULL (no out-of-fold evidence) rather than a leaked or fabricated
    value.

    ``fold_col`` must be a deterministic small-int fold assignment the
    caller derives (hash of a stable id — never random, or train/apply
    drift follows). Keeps all input columns.
    """
    agg = df.groupBy(cat_col, fold_col).agg(
        F.sum(F.col(target_col).cast("decimal(18,6)")).alias("__s"),
        F.count(F.lit(1)).alias("__c"),
    )
    tot = agg.groupBy(cat_col).agg(
        F.sum("__s").alias("__st"), F.sum("__c").alias("__ct")
    ).select(F.col(cat_col).alias("__tot_cat"), "__st", "__ct")
    # null-safe here too: a NULL category is a legitimate group and a
    # plain equality join would drop its totals row (review r10)
    enc = agg.join(tot, agg[cat_col].eqNullSafe(F.col("__tot_cat"))).select(
        F.col(cat_col).alias("__enc_cat"),
        F.col(fold_col).alias("__enc_fold"),
        F.when(
            F.col("__ct") > F.col("__c"),
            (F.col("__st") - F.col("__s")).cast("double")
            / (F.col("__ct") - F.col("__c")).cast("double"),
        ).alias(out_col),
    )
    # null-safe LEFT join: groupBy keeps NULL categories/folds as groups
    # (their complement mean is well-defined over the other NULL-key
    # rows), but a plain equality join would silently DROP those input
    # rows — the training set must never shrink here (review r10)
    cond = df[cat_col].eqNullSafe(F.col("__enc_cat")) & df[fold_col].eqNullSafe(
        F.col("__enc_fold")
    )
    return df.join(F.broadcast(enc), cond, "left").drop(
        "__enc_cat", "__enc_fold"
    )
