"""Record linkage / entity resolution — blocked Fellegi–Sunter scoring.

A corpus at ingest time is full of near-duplicate ENTITIES, not just
near-duplicate texts: the same customer/author/site arriving twice with
case drift, punctuation drift, and small numeric drift. Classic record
linkage (Fellegi & Sunter 1969, "A theory for record linkage", JASA 64)
resolves them in two moves this module keeps separate:

- **Blocking**: only records sharing a cheap deterministic key (here any
  tuple of columns) are ever compared — the equi-join that replaces the
  O(N²) all-pairs sweep. Missed blocks are missed matches by design;
  that trade (recall vs candidate count) is the whole point of blocking.
- **Scoring**: each candidate pair gets per-field agreement bits and a
  log-odds-shaped score ``Σ (agree ? w_a : w_d)`` over the configured
  comparators; a threshold turns scores into match decisions. With
  per-field weights derived from m/u probabilities this IS Fellegi–
  Sunter; here the weights are caller-supplied constants, which is how
  production linkage usually starts before EM fitting.

Scale shape: the self-join is a plain equi-join on the block key (no
cartesian, plan-pinned in tests); candidate volume is Σ_b n_b², governed
by block-key cardinality exactly like the LSH band joins in
``operators/dedup.py``. Scores are fixed-order chains of double literal
additions — bit-identical across engines and partitionings.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class FieldComparator:
    """One field comparison: ``agree(a, b)`` must be a deterministic
    boolean expression over the two sides' column accessors (each maps a
    column name to that side's Column). ``w_agree``/``w_disagree`` are
    the score contributions (log-odds-shaped: positive for agreement on
    a discriminating field, negative for disagreement)."""

    name: str
    agree: Callable[
        [Callable[[str], Column], Callable[[str], Column]], Column
    ]
    w_agree: float
    w_disagree: float


def record_linkage_pairs(
    records: DataFrame,
    id_col: str,
    block_cols: list[str],
    comparators: list[FieldComparator],
    threshold: float,
) -> DataFrame:
    """All within-block candidate pairs with per-field agreement bits,
    the summed match score, and the thresholded decision.

    Output: ``(id_a, id_b, <name>_agree int per comparator,
    match_score double, is_match boolean)`` with ``id_a < id_b``. The
    score is a fixed-order left-associative chain of the comparator
    terms (listed order), so the double arithmetic is reproducible by
    any engine evaluating the same chain.

    ``records`` must already carry the normalized/blocking columns —
    normalization is corpus-specific and belongs to the caller; this
    operator owns only the join and the scoring algebra.
    """
    if not block_cols:
        raise ValueError("record_linkage_pairs: block_cols must be non-empty")
    if not comparators:
        raise ValueError("record_linkage_pairs: comparators must be non-empty")
    a = records.alias("a")
    b = records.alias("b")

    def ca(col: str) -> Column:
        return F.col(f"a.{col}")

    def cb(col: str) -> Column:
        return F.col(f"b.{col}")

    cond = ca(id_col) < cb(id_col)
    for c in block_cols:
        cond = cond & (ca(c) == cb(c))

    agree_cols = [
        F.when(comp.agree(ca, cb), 1).otherwise(0).alias(f"{comp.name}_agree")
        for comp in comparators
    ]
    pairs = a.join(b, cond).select(
        ca(id_col).alias("id_a"), cb(id_col).alias("id_b"), *agree_cols
    )
    score: Column | None = None
    for comp in comparators:
        term = (
            F.when(F.col(f"{comp.name}_agree") == 1, F.lit(float(comp.w_agree)))
            .otherwise(F.lit(float(comp.w_disagree)))
        )
        score = term if score is None else score + term
    return pairs.select(
        "*",
        score.alias("match_score"),
    ).withColumn("is_match", F.col("match_score") >= F.lit(float(threshold)))
