"""A1-A4 — per-key score aggregation, the core query of all three reference
pipelines (``ExtractAndSumScore``, UserScore.java:90-109).

Spark-first notes:

- ``groupBy(key).agg(sum)`` compiles to partial ``HashAggregate`` →
  ``Exchange(hashpartition(key))`` → final ``HashAggregate`` — Catalyst does
  the combiner lifting Beam delegates to its runner (SURVEY.md §4.1).
- Beam sums 32-bit Integer (wrapping overflow); the engine standardizes on
  LongType outputs (SURVEY.md §2.5 A1) — at 100 TB an int sum WILL overflow.
- Double sums are made order-independent via decimal accumulation
  (``stable_sum``): floating-point addition is non-associative, so a plain
  ``sum(double)`` differs bit-for-bit between partitionings and engines.
  Casting each addend to a fixed-scale decimal makes the sum exact and
  reproducible across Spark and the DuckDB oracle, at native columnar speed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Fixed-point scale for order-independent double aggregation. 18 digits /
#: 6 fractional keeps 12 integer digits per addend; Spark widens the sum
#: accumulator by 10 digits (decimal(28,6)) so ~1e12 rows cannot overflow.
STABLE_DECIMAL = "decimal(18,6)"


def stable_sum(col: Column | str, alias: str | None = None) -> Column:
    """Order-independent, engine-portable sum of a double column."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.sum(c.cast(STABLE_DECIMAL)).cast("double")
    return out.alias(alias) if alias else out


def stable_avg(col: Column | str, alias: str | None = None) -> Column:
    """Order-independent mean: exact decimal sum cast to double, divided by
    the count as one double division — the exact expression shape verified
    bit-identical against DuckDB (decimal/int division scale rules differ
    between engines; double division does not)."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.sum(c.cast(STABLE_DECIMAL)).cast("double") / F.count(c)
    return out.alias(alias) if alias else out


def sum_scores(events: DataFrame, key_col: str, score_col: str = "score") -> DataFrame:
    """A2 ``ExtractAndSumScore``: key by ``key_col`` (user or team —
    UserScore.java:56-62,103-106), sum scores (A1, UserScore.java:107).

    Output: ``(<key_col>, total_score: long)``. The projection before the
    groupBy keeps only two columns, so column pruning reaches the scan.
    """
    return (
        events.select(F.col(key_col), F.col(score_col))
        .groupBy(key_col)
        .agg(F.sum(score_col).cast("long").alias("total_score"))
    )


def windowed_sum_scores(
    events: DataFrame,
    key_col: str,
    window_minutes: int = 60,
    time_col: str = "event_time",
    score_col: str = "score",
) -> DataFrame:
    """W2+A2 (``HourlyTeamScore``): per-key sums within tumbling event-time
    windows (HourlyTeamScore.java:90-93). The window becomes an explicit
    grouping column; physical plan shape is identical to the global sum —
    one extra (derived, non-shuffled-before) group key.

    Output: ``(window_start: timestamp, <key_col>, total_score: long)``.
    """
    win = F.window(F.col(time_col), f"{int(window_minutes)} minutes")
    return (
        events.select(F.col(time_col), F.col(key_col), F.col(score_col))
        .groupBy(win.alias("w"), F.col(key_col))
        .agg(F.sum(score_col).cast("long").alias("total_score"))
        .select(F.col("w.start").alias("window_start"), key_col, "total_score")
    )
