"""Temporal join operators beyond Spark's built-in equi/range joins.

The reference engine has no join surface at all (SURVEY.md §2.9); these
are extension operators a time-series / training-data pipeline needs.

``asof_join`` uses the sort-merge formulation, not a range self-join:
both sides are tagged and unioned, shuffled ONCE on the key, sorted
within each partition by (time, side), and the right side's columns are
carried forward with ``last(..., ignorenulls=True)`` over a running
window. Cost is one shuffle + one in-partition sort — no candidate-pair
explosion, no broadcast requirement, and AQE's skew-split still applies
to the single exchange. A per-key range join (the naive formulation)
materializes |L_k|·|R_k| pairs per key before picking the max, which is
quadratic on hot keys — exactly what kills it at 100 TB.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    num_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Hot-key equi-join: spread each join key over ``num_salts`` reducers.

    For when the small side can't broadcast and AQE's skew split doesn't
    apply (streaming joins, aggregation-state joins, engines without
    AQE). Left rows get a deterministic salt (hash of the whole row);
    the right side is replicated ``num_salts``× so every (key, salt)
    bucket can match. A key holding 20% of the left table then occupies
    ``num_salts`` tasks instead of one straggler.

    Cost model: right side inflates ``num_salts``× through the shuffle —
    use when |right| ≪ |left| (the same regime where the skew actually
    hurts). Semantics preserved for inner/left joins: every left row
    carries exactly one salt, so multiplicities are unchanged.
    """
    allowed = {"inner", "left", "left_outer", "leftouter", "leftsemi", "left_semi",
               "leftanti", "left_anti", "semi", "anti"}
    if how.lower() not in allowed:
        # right/full joins would emit num_salts copies of every unmatched
        # right row (it exists once per salt) — refuse instead of corrupting
        raise ValueError(
            f"salted_join supports inner/left-side joins, not {how!r}: the "
            "replicated right side breaks right/full-outer semantics"
        )
    on = list(on)
    salt = F.pmod(
        F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(int(num_salts))
    )
    l_salted = left.withColumn("_salt", salt)
    r_salted = right.withColumn(
        "_salt",
        F.explode(F.array(*[F.lit(i) for i in range(int(num_salts))])),
    )
    return l_salted.join(r_salted, [*on, "_salt"], how).drop("_salt")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: Sequence[str] | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """Backward as-of join: for every left row, attach the columns of the
    latest right row with ``right_ts <= left_ts`` for the same key(s);
    left rows with no such right row keep NULLs (LEFT ASOF semantics).

    Equivalent SQL (DuckDB)::

        SELECT l.*, r.<right_cols>
        FROM left l ASOF LEFT JOIN right r
          ON l.key = r.key AND r.ts <= l.ts

    The right timestamp is exposed as ``<right_ts><suffix>``. Ties at
    identical (key, ts): the right row sorts before the left row, so an
    exactly-simultaneous right row IS matched (inclusive bound).
    """
    on = list(on)
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in on and c != right_ts]
    carried = [f"{right_ts}{suffix}", *[f"{c}{suffix}" for c in right_cols]]

    left_payload = [c for c in left.columns if c not in on and c != left_ts]
    # the right row travels as ONE nullable struct: last(ignorenulls) then
    # skips only missing rows, never a matched row's genuinely-NULL field
    # (per-column last would silently fall back to an older row's value)
    r_struct = F.struct(
        F.col(right_ts).alias("_rts"),
        *[F.col(c).alias(c) for c in right_cols],
    )
    struct_type = right.select(r_struct.alias("_r")).schema["_r"].dataType
    l_tag = left.select(
        *on,
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_side"),
        *[F.col(c) for c in left_payload],
        F.lit(None).cast(struct_type).alias("_r"),
    )
    r_tag = right.select(
        *on,
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_payload],
        r_struct.alias("_r"),
    )

    merged = l_tag.unionByName(r_tag)
    # _r as the last sort key makes right-right ties at identical (key, ts)
    # deterministic (max struct wins) — without it the carried row would be
    # partition-order dependent; left rows (_side=1) never tie with right
    # rows (_side=0), so the extra key only disambiguates the right side
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("_t").asc(), F.col("_side").asc(), F.col("_r").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = merged.select(
        *on,
        "_t",
        "_side",
        *left_payload,
        F.last("_r", ignorenulls=True).over(w).alias("_r"),
    )
    return filled.filter(F.col("_side") == 1).select(
        *on,
        F.col("_t").alias(left_ts),
        *left_payload,
        F.col("_r._rts").alias(carried[0]),
        *[F.col(f"_r.{c}").alias(f"{c}{suffix}") for c in right_cols],
    )
