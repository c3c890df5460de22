"""Differentially-private aggregate release — seeded Laplace mechanism.

The release gate that sits after the k-anonymity audit
(``events_k_anonymity``): instead of suppressing small cells, perturb
every released statistic with Laplace noise calibrated to the query's
sensitivity (Dwork et al. 2006). A count has sensitivity 1; a sum of
values clipped to ``[0, C]`` has sensitivity ``C``; scale ``b =
sensitivity / ε`` gives ε-DP per released statistic.

Engine notes:

- The noise here is SEEDED: uniform draws come from an md5 hash of the
  release key (the portable hash family the near-dup oracles use), so
  a release is reproducible, testable, and replayable bit-for-bit by
  the DuckDB oracle. A production deployment swaps
  ``seeded_laplace_noise`` for a secure RNG — everything else (clip,
  sensitivity accounting, exact-decimal accumulation) is unchanged.
  Seeding noise per release ALSO matters for privacy at 100 TB: a
  re-run must not draw fresh noise for the same cell, or averaging
  repeated releases cancels the mechanism (the "memoized noise"
  practice).
- The inverse-CDF transform uses exact dyadic arithmetic until the one
  ``ln`` call, whose result is rounded once to 6 decimal places as a
  decimal — from there noise + aggregate stays exact-decimal, so both
  engines agree bit-for-bit (the ``stable_sum`` discipline).
- Everything is per-row column algebra over the aggregated cells (one
  md5 + one ln per cell, whole-stage codegen) — noise costs nothing
  at scale; the only shuffle is the aggregation's own.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .aggregate import STABLE_DECIMAL

#: Nibbles of md5 hex that become the uniform draw: 6 → u has 24 random
#: bits, exactly representable, and u ∈ (0, 1) strictly (offset 0.5).
_U_NIBBLES = 6
_U_DENOM = float(16 ** _U_NIBBLES)


def seeded_uniform(key: Column, seed: str) -> Column:
    """Deterministic uniform draw in (0, 1) from md5(seed ‖ key)."""
    hx = F.md5(F.concat(F.lit(seed + ":"), key))
    v = F.conv(F.substring(hx, 1, _U_NIBBLES), 16, 10).cast("long")
    return (v.cast("double") + F.lit(0.5)) / F.lit(_U_DENOM)


def seeded_laplace_noise(key: Column, scale: int, seed: str = "dp1") -> Column:
    """Laplace(b=scale) noise as an exact ``decimal(18,6)`` column.

    Inverse CDF: ``-b · sgn(u − ½) · ln(1 − 2|u − ½|)``. The ln result
    is rounded once to 6 dp; ``scale`` is an integer so the product
    stays exact decimal. |noise| ≤ b·ln(16^6) ≈ 16.6·b by construction
    (the uniform never reaches 0 or 1).
    """
    if int(scale) != scale or int(scale) < 1:
        # a float scale would silently truncate below (0.5 → 0 disables
        # the mechanism); express fractional b = Δ/ε by scaling Δ
        raise ValueError(f"scale must be a positive integer, got {scale!r}")
    u = seeded_uniform(key, seed)
    ln6 = F.log(F.lit(1.0) - F.lit(2.0) * F.abs(u - F.lit(0.5))).cast(
        STABLE_DECIMAL
    )
    mag = F.lit(-int(scale)).cast("decimal(9,0)") * ln6
    return F.when(u >= F.lit(0.5), mag).otherwise(-mag)


def dp_noisy(value: Column, key: Column, sensitivity: int, seed: str) -> Column:
    """``value`` + Laplace(sensitivity/ε) noise at ε=1, rounded to 6 dp.

    ``value`` must be exact (integer count or decimal-accumulated sum)
    so the release is bit-reproducible across engines and partitionings.
    """
    noisy = value.cast(STABLE_DECIMAL) + seeded_laplace_noise(key, sensitivity, seed)
    return F.round(noisy.cast("double"), 6) + F.lit(0.0)
