"""Geospatial radius join — grid-cell blocking + haversine verify.

The spatial sibling of the LSH band joins and the linkage blocking join:
a radius self-join ("all pairs within r km") must never be the O(N²)
cross product, so points hash into lat/lon grid cells sized to the
radius, one side probes its 3×3 cell neighborhood (the standard grid
join), and the exact haversine distance filters candidates. Join volume
is Σ_cell 9·n_cell·m_cell — density-bounded, like every blocked join in
this engine.

Correctness bounds (why 3×3 is enough) — derived on the SAME sphere the
verify step uses (R = 6371.0088 km), not the WGS84 approximations a
first draft borrowed (111.320 km/° under-estimated the longitude bound
by ~0.1% at lat 60, enough to admit a cell size that drops a 49.997 km
pair — review r10):

- Δlat ≤ degrees(r / R);
- Δlon ≤ degrees(2·asin(sin(r / 2R) / cos(lat))) — the exact inversion
  of the haversine at fixed latitude (the asin curvature term is what
  the flat km/° constant missed).

:func:`required_cell_deg` returns the max of the two at the corpus's
maximum |lat|; the operator raises when the configured cell is smaller
— a silently lossy spatial join is the failure mode the guard exists
for — and also raises AT RUNTIME on any row whose |lat| exceeds the
declared ``max_abs_lat`` (data outside the declared envelope would
silently bypass the bound, review r10).

Antimeridian: candidate pairs straddling ±180° are found via GHOST
probe rows — points within the Δlon bound of either edge probe once
more with their longitude shifted ∓360° (cells only; distances always
use the raw coordinates — haversine is 360°-periodic in Δlon, so the
shifted pair verifies exactly). Real and ghost probe cells are ~360/cell
apart, so no pair can be emitted twice.

Haversine is evaluated in the same operation order on both engines
(sin/cos/asin over doubles — libm-identical), so the r-threshold filter
and the emitted distances hash-match a SQL oracle.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EARTH_RADIUS_KM = 6371.0088


def max_dlat_deg(radius_km: float) -> float:
    """Largest latitude separation (degrees) of two points within
    ``radius_km`` on the verification sphere."""
    return math.degrees(radius_km / EARTH_RADIUS_KM)


def max_dlon_deg(radius_km: float, max_abs_lat: float) -> float:
    """Largest longitude separation (degrees) of two points within
    ``radius_km`` at |lat| ≤ ``max_abs_lat`` — exact haversine inversion
    at fixed latitude."""
    if not (0.0 <= max_abs_lat < 90.0):
        raise ValueError("max_abs_lat must be in [0, 90)")
    s = math.sin(radius_km / (2.0 * EARTH_RADIUS_KM)) / math.cos(
        math.radians(max_abs_lat)
    )
    return math.degrees(2.0 * math.asin(min(1.0, s)))


def required_cell_deg(radius_km: float, max_abs_lat: float) -> float:
    """Smallest grid cell (degrees) for which the 3×3 neighborhood probe
    is EXACT at ``radius_km`` up to latitude ``max_abs_lat``."""
    return max(max_dlat_deg(radius_km), max_dlon_deg(radius_km, max_abs_lat))


def haversine_km(lat_a, lon_a, lat_b, lon_b):
    """Great-circle distance in km — fixed evaluation order (see module
    docstring); takes Columns, returns a Column. 360°-periodic in the
    longitude difference (sin²(Δλ/2 ± 180°) = sin²(Δλ/2)), so shifted
    ghost coordinates need never reach this function."""
    dlat = F.radians(lat_b - lat_a) / 2.0
    dlon = F.radians(lon_b - lon_a) / 2.0
    h = (
        F.sin(dlat) * F.sin(dlat)
        + F.cos(F.radians(lat_a)) * F.cos(F.radians(lat_b))
        * F.sin(dlon) * F.sin(dlon)
    )
    return F.lit(2.0 * EARTH_RADIUS_KM) * F.asin(F.sqrt(h))


def geo_radius_join(
    pts: DataFrame,
    radius_km: float,
    id_col: str = "cid",
    lat_col: str = "lat",
    lon_col: str = "lon",
    cell_deg: float = 1.0,
    max_abs_lat: float = 60.0,
) -> DataFrame:
    """All point pairs within ``radius_km`` — exact, via grid blocking.

    ``pts``: one row per point with ``id_col`` (unique), ``lat_col``,
    ``lon_col`` in degrees; longitudes in [-180, 180). Output
    ``(id_a, id_b, dist_km)`` with id_a < id_b and dist_km rounded to
    6 dp (engine-stable emission; the ≤ filter runs on the raw double,
    identical on both engines). Raises when ``cell_deg`` <
    :func:`required_cell_deg` (the 3×3 probe would silently miss
    pairs), and at runtime on any row with |lat| > ``max_abs_lat``
    (data outside the declared envelope would silently bypass the
    bound). Antimeridian pairs are found via ghost probes (module
    docstring).
    """
    need = required_cell_deg(radius_km, max_abs_lat)
    if cell_deg < need:
        raise ValueError(
            f"geo_radius_join: cell_deg {cell_deg} < {need:.6f} required "
            f"for radius {radius_km} km at |lat| ≤ {max_abs_lat}° — the "
            "3x3 neighborhood probe would miss pairs; enlarge cell_deg"
        )
    if cell_deg > 90.0:
        # with fewer than 4 lon cells around the globe the ±360° ghost
        # shift lands within the REAL 3×3 neighborhood, so an
        # antimeridian pair is emitted twice — keep ghost and real
        # neighborhoods provably disjoint (ADVICE r10)
        raise ValueError(
            f"geo_radius_join: cell_deg {cell_deg} > 90 — ghost-probe "
            "cells would overlap the real neighborhood and antimeridian "
            "pairs would duplicate; use a smaller cell_deg"
        )
    lat_guarded = F.when(
        F.abs(F.col(lat_col)) > F.lit(float(max_abs_lat)),
        F.raise_error(
            F.lit(
                f"geo_radius_join: |{lat_col}| exceeds declared "
                f"max_abs_lat {max_abs_lat} — the exactness bound does "
                "not hold; raise max_abs_lat (and cell_deg) to cover "
                "the data"
            )
        ).cast("double"),
    ).otherwise(F.col(lat_col))
    cells = pts.select(
        F.col(id_col),
        lat_guarded.alias("_lat"),
        F.col(lon_col).alias("_lon"),
        F.floor(F.col(lat_col) / F.lit(float(cell_deg))).cast("long").alias("_cy"),
        F.floor(F.col(lon_col) / F.lit(float(cell_deg))).cast("long").alias("_cx"),
    )
    # ghost probe rows for antimeridian wrap: shift the CELL coordinate
    # by ∓360°, keep raw coords for the distance
    edge = max_dlon_deg(radius_km, max_abs_lat)
    ghost_hi = cells.filter(F.col("_lon") >= F.lit(180.0 - edge)).withColumn(
        "_cx",
        F.floor((F.col("_lon") - 360.0) / F.lit(float(cell_deg))).cast("long"),
    )
    ghost_lo = cells.filter(F.col("_lon") < F.lit(-180.0 + edge)).withColumn(
        "_cx",
        F.floor((F.col("_lon") + 360.0) / F.lit(float(cell_deg))).cast("long"),
    )
    probe_base = cells.unionAll(ghost_hi).unionAll(ghost_lo)
    offs = F.array(F.lit(-1), F.lit(0), F.lit(1))
    probes = (
        probe_base.withColumn("_dy", F.explode(offs))
        .withColumn("_dx", F.explode(offs))
        .select(
            F.col(id_col),
            "_lat",
            "_lon",
            (F.col("_cy") + F.col("_dy")).alias("_py"),
            (F.col("_cx") + F.col("_dx")).alias("_px"),
        )
    )
    a, b = probes.alias("a"), cells.alias("b")
    cand = a.join(
        b,
        (F.col("a._py") == F.col("b._cy"))
        & (F.col("a._px") == F.col("b._cx"))
        & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
    )
    dist = haversine_km(
        F.col("a._lat"), F.col("a._lon"), F.col("b._lat"), F.col("b._lon")
    )
    return (
        cand.select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            dist.alias("_d"),
        )
        .filter(F.col("_d") <= F.lit(float(radius_km)))
        .select("id_a", "id_b", F.round("_d", 6).alias("dist_km"))
    )
