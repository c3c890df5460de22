"""Geospatial radius join — grid-cell blocking + haversine verify.

The spatial sibling of the LSH band joins and the linkage blocking join:
a radius self-join ("all pairs within r km") must never be the O(N²)
cross product, so points hash into lat/lon grid cells sized to the
radius, one side probes its 3×3 cell neighborhood (the standard grid
join), and the exact haversine distance filters candidates. Join volume
is Σ_cell 9·n_cell·m_cell — density-bounded, like every blocked join in
this engine.

Correctness bound (why 3×3 is enough): two points within r km differ by
at most r/110.574 degrees latitude and r/(111.320·cos(lat)) degrees
longitude, so with ``cell_deg`` at least that worst-case Δ the floor
cells differ by at most 1 in each axis. :func:`required_cell_deg` gives
the minimum for a radius and the corpus's maximum |lat|; the operator
raises when the configured cell is too small to be exact — a silently
lossy spatial join is the failure mode this guard exists for.

Haversine is evaluated in the same operation order on both engines
(sin/cos/asin over doubles — libm-identical), so the r-threshold filter
and the emitted distances hash-match a SQL oracle.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EARTH_RADIUS_KM = 6371.0088
KM_PER_DEG_LAT = 110.574
KM_PER_DEG_LON_EQ = 111.320


def required_cell_deg(radius_km: float, max_abs_lat: float) -> float:
    """Smallest grid cell (degrees) for which the 3×3 neighborhood probe
    is EXACT at ``radius_km`` up to latitude ``max_abs_lat``."""
    if not (0.0 <= max_abs_lat < 90.0):
        raise ValueError("max_abs_lat must be in [0, 90)")
    d_lat = radius_km / KM_PER_DEG_LAT
    d_lon = radius_km / (
        KM_PER_DEG_LON_EQ * math.cos(math.radians(max_abs_lat))
    )
    return max(d_lat, d_lon)


def haversine_km(lat_a, lon_a, lat_b, lon_b):
    """Great-circle distance in km — fixed evaluation order (see module
    docstring); takes Columns, returns a Column."""
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
    ``lon_col`` in degrees, |lat| ≤ ``max_abs_lat``. Output
    ``(id_a, id_b, dist_km)`` with id_a < id_b and dist_km rounded to
    6 dp (engine-stable emission; the ≤ filter runs on the raw double,
    identical on both engines). Raises when ``cell_deg`` <
    :func:`required_cell_deg` — the 3×3 probe would silently miss
    pairs.
    """
    need = required_cell_deg(radius_km, max_abs_lat)
    if cell_deg < need:
        raise ValueError(
            f"geo_radius_join: cell_deg {cell_deg} < {need:.4f} required "
            f"for radius {radius_km} km at |lat| ≤ {max_abs_lat}° — the "
            "3x3 neighborhood probe would miss pairs; enlarge cell_deg"
        )
    cells = pts.select(
        F.col(id_col),
        F.col(lat_col).alias("_lat"),
        F.col(lon_col).alias("_lon"),
        F.floor(F.col(lat_col) / F.lit(float(cell_deg))).cast("long").alias("_cy"),
        F.floor(F.col(lon_col) / F.lit(float(cell_deg))).cast("long").alias("_cx"),
    )
    offs = F.array(F.lit(-1), F.lit(0), F.lit(1))
    probes = (
        cells.withColumn("_dy", F.explode(offs))
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
