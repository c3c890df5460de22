"""Streaming geofencing — the streaming face of the spatial family.

A stream of located points (vehicles, requests, sensor pings) is
enriched with the geofences containing each point — the spatial
stream-static join. Fences are dimension-sized, so the plan is the
broadcast-enrichment shape (``streaming/joins.py:enrich_stream``) made
spatial:

1. each fence is EXPANDED driver-side to the grid cells its radius can
   touch (:func:`fence_cover_cells` — the same haversine-inversion
   bounds as ``operators/geo.py``, including ±180° wrap cells), giving
   a broadcastable (cell → fence) table;
2. each streamed point computes its single home cell — a map-only
   projection, no probe explosion on the unbounded side;
3. one broadcast equi-join on the cell plus the exact haversine ≤
   radius filter.

Per-event cost is one broadcast hash probe + a fixed trig expression;
no state, no shuffle, no watermark needed (enrichment is stateless), so
the operator composes freely with the windowed aggregations downstream.
The same callable serves batch DataFrames — stream==batch parity is
pinned in pytest.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators.geo import haversine_km, max_dlat_deg, max_dlon_deg


def fence_cover_cells(
    fences: list[tuple], cell_deg: float
) -> list[tuple[int, int, int]]:
    """Grid cells each fence can reach — pure function (driver-side;
    fences are dimension-sized by contract).

    ``fences``: (fence_id, lat, lon, radius_km) tuples, lon in
    [-180, 180). Returns (fence_id, cy, cx) rows covering every cell a
    point within radius can occupy, with ±180° wrap handled by emitting
    the shifted cells too. Raises on |lat| ≥ 90 − Δlat (a fence whose
    reach crosses a pole needs a polar cap join, not a lon/lat grid).
    """
    out: list[tuple[int, int, int]] = []
    for fence_id, lat, lon, radius_km in fences:
        if lon >= 180.0:  # +180 is the same meridian as -180 (review r10)
            lon -= 360.0
        dlat = max_dlat_deg(radius_km)
        if abs(lat) + dlat >= 90.0:
            raise ValueError(
                f"fence {fence_id}: reach crosses a pole — the lon/lat "
                "grid cover is not exact there"
            )
        dlon = max_dlon_deg(radius_km, abs(lat) + dlat)
        cy_lo = math.floor((lat - dlat) / cell_deg)
        cy_hi = math.floor((lat + dlat) / cell_deg)
        for cy in range(cy_lo, cy_hi + 1):
            for lon_shift in (0.0, -360.0, 360.0):
                lo = lon + lon_shift - dlon
                hi = lon + lon_shift + dlon
                # only cells that can hold a REAL point longitude
                lo = max(lo, -180.0)
                hi = min(hi, math.nextafter(180.0, -math.inf))
                if lo > hi:
                    continue
                for cx in range(
                    math.floor(lo / cell_deg), math.floor(hi / cell_deg) + 1
                ):
                    out.append((fence_id, cy, cx))
    return sorted(set(out))


def geofence_points(
    points: DataFrame,
    fences: list[tuple],
    cell_deg: float = 1.0,
    id_col: str = "point_id",
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """Enrich ``points`` (stream OR batch — same plan) with the fences
    containing each point: output = input columns + ``fence_id`` +
    ``dist_km`` (6 dp), one row per (point, containing fence); points
    in no fence are dropped (filter semantics — wrap with a left join
    upstream if pass-through is wanted). ``fences`` as in
    :func:`fence_cover_cells`."""
    spark = points.sparkSession
    cover = fence_cover_cells(fences, cell_deg)
    fdict = {f[0]: f for f in fences}
    rows = [
        (fid, cy, cx, fdict[fid][1], fdict[fid][2], fdict[fid][3])
        for fid, cy, cx in cover
    ]
    ftype = T.StructType(
        [
            T.StructField("fence_id", T.LongType()),
            T.StructField("_fcy", T.LongType()),
            T.StructField("_fcx", T.LongType()),
            T.StructField("_flat", T.DoubleType()),
            T.StructField("_flon", T.DoubleType()),
            T.StructField("_frad", T.DoubleType()),
        ]
    )
    fcells = spark.createDataFrame(rows, ftype)
    # +180 normalizes to -180 BEFORE the cell floor: fence covers stop
    # at nextafter(180, -inf), so a lon==180.0 point would otherwise
    # land in a cell no fence ever emits and silently miss containment
    # (review r10); haversine itself is 360-periodic, so only the CELL
    # uses the normalized value
    lon_n = F.when(
        F.col(lon_col) >= F.lit(180.0), F.col(lon_col) - F.lit(360.0)
    ).otherwise(F.col(lon_col))
    pts = points.withColumn(
        "_pcy", F.floor(F.col(lat_col) / F.lit(float(cell_deg))).cast("long")
    ).withColumn(
        "_pcx", F.floor(lon_n / F.lit(float(cell_deg))).cast("long")
    )
    joined = pts.join(
        F.broadcast(fcells),
        (F.col("_pcy") == F.col("_fcy")) & (F.col("_pcx") == F.col("_fcx")),
    )
    dist = haversine_km(
        F.col(lat_col), F.col(lon_col), F.col("_flat"), F.col("_flon")
    )
    return (
        joined.withColumn("_d", dist)
        .filter(F.col("_d") <= F.col("_frad"))
        .withColumn("dist_km", F.round("_d", 6))
        .drop("_pcy", "_pcx", "_fcy", "_fcx", "_flat", "_flon", "_frad", "_d")
    )
