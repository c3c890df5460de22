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

Polygon fences (:func:`geofence_points_polygon`) follow the identical
shape: the driver expands each polygon's bbox to cells (±360° shifted
copies for the seam), the point computes one home cell, and exact
containment is the even-odd ray-crossing rule evaluated as a single
``aggregate`` HOF over broadcast EDGE arrays (each ring closed
independently, so multi-ring fences express holes) — still no Python
and no state on the unbounded side.
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


def _polygon_rings(fence_id, verts) -> list[list[tuple]]:
    """Normalize a fence's vertex spec to a list of rings: a bare
    ``[(lat, lon), ...]`` ring, or ``[ring, ring, ...]`` for polygons
    WITH HOLES (even-odd over all rings' edges = inside the outer ring
    and outside the holes — the standard multi-ring semantics)."""
    if not verts:
        raise ValueError(f"polygon {fence_id}: empty vertex list")

    def _is_vertex(v) -> bool:
        # a (lat, lon) pair as tuple OR list — JSON-loaded fences
        # arrive as lists, and misreading one as a ring would reject
        # valid input with a wrong-problem error (review r11)
        return (
            isinstance(v, (tuple, list))
            and len(v) == 2
            and all(isinstance(x, (int, float)) for x in v)
        )

    rings = [verts] if _is_vertex(verts[0]) else [list(r) for r in verts]
    for ring in rings:
        if len(ring) < 3:
            raise ValueError(
                f"polygon {fence_id}: each ring needs >= 3 vertices"
            )
        lats = [v[0] for v in ring]
        lons = [v[1] for v in ring]
        if any(abs(la) >= 90.0 for la in lats):
            raise ValueError(
                f"polygon {fence_id}: vertex at |lat| >= 90 is not a "
                "valid latitude"
            )
        for i in range(len(ring)):
            if abs(lons[i] - lons[i - 1]) >= 180.0:
                raise ValueError(
                    f"polygon {fence_id}: consecutive vertex lon jump "
                    ">= 180° — unwrap the seam crossing (e.g. 179 → 181)"
                )
    return rings


def polygon_cover_cells(
    polygons: list[tuple], cell_deg: float
) -> list[tuple[int, int, int, float]]:
    """Grid cells each POLYGON fence's bounding box touches — pure
    driver-side function (fences are dimension-sized by contract),
    the polygon analogue of :func:`fence_cover_cells`.

    ``polygons``: (fence_id, ring) or (fence_id, [rings...]) with
    ≥ 3 vertices per ring — multiple rings express HOLES (even-odd
    containment over all rings' edges). Vertices must be CONTINUOUS in
    longitude (consecutive |Δlon| < 180°): a fence straddling ±180° is
    expressed unwrapped (e.g. 179 → 181), the standard representation —
    the ±360° shifted cell copies map seam points back into it. Edges
    are straight lines in lat/lon space (plate carrée, the usual
    geofence convention — for the few-km fences this serves, the
    geodesic deviation is negligible). Returns
    (fence_id, cy, cx, lon_shift) rows; the shift travels with the row
    so containment tests the point in the polygon's own longitude
    frame.

    Raises on: a ring with < 3 vertices, |lat| ≥ 90 (not a valid vertex
    latitude — note near-pole polygons are fine here, unlike circles:
    the polygon is DEFINED in lat/lon space, so bbox cover and ray
    crossing stay exact), a lon discontinuity, or a lon extent ≥
    360 − 2·cell_deg (a near-global fence could match one point through
    two shifted copies — duplicates)."""
    out: set[tuple[int, int, int, float]] = set()
    for fence_id, verts in polygons:
        rings = _polygon_rings(fence_id, verts)
        lats = [v[0] for ring in rings for v in ring]
        lons = [v[1] for ring in rings for v in ring]
        extent = max(lons) - min(lons)
        if extent >= 360.0 - 2.0 * cell_deg:
            raise ValueError(
                f"polygon {fence_id}: lon extent {extent:.1f}° too wide — "
                "a point could match through two ±360° copies"
            )
        cy_lo = math.floor(min(lats) / cell_deg)
        cy_hi = math.floor(max(lats) / cell_deg)
        for lon_shift in (0.0, -360.0, 360.0):
            lo = min(lons) + lon_shift
            hi = max(lons) + lon_shift
            # only cells that can hold a REAL point longitude
            lo = max(lo, -180.0)
            hi = min(hi, math.nextafter(180.0, -math.inf))
            if lo > hi:
                continue
            for cy in range(cy_lo, cy_hi + 1):
                for cx in range(
                    math.floor(lo / cell_deg), math.floor(hi / cell_deg) + 1
                ):
                    out.add((fence_id, cy, cx, lon_shift))
    return sorted(out)


def _polygon_edges(fence_id, verts) -> tuple[list, list, list, list]:
    """Edge arrays (elat1, elon1, elat0, elon0) over ALL rings — vertex
    i paired with its ring-local predecessor, each ring closed
    independently (the wraparound edge never spans two rings, which is
    what lets one flat edge list carry holes)."""
    elat1, elon1, elat0, elon0 = [], [], [], []
    for ring in _polygon_rings(fence_id, verts):
        for i in range(len(ring)):
            la1, lo1 = ring[i]
            la0, lo0 = ring[i - 1]
            elat1.append(float(la1))
            elon1.append(float(lo1))
            elat0.append(float(la0))
            elon0.append(float(lo0))
    return elat1, elon1, elat0, elon0


def geofence_points_polygon(
    points: DataFrame,
    polygons: list[tuple],
    cell_deg: float = 1.0,
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """Polygon-fence enrichment (stream OR batch — same plan): output =
    input columns + ``fence_id``, one row per (point, containing
    polygon); points in no polygon are dropped. Containment is the
    even-odd ray-crossing rule evaluated as ONE ``aggregate`` HOF over
    broadcast EDGE arrays — a pure JVM expression, no Python in the
    per-event path (boundary points are implementation-defined, as ray
    crossing always is). Fences may carry multiple rings (holes): the
    edge list concatenates every ring closed independently, and
    even-odd over all edges is exactly outer-minus-holes. Scale shape
    is identical to the circle variant: fences expand driver-side to
    (cell, fence, edges) rows, each streamed point computes one home
    cell, and the only join is a broadcast equi-join on the cell —
    map-only on the unbounded side."""
    spark = points.sparkSession
    cover = polygon_cover_cells(polygons, cell_deg)
    edges = {fid: _polygon_edges(fid, verts) for fid, verts in polygons}
    rows = [
        (fid, cy, cx, shift, *edges[fid])
        for fid, cy, cx, shift in cover
    ]
    arr = T.ArrayType(T.DoubleType())
    ftype = T.StructType(
        [
            T.StructField("fence_id", T.LongType()),
            T.StructField("_fcy", T.LongType()),
            T.StructField("_fcx", T.LongType()),
            T.StructField("_fshift", T.DoubleType()),
            T.StructField("_elat1", arr),
            T.StructField("_elon1", arr),
            T.StructField("_elat0", arr),
            T.StructField("_elon0", arr),
        ]
    )
    fcells = spark.createDataFrame(rows, ftype)
    # +180 → -180 normalization BEFORE the cell floor (same review-r10
    # fix as the circle path); the containment test then maps the point
    # into the polygon's own frame by undoing the copy's shift
    lon_n = F.when(
        F.col(lon_col) >= F.lit(180.0), F.col(lon_col) - F.lit(360.0)
    ).otherwise(F.col(lon_col))
    pts = points.withColumn("_lon_n", lon_n).withColumn(
        "_pcy", F.floor(F.col(lat_col) / F.lit(float(cell_deg))).cast("long")
    ).withColumn(
        "_pcx", F.floor(F.col("_lon_n") / F.lit(float(cell_deg))).cast("long")
    )
    joined = pts.join(
        F.broadcast(fcells),
        (F.col("_pcy") == F.col("_fcy")) & (F.col("_pcx") == F.col("_fcx")),
    )
    # even-odd ray crossing (+lon ray) over the flat edge list; edge i
    # is (vertex _e*1[i], ring-predecessor _e*0[i]) — 1-based element_at
    inside = F.expr(
        f"""
        aggregate(
          sequence(1, size(_elat1)),
          false,
          (acc, i) -> CASE WHEN
            (
              (element_at(_elat1, i) > {lat_col})
              != (element_at(_elat0, i) > {lat_col})
            )
            AND (
              (_lon_n - _fshift) <
                element_at(_elon1, i)
                + (element_at(_elon0, i) - element_at(_elon1, i))
                  * ({lat_col} - element_at(_elat1, i))
                  / (element_at(_elat0, i) - element_at(_elat1, i))
            )
          THEN NOT acc ELSE acc END,
          acc -> acc
        )
        """
    )
    return (
        joined.filter(inside)
        .drop(
            "_lon_n", "_pcy", "_pcx", "_fcy", "_fcx", "_fshift",
            "_elat1", "_elon1", "_elat0", "_elon0",
        )
    )
