"""spatial3d (geo3d) subset — geodesic shapes on the unit sphere.

Behavioral reference: spatial3d/src/java/org/apache/lucene/spatial3d/
geom/GeoPoint.java (a point is a 3D unit vector: x = cos(lat)·cos(lon),
y = cos(lat)·sin(lon), z = sin(lat)), GeoStandardCircle.java (membership
= angular distance to the center ≤ cutoff), GeoConvexPolygon.java:
isWithin (a convex geodesic polygon is the intersection of SIDED PLANES
through the origin — one per great-circle edge; the point is inside iff
it is on the interior side of every edge plane),
GeoPolygonFactory.java (concave polygons are built as composites of
convex pieces — makeGeoPolygon splits; a composite matches iff any
piece does), GeoStandardPath.java (a path is a polyline buffer: within
cutoff of any segment's great-circle arc — cross-track distance where
the point projects onto the arc, endpoint distance otherwise).

Scope (documented): PlanetModel.SPHERE (the reference's WGS84 planet
model scales the axes by xyScaling/zScaling — a per-axis constant
multiply this subset omits); membership tolerance is a fixed 1e-12
side-of-plane epsilon rather than the reference's per-plane
MINIMUM_RESOLUTION bookkeeping. Every predicate is built twice from the
SAME driver-side vertex math: once as a Catalyst Column (JVM-side,
codegen) and once as ANSI SQL for the DuckDB oracle — both evaluate the
identical double expression tree, so the gate hashes match bit-for-bit.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "unit_vector",
    "arc_distance_meters",
    "geo3d_circle_query",
    "geo3d_convex_polygon_query",
    "geo3d_composite_polygon_query",
    "geo3d_path_query",
    "circle_sql",
    "convex_polygon_sql",
    "path_sql",
    "convex_edge_normals",
    "path_segment_frames",
]

MEAN_EARTH_RADIUS_M = 6371008.7714  # same constant as search/geo.py
_EPS = 1e-12  # side-of-plane tolerance (MINIMUM_RESOLUTION analog)


def _py_unit(lat_deg: float, lon_deg: float) -> tuple[float, float, float]:
    la, lo = math.radians(lat_deg), math.radians(lon_deg)
    return (
        math.cos(la) * math.cos(lo),
        math.cos(la) * math.sin(lo),
        math.sin(la),
    )


def _cross(a, b):
    return (
        a[1] * b[2] - a[2] * b[1],
        a[2] * b[0] - a[0] * b[2],
        a[0] * b[1] - a[1] * b[0],
    )


def _norm(v):
    n = math.sqrt(v[0] * v[0] + v[1] * v[1] + v[2] * v[2])
    if n == 0.0:
        raise ValueError("degenerate edge (antipodal or equal vertices)")
    return (v[0] / n, v[1] / n, v[2] / n)


def unit_vector(lat_col, lon_col) -> tuple[Column, Column, Column]:
    """GeoPoint columns: the document's (x, y, z) on the unit sphere."""
    la = F.radians(F.col(lat_col) if isinstance(lat_col, str) else lat_col)
    lo = F.radians(F.col(lon_col) if isinstance(lon_col, str) else lon_col)
    return (
        F.cos(la) * F.cos(lo),
        F.cos(la) * F.sin(lo),
        F.sin(la),
    )


def _sql_unit(lat_expr: str, lon_expr: str) -> tuple[str, str, str]:
    la = f"radians({lat_expr})"
    lo = f"radians({lon_expr})"
    return (
        f"(cos({la}) * cos({lo}))",
        f"(cos({la}) * sin({lo}))",
        f"sin({la})",
    )


def _dot_col(xyz: tuple[Column, Column, Column], v) -> Column:
    # identical association order as the SQL twin: ((x·vx + y·vy) + z·vz)
    return xyz[0] * F.lit(v[0]) + xyz[1] * F.lit(v[1]) + xyz[2] * F.lit(v[2])


def _dot_sql(xyz: tuple[str, str, str], v) -> str:
    return (
        f"(({xyz[0]} * {v[0]!r} + {xyz[1]} * {v[1]!r})"
        f" + {xyz[2]} * {v[2]!r})"
    )


# --- arc distance ---------------------------------------------------------


def arc_distance_meters(lat_col, lon_col, qlat: float, qlon: float) -> Column:
    """Geodesic (great-circle) distance column: R · acos(clamp(p · q)).
    Mathematically the haversine of geo.py; the 3D form is the geo3d
    GeoPoint.arcDistance shape (acos of the dot product)."""
    q = _py_unit(qlat, qlon)
    d = _dot_col(unit_vector(lat_col, lon_col), q)
    clamped = F.greatest(F.lit(-1.0), F.least(F.lit(1.0), d))
    return F.acos(clamped) * F.lit(MEAN_EARTH_RADIUS_M)


# --- GeoStandardCircle ----------------------------------------------------


def geo3d_circle_query(
    df: DataFrame, qlat: float, qlon: float, radius_m: float,
    lat_col: str = "lat", lon_col: str = "lon",
) -> DataFrame:
    """Geodesic cap membership (GeoStandardCircle.isWithin): p · center ≥
    cos(radius/R). The dot-product form needs no acos in the hot path."""
    c = _py_unit(qlat, qlon)
    cutoff = math.cos(radius_m / MEAN_EARTH_RADIUS_M)
    d = _dot_col(unit_vector(lat_col, lon_col), c)
    return df.filter(d >= F.lit(cutoff))


def circle_sql(
    qlat: float, qlon: float, radius_m: float,
    lat_expr: str = "lat", lon_expr: str = "lon",
) -> str:
    c = _py_unit(qlat, qlon)
    cutoff = math.cos(radius_m / MEAN_EARTH_RADIUS_M)
    d = _dot_sql(_sql_unit(lat_expr, lon_expr), c)
    return f"{d} >= {cutoff!r}"


# --- GeoConvexPolygon -----------------------------------------------------


def convex_edge_normals(vertices: list[tuple[float, float]]):
    """Unit normals of the edge planes of a counter-clockwise geodesic
    convex polygon (GeoConvexPolygon edges: the plane through the origin
    containing v_i and v_{i+1}; interior = positive side). Raises if the
    winding is not consistently counter-clockwise convex (a vertex on
    the negative side of another edge's plane)."""
    if len(vertices) < 3:
        raise ValueError("polygon needs at least 3 vertices")
    pts = [_py_unit(la, lo) for (la, lo) in vertices]
    normals = []
    n = len(pts)
    for i in range(n):
        normals.append(_norm(_cross(pts[i], pts[(i + 1) % n])))
    for i, nm in enumerate(normals):
        for j, p in enumerate(pts):
            if j in (i, (i + 1) % n):
                continue
            if (p[0] * nm[0] + p[1] * nm[1] + p[2] * nm[2]) < -_EPS:
                raise ValueError(
                    "vertices are not a counter-clockwise convex geodesic "
                    f"polygon (vertex {j} outside edge {i})"
                )
    return normals


def geo3d_convex_polygon_query(
    df: DataFrame, vertices: list[tuple[float, float]],
    lat_col: str = "lat", lon_col: str = "lon",
) -> DataFrame:
    """Geodesic convex-polygon containment (GeoConvexPolygon.isWithin):
    inside iff on the interior side of EVERY edge plane."""
    normals = convex_edge_normals(vertices)
    xyz = unit_vector(lat_col, lon_col)
    cond = None
    for nm in normals:
        c = _dot_col(xyz, nm) >= F.lit(-_EPS)
        cond = c if cond is None else (cond & c)
    return df.filter(cond)


def convex_polygon_sql(
    vertices: list[tuple[float, float]],
    lat_expr: str = "lat", lon_expr: str = "lon",
) -> str:
    normals = convex_edge_normals(vertices)
    xyz = _sql_unit(lat_expr, lon_expr)
    return " AND ".join(
        f"({_dot_sql(xyz, nm)} >= {-_EPS!r})" for nm in normals
    )


def geo3d_composite_polygon_query(
    df: DataFrame, pieces: list[list[tuple[float, float]]],
    lat_col: str = "lat", lon_col: str = "lon",
) -> DataFrame:
    """GeoCompositePolygon (GeoPolygonFactory's concave decomposition):
    inside iff inside ANY convex piece."""
    xyz = unit_vector(lat_col, lon_col)
    disj = None
    for piece in pieces:
        cond = None
        for nm in convex_edge_normals(piece):
            c = _dot_col(xyz, nm) >= F.lit(-_EPS)
            cond = c if cond is None else (cond & c)
        disj = cond if disj is None else (disj | cond)
    if disj is None:
        raise ValueError("composite polygon needs at least one piece")
    return df.filter(disj)


# --- GeoStandardPath ------------------------------------------------------


def path_segment_frames(vertices: list[tuple[float, float]]):
    """Per path segment (a, b): (a, b, n, na, bn) with n = unit(a×b) (the
    segment's great-circle normal), na = n×a and bn = b×n — the two
    half-space normals bounding the along-arc projection window
    (GeoStandardPath.PathSegment: cross-track applies only between the
    perpendicular planes at the endpoints)."""
    if len(vertices) < 2:
        raise ValueError("path needs at least 2 vertices")
    pts = [_py_unit(la, lo) for (la, lo) in vertices]
    frames = []
    for a, b in zip(pts, pts[1:]):
        n = _norm(_cross(a, b))
        frames.append((a, b, n, _cross(n, a), _cross(b, n)))
    return frames


def geo3d_path_query(
    df: DataFrame, vertices: list[tuple[float, float]], width_m: float,
    lat_col: str = "lat", lon_col: str = "lon",
) -> DataFrame:
    """Geodesic path buffer (GeoStandardPath): within ``width_m`` of the
    polyline — per segment the |cross-track| angle asin(|p·n|) where the
    point projects onto the arc (p·(n×a) ≥ 0 and p·(b×n) ≥ 0), endpoint
    arc distance otherwise; match iff the minimum over segments and
    endpoints is ≤ width/R."""
    cutoff_cos = math.cos(width_m / MEAN_EARTH_RADIUS_M)
    cutoff_sin = math.sin(width_m / MEAN_EARTH_RADIUS_M)
    xyz = unit_vector(lat_col, lon_col)
    cond = None
    for (a, b, n, na, bn) in path_segment_frames(vertices):
        in_window = (
            (_dot_col(xyz, na) >= F.lit(-_EPS))
            & (_dot_col(xyz, bn) >= F.lit(-_EPS))
        )
        cross_ok = F.abs(_dot_col(xyz, n)) <= F.lit(cutoff_sin)
        seg = in_window & cross_ok
        for endpoint in (a, b):
            seg = seg | (_dot_col(xyz, endpoint) >= F.lit(cutoff_cos))
        cond = seg if cond is None else (cond | seg)
    return df.filter(cond)


def path_sql(
    vertices: list[tuple[float, float]], width_m: float,
    lat_expr: str = "lat", lon_expr: str = "lon",
) -> str:
    cutoff_cos = math.cos(width_m / MEAN_EARTH_RADIUS_M)
    cutoff_sin = math.sin(width_m / MEAN_EARTH_RADIUS_M)
    xyz = _sql_unit(lat_expr, lon_expr)
    parts = []
    for (a, b, n, na, bn) in path_segment_frames(vertices):
        seg = (
            f"(({_dot_sql(xyz, na)} >= {-_EPS!r})"
            f" AND ({_dot_sql(xyz, bn)} >= {-_EPS!r})"
            f" AND (abs({_dot_sql(xyz, n)}) <= {cutoff_sin!r}))"
        )
        for endpoint in (a, b):
            seg = f"({seg} OR ({_dot_sql(xyz, endpoint)} >= {cutoff_cos!r}))"
        parts.append(seg)
    return "(" + " OR ".join(parts) + ")"
