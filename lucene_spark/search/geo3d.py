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

Planet models: PlanetModel.SPHERE and (since round 5) PlanetModel.WGS84
(`planet="wgs84"` on the circle query). The reference's WGS84 model
(geom/PlanetModel.java:31-35,140-151) scales the unit direction by
m = 1/sqrt((x²+y²)/xyScaling² + z²/zScaling²) so the point lies on the
scaled ellipsoid (Vector.computeDesiredEllipsoidMagnitude). Circle
membership then follows GeoStandardCircle exactly: a SidedPlane through
the ellipsoid points at lat±cutoff on the center's meridian,
perpendicular to the meridian Z-plane
(SidedPlane.constructNormalizedPerpendicularSidedPlane), with the
reference's |eval| < MINIMUM_RESOLUTION = 1e-12 on-plane tolerance
(SidedPlane.isWithin). On the sphere this sided plane reduces to
p·center ≥ cos(cutoff) — the fast dot-product path below. Polygon
membership is PLANET-INVARIANT by construction: GeoConvexPolygon edge
planes pass through the origin (SidedPlane.java:77-86 "and including
origin"), and both the sphere and WGS84 GeoPoint for a (lat, lon) lie
on the same ray from the origin, so the sphere predicate is already the
WGS84 predicate. Paths remain SPHERE-only (GeoStandardPath's ellipsoid
arms add per-segment offset planes this subset omits).

Also covered (round 5): StandardXYZSolid (six axis sided planes,
geom/StandardXYZSolid.java:494-504, with the isWholeWorld
short-circuit), GeoDegeneratePoint (isIdentical per-axis 1e-12,
geom/GeoPoint.java:308-312), and GeoExactCircle (the iterative
plane-sector approximation for high-accuracy ellipsoid circles,
geom/GeoExactCircle.java:58-197: Vincenty-direct bearing points on the
scaled planet, three-point slice planes split until the interpolated
edge points sit within the accuracy bound, membership = any slice's
circle-plane ∧ two origin-bounding-planes) — all planet-model aware.
Remaining declared divergence: the exact circle's radius upper bound is
a conservative 3.0 rad instead of the reference's
planetModel.minimumPoleDistance (whose exact value needs the Vincenty
INVERSE this subset omits).

Membership tolerance is the reference's MINIMUM_RESOLUTION = 1e-12
side-of-plane epsilon. Every predicate is built twice from the SAME
driver-side vertex math: once as a Catalyst Column (JVM-side, codegen)
and once as ANSI SQL for the DuckDB oracle — both evaluate the
identical double expression tree, so the gate hashes match bit-for-bit.
Since round 5 that shared-emitter loop is broken by an INDEPENDENT pin:
tests/test_geo3d_vectors.py replays the reference's own point-membership
assertions (spatial3d/src/test/.../geom/TestGeoCircle.java
testCirclePointWithin + the WGS84 "BKD discovered failure" cases in
testCircleBounds, TestGeoPolygon.java testPolygonPointWithin,
TestGeoPath.java testPathPointWithin incl. the antimeridian-straddling
path) directly against the engine predicates.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "PlanetModel",
    "circle_sided_plane",
    "planet_point_cols",
    "geo3d_xyz_solid_query",
    "xyz_solid_sql",
    "geo3d_degenerate_point_query",
    "geo3d_exact_circle_query",
    "exact_circle_sql",
    "exact_circle_slices",
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
_EPS = 1e-12  # side-of-plane tolerance (Vector.MINIMUM_RESOLUTION)


class PlanetModel:
    """geom/PlanetModel.java:140-151 — xyScaling = a/meanRadius,
    zScaling = b/meanRadius with meanRadius = (2a + b)/3. The ellipsoid
    point for a (lat, lon) is the unit direction scaled by
    1/sqrt((x²+y²)·invXYScaling² + z²·invZScaling²)
    (Vector.computeDesiredEllipsoidMagnitude, Vector.java:549-556)."""

    def __init__(self, semi_major_axis: float, semi_minor_axis: float):
        self.a = semi_major_axis
        self.b = semi_minor_axis
        self.mean_radius = (2.0 * semi_major_axis + semi_minor_axis) / 3.0
        self.xy_scaling = semi_major_axis / self.mean_radius
        self.z_scaling = semi_minor_axis / self.mean_radius
        self.inv_xy_sq = 1.0 / (self.xy_scaling * self.xy_scaling)
        self.inv_z_sq = 1.0 / (self.z_scaling * self.z_scaling)

    def point(self, lat_rad: float, lon_rad: float):
        """Driver-side ellipsoid point (GeoPoint on this planet model)."""
        u = (
            math.cos(lat_rad) * math.cos(lon_rad),
            math.cos(lat_rad) * math.sin(lon_rad),
            math.sin(lat_rad),
        )
        m = 1.0 / math.sqrt(
            (u[0] * u[0] + u[1] * u[1]) * self.inv_xy_sq
            + u[2] * u[2] * self.inv_z_sq
        )
        return (m * u[0], m * u[1], m * u[2])


PlanetModel.SPHERE = PlanetModel(1.0, 1.0)
# WGS84 semi-axes, geom/PlanetModel.java:35
PlanetModel.WGS84 = PlanetModel(6378137.0, 6356752.314245)

_PLANETS = {"sphere": PlanetModel.SPHERE, "wgs84": PlanetModel.WGS84}


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


def _circle_cutoff_rad(radius_m, radius_rad) -> float:
    if radius_rad is not None:
        return float(radius_rad)
    if radius_m is None:
        raise ValueError("pass radius_m or radius_rad")
    return radius_m / MEAN_EARTH_RADIUS_M


def circle_sided_plane(
    qlat_rad: float, qlon_rad: float, cutoff_rad: float, planet: PlanetModel,
):
    """GeoStandardCircle.java:54-121 — the membership SidedPlane through
    the planet-model points at lat±cutoff on the center's meridian
    (pole-wrapped), perpendicular to the meridian Z-plane. Returns
    (normal, D, sig): within ⟺ |n·p + D| < 1e-12 or sign(n·p + D) == sig,
    which collapses to sig·(n·p + D) > −1e-12. cutoff == π is the whole
    world (plane None). Driver-side only — O(1) per query."""
    if abs(cutoff_rad - math.pi) < _EPS:
        return None
    ulat, ulon = qlat_rad + cutoff_rad, qlon_rad
    if ulat > math.pi * 0.5:  # pole wrap, GeoStandardCircle.java:73-79
        ulon += math.pi
        if ulon > math.pi:
            ulon -= 2.0 * math.pi
        ulat = math.pi - ulat
    llat, llon = qlat_rad - cutoff_rad, qlon_rad
    if llat < -math.pi * 0.5:
        llon += math.pi
        if llon > math.pi:
            llon -= 2.0 * math.pi
        llat = -math.pi - llat
    upper = planet.point(ulat, ulon)
    lower = planet.point(llat, llon)
    center = planet.point(qlat_rad, qlon_rad)
    # Plane.constructNormalizedZPlane: vertical plane through the point
    # with the largest x²+y² among {upper, lower, center}
    best = max((upper, lower, center), key=lambda p: p[0] * p[0] + p[1] * p[1])
    d = 1.0 / math.sqrt(best[0] * best[0] + best[1] * best[1])
    meridian_n = (best[1] * d, -best[0] * d, 0.0)
    pts_vec = (
        upper[0] - lower[0], upper[1] - lower[1], upper[2] - lower[2],
    )
    n = _norm(_cross(meridian_n, pts_vec))
    big_d = -(n[0] * upper[0] + n[1] * upper[1] + n[2] * upper[2])
    ev = n[0] * center[0] + n[1] * center[1] + n[2] * center[2] + big_d
    if ev == 0.0:
        raise ValueError("degenerate circle: center on its own plane")
    return (n, big_d, math.copysign(1.0, ev))


def planet_point_cols(
    lat_col, lon_col, planet: PlanetModel,
) -> tuple[Column, Column, Column]:
    """Document-side ellipsoid point columns: the unit direction scaled
    by the computeDesiredEllipsoidMagnitude factor (identity on SPHERE)."""
    x, y, z = unit_vector(lat_col, lon_col)
    if planet.inv_xy_sq == 1.0 and planet.inv_z_sq == 1.0:
        return (x, y, z)
    m = F.lit(1.0) / F.sqrt(
        (x * x + y * y) * F.lit(planet.inv_xy_sq)
        + z * z * F.lit(planet.inv_z_sq)
    )
    return (x * m, y * m, z * m)


def _sql_planet_point(
    lat_expr: str, lon_expr: str, planet: PlanetModel,
) -> tuple[str, str, str]:
    x, y, z = _sql_unit(lat_expr, lon_expr)
    if planet.inv_xy_sq == 1.0 and planet.inv_z_sq == 1.0:
        return (x, y, z)
    m = (
        f"(1.0 / sqrt(({x} * {x} + {y} * {y}) * {planet.inv_xy_sq!r}"
        f" + {z} * {z} * {planet.inv_z_sq!r}))"
    )
    return (f"({x} * {m})", f"({y} * {m})", f"({z} * {m})")


def geo3d_circle_query(
    df: DataFrame, qlat: float, qlon: float, radius_m: float = None,
    lat_col: str = "lat", lon_col: str = "lon",
    radius_rad: float = None, planet: str = "sphere",
) -> DataFrame:
    """Geodesic cap membership (GeoStandardCircle.isWithin). On the
    sphere: p · center ≥ cos(cutoff) — no acos in the hot path (the
    sided plane reduces to exactly this). On WGS84: the reference's
    sided-plane test against the ellipsoid-scaled point columns."""
    pm = _PLANETS[planet]
    cutoff = _circle_cutoff_rad(radius_m, radius_rad)
    if pm is PlanetModel.SPHERE:
        c = _py_unit(qlat, qlon)
        cutoff_cos = math.cos(cutoff)
        d = _dot_col(unit_vector(lat_col, lon_col), c)
        return df.filter(d >= F.lit(cutoff_cos))
    plane = circle_sided_plane(
        math.radians(qlat), math.radians(qlon), cutoff, pm,
    )
    if plane is None:
        return df
    (n, big_d, sig) = plane
    xyz = planet_point_cols(lat_col, lon_col, pm)
    ev = _dot_col(xyz, n) + F.lit(big_d)
    return df.filter(ev * F.lit(sig) > F.lit(-_EPS))


def circle_sql(
    qlat: float, qlon: float, radius_m: float = None,
    lat_expr: str = "lat", lon_expr: str = "lon",
    radius_rad: float = None, planet: str = "sphere",
) -> str:
    pm = _PLANETS[planet]
    cutoff = _circle_cutoff_rad(radius_m, radius_rad)
    if pm is PlanetModel.SPHERE:
        c = _py_unit(qlat, qlon)
        cutoff_cos = math.cos(cutoff)
        d = _dot_sql(_sql_unit(lat_expr, lon_expr), c)
        return f"{d} >= {cutoff_cos!r}"
    plane = circle_sided_plane(
        math.radians(qlat), math.radians(qlon), cutoff, pm,
    )
    if plane is None:
        return "TRUE"
    (n, big_d, sig) = plane
    xyz = _sql_planet_point(lat_expr, lon_expr, pm)
    ev = f"({_dot_sql(xyz, n)} + {big_d!r})"
    return f"({ev} * {sig!r}) > {-_EPS!r}"


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


# --- StandardXYZSolid ------------------------------------------------------


def geo3d_xyz_solid_query(
    df: DataFrame,
    min_x: float, max_x: float, min_y: float, max_y: float,
    min_z: float, max_z: float,
    lat_col: str = "lat", lon_col: str = "lon", planet: str = "sphere",
) -> DataFrame:
    """3D axis-aligned solid membership (StandardXYZSolid.isWithin,
    geom/StandardXYZSolid.java:494-504): the document's planet-model
    point on the interior side of all six axis sided planes, each with
    the 1e-12 on-plane tolerance. Bounds that swallow the whole planet
    short-circuit to match-all (isWholeWorld)."""
    pm = _PLANETS[planet]
    if (min_x <= -pm.xy_scaling and max_x >= pm.xy_scaling
            and min_y <= -pm.xy_scaling and max_y >= pm.xy_scaling
            and min_z <= -pm.z_scaling and max_z >= pm.z_scaling):
        return df
    x, y, z = planet_point_cols(lat_col, lon_col, pm)
    eps = F.lit(_EPS)
    cond = (
        (x >= F.lit(min_x) - eps) & (x <= F.lit(max_x) + eps)
        & (y >= F.lit(min_y) - eps) & (y <= F.lit(max_y) + eps)
        & (z >= F.lit(min_z) - eps) & (z <= F.lit(max_z) + eps)
    )
    return df.filter(cond)


def xyz_solid_sql(
    min_x: float, max_x: float, min_y: float, max_y: float,
    min_z: float, max_z: float,
    lat_expr: str = "lat", lon_expr: str = "lon", planet: str = "sphere",
) -> str:
    pm = _PLANETS[planet]
    if (min_x <= -pm.xy_scaling and max_x >= pm.xy_scaling
            and min_y <= -pm.xy_scaling and max_y >= pm.xy_scaling
            and min_z <= -pm.z_scaling and max_z >= pm.z_scaling):
        return "TRUE"
    x, y, z = _sql_planet_point(lat_expr, lon_expr, pm)
    parts = []
    for expr, lo, hi in ((x, min_x, max_x), (y, min_y, max_y),
                         (z, min_z, max_z)):
        parts.append(f"({expr} >= {lo - _EPS!r})")
        parts.append(f"({expr} <= {hi + _EPS!r})")
    return "(" + " AND ".join(parts) + ")"


def geo3d_degenerate_point_query(
    df: DataFrame, qlat: float, qlon: float,
    lat_col: str = "lat", lon_col: str = "lon", planet: str = "sphere",
) -> DataFrame:
    """Degenerate point membership (GeoDegeneratePoint.isWithin =
    GeoPoint.isIdentical, geom/GeoPoint.java:308-312): per-axis
    |delta| < 1e-12 against the query's planet-model point."""
    pm = _PLANETS[planet]
    q = pm.point(math.radians(qlat), math.radians(qlon))
    x, y, z = planet_point_cols(lat_col, lon_col, pm)
    eps = F.lit(_EPS)
    cond = (
        (F.abs(x - F.lit(q[0])) < eps)
        & (F.abs(y - F.lit(q[1])) < eps)
        & (F.abs(z - F.lit(q[2])) < eps)
    )
    return df.filter(cond)


# --- GeoExactCircle --------------------------------------------------------


def _vincenty_direct(pm: PlanetModel, lat: float, lon: float,
                     dist: float, bearing: float):
    """PlanetModel.surfacePointOnBearing (PlanetModel.java:566-637):
    Vincenty's direct formula with the planet's scaled flattening —
    (lat, lon) of the point ``dist`` along ``bearing`` from (lat, lon),
    all in radians on the scaled planet."""
    scaled_flattening = (pm.xy_scaling - pm.z_scaling) / pm.xy_scaling
    square_ratio = (
        (pm.xy_scaling * pm.xy_scaling - pm.z_scaling * pm.z_scaling)
        / (pm.z_scaling * pm.z_scaling)
    )
    scale = (2.0 * pm.xy_scaling + pm.z_scaling) / 3.0
    sinalpha1, cosalpha1 = math.sin(bearing), math.cos(bearing)
    tan_u1 = (1.0 - scaled_flattening) * math.tan(lat)
    cos_u1 = 1.0 / math.sqrt(1.0 + tan_u1 * tan_u1)
    sin_u1 = tan_u1 * cos_u1
    sigma1 = math.atan2(tan_u1, cosalpha1)
    sinalpha = cos_u1 * sinalpha1
    cos_sq_alpha = 1.0 - sinalpha * sinalpha
    u_sq = cos_sq_alpha * square_ratio
    big_a = 1.0 + u_sq / 16384.0 * (
        4096.0 + u_sq * (-768.0 + u_sq * (320.0 - 175.0 * u_sq)))
    big_b = u_sq / 1024.0 * (
        256.0 + u_sq * (-128.0 + u_sq * (74.0 - 47.0 * u_sq)))
    base = dist / (pm.z_scaling * (1.0 / scale) * big_a)
    sigma = base
    for _ in range(100):
        cos2sigma_m = math.cos(2.0 * sigma1 + sigma)
        sinsigma, cossigma = math.sin(sigma), math.cos(sigma)
        deltasigma = big_b * sinsigma * (
            cos2sigma_m + big_b / 4.0 * (
                cossigma * (-1.0 + 2.0 * cos2sigma_m * cos2sigma_m)
                - big_b / 6.0 * cos2sigma_m
                * (-3.0 + 4.0 * sinsigma * sinsigma)
                * (-3.0 + 4.0 * cos2sigma_m * cos2sigma_m)))
        sigmaprime = sigma
        sigma = base + deltasigma
        if abs(sigma - sigmaprime) < _EPS:
            break
    cos2sigma_m = math.cos(2.0 * sigma1 + sigma)
    sinsigma, cossigma = math.sin(sigma), math.cos(sigma)
    x = sin_u1 * sinsigma - cos_u1 * cossigma * cosalpha1
    phi2 = math.atan2(
        sin_u1 * cossigma + cos_u1 * sinsigma * cosalpha1,
        (1.0 - scaled_flattening) * math.sqrt(sinalpha * sinalpha + x * x))
    lam = math.atan2(
        sinsigma * sinalpha1,
        cos_u1 * cossigma - sin_u1 * sinsigma * cosalpha1)
    c = (scaled_flattening / 16.0 * cos_sq_alpha
         * (4.0 + scaled_flattening * (4.0 - 3.0 * cos_sq_alpha)))
    big_l = lam - (1.0 - c) * scaled_flattening * sinalpha * (
        sigma + c * sinsigma * (
            cos2sigma_m
            + c * cossigma * (-1.0 + 2.0 * cos2sigma_m * cos2sigma_m)))
    lambda2 = (lon + big_l + 3.0 * math.pi) % (2.0 * math.pi) - math.pi
    return (phi2, lambda2)


def _three_point_sided_plane(inside, p1, p2, p3):
    """SidedPlane.constructNormalizedThreePointSidedPlane: plane through
    p1, p2, p3 (NOT the origin); sidedness from ``inside``. Tries the
    reference's three delta orderings before giving up."""
    for (a, b, base) in (
        ((p1[0] - p2[0], p1[1] - p2[1], p1[2] - p2[2]),
         (p2[0] - p3[0], p2[1] - p3[1], p2[2] - p3[2]), p2),
        ((p1[0] - p3[0], p1[1] - p3[1], p1[2] - p3[2]),
         (p3[0] - p2[0], p3[1] - p2[1], p3[2] - p2[2]), p3),
        ((p3[0] - p1[0], p3[1] - p1[1], p3[2] - p1[2]),
         (p1[0] - p2[0], p1[1] - p2[1], p1[2] - p2[2]), p1),
    ):
        try:
            n = _norm(_cross(a, b))
        except ValueError:
            continue
        d = -(n[0] * base[0] + n[1] * base[1] + n[2] * base[2])
        ev = n[0] * inside[0] + n[1] * inside[1] + n[2] * inside[2] + d
        if ev == 0.0:
            continue
        return (n, d, math.copysign(1.0, ev))
    raise ValueError("cannot construct plane through three points")


def _origin_sided_plane(check, a, b):
    """SidedPlane(check, A, B): plane through A, B and the ORIGIN."""
    n = _norm(_cross(a, b))
    ev = n[0] * check[0] + n[1] * check[1] + n[2] * check[2]
    if ev == 0.0:
        raise ValueError("check point on plane")
    return (n, 0.0, math.copysign(1.0, ev))


def exact_circle_slices(
    qlat_rad: float, qlon_rad: float, radius_rad: float,
    accuracy: float, planet: PlanetModel,
):
    """GeoExactCircle.java:58-197 — approximate the true (ellipsoid)
    circle by plane slices, splitting each until the interpolated edge
    points lie within ``accuracy`` of the slice plane. Returns
    [(circle_plane, plane1, plane2)] with each plane = (n, D, sig).
    Conservative subset bound: radius must be < 3.0 rad (the reference
    allows up to the planet's minimumPoleDistance ≈ π·scale, whose exact
    computation needs the Vincenty INVERSE this subset omits)."""
    if radius_rad < _EPS:
        raise ValueError("radius cannot be effectively zero")
    if radius_rad >= 3.0:
        raise ValueError("radius out of this subset's conservative bound")
    accuracy = max(accuracy, _EPS)
    center = planet.point(qlat_rad, qlon_rad)

    def bearing_point(bearing: float):
        la, lo = _vincenty_direct(
            planet, qlat_rad, qlon_rad, radius_rad, bearing)
        return planet.point(la, lo)

    north = bearing_point(0.0)
    south = bearing_point(math.pi)
    east = bearing_point(math.pi * 0.5)
    west = bearing_point(math.pi * 1.5)
    # (endPoint1, bearing1, endPoint2, bearing2, middle, middleBearing,
    #  must_split)
    if planet.z_scaling > planet.xy_scaling:
        todo = [
            (east, math.pi * 0.5, west, -math.pi * 0.5, north, 0.0, True),
            (west, math.pi * 1.5, east, math.pi * 0.5, south, math.pi,
             True),
        ]
    else:
        todo = [
            (north, 0.0, south, math.pi, east, math.pi * 0.5, True),
            (south, math.pi, north, math.pi * 2.0, west, math.pi * 1.5,
             True),
        ]
    slices = []
    guard = 0
    while todo:
        guard += 1
        if guard > 100000:
            raise ValueError("exact circle did not converge")
        (e1, b1, e2, b2, mid, bm, must_split) = todo.pop()
        plane = _three_point_sided_plane(center, e1, e2, mid)
        ib1 = (b1 + bm) * 0.5
        ib2 = (b2 + bm) * 0.5
        ip1 = bearing_point(ib1)
        ip2 = bearing_point(ib2)
        (n, d, _sig) = plane
        ev1 = n[0] * ip1[0] + n[1] * ip1[1] + n[2] * ip1[2] + d
        ev2 = n[0] * ip2[0] + n[1] * ip2[1] + n[2] * ip2[2] + d
        if not must_split and abs(ev1) < accuracy and abs(ev2) < accuracy:
            slices.append((
                plane,
                _origin_sided_plane(mid, e1, center),
                _origin_sided_plane(mid, e2, center),
            ))
        else:
            todo.append((e1, b1, mid, bm, ip1, ib1, False))
            todo.append((mid, bm, e2, b2, ip2, ib2, False))
    return slices


def _sided_within_col(xyz, plane) -> Column:
    (n, d, sig) = plane
    ev = _dot_col(xyz, n) + F.lit(d)
    return (ev * F.lit(sig)) > F.lit(-_EPS)


def _sided_within_sql(xyz, plane) -> str:
    (n, d, sig) = plane
    return f"((({_dot_sql(xyz, n)} + {d!r}) * {sig!r}) > {-_EPS!r})"


def geo3d_exact_circle_query(
    df: DataFrame, qlat: float, qlon: float, radius_rad: float,
    accuracy: float = 1e-6, lat_col: str = "lat", lon_col: str = "lon",
    planet: str = "wgs84",
) -> DataFrame:
    """High-accuracy ellipsoid circle (GeoExactCircle.isWithin,
    GeoExactCircle.java:261-270): inside ANY slice's (circle plane ∧
    bounding plane 1 ∧ bounding plane 2). ``accuracy`` is the linear
    plane-distance bound the slice subdivision drives to (the
    reference's makeExactGeoCircle accuracy argument)."""
    pm = _PLANETS[planet]
    slices = exact_circle_slices(
        math.radians(qlat), math.radians(qlon), radius_rad, accuracy, pm)
    xyz = planet_point_cols(lat_col, lon_col, pm)
    cond = None
    for (cp, p1, p2) in slices:
        c = (
            _sided_within_col(xyz, cp)
            & _sided_within_col(xyz, p1)
            & _sided_within_col(xyz, p2)
        )
        cond = c if cond is None else (cond | c)
    return df.filter(cond)


def exact_circle_sql(
    qlat: float, qlon: float, radius_rad: float, accuracy: float = 1e-6,
    lat_expr: str = "lat", lon_expr: str = "lon", planet: str = "wgs84",
) -> str:
    pm = _PLANETS[planet]
    slices = exact_circle_slices(
        math.radians(qlat), math.radians(qlon), radius_rad, accuracy, pm)
    xyz = _sql_planet_point(lat_expr, lon_expr, pm)
    parts = [
        f"({_sided_within_sql(xyz, cp)} AND {_sided_within_sql(xyz, p1)}"
        f" AND {_sided_within_sql(xyz, p2)})"
        for (cp, p1, p2) in slices
    ]
    return "(" + " OR ".join(parts) + ")"
