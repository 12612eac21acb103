"""Geo-point queries: the LatLonPoint surface re-expressed Spark-first.

Reference behavior: document/LatLonPoint.java (newBoxQuery:169,
newDistanceQuery:191), geo/GeoEncodingUtils.java:40-89 (the 32-bit
coordinate quantization), document/LatLonDocValuesField.newDistanceSort,
and sandbox LatLonPointPrototypeQueries.nearest (distance top-k).

Lucene stores points quantized to int32 per dimension
(enc = floor(deg / 90 * 2^31) for latitude, / 180 for longitude; box query
bounds use ceil for the lower edge — GeoEncodingUtils.encodeLatitudeCeil)
and prunes with a BKD tree. The Spark-first equivalents:

- quantization is two JVM-codegen column expressions; matching happens in
  quantized space, so box-edge semantics are bit-identical to Lucene's
  (a point just outside the box that quantizes inside it MATCHES, exactly
  as in Lucene);
- the BKD prune becomes parquet min/max + partition pruning: store the
  quantized columns (optionally partition/Z-order by an interleaved-bit
  prefix — the BKD split order IS a Z-order) and Catalyst pushes the range
  predicates to the scan;
- distance queries prefilter with the derived bounding box (range
  predicates that reach the scan) then refine with exact haversine —
  the same two-phase shape as Lucene's distance query (box from
  Rectangle.fromPointDistance, then haversin refine). We use the exact
  haversine (not SloppyMath's table approximation): same matches for any
  radius not exactly on a doc's distance, and reproducible in ANSI SQL.

All functions take any DataFrame with latitude/longitude columns in
degrees; none shuffle (map-only filters) except the top-k, which is a
TakeOrderedAndProject over the refined candidates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "encode_latitude",
    "encode_longitude",
    "decode_latitude",
    "decode_longitude",
    "box_query",
    "distance_query",
    "polygon_query",
    "nearest",
    "EARTH_MEAN_RADIUS_METERS",
]

_SCALE = float(1 << 31)
# GeoUtils.EARTH_MEAN_RADIUS_METERS (geo/GeoUtils.java:49)
EARTH_MEAN_RADIUS_METERS = 6371008.7714
_PI = 3.141592653589793


def _enc(col: Column, extent: float, ceil: bool = False) -> Column:
    x = col.cast("double") / extent * _SCALE
    e = (F.ceil(x) if ceil else F.floor(x)).cast("long")
    # degrees == +extent encodes to 2^31, one past int32 max: clamp like
    # Lucene's nextDown special case (GeoEncodingUtils.encodeLatitude:58)
    return F.least(e, F.lit((1 << 31) - 1)).cast("int")


def encode_latitude(col: Column, ceil: bool = False) -> Column:
    """int32 quantized latitude — GeoEncodingUtils.encodeLatitude[Ceil]."""
    return _enc(col, 90.0, ceil)


def encode_longitude(col: Column, ceil: bool = False) -> Column:
    """int32 quantized longitude — GeoEncodingUtils.encodeLongitude[Ceil]."""
    return _enc(col, 180.0, ceil)


def decode_latitude(col: Column) -> Column:
    return col.cast("double") / _SCALE * 90.0


def decode_longitude(col: Column) -> Column:
    return col.cast("double") / _SCALE * 180.0


def _py_enc(deg: float, extent: float, ceil: bool = False) -> int:
    import math

    x = deg / extent * _SCALE
    e = int(math.ceil(x) if ceil else math.floor(x))
    return min(e, (1 << 31) - 1)


def box_query(
    df: DataFrame,
    min_lat: float,
    max_lat: float,
    min_lon: float,
    max_lon: float,
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """LatLonPoint.newBoxQuery: match in QUANTIZED space (lower edges use
    encodeCeil, upper edges encode — LatLonPoint.newBoxQuery:169 via
    Box2D). ``min_lon > max_lon`` is the dateline-crossing box and matches
    the union of the two longitude ranges, as in Lucene. Map-only; the
    four int range predicates push down to the scan when the quantized
    columns are stored."""
    elat = encode_latitude(F.col(lat_col))
    elon = encode_longitude(F.col(lon_col))
    lat_pred = (elat >= _py_enc(min_lat, 90.0, ceil=True)) & (
        elat <= _py_enc(max_lat, 90.0)
    )
    lo, hi = _py_enc(min_lon, 180.0, ceil=True), _py_enc(max_lon, 180.0)
    if min_lon > max_lon:  # dateline crossing: [min_lon, 180] U [-180, max_lon]
        lon_pred = (elon >= lo) | (elon <= hi)
    else:
        lon_pred = (elon >= lo) & (elon <= hi)
    return df.filter(lat_pred & lon_pred)


def haversine_meters(
    lat: Column, lon: Column, qlat: float, qlon: float
) -> Column:
    """Exact haversine great-circle distance in meters on the mean-radius
    sphere. Written as one arithmetic expression (same structure as the
    oracle SQL) so both engines evaluate the identical double tree."""
    rl1 = lat.cast("double") * _PI / 180.0
    rl2 = F.lit(float(qlat)) * _PI / 180.0
    dlat = (F.lit(float(qlat)) - lat.cast("double")) * _PI / 180.0
    dlon = (F.lit(float(qlon)) - lon.cast("double")) * _PI / 180.0
    h = F.pow(F.sin(dlat / 2.0), 2.0) + F.cos(rl1) * F.cos(rl2) * F.pow(
        F.sin(dlon / 2.0), 2.0
    )
    return 2.0 * EARTH_MEAN_RADIUS_METERS * F.asin(F.sqrt(h))


def _bounding_box(qlat: float, qlon: float, radius_m: float):
    """Bounding box of the distance circle (Rectangle.fromPointDistance
    analog, conservatively widened): lat delta from arc length, lon delta
    scaled by the narrowest cos(lat) in the band."""
    import math

    dlat = math.degrees(radius_m / EARTH_MEAN_RADIUS_METERS) * 1.0001
    lo, hi = max(-90.0, qlat - dlat), min(90.0, qlat + dlat)
    max_abs = min(90.0, max(abs(lo), abs(hi)))
    c = math.cos(math.radians(max_abs))
    if c < 1e-9 or hi >= 89.9 or lo <= -89.9:
        return lo, hi, -180.0, 180.0  # pole-adjacent: full longitude ring
    dlon = min(180.0, dlat / c)
    mnl, mxl = qlon - dlon, qlon + dlon
    if mnl < -180.0 or mxl > 180.0:
        return lo, hi, -180.0, 180.0  # dateline wrap: keep the filter simple
    return lo, hi, mnl, mxl


def distance_query(
    df: DataFrame,
    qlat: float,
    qlon: float,
    radius_m: float,
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """LatLonPoint.newDistanceQuery: docs within ``radius_m`` meters of
    the query point. Distance is measured on the QUANTIZED coordinates
    (Lucene matches against the encoded point), after a bounding-box
    prefilter whose range predicates reach the parquet scan."""
    boxed = box_query(df, *_bounding_box(qlat, qlon, radius_m), lat_col, lon_col)
    dlat = decode_latitude(encode_latitude(F.col(lat_col)))
    dlon = decode_longitude(encode_longitude(F.col(lon_col)))
    return boxed.filter(haversine_meters(dlat, dlon, qlat, qlon) <= radius_m)


def polygon_query(
    df: DataFrame,
    vertices: list[tuple[float, float]],
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """LatLonShape polygon containment (document/LatLonShape.java:48
    newPolygonQuery with QueryRelation.CONTAINS-the-point semantics, i.e.
    LatLonPoint.newPolygonQuery): two-phase like the distance query — the
    polygon's bounding box prunes first (four int range predicates that
    reach the parquet scan, the BKD-outer-box analog of
    Polygon2D's relateTriangle bbox check), then the survivors refine with
    the even-odd ray-casting crossing test (GeoUtils.pointInPolygon /
    EdgeTree crossing semantics) evaluated on the DECODED QUANTIZED
    coordinates as one flat JVM-codegen expression — no UDF, map-only.

    ``vertices`` is [(lat, lon), ...] in order (either winding); the
    closing edge last→first is implicit. Dateline-crossing polygons are
    not supported (split them into two, as Lucene's Polygon docs advise).
    Boundary points follow the strict ray-casting rule (lower-inclusive in
    y, strict in x) — pick test polygons whose edges avoid exact doc
    coordinates for oracle-exact gating."""
    n = len(vertices)
    if n < 3:
        raise ValueError("polygon needs at least 3 vertices")
    lats = [float(v[0]) for v in vertices]
    lons = [float(v[1]) for v in vertices]
    boxed = box_query(
        df, min(lats), max(lats), min(lons), max(lons), lat_col, lon_col
    )
    y = decode_latitude(encode_latitude(F.col(lat_col)))
    x = decode_longitude(encode_longitude(F.col(lon_col)))
    crossings: Column | None = None
    for i in range(n):
        yi, xi = lats[i], lons[i]
        yj, xj = lats[i - 1], lons[i - 1]
        dy, dx = yj - yi, xj - xi
        # identical operand order to the oracle SQL (polygon_edge_sql)
        cond = ((F.lit(yi) > y) != (F.lit(yj) > y)) & (
            x < F.lit(dx) * (y - F.lit(yi)) / F.lit(dy) + F.lit(xi)
        )
        term = F.when(cond, 1).otherwise(0)
        crossings = term if crossings is None else crossings + term
    return boxed.filter(crossings % 2 == 1)


def polygon_edge_sql(
    vertices: list[tuple[float, float]], lat_expr: str, lon_expr: str
) -> str:
    """The ANSI-SQL twin of ``polygon_query``'s refine expression (same
    edge order, same operand order — the oracle gate relies on both
    engines evaluating the identical double tree)."""
    n = len(vertices)
    lats = [float(v[0]) for v in vertices]
    lons = [float(v[1]) for v in vertices]
    terms = []
    for i in range(n):
        yi, xi = lats[i], lons[i]
        yj, xj = lats[i - 1], lons[i - 1]
        dy, dx = yj - yi, xj - xi
        terms.append(
            f"(CASE WHEN (({yi!r} > {lat_expr}) <> ({yj!r} > {lat_expr})) "
            f"AND ({lon_expr} < {dx!r} * ({lat_expr} - {yi!r}) / {dy!r} + {xi!r}) "
            "THEN 1 ELSE 0 END)"
        )
    return "(" + " + ".join(terms) + ") % 2 = 1"


def nearest(
    df: DataFrame,
    qlat: float,
    qlon: float,
    k: int = 10,
    id_col: str = "doc_id",
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """Distance top-k (LatLonPointPrototypeQueries.nearest /
    newDistanceSort semantics): (id, dist_m) by haversine over quantized
    coords, ties (dist ASC, id ASC); the cut uses the unrounded distance,
    output rounds to 3 (mm). TakeOrderedAndProject — no global sort."""
    dlat = decode_latitude(encode_latitude(F.col(lat_col)))
    dlon = decode_longitude(encode_longitude(F.col(lon_col)))
    scored = df.select(
        id_col, haversine_meters(dlat, dlon, qlat, qlon).alias("dist_m")
    )
    top = scored.orderBy(F.asc("dist_m"), F.asc(id_col)).limit(k)
    return top.select(id_col, F.round("dist_m", 3).alias("dist_m"))
