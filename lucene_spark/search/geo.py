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
    "distance_feature",
    "distance_join",
    "xy_box_query",
    "xy_distance_query",
    "xy_polygon_query",
    "haversine_pair_meters",
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
    # conservative RAW-column prefilter: quantization moves a coordinate
    # by < 90/2^31 ≈ 4.2e-8 deg, so a 1e-6-deg widened raw range can never
    # drop a quantized match — and unlike the encode() expressions these
    # bare-attribute predicates reach the parquet scan (PushedFilters /
    # row-group stats pruning), the BKD-outer-box analog at 100 TB
    m = 1e-6
    raw = (F.col(lat_col) >= min_lat - m) & (F.col(lat_col) <= max_lat + m)
    if min_lon > max_lon:  # dateline crossing: [min_lon, 180] U [-180, max_lon]
        lon_pred = (elon >= lo) | (elon <= hi)
        raw = raw & (
            (F.col(lon_col) >= min_lon - m) | (F.col(lon_col) <= max_lon + m)
        )
    else:
        lon_pred = (elon >= lo) & (elon <= hi)
        raw = raw & (
            (F.col(lon_col) >= min_lon - m) & (F.col(lon_col) <= max_lon + m)
        )
    return df.filter(raw).filter(lat_pred & lon_pred)


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


# --- XY cartesian geometry (document/XYPointField.java, XYShape.java) ------
# The planar twin of the LatLon family: coordinates are float32
# (XYEncodingUtils.encode stores the sortable float bits; decode returns
# the same float), so quantization = one float32 round-trip — widening
# back to double is exact, and both engines then evaluate the identical
# double expression tree.


def _xy_quantize(col: Column) -> Column:
    return col.cast("float").cast("double")


def xy_box_query(
    df: DataFrame,
    min_x: float,
    max_x: float,
    min_y: float,
    max_y: float,
    x_col: str = "x",
    y_col: str = "y",
) -> DataFrame:
    """XYPoint.newBoxQuery (document/XYPointField.java:150 / XYRectangle):
    cartesian box over the float32-quantized coordinates. A conservative
    RAW-column prefilter (float32 moves a value by ≤ |v|·2⁻²⁴; the margin
    covers it with orders of magnitude to spare) is bare-attribute and
    reaches the parquet scan (PushedFilters / row-group pruning); the
    exact quantized predicate refines after."""
    span = max(abs(float(min_x)), abs(float(max_x)),
               abs(float(min_y)), abs(float(max_y)), 1.0)
    m = span * 1e-6
    raw = (
        (F.col(x_col) >= float(min_x) - m) & (F.col(x_col) <= float(max_x) + m)
        & (F.col(y_col) >= float(min_y) - m) & (F.col(y_col) <= float(max_y) + m)
    )
    x, y = _xy_quantize(F.col(x_col)), _xy_quantize(F.col(y_col))
    return df.filter(raw).filter(
        (x >= float(min_x)) & (x <= float(max_x))
        & (y >= float(min_y)) & (y <= float(max_y))
    )


def xy_distance_query(
    df: DataFrame,
    qx: float,
    qy: float,
    radius: float,
    x_col: str = "x",
    y_col: str = "y",
) -> DataFrame:
    """XYPoint.newDistanceQuery (geo/XYCircle): euclidean circle over the
    quantized coords — bounding-box prefilter (pushed down), then the
    squared-distance refine in one codegen expression (no sqrt: compare
    squared against radius², the Circle2D.contains shape)."""
    if not (radius > 0):
        raise ValueError(f"radius must be > 0, got {radius}")
    boxed = xy_box_query(
        df, qx - radius, qx + radius, qy - radius, qy + radius, x_col, y_col
    )
    x, y = _xy_quantize(F.col(x_col)), _xy_quantize(F.col(y_col))
    dx, dy = x - float(qx), y - float(qy)
    return boxed.filter(dx * dx + dy * dy <= float(radius) * float(radius))


def xy_polygon_query(
    df: DataFrame,
    vertices: list[tuple[float, float]],
    x_col: str = "x",
    y_col: str = "y",
) -> DataFrame:
    """XYShape.newPolygonQuery point-CONTAINS analog (geo/XYPolygon +
    spatial XYPointInGeometryQuery): bbox prune + the same even-odd
    ray-cast refine as the LatLon polygon, on float32-quantized cartesian
    coords. ``vertices`` is [(x, y), ...]; the closing edge is implicit;
    boundary points follow the strict crossing rule (pick test polygons
    off the data grid for oracle-exact gating)."""
    n = len(vertices)
    if n < 3:
        raise ValueError("polygon needs at least 3 vertices")
    xs = [float(v[0]) for v in vertices]
    ys = [float(v[1]) for v in vertices]
    boxed = xy_box_query(
        df, min(xs), max(xs), min(ys), max(ys), x_col, y_col
    )
    x, y = _xy_quantize(F.col(x_col)), _xy_quantize(F.col(y_col))
    crossings: Column | None = None
    for i in range(n):
        yi, xi = ys[i], xs[i]
        yj, xj = ys[i - 1], xs[i - 1]
        dy, dx = yj - yi, xj - xi
        # identical operand order to polygon_edge_sql (vertices as (y, x))
        cond = ((F.lit(yi) > y) != (F.lit(yj) > y)) & (
            x < F.lit(dx) * (y - F.lit(yi)) / F.lit(dy) + F.lit(xi)
        )
        term = F.when(cond, 1).otherwise(0)
        crossings = term if crossings is None else crossings + term
    return boxed.filter(crossings % 2 == 1)


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


def distance_feature(
    df: DataFrame,
    qlat: float,
    qlon: float,
    pivot_m: float,
    weight: float = 1.0,
    k: int = 10,
    id_col: str = "doc_id",
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """LatLonPointDistanceFeatureQuery (document/LatLonPointDistance-
    FeatureQuery.java:64, built by LatLonPoint.newDistanceFeatureQuery):
    feature score = weight · pivot / (pivot + haversine(origin, doc)) over
    the QUANTIZED coordinates — the boost-by-geo-proximity clause. Top-k
    ties (score DESC, id ASC); the cut uses the unrounded score, output
    rounds to 6. Lucene prunes via BKD distance buckets as the k-th score
    rises; here the feature is one codegen expression and the rank is a
    TakeOrderedAndProject (no global sort). Combine with a text query by
    joining on the id and summing, as DistanceFeatureQuery's SHOULD clause
    does."""
    if not (pivot_m > 0):
        raise ValueError(f"pivotDistance must be > 0, got {pivot_m}")
    dlat = decode_latitude(encode_latitude(F.col(lat_col)))
    dlon = decode_longitude(encode_longitude(F.col(lon_col)))
    dist = haversine_meters(dlat, dlon, qlat, qlon)
    feat = F.lit(float(weight)) * (
        F.lit(float(pivot_m)) / (F.lit(float(pivot_m)) + dist)
    )
    scored = df.select(id_col, feat.alias("score"))
    top = scored.orderBy(F.desc("score"), F.asc(id_col)).limit(k)
    return top.select(id_col, F.round("score", 6).alias("score"))


def haversine_pair_meters(
    lat1: Column, lon1: Column, lat2: Column, lon2: Column
) -> Column:
    """haversine_meters between two column points — the same expression
    tree, both endpoints columns (for the pair join and its SQL oracle)."""
    rl1 = lat1.cast("double") * _PI / 180.0
    rl2 = lat2.cast("double") * _PI / 180.0
    dlat = (lat2.cast("double") - lat1.cast("double")) * _PI / 180.0
    dlon = (lon2.cast("double") - lon1.cast("double")) * _PI / 180.0
    h = F.pow(F.sin(dlat / 2.0), 2.0) + F.cos(rl1) * F.cos(rl2) * F.pow(
        F.sin(dlon / 2.0), 2.0
    )
    return 2.0 * EARTH_MEAN_RADIUS_METERS * F.asin(F.sqrt(h))


# meters per degree of latitude on the mean-radius sphere
_DEG_LAT_M = _PI / 180.0 * EARTH_MEAN_RADIUS_METERS


def _ncells_for_band(band: Column, dlat_deg: float) -> Column:
    """Longitude tile count for a latitude band: tiles at least dlat_deg
    wide at the band's pole-nearest latitude (so a radius never spans more
    than one tile boundary in that band); a band touching a pole (min cos
    -> 0) collapses to one tile."""
    worst_abs_lat = F.least(
        F.greatest(
            F.abs(band.cast("double") * dlat_deg),
            F.abs((band.cast("double") + 1.0) * dlat_deg),
        ),
        F.lit(90.0),
    )
    cos_min = F.cos(worst_abs_lat * _PI / 180.0)
    dlon = F.least(F.lit(360.0), F.lit(dlat_deg) / F.greatest(cos_min, F.lit(1e-9)))
    return F.greatest(F.floor(F.lit(360.0) / dlon), F.lit(1.0)).cast("long")


def _cell_for(lon: Column, ncells: Column) -> Column:
    # tile index in [0, ncells); lon=+180 folds onto tile 0 via pmod
    return F.pmod(
        F.floor((lon.cast("double") + 180.0) / (F.lit(360.0) / ncells)).cast(
            "long"
        ),
        ncells,
    )


def distance_join(
    df: DataFrame,
    radius_m: float,
    id_col: str = "doc_id",
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """All pairs of points within ``radius_m`` meters (haversine), found by
    a banded-grid bucket join — never all-pairs.

    The reference indexes points into grid-prefix cells and joins/filters
    per cell (spatial-extras PrefixTreeStrategy.java:63 +
    prefix/tree/GeohashPrefixTree.java — "one grid square per cell, query
    shapes match cells then refine"); the Spark-first restatement makes the
    cell the JOIN KEY: latitude bands of radius height, per-band longitude
    tiles of at least radius width (sized at the band's pole-nearest
    latitude, so tiles widen toward the poles; a band touching a pole is
    one tile), antimeridian wrap via modular tile indexes. The probe side
    emits its 3 bands x 3 tiles neighborhood (tile index recomputed in each
    band's own tiling), the build side exactly its own cell; candidates
    are verified with the exact haversine and deduped.

    Scale shape: two shuffles on (band, tile) — the classic spatial
    bucket join; dense-city skew is AQE skew-join territory, and the
    candidate count is bounded by true spatial density, never N^2. Returns
    (a, b, dist_m) with a < b, dist rounded to mm.
    """
    dlat_deg = float(radius_m) / _DEG_LAT_M

    pts = df.select(
        F.col(id_col).alias("_pid"),
        F.col(lat_col).cast("double").alias("_lat"),
        F.col(lon_col).cast("double").alias("_lon"),
    )
    band = F.floor(F.col("_lat") / F.lit(dlat_deg)).cast("long")

    right = pts.select(
        F.col("_pid").alias("b"),
        F.col("_lat").alias("_blat"),
        F.col("_lon").alias("_blon"),
        band.alias("_band"),
        _cell_for(F.col("_lon"), _ncells_for_band(band, dlat_deg)).alias("_cell"),
    )

    keys = []
    for db in (-1, 0, 1):
        nb = band + F.lit(db)
        ncells = _ncells_for_band(nb, dlat_deg)
        base = _cell_for(F.col("_lon"), ncells)
        for dc in (-1, 0, 1):
            keys.append(F.struct(nb.alias("_band"),
                                 F.pmod(base + F.lit(dc), ncells).alias("_cell")))
    left = pts.select(
        F.col("_pid").alias("a"),
        F.col("_lat").alias("_alat"),
        F.col("_lon").alias("_alon"),
        F.explode(F.array_distinct(F.array(*keys))).alias("_k"),
    ).select("a", "_alat", "_alon", F.col("_k._band").alias("_band"),
             F.col("_k._cell").alias("_cell"))

    dist = haversine_pair_meters(
        F.col("_alat"), F.col("_alon"), F.col("_blat"), F.col("_blon")
    )
    pairs = (
        left.join(right, ["_band", "_cell"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", dist.alias("_d"))
        .filter(F.col("_d") <= float(radius_m))
        .groupBy("a", "b")
        .agg(F.min("_d").alias("_d"))
    )
    return pairs.select("a", "b", F.round("_d", 3).alias("dist_m"))
