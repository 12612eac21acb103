"""spatial3d geodesic subset (search/geo3d.py): unit-sphere points,
geodesic caps, convex/composite polygons via sided edge planes, path
buffers. Hand-computed great-circle vectors; the exact-value gates are
geo3d_circle / geo3d_polygon / geo3d_path in test_gate.py (engine vs an
identical-expression DuckDB oracle)."""

import math

import pytest
from pyspark.sql import functions as F

from lucene_spark.search.geo3d import (
    MEAN_EARTH_RADIUS_M,
    arc_distance_meters,
    convex_edge_normals,
    geo3d_circle_query,
    geo3d_composite_polygon_query,
    geo3d_convex_polygon_query,
    geo3d_path_query,
    path_segment_frames,
)


@pytest.fixture(scope="module")
def pts(spark):
    rows = [
        (0, 0.0, 0.0),       # origin
        (1, 0.0, 90.0),      # quarter turn east
        (2, 90.0, 0.0),      # north pole
        (3, 0.0, 179.0),     # near antipode
        (4, 10.0, 10.0),
        (5, 45.0, 45.0),
        (6, -30.0, 120.0),
        (7, 0.1, 0.1),       # near origin
        (8, 2.0, 15.0),      # between path vertices (cross-track ~2°)
        (9, 52.0, 13.0),     # Berlin-ish
    ]
    return spark.createDataFrame(rows, "id long, lat double, lon double").cache()


def ids(df):
    return sorted(r["id"] for r in df.select("id").collect())


def test_arc_distance_quarter_turn(spark, pts):
    got = (
        pts.filter("id = 0")
        .select(arc_distance_meters("lat", "lon", 0.0, 90.0).alias("d"))
        .first()["d"]
    )
    # a quarter of the great circle: R·π/2
    assert abs(got - MEAN_EARTH_RADIUS_M * math.pi / 2) < 1.0
    got2 = (
        pts.filter("id = 2")
        .select(arc_distance_meters("lat", "lon", 0.0, 123.0).alias("d"))
        .first()["d"]
    )
    # pole to any equator point is also R·π/2
    assert abs(got2 - MEAN_EARTH_RADIUS_M * math.pi / 2) < 1.0


def test_circle_membership(spark, pts):
    # 2000 km cap around the origin: ids 0 and 7, 4 (10°,10° is
    # ~1560 km) and 8 (2°,15° is ~1680 km) — not 45°,45°
    got = ids(geo3d_circle_query(pts, 0.0, 0.0, 2_000_000.0))
    assert got == [0, 4, 7, 8]
    # a cap through the pole
    got2 = ids(geo3d_circle_query(pts, 90.0, 0.0, 1_000_000.0))
    assert got2 == [2]


def test_convex_polygon(spark, pts):
    square = [(-6.0, -6.0), (-6.0, 6.0), (6.0, 6.0), (6.0, -6.0)]
    got = ids(geo3d_convex_polygon_query(pts, square))
    assert got == [0, 7]  # 10,10 is outside the 6° square
    with pytest.raises(ValueError):
        convex_edge_normals(list(reversed(square)))  # cw winding
    with pytest.raises(ValueError):
        convex_edge_normals(square[:2])


def test_composite_polygon(spark, pts):
    # L-shape: equatorial square + a northern extension covering 10,10
    pieces = [
        [(-6.0, -6.0), (-6.0, 6.0), (6.0, 6.0), (6.0, -6.0)],
        [(6.0, 6.0), (6.0, 12.0), (12.0, 12.0), (12.0, 6.0)],
    ]
    got = ids(geo3d_composite_polygon_query(pts, pieces))
    assert got == [0, 4, 7]


def test_path_buffer(spark, pts):
    # equatorial path 0°..30°E with ~335 km (3°) width: contains the
    # origin (endpoint), 0.1/0.1 and the 2°-cross-track point at 15°E;
    # excludes 10,10 (10° off-track)
    path = [(0.0, 0.0), (0.0, 30.0)]
    width = math.radians(3.0) * MEAN_EARTH_RADIUS_M
    got = ids(geo3d_path_query(pts, path, width))
    # 0,90 is 60° past the segment end (endpoint distance 60° > 3°) and
    # 0,179 is on the far side of the planet: both stay out
    assert got == [0, 7, 8]


def test_path_multi_segment(spark, pts):
    path = [(0.0, 0.0), (0.0, 30.0), (45.0, 45.0)]
    width = math.radians(5.0) * MEAN_EARTH_RADIUS_M
    got = ids(geo3d_path_query(pts, path, width))
    assert 5 in got          # second segment's far endpoint
    assert 0 in got and 8 in got
    assert 2 not in got      # the pole stays out


def test_circle_matches_planar_distance(spark, pts):
    """The geodesic cap and geo.py's haversine distance_query agree on
    the same sphere (same radius constant, mathematically equal)."""
    from lucene_spark.search.geo import distance_query

    for (qlat, qlon, r) in [(0.0, 0.0, 2_000_000.0), (40.0, 100.0, 5_000_000.0)]:
        a = ids(geo3d_circle_query(pts, qlat, qlon, r))
        b = ids(distance_query(pts, qlat, qlon, r))
        assert a == b
