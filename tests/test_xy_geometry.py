"""XY cartesian geometry (document/XYPointField.java, geo/XYCircle,
geo/XYPolygon): float32 quantization + planar box/circle/polygon. Exact
gates vs DuckDB are test_gate.py's xy_* rows; these pin the contracts."""

import pytest

from lucene_spark.search.geo import (
    xy_box_query,
    xy_distance_query,
    xy_polygon_query,
)


@pytest.fixture(scope="module")
def pts(spark):
    rows = [
        (1, 0.0, 0.0),
        (2, 5.0, 5.0),
        (3, -5.0, 5.0),
        (4, 100.0, 100.0),
        (5, 3.0, -4.0),   # distance 5 from origin
    ]
    return spark.createDataFrame(rows, "doc_id int, x double, y double")


def _ids(df):
    return sorted(r["doc_id"] for r in df.collect())


def test_box(pts):
    assert _ids(xy_box_query(pts, -6, 6, -6, 6)) == [1, 2, 3, 5]
    assert _ids(xy_box_query(pts, 0, 6, 0, 6)) == [1, 2]


def test_circle(pts):
    # radius 5: boundary point (3,-4) at distance exactly 5 is INSIDE
    # (<=, Circle2D.contains)
    assert _ids(xy_distance_query(pts, 0.0, 0.0, 5.0)) == [1, 5]
    assert _ids(xy_distance_query(pts, 0.0, 0.0, 7.1)) == [1, 2, 3, 5]
    with pytest.raises(ValueError):
        xy_distance_query(pts, 0, 0, 0.0)


def test_polygon(pts):
    tri = [(-20.0, -1.0), (20.0, -1.0), (0.0, 20.0)]
    assert _ids(xy_polygon_query(pts, tri)) == [1, 2, 3]
    with pytest.raises(ValueError):
        xy_polygon_query(pts, tri[:2])
