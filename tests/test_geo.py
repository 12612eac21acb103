"""Geo-point query semantics vs brute-force python oracles.

Behavior reference: document/LatLonPoint.java (box/distance queries),
geo/GeoEncodingUtils.java (quantization, ceil on lower box edges)."""

import math

import pytest
from pyspark.sql import functions as F

from lucene_spark.search.geo import (
    EARTH_MEAN_RADIUS_METERS,
    _py_enc,
    box_query,
    distance_query,
    nearest,
)

PTS = [
    # hand-placed + a deterministic scatter
    (0, 0.0, 0.0),
    (1, 10.0, 10.0),
    (2, -10.0, -10.0),
    (3, 89.99, 120.0),
    (4, -89.99, -120.0),
    (5, 45.0, 179.95),     # near dateline, east side
    (6, 45.0, -179.95),    # near dateline, west side
    (7, 90.0, 180.0),      # encode clamp corner
    (8, 1e-9, -1e-9),      # sub-quantum magnitude: floor sends lon to -1
] + [
    (100 + i, ((i * 37) % 1801) / 10.0 - 90.0, ((i * 73) % 3601) / 10.0 - 180.0)
    for i in range(60)
]


def _enc_pair(lat, lon):
    return _py_enc(lat, 90.0), _py_enc(lon, 180.0)


def _pts_df(spark):
    return spark.createDataFrame(PTS, "doc_id long, lat double, lon double")


def _hav(lat1, lon1, lat2, lon2):
    rl1, rl2 = math.radians(lat1), math.radians(lat2)
    dlat, dlon = math.radians(lat2 - lat1), math.radians(lon2 - lon1)
    h = math.sin(dlat / 2) ** 2 + math.cos(rl1) * math.cos(rl2) * math.sin(dlon / 2) ** 2
    return 2 * EARTH_MEAN_RADIUS_METERS * math.asin(math.sqrt(h))


def _dec(lat, lon):
    elat, elon = _enc_pair(lat, lon)
    return elat / float(1 << 31) * 90.0, elon / float(1 << 31) * 180.0


def test_box_matches_quantized_oracle(spark):
    box = (-20.0, 50.0, -30.0, 130.0)
    got = {r["doc_id"] for r in box_query(_pts_df(spark), *box).collect()}
    lo_lat, hi_lat = _py_enc(box[0], 90.0, True), _py_enc(box[1], 90.0)
    lo_lon, hi_lon = _py_enc(box[2], 180.0, True), _py_enc(box[3], 180.0)
    want = {
        i
        for i, lat, lon in PTS
        if lo_lat <= _py_enc(lat, 90.0) <= hi_lat
        and lo_lon <= _py_enc(lon, 180.0) <= hi_lon
    }
    assert got == want and got  # non-empty


def test_box_quantized_edge_semantics(spark):
    # a point a hair below the min edge can quantize INTO the box (Lucene
    # matches the encoded point, not the raw double)
    eps_lat = -20.0 - 1e-9  # floor quantum below -20 is the same cell...
    enc_edge = _py_enc(-20.0, 90.0, True)
    assert _py_enc(eps_lat, 90.0) < enc_edge  # ...actually floor drops it
    # and a raw value exactly on the max edge always matches
    df = spark.createDataFrame(
        [(0, 50.0, 0.0), (1, eps_lat, 0.0)], "doc_id long, lat double, lon double"
    )
    got = {r["doc_id"] for r in box_query(df, -20.0, 50.0, -10.0, 10.0).collect()}
    assert got == {0}


def test_box_dateline_crossing(spark):
    got = {
        r["doc_id"]
        for r in box_query(_pts_df(spark), 40.0, 50.0, 179.0, -179.0).collect()
    }
    assert {5, 6} <= got
    assert 1 not in got


def test_clamp_at_pole_and_dateline(spark):
    # (90, 180) encodes to int32 max on both dims, not an overflow
    (r,) = (
        box_query(_pts_df(spark), 89.0, 90.0, 179.0, 180.0)
        .filter(F.col("doc_id") == 7)
        .collect()
    )
    assert r["doc_id"] == 7
    assert _py_enc(90.0, 90.0) == (1 << 31) - 1


def test_distance_query_matches_brute_force(spark):
    qlat, qlon, radius = 5.0, 5.0, 3_000_000.0
    got = {
        r["doc_id"]
        for r in distance_query(_pts_df(spark), qlat, qlon, radius).collect()
    }
    want = {
        i for i, lat, lon in PTS if _hav(*_dec(lat, lon), qlat, qlon) <= radius
    }
    assert got == want and got


def test_distance_near_pole_keeps_full_ring(spark):
    # query near the pole: the bbox prefilter must not clip longitudes
    got = {
        r["doc_id"]
        for r in distance_query(_pts_df(spark), 89.5, 0.0, 200_000.0).collect()
    }
    want = {
        i for i, lat, lon in PTS if _hav(*_dec(lat, lon), 89.5, 0.0) <= 200_000.0
    }
    assert got == want


def test_nearest_order_and_ties(spark):
    rows = nearest(_pts_df(spark), 0.0, 0.0, k=5).collect()
    ids = [r["doc_id"] for r in rows]
    dists = [r["dist_m"] for r in rows]
    assert dists == sorted(dists)
    brute = sorted(
        ((_hav(*_dec(lat, lon), 0.0, 0.0), i) for i, lat, lon in PTS)
    )[:5]
    assert ids == [i for _, i in brute]
    assert dists[0] == pytest.approx(brute[0][0], abs=1e-3)


# --- polygon containment (LatLonShape.java:48 analog) ------------------------

def test_polygon_square_contains(spark):
    from lucene_spark.search.geo import polygon_query

    pts = spark.createDataFrame(
        [(1, 5.0, 5.0), (2, 15.0, 5.0), (3, 5.0, 15.0), (4, -5.0, 5.0),
         (5, 9.99, 9.99), (6, 0.01, 0.01)],
        "doc_id long, lat double, lon double",
    )
    square = [(0.005, 0.005), (10.005, 0.005), (10.005, 10.005), (0.005, 10.005)]
    got = {r["doc_id"] for r in polygon_query(pts, square).collect()}
    assert got == {1, 5, 6}


def test_polygon_nonconvex(spark):
    from lucene_spark.search.geo import polygon_query

    # chevron whose top boundary dips to (lat=5, lon=4): the point
    # (lat=8, lon=4) sits in the notch — inside the bbox, OUTSIDE the
    # polygon; (5,1) and (5,8) sit under the two roof slopes (inside)
    chevron = [(0.0, 0.0), (10.0, 0.0), (5.0, 4.0), (10.0, 10.0), (0.0, 10.0)]
    pts = spark.createDataFrame(
        [(1, 8.0, 4.0), (2, 5.0, 1.0), (3, 5.0, 8.0)],
        "doc_id long, lat double, lon double",
    )
    got = {r["doc_id"] for r in polygon_query(pts, chevron).collect()}
    assert 1 not in got  # the notch
    assert got == {2, 3}


def test_polygon_needs_3_vertices(spark):
    import pytest
    from lucene_spark.search.geo import polygon_query

    pts = spark.createDataFrame([(1, 0.0, 0.0)], "doc_id long, lat double, lon double")
    with pytest.raises(ValueError, match="3 vertices"):
        polygon_query(pts, [(0.0, 0.0), (1.0, 1.0)])
