"""Banded-grid spatial pair join (geo.distance_join ← spatial-extras
PrefixTreeStrategy cell economics): bucket join == brute force."""

import math

import pytest
from pyspark.sql import functions as F

from lucene_spark.search.geo import (
    distance_join,
    haversine_pair_meters,
)


def _brute(spark, pts, radius):
    df = spark.createDataFrame(pts, "doc_id long, lat double, lon double")
    a = df.select(
        F.col("doc_id").alias("a"), F.col("lat").alias("la"), F.col("lon").alias("lo")
    )
    b = df.select(
        F.col("doc_id").alias("b"), F.col("lat").alias("lb"), F.col("lon").alias("lg")
    )
    d = haversine_pair_meters(F.col("la"), F.col("lo"), F.col("lb"), F.col("lg"))
    return {
        (int(r["a"]), int(r["b"]))
        for r in a.crossJoin(b)
        .filter((F.col("a") < F.col("b")) & (d <= radius))
        .collect()
    }


def _grid(spark, pts, radius):
    df = spark.createDataFrame(pts, "doc_id long, lat double, lon double")
    return {
        (int(r["a"]), int(r["b"]))
        for r in distance_join(df, radius).collect()
    }


def test_matches_brute_force_global_scatter(spark):
    # deterministic synthetic scatter incl. high latitudes
    pts = [
        (i, ((i * 37) % 18001) / 100.0 - 90.0, ((i * 73) % 36001) / 100.0 - 180.0)
        for i in range(250)
    ]
    r = 500_000.0
    assert _grid(spark, pts, r) == _brute(spark, pts, r)


def test_antimeridian_and_pole_pairs(spark):
    pts = [
        (0, 10.0, 179.95),
        (1, 10.0, -179.95),  # ~11km across the dateline
        (2, 89.5, 0.0),
        (3, 89.5, 180.0),    # ~111km across the pole region
        (4, -89.9, 45.0),
        (5, -89.8, -135.0),
        (6, 0.0, 0.0),       # far from everything
    ]
    r = 150_000.0
    got = _grid(spark, pts, r)
    want = _brute(spark, pts, r)
    assert got == want
    assert (0, 1) in got and (2, 3) in got


def test_adjacent_band_pairs(spark):
    # two points radius*0.9 apart straddling a band boundary
    r = 100_000.0
    dlat = math.degrees(r / 6371008.7714)
    b = 17 * dlat  # band boundary latitude
    pts = [(0, b - 0.4 * dlat, 30.0), (1, b + 0.4 * dlat, 30.0), (2, b + 5 * dlat, 30.0)]
    got = _grid(spark, pts, r)
    assert got == _brute(spark, pts, r) == {(0, 1)}


def test_distances_rounded_and_deduped(spark):
    pts = [(0, 50.0, 7.0), (1, 50.0, 7.01), (2, 50.0, 7.02)]
    df = spark.createDataFrame(pts, "doc_id long, lat double, lon double")
    out = distance_join(df, 5_000.0).collect()
    pairs = [(int(r["a"]), int(r["b"])) for r in out]
    assert sorted(pairs) == [(0, 1), (0, 2), (1, 2)]
    assert len(pairs) == len(set(pairs))
    d01 = [float(r["dist_m"]) for r in out if int(r["a"]) == 0 and int(r["b"]) == 1][0]
    assert d01 == pytest.approx(716.0, abs=5.0)
