"""RangeFieldQuery relation algebra + LatLonPointDistanceFeatureQuery.

Exact-value gates (vs DuckDB) live in test_gate.py (range_field_* and
geo_distance_feature rows); these cover the relation algebra's internal
consistency and the argument contracts."""

import pytest
from pyspark.sql import functions as F

from lucene_spark.search.geo import distance_feature
from lucene_spark.search.misc import range_field_query


@pytest.fixture(scope="module")
def ranged(spark):
    rows = [
        # (id, lo, hi) vs query [10, 20]
        (1, 12, 18),   # within (and intersects)
        (2, 5, 25),    # contains (and intersects)
        (3, 15, 30),   # crosses (and intersects)
        (4, 0, 9),     # disjoint below
        (5, 21, 40),   # disjoint above
        (6, 10, 20),   # within AND contains (exact match)
    ]
    return spark.createDataFrame(rows, "id int, lo int, hi int")


def _ids(df):
    return sorted(r["id"] for r in df.collect())


def test_relations(ranged):
    assert _ids(range_field_query(ranged, "lo", "hi", 10, 20, "intersects")) == [1, 2, 3, 6]
    assert _ids(range_field_query(ranged, "lo", "hi", 10, 20, "within")) == [1, 6]
    assert _ids(range_field_query(ranged, "lo", "hi", 10, 20, "contains")) == [2, 6]
    assert _ids(range_field_query(ranged, "lo", "hi", 10, 20, "crosses")) == [3]


def test_crosses_is_intersects_minus_within_minus_contains(ranged):
    inter = set(_ids(range_field_query(ranged, "lo", "hi", 10, 20, "intersects")))
    within = set(_ids(range_field_query(ranged, "lo", "hi", 10, 20, "within")))
    contains = set(_ids(range_field_query(ranged, "lo", "hi", 10, 20, "contains")))
    crosses = set(_ids(range_field_query(ranged, "lo", "hi", 10, 20, "crosses")))
    assert crosses == inter - within - contains


def test_unknown_relation(ranged):
    with pytest.raises(ValueError):
        range_field_query(ranged, "lo", "hi", 10, 20, "overlaps")


def test_distance_feature_pivot_contract(spark):
    df = spark.createDataFrame(
        [(1, 0.0, 0.0), (2, 10.0, 10.0)], "doc_id int, lat double, lon double"
    )
    with pytest.raises(ValueError):
        distance_feature(df, 0.0, 0.0, pivot_m=0.0)
    out = distance_feature(df, 0.0, 0.0, pivot_m=1000.0, weight=3.0, k=2).collect()
    # doc at the origin: distance 0 => score = weight
    assert out[0]["doc_id"] == 1 and abs(out[0]["score"] - 3.0) < 1e-9
    assert out[1]["score"] < out[0]["score"]
