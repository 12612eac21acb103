"""range_facets (LongRangeFacetCounts analog): overlap independence,
zero-count ranges present, endpoint inclusivity."""

import pytest

from lucene_spark.search.facets import LongRange, range_facets


@pytest.fixture(scope="module")
def vals(spark):
    return spark.createDataFrame(
        [(i, v) for i, v in enumerate([1, 5, 5, 10, 20])], "id long, v long"
    )


def _counts(df):
    return {r["bucket"]: r["n_docs"] for r in df.collect()}


def test_overlapping_ranges_count_independently(vals):
    out = range_facets(
        vals, "v",
        [LongRange("lo", 0, 6), LongRange("mid", 5, 15), LongRange("all", 0, 100)],
    )
    assert _counts(out) == {"lo": 3, "mid": 3, "all": 5}


def test_zero_count_range_present(vals):
    out = range_facets(vals, "v", [LongRange("none", 50, 60)])
    assert _counts(out) == {"none": 0}


def test_endpoint_inclusivity(vals):
    # [5, 10] inclusive-both vs (5, 10) exclusive-both
    out = range_facets(
        vals, "v",
        [
            LongRange("incl", 5, 10, lo_inclusive=True, hi_inclusive=True),
            LongRange("excl", 5, 10, lo_inclusive=False, hi_inclusive=False),
        ],
    )
    assert _counts(out) == {"incl": 3, "excl": 0}


def test_validation(vals):
    with pytest.raises(ValueError):
        range_facets(vals, "v", [])
    with pytest.raises(ValueError):
        range_facets(vals, "v", [LongRange("a", 0, 1), LongRange("a", 1, 2)])
