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


def test_drill_sideways_three_dims(spark):
    from lucene_spark.search.facets import drill_sideways

    rows = [
        # (id, color, size, shape)
        (0, "red", "s", "circle"),
        (1, "red", "s", "square"),
        (2, "red", "m", "circle"),
        (3, "blue", "s", "circle"),
        (4, "blue", "m", "square"),
        (5, "green", "s", "circle"),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, color string, size string, shape string"
    )
    cons = {"color": "red", "size": "s", "shape": "circle"}
    got = {
        (r["dim"], r["value"]): r["n_docs"]
        for r in drill_sideways(docs, cons).collect()
    }
    # sideways for color: size=s AND shape=circle -> docs 0,3,5
    assert got[("color", "red")] == 1
    assert got[("color", "blue")] == 1
    assert got[("color", "green")] == 1
    # sideways for size: color=red AND shape=circle -> docs 0,2
    assert got[("size", "s")] == 1 and got[("size", "m")] == 1
    # sideways for shape: color=red AND size=s -> docs 0,1
    assert got[("shape", "circle")] == 1 and got[("shape", "square")] == 1
    # drill-down hits: all three constraints -> doc 0 only
    assert got[("__drilldown__", "")] == 1
    # values failing every other-dim constraint never appear
    assert ("color", "???") not in got


def test_drill_sideways_single_dim_equals_plain_facets(spark):
    from lucene_spark.search.facets import drill_sideways

    docs = spark.createDataFrame(
        [(0, "en"), (1, "en"), (2, "de")], "doc_id long, lang string"
    )
    got = {
        (r["dim"], r["value"]): r["n_docs"]
        for r in drill_sideways(docs, {"lang": "en"}).collect()
    }
    # one dim: sideways = unfiltered facet counts over the base query
    assert got[("lang", "en")] == 2 and got[("lang", "de")] == 1
    assert got[("__drilldown__", "")] == 2


def test_taxonomy_facets_rollup(spark):
    from lucene_spark.search.facets import taxonomy_facets

    docs = spark.createDataFrame(
        [("a/x",), ("a/x",), ("a/y",), ("b/x",), ("b",)], "path string"
    )
    got = {
        r["path"]: r["n_docs"] for r in taxonomy_facets(docs, "path").collect()
    }
    # ancestor rollup: 'a' counts both its leaves
    assert got == {"a": 3, "a/x": 2, "a/y": 1, "b": 2, "b/x": 1}


def test_sampled_facets_deterministic_and_amortized(spark):
    """RandomSamplingFacetsCollector analog: deterministic MINSTD sample,
    amortized counts = raw sample counts × 100/rate (facets.sampled_facets;
    gate row facet_sampled carries the DuckDB oracle)."""
    from lucene_spark.search.facets import sampled_facets

    rows = [(i, "en" if i % 3 else "de") for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    raw = sampled_facets(df, "lang", rate_pct=20, amortize=False).collect()
    amo = sampled_facets(df, "lang", rate_pct=20).collect()
    expect = {}
    for i, lang in rows:
        if (i * 48271) % 100 < 20:
            expect[lang] = expect.get(lang, 0) + 1
    assert {r["lang"]: r["n_docs"] for r in raw} == expect
    assert {r["lang"]: r["n_docs"] for r in amo} == {
        k: v * 5.0 for k, v in expect.items()
    }
    # sample rate lands near 20%
    total = sum(expect.values())
    assert 0.1 < total / 1000 < 0.3
