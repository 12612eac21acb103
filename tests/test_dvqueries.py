"""Sandbox doc-value queries + SortRescorer.

Reference behavior: sandbox/search/DocValuesNumbersQuery.java:55 (constant
score, dv IN set), sandbox/search/MultiRangeQuery.java:60 (single-pass OR
of ranges, :169 mergeOverlappingRanges), queries/function/
FunctionRangeQuery.java:43 (range on a ValueSource, score = value), and
core/search/SortRescorer.java:35 (re-sort a first-pass window by a sort
field, original score preserved). DuckDB-oracle gate rows live in
test_gate.py (dv_numbers_query, multi_range_query, function_range,
sort_rescore).
"""

import pytest

from lucene_spark.fixtures import generate_webtext
from lucene_spark.index.builder import build_index
from lucene_spark.index.deletes import add_deletes_by_url
from lucene_spark.search.searcher import Searcher


def _rank(i: int) -> float | None:
    return None if i % 7 == 0 else float((i * 13) % 101)


@pytest.fixture(scope="module")
def corpus():
    return generate_webtext(300)


@pytest.fixture(scope="module")
def index_dir(spark, corpus, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("dvqidx"))
    rows = [(r["url"], r["text"], _rank(i)) for i, r in enumerate(corpus)]
    df = spark.createDataFrame(rows, "url string, text string, rank double")
    build_index(
        spark, df, d, num_segments=3, analyzer="simple",
        doc_values={"rank": "rank"},
    )
    return d


def _urls(spark, s, out):
    dm = s._docmap_global().select("docid", "url")
    return {
        (r["url"], r["score"]) for r in out.join(dm, "docid").collect()
    }


def test_doc_values_numbers(spark, corpus, index_dir):
    s = Searcher(spark, index_dir, analyzer="simple", mode="double")
    values = [3.0, 17.0, 55.0, 90.0]
    got = _urls(spark, s, s.doc_values_numbers("rank", values, boost=2.5))
    want = {
        (r["url"], 2.5)
        for i, r in enumerate(corpus)
        if _rank(i) in set(values)
    }
    assert got == want and len(want) > 0


def test_multi_range_merges_overlaps(spark, corpus, index_dir):
    s = Searcher(spark, index_dir, analyzer="simple", mode="double")
    ranges = [(10.0, 30.0), (25.0, 40.0), (80.0, 95.0)]
    got = _urls(spark, s, s.multi_range("rank", ranges))
    want = {
        (r["url"], 1.0)
        for i, r in enumerate(corpus)
        if _rank(i) is not None
        and any(lo <= _rank(i) <= hi for lo, hi in ranges)
    }
    assert got == want and len(want) > 0
    # empty range list matches nothing
    assert s.multi_range("rank", []).count() == 0


def test_function_range_scores_value(spark, corpus, index_dir):
    s = Searcher(spark, index_dir, analyzer="simple", mode="double")
    out = s.function_range("dv['rank']", 20.0, 60.0,
                           include_lower=False, include_upper=True)
    got = _urls(spark, s, out)
    want = {
        (r["url"], _rank(i))
        for i, r in enumerate(corpus)
        if _rank(i) is not None and 20.0 < _rank(i) <= 60.0
    }
    assert got == want and len(want) > 0


def test_sort_rescore_matches_brute_force(spark, corpus, index_dir):
    s = Searcher(spark, index_dir, analyzer="simple", mode="double")
    window, k = 40, 10
    first = s.search("w0001 OR w0002", k=window)
    dm = s._docmap_global().select("docid", "url")
    fr = {r["docid"]: r["score"] for r in first.collect()}
    url_of = {r["docid"]: r["url"] for r in dm.collect()}
    rank_of = {r["url"]: _rank(i) for i, r in enumerate(corpus)}
    expect = sorted(
        fr,
        key=lambda d: (
            rank_of[url_of[d]] is None,           # missing last
            -(rank_of[url_of[d]] or 0.0),         # value DESC
            d,                                    # docid ASC
        ),
    )[:k]
    out = s.sort_rescore("w0001 OR w0002", "rank", window=window, k=k)
    rows = out.collect()
    assert [r["docid"] for r in rows] == expect
    for r in rows:
        assert r["score"] == pytest.approx(fr[r["docid"]])
        assert r["sort_val"] == rank_of[url_of[r["docid"]]]


def test_dv_queries_respect_deletes(spark, corpus, index_dir, tmp_path):
    import shutil

    d = str(tmp_path / "delidx")
    shutil.copytree(index_dir, d)
    s0 = Searcher(spark, d, analyzer="simple", mode="double")
    hit = s0.doc_values_numbers("rank", [3.0, 17.0, 55.0, 90.0])
    dm = s0._docmap_global().select("docid", "url")
    victims = [
        r["url"] for r in hit.join(dm, "docid").limit(2).collect()
    ]
    assert victims
    add_deletes_by_url(
        spark, d, spark.createDataFrame([(u,) for u in victims], "url string")
    )
    s = Searcher(spark, d, analyzer="simple", mode="double")
    left = {
        r["url"]
        for r in s.doc_values_numbers("rank", [3.0, 17.0, 55.0, 90.0])
        .join(s._docmap_global().select("docid", "url"), "docid")
        .collect()
    }
    assert left.isdisjoint(set(victims))
    # the other dv-side queries share the same liveDocs mask
    fr = {
        r["url"]
        for r in s.function_range("dv['rank']", 0.0, 200.0)
        .join(s._docmap_global().select("docid", "url"), "docid")
        .collect()
    }
    assert fr.isdisjoint(set(victims))
