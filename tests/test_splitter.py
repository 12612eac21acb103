"""MultiPassIndexSplitter analog (index/splitter.py)."""

import pytest

from lucene_spark.index import build_index
from lucene_spark.index.splitter import split_index
from lucene_spark.search import Searcher


@pytest.fixture(scope="module")
def corpus():
    words = ["alpha", "beta", "gamma", "delta"]
    return [
        (f"doc://{i:04d}", " ".join(words[(i + j) % 4] for j in range(6)))
        for i in range(30)
    ]


@pytest.fixture(scope="module")
def src_index(spark, corpus, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("split_src"))
    df = spark.createDataFrame(corpus, "url string, text string")
    build_index(spark, df, d, num_segments=3, stopwords=None)
    return d


def _urls(spark, path, query="alpha OR beta OR gamma OR delta"):
    s = Searcher(spark, path, stopwords=None)
    return {r["url"] for r in s.search(query, k=1000, with_url=True).collect()}


def test_round_robin_partition(spark, src_index, tmp_path_factory, corpus):
    out = str(tmp_path_factory.mktemp("split_rr"))
    parts = split_index(spark, src_index, out, 3)
    assert len(parts) == 3
    all_urls = [_urls(spark, p) for p in parts]
    # disjoint and complete
    union = set().union(*all_urls)
    assert union == {u for u, _t in corpus}
    assert sum(len(u) for u in all_urls) == len(corpus)
    # round-robin sizes: 30 docs % 3 -> 10 each
    assert sorted(len(u) for u in all_urls) == [10, 10, 10]


def test_sequential_partition(spark, src_index, tmp_path_factory, corpus):
    out = str(tmp_path_factory.mktemp("split_seq"))
    parts = split_index(spark, src_index, out, 4, seq=True)
    sizes = [len(_urls(spark, p)) for p in parts]
    # 30 // 4 = 7 per part, last takes the remainder
    assert sizes == [7, 7, 7, 9]


def test_part_scores_match_filtered_source(spark, src_index, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("split_sc"))
    parts = split_index(spark, src_index, out, 3)
    s_src = Searcher(spark, src_index, stopwords=None)
    src_hits = {
        r["url"]: r["score"]
        for r in s_src.search("alpha", k=1000, with_url=True).collect()
    }
    # per-doc freqs and lengths are unchanged; only collection stats
    # differ (each part is its own collection) — so every part hit must
    # exist in the source and rank by the same tf ordering
    for p in parts:
        s = Searcher(spark, p, stopwords=None)
        hits = s.search("alpha", k=1000, with_url=True).collect()
        assert hits, p
        for r in hits:
            assert r["url"] in src_hits


def test_split_rejects_tiny_or_degenerate(spark, src_index, tmp_path_factory):
    with pytest.raises(ValueError):
        split_index(spark, src_index, "/tmp/unused_split", 1)
