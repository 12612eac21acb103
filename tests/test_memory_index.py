"""MemoryIndex (search/memory.py ← memory/MemoryIndex.java): one-doc index,
single-doc stats, full-AST percolation."""

import pytest

from lucene_spark.constants import ENGLISH_STOP_WORDS
from lucene_spark.index import build_index
from lucene_spark.search import Searcher
from lucene_spark.search.memory import MemoryIndex, memory_index_matches

DOC = (
    "stream processing engines window the stream and join the batches "
    "stream state lives in the store"
)


def test_scores_match_one_doc_searcher(spark, tmp_path):
    """THE MemoryIndex contract: search(q) == what an IndexSearcher over an
    index containing only that document scores (float32 both sides)."""
    d = str(tmp_path / "one_doc_idx")
    df = spark.createDataFrame([("doc://0", DOC)], "url string, text string")
    build_index(spark, df, d, num_segments=1, stopwords=None)
    s = Searcher(spark, d)
    mi = MemoryIndex(DOC)

    for q in [
        "stream",
        "stream AND window",
        "stream OR nosuchterm",
        '"stream processing"',
        '"stream the"~3',
        "stream AND NOT nosuchterm",
        "window^2.5",
    ]:
        hits = s.search(q, k=1).collect()
        expect = float(hits[0]["score"]) if hits else 0.0
        assert mi.search(q) == pytest.approx(expect, rel=1e-6), q


def test_no_match_and_not_semantics():
    mi = MemoryIndex(DOC)
    assert mi.search("nosuchterm") == 0.0
    assert not mi.matches("stream AND nosuchterm")
    assert mi.matches("stream AND NOT nosuchterm")
    assert not mi.matches("stream AND NOT window")
    # sloppy phrase matches only within slop
    assert mi.matches('"engines stream"~2')
    assert not mi.matches('"engines store"~2')


def test_single_doc_stats():
    """df=1, N=1 -> idf = ln(4/3); one term occurrence in an 8-token doc
    where avgdl == dl: tf_part = 1 + 1/k1 -> score = idf*(1/(1+k1))."""
    import numpy as np

    text = "alpha beta gamma delta epsilon zeta eta theta"
    mi = MemoryIndex(text)
    idf = np.float32(np.log(np.float32(1.0 + 0.5 / 1.5)))
    # dl=8 quantizes to 8 exactly; avgdl=8 -> norm term = k1
    expect = idf - idf / np.float32(1.0 + 1.0 / 1.2)
    assert mi.search("alpha") == pytest.approx(float(expect), rel=1e-6)


def test_distributed_percolation(spark):
    docs = spark.createDataFrame(
        [
            (0, "stream processing with windows"),
            (1, "batch jobs and table scans"),
            (2, "stream the window stream"),
            (3, None),
        ],
        "doc_id long, text string",
    )
    queries = {
        "q_term": "stream",
        "q_and": "stream AND window",
        "q_phrase": '"stream processing"',
        "q_not": "batch AND NOT stream",
    }
    out = memory_index_matches(docs, queries)
    got = {(int(r["doc_id"]), r["query_id"]) for r in out.collect()}
    assert got == {
        (0, "q_term"),
        (2, "q_term"),
        (2, "q_and"),
        (0, "q_phrase"),
        (1, "q_not"),
    }


def test_stopword_analyzer_path():
    mi = MemoryIndex("the stream and the window", stopwords=ENGLISH_STOP_WORDS)
    assert mi.matches("stream AND window")
    assert not mi.matches("the")


def test_percolate_equals_brute_force(spark):
    from lucene_spark.search.memory import percolate
    from lucene_spark.search.query import BooleanQuery, PrefixQuery, TermQuery

    docs = spark.createDataFrame(
        [
            (0, "stream processing with windows"),
            (1, "batch jobs and table scans"),
            (2, "stream the window stream"),
            (3, "prefixable content here"),
            (4, None),
        ],
        "doc_id long, text string",
    )
    queries = {
        "q_term": "stream",
        "q_and": "stream AND window",
        "q_phrase": '"stream processing"',
        "q_not": "batch AND NOT stream",         # term-filterable (has MUST)
        "q_pure_not": BooleanQuery(must_not=(TermQuery("stream"),)),  # full scan
        "q_prefix": PrefixQuery("prefix"),        # full scan (expansion)
    }
    got = {
        (int(r["doc_id"]), r["query_id"])
        for r in percolate(docs, queries).collect()
    }
    brute = {
        (int(r["doc_id"]), r["query_id"])
        for r in memory_index_matches(docs, queries).collect()
    }
    assert got == brute
    assert (3, "q_prefix") in got  # full-scan bucket still percolates
    # pure negation matches NOTHING (Lucene's only-prohibited-clauses
    # semantics) — the full-scan path checked every doc and agreed
    assert not any(q == "q_pure_not" for _d, q in got)


def test_percolate_scores_match_memory_index(spark):
    from lucene_spark.search.memory import percolate

    docs = spark.createDataFrame(
        [(0, "stream processing with windows")], "doc_id long, text string"
    )
    out = {r["query_id"]: float(r["score"])
           for r in percolate(docs, {"q": "stream AND processing"}).collect()}
    mi = MemoryIndex("stream processing with windows")
    assert out["q"] == pytest.approx(mi.search("stream AND processing"), rel=1e-7)
