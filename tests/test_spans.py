"""Span query family (queries/spans analog): vectorized engine vs the
pure-python oracle's LITERAL port of the reference algorithms (pointer
loops + the NearSpansUnordered advance-min priority queue) —
rank-identical docids AND bit-identical float32 scores.
"""

import numpy as np
import pytest

from lucene_spark.index import build_index
from lucene_spark.oracle.pyindex import PyIndex
from lucene_spark.search import Searcher
from lucene_spark.search.query import BooleanQuery, TermQuery
from lucene_spark.search.spans import (
    SpanContaining,
    SpanFirst,
    SpanNear,
    SpanNot,
    SpanOr,
    SpanPositionRange,
    SpanTerm,
    SpanWithin,
)

N_DOCS = 90
VOCAB = ["alpha", "beta", "gamma", "delta", "eps", "zeta"] + [
    f"pad{i}" for i in range(12)
]


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(17)
    rows = []
    for i in range(N_DOCS):
        n = int(rng.integers(8, 60))
        toks = [VOCAB[int(t)] for t in rng.integers(0, len(VOCAB), size=n)]
        rows.append({"url": f"doc://{i:06d}", "text": " ".join(toks)})
    rows.append({"url": "doc://edge01", "text": "alpha beta alpha beta alpha"})
    rows.append({"url": "doc://edge02", "text": "alpha pad0 pad1 pad2 beta"})
    rows.append({"url": "doc://edge03", "text": "beta alpha"})
    rows.append({"url": "doc://edge04", "text": "alpha"})
    rows.append({"url": "doc://edge05", "text": "gamma beta alpha gamma beta"})
    rows.append({"url": "doc://edge06", "text": "alpha gamma beta gamma alpha"})
    return rows


@pytest.fixture(scope="module")
def index_dir(spark, corpus, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("index_sp"))
    df = spark.createDataFrame(
        [(r["url"], r["text"]) for r in corpus], "url string, text string"
    )
    build_index(spark, df, d, num_segments=3, stopwords=None)
    return d


@pytest.fixture(scope="module")
def searcher(spark, index_dir):
    return Searcher(spark, index_dir, stopwords=None)


@pytest.fixture(scope="module")
def oracle(corpus, searcher):
    dm = searcher._docmap_global().select("url", "docid").collect()
    url_to_docid = {r["url"]: r["docid"] for r in dm}
    idx = PyIndex(stopwords=None)
    for r in corpus:
        idx.add(url_to_docid[r["url"]], r["text"])
    return idx


def _check(searcher, oracle, q, k=10):
    from lucene_spark.oracle.pyindex import topk_sort

    expected = topk_sort(
        [(d, float(s)) for d, s in oracle.span_scores(q).items()], k
    )
    got = [(r["docid"], r["score"]) for r in searcher.search(q, k=k).collect()]
    assert [d for d, _ in got] == [d for d, _ in expected], (
        f"{q}: docids diverge\n got={got}\n exp={expected}"
    )
    for (gd, gs), (_ed, es) in zip(got, expected):
        assert np.float32(gs) == np.float32(es), (q, gd, gs, es)
    return got


def T(t):
    return SpanTerm(t)


GRID = [
    # ordered near at varied slops, incl. 3 clauses
    SpanNear((T("alpha"), T("beta")), slop=0),
    SpanNear((T("alpha"), T("beta")), slop=2),
    SpanNear((T("alpha"), T("beta")), slop=6),
    SpanNear((T("beta"), T("alpha")), slop=3),
    SpanNear((T("alpha"), T("beta"), T("gamma")), slop=5),
    SpanNear((T("gamma"), T("delta"), T("eps")), slop=8),
    # unordered near
    SpanNear((T("alpha"), T("beta")), slop=0, in_order=False),
    SpanNear((T("alpha"), T("beta")), slop=3, in_order=False),
    SpanNear((T("alpha"), T("beta"), T("gamma")), slop=7, in_order=False),
    SpanNear((T("delta"), T("zeta")), slop=10, in_order=False),
    # or / nested composition
    SpanOr((T("alpha"), T("gamma"))),
    SpanNear((SpanOr((T("alpha"), T("gamma"))), T("beta")), slop=2),
    SpanNear((T("pad0"), SpanOr((T("beta"), T("eps")))), slop=4),
    SpanNear(
        (SpanOr((T("alpha"), T("delta"))), SpanOr((T("beta"), T("gamma")))),
        slop=3,
        in_order=False,
    ),
    SpanOr((SpanNear((T("alpha"), T("beta")), slop=1), T("zeta"))),
    # near of near (composite sub-spans exercise width bookkeeping)
    SpanNear((SpanNear((T("alpha"), T("beta")), slop=2), T("gamma")), slop=6),
    SpanNear(
        (SpanNear((T("alpha"), T("beta")), slop=3), T("gamma")),
        slop=9,
        in_order=False,
    ),
    # not / position filters
    SpanNot(SpanNear((T("alpha"), T("beta")), slop=4), T("gamma")),
    SpanNot(SpanNear((T("alpha"), T("beta")), slop=4), T("gamma"), pre=2, post=2),
    SpanNot(T("alpha"), T("beta"), pre=1, post=1),
    SpanFirst(T("beta"), 3),
    SpanFirst(SpanNear((T("alpha"), T("beta")), slop=2), 8),
    SpanPositionRange(T("gamma"), 2, 12),
    # containment
    SpanContaining(SpanNear((T("alpha"), T("gamma")), slop=6), T("beta")),
    SpanWithin(SpanNear((T("alpha"), T("gamma")), slop=6), T("beta")),
    SpanContaining(
        SpanNear((T("alpha"), T("beta")), slop=8, in_order=False), T("pad0")
    ),
    SpanWithin(
        SpanNear((T("alpha"), T("beta")), slop=8, in_order=False),
        SpanNear((T("gamma"), T("pad1")), slop=1),
    ),
    # repeated terms: idf counts each distinct term once
    SpanNear((T("alpha"), T("alpha")), slop=3),
    SpanNear((T("alpha"), T("beta"), T("alpha")), slop=6),
]


@pytest.mark.parametrize("q", GRID, ids=lambda q: repr(q)[:70])
def test_span_parity(searcher, oracle, q):
    _check(searcher, oracle, q)


def test_span_inside_boolean(searcher, oracle):
    q = BooleanQuery(
        must=(TermQuery("gamma"), SpanNear((T("alpha"), T("beta")), slop=3))
    )
    expected_span = oracle.span_scores(
        SpanNear((T("alpha"), T("beta")), slop=3)
    )
    expected_term = oracle.term_scores("gamma")
    exp = {
        d: np.float32(expected_term[d] + expected_span[d])
        for d in set(expected_span) & set(expected_term)
    }
    got = {
        r["docid"]: r["score"] for r in searcher.search(q, k=200).collect()
    }
    assert set(got) == set(exp)
    for d in got:
        assert np.float32(got[d]) == np.float32(exp[d])


def test_span_filter_context(searcher, oracle):
    # MUST_NOT side: set algebra only
    q = BooleanQuery(
        must=(TermQuery("alpha"),),
        must_not=(SpanNear((T("beta"), T("gamma")), slop=1),),
    )
    excl = set(oracle.span_scores(SpanNear((T("beta"), T("gamma")), slop=1)))
    exp = {d for d in oracle.term_scores("alpha") if d not in excl}
    got = {r["docid"] for r in searcher.search(q, k=500).collect()}
    assert got == exp


def test_span_or_tie_enumeration(oracle):
    # SpanOr over the same term twice: duplicate spans both count
    q = SpanOr((T("alpha"), T("alpha")))
    single = oracle.span_scores(T("alpha"))
    double = oracle.span_scores(q)
    assert set(single) == set(double)
