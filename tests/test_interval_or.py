"""Top-level Intervals.or over sources (DisjunctionIntervalsSource),
Intervals.unorderedNoOverlaps (= or(ordered(a,b), ordered(b,a)),
Intervals.java:446-448), and Intervals.fixField (:456).

Engine vs pure-python oracle: rank-identical docids AND bit-identical
float32 scores over a randomized corpus; plus semantic asserts (the
no-overlaps contract, cross-source re-minimalization, fixField's term
namespace rewrite)."""

import numpy as np
import pytest

from lucene_spark.index import build_index
from lucene_spark.oracle.pyindex import PyIndex
from lucene_spark.search import Searcher
from lucene_spark.search.query import (
    IntervalExtend,
    IntervalFilter,
    IntervalNear,
    IntervalOr,
    IntervalPhrase,
    fix_field,
    rewrite,
    unordered_no_overlaps,
)

N_DOCS = 60
VOCAB = ["alpha", "beta", "gamma", "delta", "eps"] + [
    f"pad{i}" for i in range(8)
]


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(57)
    rows = []
    for i in range(N_DOCS):
        n = int(rng.integers(6, 40))
        toks = [VOCAB[int(t)] for t in rng.integers(0, len(VOCAB), size=n)]
        rows.append({"url": f"doc://{i:06d}", "text": " ".join(toks)})
    rows.append({"url": "doc://edge01", "text": "alpha beta"})
    rows.append({"url": "doc://edge02", "text": "beta alpha"})
    rows.append({"url": "doc://edge03", "text": "alpha pad0 pad1 beta alpha"})
    return rows


@pytest.fixture(scope="module")
def searcher(spark, corpus, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("index_ior"))
    df = spark.createDataFrame(
        [(r["url"], r["text"]) for r in corpus], "url string, text string"
    )
    build_index(spark, df, d, num_segments=3, stopwords=None)
    return Searcher(spark, d, stopwords=None)


@pytest.fixture(scope="module")
def oracle(corpus, searcher):
    dm = searcher._docmap_global().select("url", "docid").collect()
    url_to_docid = {r["url"]: r["docid"] for r in dm}
    idx = PyIndex(stopwords=None)
    for r in corpus:
        idx.add(url_to_docid[r["url"]], r["text"])
    return idx


def _check(searcher, oracle, q, k=10):
    expected = oracle.search_query(q, k=k)
    got = [(r["docid"], r["score"]) for r in searcher.search(q, k=k).collect()]
    assert [d for d, _ in got] == [d for d, _ in expected], (
        f"{q}: docids diverge\n got={got}\n exp={expected}"
    )
    for (gd, gs), (_ed, es) in zip(got, expected):
        assert np.float32(gs) == np.float32(es), (q, gd, gs, es)
    return got


GRID = [
    unordered_no_overlaps("alpha", "beta"),
    unordered_no_overlaps("alpha", "beta", pivot=0.5, boost=2.0),
    unordered_no_overlaps(IntervalPhrase(("alpha", "beta")), "gamma"),
    unordered_no_overlaps(IntervalExtend("alpha", 1, 0), "beta"),
    # heterogeneous sources with different minExtents (min wins)
    IntervalOr(
        (
            IntervalNear(("alpha", "beta", "gamma"), max_gaps=4),
            IntervalNear(("delta", "eps"), ordered=False, max_gaps=2),
        )
    ),
    # or of a filtered source and a plain one
    IntervalOr(
        (
            IntervalFilter(
                IntervalNear(("alpha", "beta"), ordered=False, max_gaps=5),
                IntervalNear(("pad0",)),
                "containing",
            ),
            IntervalNear(("gamma", "delta"), max_gaps=3),
        )
    ),
]


@pytest.mark.parametrize("q", GRID, ids=lambda q: repr(q)[:60])
def test_interval_or_parity(searcher, oracle, q):
    _check(searcher, oracle, q)


def test_no_overlaps_contract(oracle):
    """unorderedNoOverlaps('alpha','beta'): edge docs — adjacency in both
    orders matches; a doc where the only co-occurrence would overlap
    (impossible for single-position terms at distinct positions) always
    matches when both present at different positions."""
    q = unordered_no_overlaps("alpha", "beta")
    got = oracle._interval_or(q)
    # every enumerated interval covers both terms without overlap: width >= 2
    for _d, ivs in got.items():
        for s, e in ivs:
            assert e - s + 1 >= 2


def test_or_reminimalizes_across_sources(oracle):
    """A source's interval strictly containing another source's is
    dropped — or(ordered(alpha, beta), ordered(alpha)) reduces every doc
    with alpha to its [p,p] singleton intervals."""
    q = IntervalOr(
        (IntervalNear(("alpha", "beta")), IntervalNear(("alpha",)))
    )
    got = oracle._interval_or(q)
    for _d, ivs in got.items():
        assert all(e == s for s, e in ivs)  # only the singletons survive
    assert q.min_extent == 1  # min over sub minExtents


def test_rewrite_single_source():
    inner = IntervalNear(("alpha", "beta"), max_gaps=2)
    q = rewrite(IntervalOr((inner,), pivot=0.5, boost=2.0))
    assert q == IntervalNear(
        ("alpha", "beta"), max_gaps=2, pivot=0.5, boost=2.0
    )
    with pytest.raises(ValueError):
        IntervalOr(())


def test_fix_field_rewrites_namespace():
    from lucene_spark.index.builder import field_term

    q = fix_field(
        "title",
        IntervalNear(
            ("alpha", (IntervalExtend("beta", 1, 0), IntervalExtend("gamma", 1, 0)))
        ),
    )
    terms = {t for s in q.slots for leaf in s for t in leaf}
    assert terms == {
        field_term("title", "alpha"),
        field_term("title", "beta"),
        field_term("title", "gamma"),
    }


def test_fix_field_end_to_end(spark, tmp_path_factory):
    """fixField against a real two-field index: the same interval matches
    only through the fixed field's positions."""
    from lucene_spark.search.query import IntervalNear

    docs = [
        ("doc://0", "alpha beta here", "gamma delta"),
        ("doc://1", "gamma delta here", "alpha beta"),
    ]
    d = str(tmp_path_factory.mktemp("idx_fixfield"))
    df = spark.createDataFrame(docs, "url string, body string, title string")
    build_index(
        spark, df, d, num_segments=1, stopwords=None,
        fields={"body": "body", "title": "title"},
    )
    s = Searcher(spark, d, stopwords=None)
    q = fix_field("title", IntervalNear(("alpha", "beta"), max_gaps=0))
    got = {r["url"] for r in s.search(q, k=10, with_url=True).collect()}
    assert got == {"doc://1"}
