"""Round-3 advice regressions — hand-computed reference vectors (the
engine and the python oracle shared each bug, so engine-vs-oracle parity
alone could not catch them).

1. ``_interval_or_enumerate`` must densify GLOBAL docids before the
   containment antichain keys rows as doc·2^31+end (10^12-docid global
   coordinates overflow int64 otherwise).
2. The max_gaps filter must subtract the ACTUAL clipped widths of
   extended slots whose start was clamped at the doc start
   (OrderedIntervalsSource.java:165-169 via IntervalIterator.width() on
   an ExtendedIntervalIterator), not the nominal slot extents.
3. Intervals.atLeast with min_match == len(sources): the reference
   rewrites to unordered(sources) for ALL source kinds
   (Intervals.java:567-570) and unordered dedups equal sources into
   RepeatingIntervalsSource — duplicate IntervalNear sources must take
   consecutive distinct occurrences, never share one.
"""

import numpy as np
import pytest

from lucene_spark.index import build_index
from lucene_spark.oracle.pyindex import PyIndex
from lucene_spark.search import Searcher
from lucene_spark.search.query import (
    IntervalAtLeast,
    IntervalExtend,
    IntervalNear,
    IntervalOr,
)
from lucene_spark.search.segment import _SegmentSearcher


# --- 1. or-enumerate densifies global docids ------------------------------


def test_or_enumerate_densifies_global_docids():
    """Two sources over docids near 10^12: doc·2^31 would overflow int64
    without densification; the antichain must still drop the strictly
    containing interval and keep every doc."""
    big = np.int64(10**12)
    docs_a = np.array([big, big + 7], dtype=np.int64)
    # source A: [2,5] on doc big (contains B's [3,4]); [0,1] on big+7
    a = (docs_a, np.array([2, 0], dtype=np.int64),
         np.array([5, 1], dtype=np.int64), 1)
    b = (np.array([big], dtype=np.int64), np.array([3], dtype=np.int64),
         np.array([4], dtype=np.int64), 1)

    na, nb = IntervalNear(("a",)), IntervalNear(("b",))

    class Fake:
        def _enumerate_interval_source(self, src):
            return a if src == na else b

        _interval_or_enumerate = _SegmentSearcher._interval_or_enumerate

    q = IntervalOr((na, nb))
    d, s, e, _x = Fake()._interval_or_enumerate(q)
    got = sorted(zip(d.tolist(), s.tolist(), e.tolist()))
    assert got == [(int(big), 3, 4), (int(big) + 7, 0, 1)]


# --- 2/3. tiny-corpus fixtures -------------------------------------------

CORPUS = [
    ("doc://0", "a x b"),
    ("doc://1", "alpha beta pad0 alpha beta"),
    ("doc://2", "alpha beta pad0"),
    ("doc://3", "filler words here"),
]


@pytest.fixture(scope="module")
def searcher(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("index_advice"))
    df = spark.createDataFrame(CORPUS, "url string, text string")
    build_index(spark, df, d, num_segments=2, stopwords=None)
    return Searcher(spark, d, stopwords=None)


@pytest.fixture(scope="module")
def docmap(searcher):
    dm = searcher._docmap_global().select("url", "docid").collect()
    return {r["url"]: r["docid"] for r in dm}


@pytest.fixture(scope="module")
def oracle(searcher, docmap):
    idx = PyIndex(stopwords=None)
    for url, text in CORPUS:
        idx.add(docmap[url], text)
    return idx


def _hit_docids(searcher, q, k=10):
    return sorted(r["docid"] for r in searcher.search(q, k=k).collect())


# --- 2. clipped-width slop -----------------------------------------------


def test_max_gaps_uses_clipped_widths(searcher, oracle, docmap):
    """doc 'a x b', ordered(extend(a, before=2), b): 'a' sits at the doc
    start so the extension clips to actual width 1; the chain [0,2] has
    width 3 and Σ actual sub widths 1+1=2 ⇒ slop 1. max_gaps=0 must
    REJECT (the nominal ext_total 3+1=4 gave slop −1 and kept it)."""
    q0 = IntervalNear((IntervalExtend("a", 2, 0), "b"), max_gaps=0)
    assert oracle._interval_minimal(q0) == {}
    assert _hit_docids(searcher, q0) == []
    # positive control: max_gaps=1 admits exactly that interval
    q1 = IntervalNear((IntervalExtend("a", 2, 0), "b"), max_gaps=1)
    d0 = docmap["doc://0"]
    assert oracle._interval_minimal(q1) == {d0: [(0, 2)]}
    assert _hit_docids(searcher, q1) == [d0]
    # unclipped occurrences still use nominal widths: 'alpha beta' with
    # extend(beta, 1, 0) — beta at 1 clips by 0, widths 1+2=3, span [0,1]
    # ⇒ slop −1, kept at max_gaps=0
    q2 = IntervalNear(("alpha", IntervalExtend("beta", 1, 0)),
                      ordered=False, max_gaps=0)
    hits = _hit_docids(searcher, q2)
    assert docmap["doc://1"] in hits and docmap["doc://2"] in hits


def test_max_gaps_clipped_widths_unordered(searcher, oracle, docmap):
    """Same clip rule on the unordered walk: doc 'a x b' with
    unordered(extend(b, before=3), a): b at 2 clips to start 0 ⇒ actual
    width 3 (nominal 4); span [0,2] width 3, Σ=3+1=4 ⇒ slop −1 keeps at
    max_gaps=0. With extend(b, before=9): clips to width 3 as well but
    nominal 10 — the old nominal filter computed slop 3−11=−8; actual
    slop is still −1. Both must agree engine↔oracle and match hand math."""
    d0 = docmap["doc://0"]
    for before in (3, 9):
        q = IntervalNear((IntervalExtend("b", before, 0), "a"),
                         ordered=False, max_gaps=0)
        assert oracle._interval_minimal(q).get(d0) == [(0, 2)]
        assert d0 in _hit_docids(searcher, q)


# --- 3. atLeast duplicate-source dedup -----------------------------------


def test_atleast_duplicate_near_requires_distinct_occurrences(
    searcher, oracle, docmap
):
    near = IntervalNear(("alpha", "beta"))
    q = IntervalAtLeast((near, near), min_match=2)
    d1 = docmap["doc://1"]  # two occurrences: [0,1], [3,4]
    d2 = docmap["doc://2"]  # ONE occurrence: [0,1]
    # Repeating window over doc://1: [0,4] (consecutive occurrences);
    # doc://2's single occurrence can NOT satisfy both copies
    per_doc = oracle._interval_atleast(q)
    assert d2 not in per_doc
    assert [t[:2] for t in per_doc[d1]] == [(0, 4)]
    hits = _hit_docids(searcher, q)
    assert d1 in hits and d2 not in hits


def test_atleast_duplicate_near_gaps_uses_copy_widths(
    searcher, oracle, docmap
):
    """Rep.width() sums every copy's width: window [0,4] over occurrences
    [0,1],[3,4] has width 5 and Σ copy widths 4 ⇒ slop 1. max_gaps=0
    rejects, max_gaps=1 keeps."""
    near = IntervalNear(("alpha", "beta"))
    d1 = docmap["doc://1"]
    q0 = IntervalAtLeast((near, near), min_match=2, max_gaps=0)
    assert d1 not in oracle._interval_atleast(q0)
    assert _hit_docids(searcher, q0) == []
    q1 = IntervalAtLeast((near, near), min_match=2, max_gaps=1)
    assert [t[:2] for t in oracle._interval_atleast(q1)[d1]] == [(0, 4)]
    assert _hit_docids(searcher, q1) == [d1]


def test_atleast_distinct_sources_unchanged(searcher, oracle, docmap):
    """Distinct sources with min_match == n keep their behavior (engine
    vs oracle float32 parity on the tiny corpus)."""
    q = IntervalAtLeast(
        (IntervalNear(("alpha", "beta")), IntervalNear(("pad0",))),
        min_match=2,
    )
    expected = oracle.search_query(q, k=10)
    got = [(r["docid"], r["score"])
           for r in searcher.search(q, k=10).collect()]
    assert [d for d, _ in got] == [d for d, _ in expected]
    for (gd, gs), (_ed, es) in zip(got, expected):
        assert np.float32(gs) == np.float32(es), (gd, gs, es)
