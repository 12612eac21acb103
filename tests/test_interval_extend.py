"""Intervals.extend (ExtendedIntervalsSource) — defined-gap phrases and
padded leaves.

Gates: (1) the reference's testDefinedGaps enumeration replayed verbatim
on the TestIntervals field1 corpus (queries/src/test/.../TestIntervals.java
"testDefinedGaps": phrase(pease, extend(cold,1,1), porridge) → doc1 [3,7],
doc2 [0,4], doc4 [3,7]; minExtent 5); (2) engine vs pure-python oracle
float32 bit-parity over a randomized corpus for extend in slots, or-slots,
phrases, with gap/width filters and start-clipping at doc start.

Enumeration convention: this repo enumerates MINIMAL intervals everywhere
(segment._interval_enumerate's documented contract), so the raw
ExtendedIntervalIterator's duplicate/nested emissions (the Java test's
extend(w1, 5, MAX) case) fold into their minimal subset on BOTH engine and
oracle sides.
"""

import numpy as np
import pytest

from lucene_spark.index import build_index
from lucene_spark.oracle.pyindex import PyIndex
from lucene_spark.search import Searcher
from lucene_spark.search.query import (
    IntervalAtLeast,
    IntervalExtend,
    IntervalFilter,
    IntervalNear,
    IntervalPhrase,
)

FIELD1 = [
    "Nothing of interest to anyone here",
    "Pease porridge hot, pease porridge cold, pease porridge in the pot "
    "nine days old.  Some like it hot, some like it cold, some like it in "
    "the pot nine days old",
    "Pease porridge cold, pease porridge hot, pease porridge in the pot "
    "twelve days old.  Some like it cold, some like it hot, some like it "
    "in the fraggle",
    "Nor here, nowt hot going on in pease this one",
    "Pease porridge hot, pease porridge cold, pease porridge in the pot "
    "nine years old.  Some like it hot, some like it twelve",
    "Porridge is great",
    "",
]


def test_defined_gaps_reference_enumeration():
    idx = PyIndex(stopwords=None)
    for i, t in enumerate(FIELD1):
        idx.add(i, t)
    q = IntervalNear(
        (IntervalPhrase(("pease", IntervalExtend("cold", 1, 1), "porridge")),)
    )
    assert idx._interval_minimal(q) == {
        1: [(3, 7)], 2: [(0, 4)], 4: [(3, 7)]
    }
    assert q.min_extent == 5  # assertEquals(5, source.minExtent())


def test_extend_validation():
    with pytest.raises(ValueError):
        IntervalExtend("a", -1, 0)
    with pytest.raises(ValueError):
        IntervalExtend((), 0, 0)
    # minExtent = before + base + after (ExtendedIntervalsSource:126-132)
    assert IntervalNear((IntervalExtend("a", 2, 3),)).min_extent == 6


# --- engine vs oracle parity ---------------------------------------------

N_DOCS = 60
VOCAB = ["alpha", "beta", "gamma", "delta", "eps"] + [
    f"pad{i}" for i in range(8)
]


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(41)
    rows = []
    for i in range(N_DOCS):
        n = int(rng.integers(6, 40))
        toks = [VOCAB[int(t)] for t in rng.integers(0, len(VOCAB), size=n)]
        rows.append({"url": f"doc://{i:06d}", "text": " ".join(toks)})
    # clip corners: extended leaves whose padding crosses the doc start
    rows.append({"url": "doc://edge01", "text": "alpha beta gamma"})
    rows.append({"url": "doc://edge02", "text": "beta pad0 alpha pad1 gamma"})
    rows.append({"url": "doc://edge03", "text": "alpha pad0 pad1 beta"})
    return rows


@pytest.fixture(scope="module")
def searcher(spark, corpus, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("index_ext"))
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
    # standalone padded leaf (incl. doc-start clipping)
    IntervalNear((IntervalExtend("alpha", 1, 1),)),
    IntervalNear((IntervalExtend("alpha", 3, 0),)),
    IntervalNear((IntervalExtend("beta", 0, 2),)),
    # padded slot inside ordered / unordered
    IntervalNear((IntervalExtend("alpha", 1, 1), "beta"), max_gaps=4),
    IntervalNear(("alpha", IntervalExtend("beta", 2, 0)), ordered=False, max_gaps=5),
    IntervalNear((IntervalExtend("alpha", 0, 1), "beta", "gamma"), max_gaps=6),
    # or-slot of two padded alternatives (equal extents, different before)
    IntervalNear(
        ((IntervalExtend("alpha", 1, 0), IntervalExtend("delta", 0, 1)), "beta"),
        max_gaps=4,
    ),
    # defined-gaps phrase as a slot, alone and chained
    IntervalNear((IntervalPhrase(("alpha", IntervalExtend("pad0", 1, 1), "gamma")),)),
    IntervalNear(
        (IntervalPhrase(("beta", IntervalExtend("pad0", 0, 1))), "gamma"),
        max_gaps=8,
    ),
    # width filter over padded widths
    IntervalNear((IntervalExtend("alpha", 1, 1), "beta"), max_width=6),
    # clip-sensitive gaps filters (round-4 actual-width slop: engine
    # tracks per-occurrence clipped widths through the walks, the oracle
    # sums chain widths — independent implementations of
    # OrderedIntervalsSource.java:165-169 minus clipped width())
    IntervalNear((IntervalExtend("alpha", 2, 0), "beta"), max_gaps=0),
    IntervalNear((IntervalExtend("alpha", 3, 0), "beta"), max_gaps=1),
    IntervalNear((IntervalExtend("beta", 2, 1), "gamma"), ordered=False, max_gaps=0),
    IntervalNear(
        ((IntervalExtend("alpha", 2, 0), IntervalExtend("delta", 2, 0)), "beta"),
        max_gaps=0,
    ),
    IntervalNear(
        (IntervalExtend("alpha", 1, 0), IntervalExtend("beta", 2, 0), "gamma"),
        ordered=False, max_gaps=2,
    ),
    # inside an IntervalFilter and an atLeast
    IntervalFilter(
        IntervalNear((IntervalExtend("alpha", 1, 1), "beta"), max_gaps=6),
        IntervalNear(("pad0",)),
        "containing",
    ),
    IntervalAtLeast(
        (IntervalExtend("alpha", 1, 1), "beta", "gamma"), min_match=2
    ),
]


@pytest.mark.parametrize("q", GRID, ids=lambda q: repr(q)[:60])
def test_extend_parity(searcher, oracle, q):
    _check(searcher, oracle, q)
