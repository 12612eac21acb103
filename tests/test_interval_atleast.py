"""Intervals.atLeast (MinimumShouldMatchIntervalsSource) — three gates:

1. The reference's OWN unit-test expectations replayed verbatim: the
   TestIntervals corpus (queries/src/test/.../TestIntervals.java:67-86)
   with the exact per-doc interval enumerations and gaps the Java tests
   assert (testMinimumShouldMatch :770-811, testMinShouldMatch2 :813-846,
   testNoMatchMinShouldMatch :853-856).
2. Engine vs pure-python oracle parity (rank-identical docids AND
   bit-identical float32 scores) over a randomized corpus and a grid of
   atLeast shapes, including composition inside IntervalFilter and
   BooleanQuery.
3. Factory degenerate arms (Intervals.java:567-579) via rewrite.
"""

import numpy as np
import pytest

from lucene_spark.index import build_index
from lucene_spark.oracle.pyindex import PyIndex
from lucene_spark.search import Searcher
from lucene_spark.search.query import (
    BooleanQuery,
    ConstantScoreQuery,
    IntervalAtLeast,
    IntervalFilter,
    IntervalNear,
    IntervalPhrase,
    MatchNoDocsQuery,
    TermQuery,
    rewrite,
)

# TestIntervals.java:67-75 (field1) and :80-86 (field2), StandardAnalyzer
# with an empty stop set → plain lowercase word tokens
FIELD1_DOCS = [
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
FIELD2_DOCS = [
    "In Xanadu did Kubla Khan a stately pleasure dome decree",
    "Where Alph the sacred river ran through caverns measureless to man",
    "a b a c b a b c",
    "So thrice five miles of fertile ground",
    "Pease hot porridge porridge",
    "w1 w2 w3 w4 w1 w6 w3 w8 w4 w7 w1 w6",
    "the quick brown fox jumps over the lazy dog",
]


def _pyindex(docs):
    idx = PyIndex(stopwords=None)
    for i, text in enumerate(docs):
        idx.add(i, text)
    return idx


# --- 1. the reference's own expected enumerations -----------------------


def test_reference_enumeration_field1():
    """testMinimumShouldMatch (TestIntervals.java:770-811): expected
    per-doc (start, end) pairs, verbatim from checkIntervals."""
    idx = _pyindex(FIELD1_DOCS)
    q = IntervalAtLeast(
        ("porridge", "hot", "twelve", "nine", "pease"), min_match=3
    )
    got = idx._interval_atleast(q)
    expected = {
        1: [(0, 2), (1, 3), (2, 4), (6, 11), (7, 17)],
        2: [(3, 5), (4, 6), (5, 7), (6, 11), (7, 21)],
        4: [(0, 2), (1, 3), (2, 4), (6, 11), (7, 17), (11, 21)],
    }
    assert got == expected
    assert q.min_extent == 3  # assertEquals(3, source.minExtent())


def test_reference_gaps_field1():
    """assertGaps(source, 1, "field1", {0, 0, 0, 3, 8})."""
    idx = _pyindex(FIELD1_DOCS)
    q = IntervalAtLeast(
        ("porridge", "hot", "twelve", "nine", "pease"), min_match=3
    )
    # gaps ride through the max_gaps filter: exactly the intervals with
    # gaps <= g survive, per the Java-asserted gap list
    by_cap = {
        g: idx._interval_atleast(
            IntervalAtLeast(q.sources, min_match=3, max_gaps=g)
        ).get(1, [])
        for g in (-0, 0, 2, 3, 7, 8)
    }
    assert by_cap[0] == [(0, 2), (1, 3), (2, 4)]  # three gap-0 intervals
    assert by_cap[2] == [(0, 2), (1, 3), (2, 4)]
    assert by_cap[3] == [(0, 2), (1, 3), (2, 4), (6, 11)]  # + gap-3
    assert by_cap[7] == [(0, 2), (1, 3), (2, 4), (6, 11)]
    assert by_cap[8] == [(0, 2), (1, 3), (2, 4), (6, 11), (7, 17)]  # + gap-8


def test_reference_enumeration_field2_subtree_source():
    """testMinShouldMatch2 (TestIntervals.java:813-846): a full unordered
    subtree as one source; doc 1 emits [0,4] then [1,5] and nothing more
    (the early-exhaustion give-up ends the stream)."""
    idx = _pyindex(FIELD2_DOCS)
    q = IntervalAtLeast(
        (
            IntervalNear(("alph", "ran"), ordered=False),
            "where",
            "river",
        ),
        min_match=2,
    )
    got = idx._interval_atleast(q)
    assert got.get(1) == [(0, 4), (1, 5)]


def test_reference_no_match_when_too_few_sources():
    """testNoMatchMinShouldMatch (:853-856) via the factory arm
    (Intervals.java:571-577): minShouldMatch > |sources| matches nothing."""
    q = IntervalAtLeast(("a", "b"), min_match=4)
    assert isinstance(rewrite(q), MatchNoDocsQuery)


def test_factory_m_equals_n_is_unordered():
    """Intervals.java:568-569: atLeast(n, n sources) == unordered."""
    q = rewrite(IntervalAtLeast(("alpha", "beta"), min_match=2, max_gaps=3))
    assert q == IntervalNear(("alpha", "beta"), ordered=False, max_gaps=3)


def test_validation():
    with pytest.raises(ValueError):
        IntervalAtLeast(("a", "b", "c"), min_match=0)
    with pytest.raises(ValueError):
        IntervalAtLeast(("a", "b", "c"), min_match=2, pivot=0.0)


def test_min_extent_sums_smallest_m():
    """MinimumShouldMatchIntervalsSource.minExtent (:357-367): sort the
    sub extents, sum the smallest min_match of them."""
    q = IntervalAtLeast(
        (IntervalPhrase(("a", "b", "c")), "x", IntervalPhrase(("d", "e"))),
        min_match=2,
    )
    assert q.min_extent == 3  # 1 + 2, the three extents being (3, 1, 2)


# --- 2. engine vs oracle parity ------------------------------------------

N_DOCS = 70
VOCAB = ["alpha", "beta", "gamma", "delta", "eps", "zeta"] + [
    f"pad{i}" for i in range(10)
]


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(23)
    rows = []
    for i in range(N_DOCS):
        n = int(rng.integers(6, 50))
        toks = [VOCAB[int(t)] for t in rng.integers(0, len(VOCAB), size=n)]
        rows.append({"url": f"doc://{i:06d}", "text": " ".join(toks)})
    # corners: tie starts, exhaustion mid-doc, single occurrences, repeats
    rows.append({"url": "doc://edge01", "text": "alpha beta gamma"})
    rows.append(
        {"url": "doc://edge02", "text": "alpha beta pad0 pad1 gamma beta"}
    )
    rows.append({"url": "doc://edge03", "text": "alpha pad0 beta pad1 alpha"})
    rows.append({"url": "doc://edge04", "text": "alpha"})
    rows.append(
        {"url": "doc://edge05", "text": "gamma alpha alpha beta pad2 gamma"}
    )
    return rows


@pytest.fixture(scope="module")
def searcher(spark, corpus, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("index_al"))
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
    IntervalAtLeast(("alpha", "beta", "gamma"), min_match=2),
    IntervalAtLeast(("alpha", "beta", "gamma"), min_match=2, max_gaps=0),
    IntervalAtLeast(("alpha", "beta", "gamma"), min_match=2, max_gaps=3),
    IntervalAtLeast(("alpha", "beta", "gamma"), min_match=2, max_width=4),
    IntervalAtLeast(("alpha", "beta", "gamma", "delta"), min_match=3),
    IntervalAtLeast(
        ("alpha", "beta", "gamma", "delta", "eps"), min_match=2, max_gaps=2
    ),
    IntervalAtLeast(
        ("alpha", "beta", "gamma"), min_match=2, pivot=0.5, boost=2.5
    ),
    # or-tuple source (Intervals.or) and phrase source (Intervals.phrase)
    IntervalAtLeast(
        (("alpha", "delta"), "beta", "gamma"), min_match=2, max_gaps=4
    ),
    IntervalAtLeast(
        (IntervalPhrase(("alpha", "beta")), "gamma", "delta"), min_match=2
    ),
    # full subtree source
    IntervalAtLeast(
        (
            IntervalNear(("alpha", "beta"), ordered=False, max_gaps=2),
            "gamma",
            "delta",
        ),
        min_match=2,
    ),
]


@pytest.mark.parametrize("q", GRID, ids=lambda q: repr(q)[:60])
def test_atleast_parity(searcher, oracle, q):
    _check(searcher, oracle, q)


def test_atleast_in_boolean_and_constant_score(searcher, oracle):
    q = BooleanQuery(
        must=(
            TermQuery("delta"),
            IntervalAtLeast(("alpha", "beta", "gamma"), min_match=2),
        )
    )
    _check(searcher, oracle, q)
    q2 = ConstantScoreQuery(
        IntervalAtLeast(("alpha", "beta", "gamma"), min_match=2), boost=1.5
    )
    _check(searcher, oracle, q2)


def test_atleast_as_filter_source(searcher, oracle):
    """FilteringIntervalsSource composes over the EMITTED stream — the
    atLeast side of Intervals.containing keeps its non-minimal emissions."""
    q = IntervalFilter(
        IntervalAtLeast(("alpha", "beta", "gamma"), min_match=2),
        IntervalNear(("pad0",)),
        "containing",
    )
    _check(searcher, oracle, q)
    q2 = IntervalFilter(
        IntervalNear(("alpha", "beta"), ordered=False, max_gaps=6),
        IntervalAtLeast(("gamma", "delta", "pad1"), min_match=2),
        "contained_by",
    )
    _check(searcher, oracle, q2)
