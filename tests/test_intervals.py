"""IntervalNear (queries/intervals analog): engine vs pure-python oracle —
rank-identical docids AND bit-identical float32 scores — plus an oracle
self-check against a full cartesian enumeration of minimal intervals.

Reference semantics: OrderedIntervalsSource / UnorderedIntervalsSource
minimal-interval enumeration, FilteredIntervalsSource maxgaps/maxwidth,
IntervalScorer sloppy freq, IntervalScoreFunction saturation.
"""

from itertools import product

import numpy as np
import pytest

from lucene_spark.index import build_index
from lucene_spark.oracle.pyindex import PyIndex
from lucene_spark.search import Searcher
from lucene_spark.search.query import (
    BooleanQuery,
    IntervalNear,
    MatchNoDocsQuery,
    TermQuery,
    rewrite,
)

N_DOCS = 80
# small dense vocab so every doc has many co-occurrences at varied gaps
VOCAB = ["alpha", "beta", "gamma", "delta", "eps", "zeta"] + [
    f"pad{i}" for i in range(12)
]


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(7)
    rows = []
    for i in range(N_DOCS):
        n = int(rng.integers(8, 60))
        toks = [VOCAB[int(t)] for t in rng.integers(0, len(VOCAB), size=n)]
        rows.append({"url": f"doc://{i:06d}", "text": " ".join(toks)})
    # hand-built corners: adjacency runs, missing terms, single-token doc
    rows.append({"url": "doc://edge01", "text": "alpha beta alpha beta alpha"})
    rows.append({"url": "doc://edge02", "text": "alpha pad0 pad1 pad2 beta"})
    rows.append({"url": "doc://edge03", "text": "beta alpha"})
    rows.append({"url": "doc://edge04", "text": "alpha"})
    rows.append({"url": "doc://edge05", "text": "gamma beta alpha gamma beta"})
    return rows


@pytest.fixture(scope="module")
def index_dir(spark, corpus, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("index_iv"))
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
    expected = oracle.search_query(q, k=k)
    got = [(r["docid"], r["score"]) for r in searcher.search(q, k=k).collect()]
    assert [d for d, _ in got] == [d for d, _ in expected], (
        f"{q}: docids diverge\n got={got}\n exp={expected}"
    )
    for (gd, gs), (_ed, es) in zip(got, expected):
        assert np.float32(gs) == np.float32(es), (q, gd, gs, es)
    return got


GRID = [
    IntervalNear(("alpha", "beta")),
    IntervalNear(("alpha", "beta"), max_gaps=0),
    IntervalNear(("alpha", "beta"), max_gaps=2),
    IntervalNear(("alpha", "beta"), max_width=3),
    IntervalNear(("alpha", "beta"), max_gaps=4, max_width=5),
    IntervalNear(("beta", "alpha"), max_gaps=1),
    IntervalNear(("alpha", "beta", "gamma"), max_gaps=6),
    IntervalNear(("gamma", "delta", "eps"), max_gaps=3),
    IntervalNear(("alpha", "beta"), ordered=False),
    IntervalNear(("alpha", "beta"), ordered=False, max_gaps=0),
    IntervalNear(("alpha", "beta"), ordered=False, max_gaps=3),
    IntervalNear(("alpha", "beta", "gamma"), ordered=False, max_gaps=5),
    IntervalNear(("delta", "zeta"), ordered=False, max_width=4),
    IntervalNear(("alpha",)),  # single term: span [p,p], freq = tf
    IntervalNear(("alpha", "beta"), max_gaps=2, pivot=0.5, boost=2.5),
    IntervalNear(("alpha", "beta"), ordered=False, pivot=3.0),
    # slot alternatives: Intervals.or of term leaves
    IntervalNear(("alpha", ("beta", "gamma")), max_gaps=2),
    IntervalNear((("alpha", "delta"), ("beta", "gamma")), ordered=False, max_gaps=3),
    IntervalNear((("alpha", "eps"), "beta", ("gamma", "zeta")), max_gaps=8),
    # repeated slots (RepeatingIntervalsSource consecutive-window analog)
    IntervalNear(("alpha", "alpha")),
    IntervalNear(("alpha", "alpha"), max_gaps=2),
    IntervalNear(("beta", "beta"), ordered=False, max_gaps=3),
    IntervalNear(("alpha", "alpha", "beta"), max_gaps=5),  # adjacent group
    IntervalNear(("alpha", "beta", "alpha"), max_gaps=6),  # non-adjacent
    IntervalNear(("alpha", "beta", "alpha"), ordered=False, max_gaps=6),
    # same term in two DIFFERENT slots: independent sources, may overlap
    IntervalNear(("alpha", ("alpha", "beta")), ordered=False, max_gaps=4),
    # equal OR slots form one repeat group
    IntervalNear((("alpha", "beta"), ("alpha", "beta")), ordered=False),
]


@pytest.mark.parametrize("q", GRID, ids=lambda q: repr(q)[:60])
def test_interval_parity(searcher, oracle, q):
    _check(searcher, oracle, q)


def test_interval_in_boolean(searcher, oracle):
    # filter context + scored context inside a BooleanQuery
    q = BooleanQuery(
        must=(TermQuery("gamma"), IntervalNear(("alpha", "beta"), max_gaps=3))
    )
    _check(searcher, oracle, q)
    q2 = BooleanQuery(
        should=(
            IntervalNear(("alpha", "beta"), ordered=False, max_gaps=2),
            TermQuery("delta"),
        )
    )
    _check(searcher, oracle, q2)


def test_interval_rewrite_and_validation():
    assert isinstance(rewrite(IntervalNear(())), MatchNoDocsQuery)
    with pytest.raises(ValueError):
        IntervalNear(("alpha",), pivot=0.0)


def test_min_extent_deduplicates_repeat_groups():
    """Rep(child, k).minExtent == child.minExtent, counted once per group:
    adjacent-run grouping when ordered (OrderedIntervalsSource.java:40-57),
    by-count grouping when unordered (UnorderedIntervalsSource.java:43-55)."""
    assert IntervalNear(("a", "b")).min_extent == 2
    assert IntervalNear(("a", "a")).min_extent == 1
    assert IntervalNear(("a", "a", "b")).min_extent == 2
    # ordered groups only ADJACENT equals: a,b,a stays three sources
    assert IntervalNear(("a", "b", "a")).min_extent == 3
    # unordered groups by count regardless of position
    assert IntervalNear(("a", "b", "a"), ordered=False).min_extent == 2
    assert IntervalNear(("a", "a"), ordered=False).min_extent == 1
    # slot identity is the full normalized slot: sharing a term != equal
    assert IntervalNear(("a", ("a", "b")), ordered=False).min_extent == 2
    from lucene_spark.search.query import IntervalPhrase as IP

    assert IntervalNear((IP(("a", "b")), IP(("a", "b")))).min_extent == 2
    assert IntervalNear(("a", "b", "a")).slot_dup_ranks == (0, 0, 1)


@pytest.mark.parametrize("ordered", [True, False])
def test_or_slot_matches_full_enumeration(ordered):
    """An OR slot's position list is the union of its alternatives — check
    the oracle against full enumeration over the unioned lists."""
    rng = np.random.default_rng(23)
    pool = ["a", "b", "c", "d"]
    for _trial in range(30):
        n = int(rng.integers(3, 12))
        toks = [pool[int(i)] for i in rng.integers(0, len(pool), size=n)]
        idx = PyIndex(stopwords=None)
        idx.add(0, " ".join(toks))
        q = IntervalNear((("a", "b"), ("c", "d")), ordered=ordered)
        got = idx.interval_scores(q)
        lists = [
            sorted(i for i, t in enumerate(toks) if t in ("a", "b")),
            sorted(i for i, t in enumerate(toks) if t in ("c", "d")),
        ]
        if any(not lst for lst in lists):
            assert got == {}
            continue
        minimal = _brute_minimal(lists, ordered)
        counts: dict[int, int] = {}
        for s, e in minimal:
            counts[e - s + 1] = counts.get(e - s + 1, 0) + 1
        freq = 0.0
        for w in sorted(counts):
            freq += counts[w] * (1.0 / max(w - 2 + 1, 1))
        if freq == 0:
            assert got == {}
            continue
        f = np.float32(freq)
        exp = np.float32(
            np.float32(1.0)
            * (np.float32(1.0) - np.float32(1.0) / (np.float32(1.0) + f))
        )
        assert got.get(0) == exp, (toks, minimal, got)


# --- oracle self-check: greedy+antichain == full cartesian enumeration ----

def _brute_minimal(lists, ordered):
    """Antichain of ALL valid intervals (one occurrence per term)."""
    cands = set()
    for combo in product(*lists):
        if ordered:
            if not all(combo[i] < combo[i + 1] for i in range(len(combo) - 1)):
                continue
            s, e = combo[0], combo[-1]
        else:
            s, e = min(combo), max(combo)
        cands.add((s, e))
    return {
        (s, e)
        for (s, e) in cands
        if not any(
            s2 >= s and e2 <= e and (s2, e2) != (s, e) for (s2, e2) in cands
        )
    }


@pytest.mark.parametrize("ordered", [True, False])
@pytest.mark.parametrize("m", [2, 3])
def test_oracle_matches_full_enumeration(ordered, m):
    rng = np.random.default_rng(11)
    terms = [f"t{i}" for i in range(m)]
    for trial in range(40):
        n = int(rng.integers(m, 14))
        pool = terms + ["filler"]  # one non-query term mixed in
        toks = [pool[int(i)] for i in rng.integers(0, len(pool), size=n)]
        idx = PyIndex(stopwords=None)
        idx.add(0, " ".join(toks))
        q = IntervalNear(tuple(terms), ordered=ordered)
        got = idx.interval_scores(q)
        lists = [
            sorted(p for tok_i, tok in enumerate(toks) if tok == t for p in [tok_i])
            for t in terms
        ]
        if any(not lst for lst in lists):
            assert got == {}
            continue
        minimal = _brute_minimal(lists, ordered)
        freq = 0.0
        counts: dict[int, int] = {}
        for s, e in minimal:
            w = e - s + 1
            counts[w] = counts.get(w, 0) + 1
        for w in sorted(counts):
            freq += counts[w] * (1.0 / max(w - m + 1, 1))
        if freq == 0:
            assert got == {}
            continue
        f = np.float32(freq)
        exp = np.float32(
            np.float32(1.0) * (np.float32(1.0) - np.float32(1.0) / (np.float32(1.0) + f))
        )
        assert 0 in got, (toks, minimal)
        assert got[0] == exp, (toks, minimal, got[0], exp)


# --- repeats: oracle self-check vs distinct-assignment enumeration --------

def _brute_minimal_rep(lists, ordered, slot_vals):
    """Antichain of all valid intervals where slots with EQUAL value take
    pairwise-distinct occurrences (the RepeatingIntervalsSource contract)
    while different sources may share one. Independent of both the engine's
    consecutive-window walk and the oracle's rank-j greedy — a passing
    check confirms the antichain equivalence of all three."""
    cands = set()
    for combo in product(*lists):
        if ordered:
            if not all(combo[i] < combo[i + 1] for i in range(len(combo) - 1)):
                continue
            s, e = combo[0], combo[-1]
        else:
            taken: dict = {}
            ok = True
            for v, p in zip(slot_vals, combo):
                grp = taken.setdefault(v, set())
                if p in grp:
                    ok = False
                    break
                grp.add(p)
            if not ok:
                continue
            s, e = min(combo), max(combo)
        cands.add((s, e))
    return {
        (s, e)
        for (s, e) in cands
        if not any(
            s2 >= s and e2 <= e and (s2, e2) != (s, e) for (s2, e2) in cands
        )
    }


REPEAT_SHAPES = [("t0", "t0"), ("t0", "t1", "t0"), ("t0", "t0", "t1")]


@pytest.mark.parametrize("ordered", [True, False])
@pytest.mark.parametrize("shape", REPEAT_SHAPES, ids=lambda s: "-".join(s))
def test_repeat_oracle_matches_distinct_assignment_enumeration(ordered, shape):
    rng = np.random.default_rng(31)
    for _trial in range(40):
        n = int(rng.integers(3, 14))
        pool = ["t0", "t1", "filler"]
        toks = [pool[int(i)] for i in rng.integers(0, len(pool), size=n)]
        idx = PyIndex(stopwords=None)
        idx.add(0, " ".join(toks))
        q = IntervalNear(shape, ordered=ordered)
        got = idx.interval_scores(q)
        lists = [
            [i for i, tok in enumerate(toks) if tok == t] for t in shape
        ]
        minimal = _brute_minimal_rep(lists, ordered, shape)
        counts: dict[int, int] = {}
        for s, e in minimal:
            counts[e - s + 1] = counts.get(e - s + 1, 0) + 1
        freq = 0.0
        me = q.min_extent
        for w in sorted(counts):
            freq += counts[w] * (1.0 / max(w - me + 1, 1))
        if freq == 0:
            assert got == {}, (toks, got)
            continue
        f = np.float32(freq)
        exp = np.float32(
            np.float32(1.0)
            * (np.float32(1.0) - np.float32(1.0) / (np.float32(1.0) + f))
        )
        assert got.get(0) == exp, (toks, sorted(minimal), got, exp)


# --- phrase leaves + containment filters (round-2 breadth) ----------------

from lucene_spark.search.query import IntervalFilter, IntervalPhrase  # noqa: E402

PHRASE_GRID = [
    IntervalNear((IntervalPhrase(("beta", "alpha")), "gamma"), max_gaps=6),
    IntervalNear((IntervalPhrase(("alpha", "beta")), "gamma"), max_gaps=8),
    IntervalNear(
        (IntervalPhrase(("alpha", "beta")), "gamma"), ordered=False, max_gaps=8
    ),
    IntervalNear(("delta", IntervalPhrase(("beta", "alpha"))), max_gaps=10),
    IntervalNear(
        ("eps", IntervalPhrase(("gamma", "delta"))), ordered=False, max_width=12
    ),
    # phrase-only source (single slot): freq = phrase occurrence count
    IntervalNear((IntervalPhrase(("alpha", "beta")),)),
    # Intervals.or of two equal-extent phrase leaves
    IntervalNear(
        (
            (IntervalPhrase(("alpha", "beta")), IntervalPhrase(("gamma", "delta"))),
            "eps",
        ),
        ordered=False,
        max_gaps=9,
    ),
]


@pytest.mark.parametrize("q", PHRASE_GRID, ids=lambda q: repr(q)[:60])
def test_phrase_leaf_parity(searcher, oracle, q):
    got = _check(searcher, oracle, q)
    assert got, f"{q}: fixture should produce hits"


FILTER_GRID = [
    IntervalFilter(
        IntervalNear(("alpha", "beta"), ordered=False, max_gaps=6),
        IntervalNear(("gamma",)),
        "containing",
    ),
    IntervalFilter(
        IntervalNear(("alpha", "beta"), ordered=False, max_gaps=6),
        IntervalNear(("gamma",)),
        "not_containing",
    ),
    IntervalFilter(
        IntervalNear(("pad0", "pad2")),
        IntervalNear(("alpha", "beta"), ordered=False, max_gaps=9),
        "contained_by",
    ),
    IntervalFilter(
        IntervalNear(("pad0", "pad2")),
        IntervalNear(("alpha", "beta"), ordered=False, max_gaps=9),
        "not_contained_by",
    ),
    IntervalFilter(
        IntervalNear((IntervalPhrase(("beta", "alpha")),)),
        IntervalNear(("gamma",)),
        "not_containing",
        pivot=0.5,
        boost=2.0,
    ),
]


@pytest.mark.parametrize("q", FILTER_GRID, ids=lambda q: repr(q)[:70])
def test_interval_filter_parity(searcher, oracle, q):
    got = _check(searcher, oracle, q)
    assert got, f"{q}: fixture should produce hits"


def test_interval_filter_in_boolean(searcher, oracle):
    q = BooleanQuery(
        must=(
            TermQuery("delta"),
            IntervalFilter(
                IntervalNear(("alpha", "beta"), ordered=False, max_gaps=5),
                IntervalNear(("gamma",)),
                "not_containing",
            ),
        )
    )
    _check(searcher, oracle, q)


def test_phrase_leaf_hand_case(oracle, searcher):
    """edge05 = 'gamma beta alpha gamma beta': phrase (beta,alpha) occurs at
    (1,2); ordered + 'gamma' next at 3 -> interval (1,3), width 3,
    minExtent 3 -> freq 1 -> saturation 0.5."""
    url_doc = {
        r["url"]: r["docid"]
        for r in searcher._docmap_global().select("url", "docid").collect()
    }
    d5 = url_doc["doc://edge05"]
    q = IntervalNear((IntervalPhrase(("beta", "alpha")), "gamma"), max_gaps=0)
    per = oracle._interval_minimal(q)
    assert per.get(d5) == [(1, 3)]
    got = {r["docid"]: r["score"] for r in searcher.search(q, k=100).collect()}
    assert np.float32(got[d5]) == np.float32(0.5)


def test_contained_by_hand_case(oracle, searcher):
    """edge02 = 'alpha pad0 pad1 pad2 beta': source (pad0..pad2) = (1,3) is
    inside reference unordered (alpha,beta) = (0,4)."""
    url_doc = {
        r["url"]: r["docid"]
        for r in searcher._docmap_global().select("url", "docid").collect()
    }
    d2 = url_doc["doc://edge02"]
    src = IntervalNear(("pad0", "pad2"), max_gaps=4)
    ref = IntervalNear(("alpha", "beta"), ordered=False, max_gaps=9)
    inside = oracle.interval_filter_scores(
        IntervalFilter(src, ref, "contained_by")
    )
    assert d2 in inside
    outside = oracle.interval_filter_scores(
        IntervalFilter(src, ref, "not_contained_by")
    )
    assert d2 not in outside


def test_interval_filter_validation():
    src = IntervalNear(("alpha", "beta"))
    with pytest.raises(ValueError):
        IntervalFilter(src, src, "touching")  # not a MatchOperation kind
    with pytest.raises(ValueError):
        IntervalNear(
            ((IntervalPhrase(("alpha", "beta")), "gamma"),)  # mixed extent
        )
    assert isinstance(
        rewrite(IntervalFilter(IntervalNear(()), src, "containing")),
        MatchNoDocsQuery,
    )
