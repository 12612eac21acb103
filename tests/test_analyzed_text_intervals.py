"""Intervals.analyzedText parser sugar (query.analyzed_text_intervals) —
structure vectors mirroring IntervalBuilder's arms (queries/src/test/.../
intervals/TestIntervalBuilder.java shapes, recomputed by hand on this
package's analyzer), plus engine-vs-oracle behavior on a tiny corpus.
"""

import numpy as np
import pytest

from lucene_spark.constants import ENGLISH_STOP_WORDS
from lucene_spark.index import build_index
from lucene_spark.oracle.pyindex import PyIndex
from lucene_spark.search import Searcher
from lucene_spark.search.query import (
    IntervalExtend,
    IntervalNear,
    IntervalPhrase,
    MatchNoDocsQuery,
    analyzed_text_intervals,
)


# --- structure vectors ----------------------------------------------------


def test_empty_and_single():
    assert isinstance(analyzed_text_intervals(""), MatchNoDocsQuery)
    assert isinstance(
        analyzed_text_intervals("the", stopwords=ENGLISH_STOP_WORDS),
        MatchNoDocsQuery,
    )
    q = analyzed_text_intervals("Quick")
    assert q == IntervalNear(("quick",))


def test_simple_phrase_arm():
    # maxGaps 0 + ordered + no synonyms → Intervals.phrase (Block)
    q = analyzed_text_intervals("quick brown fox", max_gaps=0, ordered=True)
    assert q == IntervalNear((IntervalPhrase(("quick", "brown", "fox")),))


def test_ordered_near_arm():
    q = analyzed_text_intervals("quick fox", max_gaps=2, ordered=True)
    assert q == IntervalNear(("quick", "fox"), ordered=True, max_gaps=2)
    q2 = analyzed_text_intervals("quick fox", ordered=False)
    assert q2 == IntervalNear(("quick", "fox"), ordered=False, max_gaps=-1)


def test_stopword_gap_becomes_extend():
    # "quick of the fox": 'of'/'the' drop with position increments →
    # fox carries precedingSpaces=2 (IntervalBuilder.analyzeTerms extend)
    q = analyzed_text_intervals(
        "quick of the fox", max_gaps=0, ordered=True,
        stopwords=ENGLISH_STOP_WORDS,
    )
    assert q == IntervalNear(
        (IntervalPhrase(("quick", IntervalExtend("fox", 2, 0))),)
    )
    # leading stopword → extend on the FIRST token (posInc −1 semantics)
    q2 = analyzed_text_intervals(
        "the fox jumps", max_gaps=1, ordered=True,
        stopwords=ENGLISH_STOP_WORDS,
    )
    assert q2 == IntervalNear(
        (IntervalExtend("fox", 1, 0), "jumps"), ordered=True, max_gaps=1
    )


def test_synonym_stacking():
    # pre-analyzed pairs with a stacked position → or alternatives; the
    # synonym presence forces the near arm even at maxGaps 0 + ordered
    pairs = [("quick", 0), ("fast", 0), ("fox", 1)]
    q = analyzed_text_intervals(pairs, max_gaps=0, ordered=True)
    assert q == IntervalNear(
        (("quick", "fast"), "fox"), ordered=True, max_gaps=0
    )
    # stacked synonyms after a gap distribute the extend
    pairs2 = [("quick", 0), ("fox", 2), ("wolf", 2)]
    q2 = analyzed_text_intervals(pairs2, ordered=True)
    assert q2 == IntervalNear(
        ("quick", (IntervalExtend("fox", 1, 0), IntervalExtend("wolf", 1, 0))),
        ordered=True, max_gaps=-1,
    )
    # a single stacked group alone → bare or slot, no gaps wrapper
    q3 = analyzed_text_intervals([("quick", 0), ("fast", 0)])
    assert q3 == IntervalNear((("quick", "fast"),))


# --- behavior: engine vs oracle on a tiny corpus --------------------------

CORPUS = [
    ("doc://0", "quick brown fox jumps"),
    ("doc://1", "quick fox"),
    ("doc://2", "quick of the fox"),
    ("doc://3", "fox quick"),
    ("doc://4", "quick brown wolf and brown fox"),
]


@pytest.fixture(scope="module")
def searcher(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("index_analyzed_text"))
    df = spark.createDataFrame(CORPUS, "url string, text string")
    build_index(spark, df, d, num_segments=2, stopwords=ENGLISH_STOP_WORDS)
    return Searcher(spark, d, stopwords=ENGLISH_STOP_WORDS)


@pytest.fixture(scope="module")
def oracle(searcher):
    dm = searcher._docmap_global().select("url", "docid").collect()
    url_to_docid = {r["url"]: r["docid"] for r in dm}
    idx = PyIndex(stopwords=ENGLISH_STOP_WORDS)
    for url, text in CORPUS:
        idx.add(url_to_docid[url], text)
    return idx


@pytest.mark.parametrize(
    "text,kw",
    [
        ("quick brown fox", dict(max_gaps=0, ordered=True)),
        ("quick fox", dict(max_gaps=1, ordered=True)),
        ("quick fox", dict(ordered=False)),
        ("quick of the fox", dict(max_gaps=0, ordered=True)),
        ("brown fox", dict(max_gaps=3, ordered=False)),
    ],
    ids=lambda v: str(v)[:40],
)
def test_analyzed_text_parity(searcher, oracle, text, kw):
    q = analyzed_text_intervals(text, stopwords=ENGLISH_STOP_WORDS, **kw)
    expected = oracle.search_query(q, k=10)
    got = [
        (r["docid"], r["score"]) for r in searcher.search(q, k=10).collect()
    ]
    assert [d for d, _ in got] == [d for d, _ in expected], (
        f"{text} {kw}: got={got} exp={expected}"
    )
    for (gd, gs), (_ed, es) in zip(got, expected):
        assert np.float32(gs) == np.float32(es), (text, kw, gd, gs, es)
