"""ComplexPhraseQueryParser analog (search/complexphrase.py): wildcard,
fuzzy, and alternation-group slots inside phrases, rewritten to the span
family exactly like the reference's rewrite (CPQP.java:266-354)."""

import pytest

from lucene_spark.index import build_index
from lucene_spark.search import Searcher
from lucene_spark.search.complexphrase import complex_phrase_query
from lucene_spark.search.query import MatchNoDocsQuery
from lucene_spark.search.spans import SpanNear, SpanNot, SpanOr, SpanTerm

DOCS = [
    ("doc://0", "john peters works here"),
    ("doc://1", "jon peterson works here"),
    ("doc://2", "jonathan peterman rests here"),
    ("doc://3", "peters john reversed order"),
    ("doc://4", "johan peters unrelated prefix"),
    ("doc://5", "john nomatch peters gapped"),
]


@pytest.fixture(scope="module")
def s(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("cpq_idx"))
    df = spark.createDataFrame(DOCS, "url string, text string")
    build_index(spark, df, d, num_segments=2, stopwords=None)
    return Searcher(spark, d)


def _urls(s, q, k=10):
    return {r["url"] for r in s.search(q, k=k, with_url=True).collect()}


def test_wildcard_slot(s):
    q = complex_phrase_query(s, "(john jon jonathan~) peter*")
    # the canonical javadoc example: each first-name alternative followed
    # by a peter*-prefixed surname, adjacent and in order
    assert _urls(s, q) == {"doc://0", "doc://1", "doc://2"}


def test_shape_and_in_order(s):
    q = complex_phrase_query(s, "john peters")
    assert isinstance(q, SpanNear) and q.in_order and q.slop == 0
    assert q.clauses == (SpanTerm("john"), SpanTerm("peters"))
    assert _urls(s, q) == {"doc://0"}  # doc://3 is reversed -> no match
    q2 = complex_phrase_query(s, "john peters", in_order=False)
    assert _urls(s, q2) == {"doc://0", "doc://3"}


def test_slop_and_fuzzy(s):
    q = complex_phrase_query(s, "john peters", slop=1)
    assert _urls(s, q) == {"doc://0", "doc://5"}
    qf = complex_phrase_query(s, "jon~1 peters")
    # jon~1 expands to {jon, john}; only john is followed by peters
    assert isinstance(qf.clauses[0], SpanOr)
    assert _urls(s, qf) == {"doc://0"}


def test_negated_group(s):
    q = complex_phrase_query(s, "(jo*n -johan) peters")
    assert isinstance(q.clauses[0], SpanNot)
    assert _urls(s, q) == {"doc://0"}  # johan excluded, jon not before peters


def test_empty_expansion_is_no_match(s):
    q = complex_phrase_query(s, "zzz* peters")
    assert isinstance(q, MatchNoDocsQuery)


def test_multi_token_slot_rejected(s):
    with pytest.raises(ValueError):
        complex_phrase_query(s, "one")
