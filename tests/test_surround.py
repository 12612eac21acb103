"""Surround query language parser (search/surround.py)."""

import pytest

from lucene_spark.search.query import BooleanQuery, MatchNoDocsQuery, TermQuery
from lucene_spark.search.spans import SpanNear, SpanOr, SpanTerm
from lucene_spark.search.surround import SurroundSyntaxError, parse_surround


def T(t):
    return SpanTerm(t)


def test_infix_w_default_distance_is_adjacent():
    assert parse_surround("a w b") == SpanNear((T("a"), T("b")), slop=0)


def test_infix_distance_prefix():
    assert parse_surround("a 3w b") == SpanNear((T("a"), T("b")), slop=2)
    assert parse_surround("a 4N b") == SpanNear(
        (T("a"), T("b")), slop=3, in_order=False
    )


def test_w_binds_tighter_than_n():
    q = parse_surround("a w b 5n c")
    assert q == SpanNear(
        (SpanNear((T("a"), T("b")), slop=0), T("c")), slop=4, in_order=False
    )


def test_prefix_forms():
    assert parse_surround("3W(a, b, c)") == SpanNear(
        (T("a"), T("b"), T("c")), slop=2
    )
    assert parse_surround("N(a, b)") == SpanNear(
        (T("a"), T("b")), slop=0, in_order=False
    )
    assert parse_surround("AND(a, b)") == BooleanQuery(must=(T("a"), T("b")))
    assert parse_surround("NOT(a, b, c)") == BooleanQuery(
        must=(T("a"),), must_not=(T("b"), T("c"))
    )


def test_boolean_precedence():
    q = parse_surround("a AND b OR c")
    assert q == BooleanQuery(
        should=(BooleanQuery(must=(T("a"), T("b"))), T("c"))
    )


def test_infix_not():
    assert parse_surround("a NOT b") == BooleanQuery(
        must=(T("a"),), must_not=(T("b"),)
    )


def test_or_of_spans_stays_distance_compatible():
    q = parse_surround("(a OR b) 2w c")
    assert q == SpanNear((SpanOr((T("a"), T("b"))), T("c")), slop=1)


def test_and_inside_distance_rejected():
    with pytest.raises(SurroundSyntaxError):
        parse_surround("W(a AND b, c)")


def test_boost_on_term():
    assert parse_surround("a^2.5") == TermQuery("a", boost=2.5)


def test_truncation_expansion():
    q = parse_surround(
        "dat* w stream", expand=lambda p: ["data", "database"]
    )
    assert q == SpanNear(
        (SpanOr((T("data"), T("database"))), T("stream")), slop=0
    )
    assert parse_surround("zz*", expand=lambda p: []) == MatchNoDocsQuery()


def test_case_insensitive_operators_and_terms():
    assert parse_surround("A 2W B") == SpanNear((T("a"), T("b")), slop=1)


def test_errors():
    with pytest.raises(SurroundSyntaxError):
        parse_surround("(a OR b")
    with pytest.raises(SurroundSyntaxError):
        parse_surround("FOO(a, b)")
    with pytest.raises(SurroundSyntaxError):
        parse_surround("a b")  # trailing input: no implicit operator
