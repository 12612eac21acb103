"""CoreParser-style XML query parsing (search/xmlparser.py)."""

import pytest

from lucene_spark.search.query import (
    BooleanQuery,
    ConstantScoreQuery,
    DisjunctionMaxQuery,
    MatchAllDocsQuery,
    TermQuery,
    TermRangeQuery,
)
from lucene_spark.search.spans import (
    SpanNear,
    SpanNot,
    SpanOr,
    SpanPositionRange,
    SpanTerm,
)
from lucene_spark.search.xmlparser import XmlParserError, parse_xml_query


def test_term_query_with_boost():
    assert parse_xml_query("<TermQuery boost='2.0'>data</TermQuery>") == (
        TermQuery("data", boost=2.0)
    )


def test_terms_query_analyzes():
    q = parse_xml_query(
        "<TermsQuery minimumNumberShouldMatch='2'>Data Stream Batch</TermsQuery>"
    )
    assert q == BooleanQuery(
        should=(TermQuery("data"), TermQuery("stream"), TermQuery("batch")),
        min_should_match=2,
    )


def test_boolean_with_clauses():
    q = parse_xml_query("""
<BooleanQuery>
  <Clause occurs="must"><TermQuery>data</TermQuery></Clause>
  <Clause occurs="should"><TermQuery>stream</TermQuery></Clause>
  <Clause occurs="mustNot"><TermQuery>window</TermQuery></Clause>
  <Clause occurs="filter"><TermQuery>batch</TermQuery></Clause>
</BooleanQuery>""")
    assert q == BooleanQuery(
        must=(
            TermQuery("data"),
            ConstantScoreQuery(query=TermQuery("batch"), boost=0.0),
        ),
        should=(TermQuery("stream"),),
        must_not=(TermQuery("window"),),
    )


def test_range_dismax_constantscore_matchall():
    assert parse_xml_query(
        "<RangeQuery lowerTerm='aaa' upperTerm='bbb' includeUpper='false'/>"
    ) == TermRangeQuery("aaa", "bbb", True, False)
    q = parse_xml_query("""
<DisjunctionMaxQuery tieBreaker="0.3">
  <TermQuery>data</TermQuery>
  <TermQuery>stream</TermQuery>
</DisjunctionMaxQuery>""")
    assert q == DisjunctionMaxQuery(
        (TermQuery("data"), TermQuery("stream")), tie_breaker=0.3
    )
    assert parse_xml_query(
        "<ConstantScoreQuery boost='3'><MatchAllDocsQuery/></ConstantScoreQuery>"
    ) == ConstantScoreQuery(query=MatchAllDocsQuery(), boost=3.0)


def test_span_family():
    q = parse_xml_query("""
<SpanNear slop="2" inOrder="true">
  <SpanOrTerms>alpha beta</SpanOrTerms>
  <SpanTerm>gamma</SpanTerm>
</SpanNear>""")
    assert q == SpanNear(
        (SpanOr((SpanTerm("alpha"), SpanTerm("beta"))), SpanTerm("gamma")),
        slop=2,
        in_order=True,
    )
    q2 = parse_xml_query("""
<SpanNot>
  <Include><SpanFirst end="5"><SpanTerm>a</SpanTerm></SpanFirst></Include>
  <Exclude><SpanTerm>b</SpanTerm></Exclude>
</SpanNot>""")
    assert q2 == SpanNot(
        SpanPositionRange(SpanTerm("a"), 0, 5), SpanTerm("b")
    )


def test_user_query_callback():
    q = parse_xml_query(
        "<UserQuery>data AND stream</UserQuery>",
        user_parser=lambda s: ("parsed", s),
    )
    assert q == ("parsed", "data AND stream")


def test_errors():
    with pytest.raises(XmlParserError):
        parse_xml_query("<WhatQuery>x</WhatQuery>")
    with pytest.raises(XmlParserError):
        parse_xml_query("<TermQuery>  </TermQuery>")
    with pytest.raises(XmlParserError):
        parse_xml_query("<SpanNear><SpanTerm>a</SpanTerm></SpanNear>")  # no slop
    with pytest.raises(XmlParserError):
        parse_xml_query("<UserQuery>x</UserQuery>")  # no callback
    with pytest.raises(XmlParserError):
        parse_xml_query("not xml at all <")
