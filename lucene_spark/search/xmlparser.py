"""XML query parser — the queryparser/xml CoreParser surface.

Behavioral reference: queryparser/src/java/org/apache/lucene/queryparser/
xml/CoreParser.java:90-134 and builders/ — an XML element tree maps to a
query tree. Elements implemented (the CoreParser registrations minus the
point/payload ones this engine expresses differently):

- ``<TermQuery boost=..>text</TermQuery>`` (TermQueryBuilder)
- ``<TermsQuery minimumNumberShouldMatch=..>text</TermsQuery>`` —
  analyzed into a SHOULD group (TermsQueryBuilder)
- ``<MatchAllDocsQuery/>``
- ``<BooleanQuery minimumNumberShouldMatch=..><Clause occurs=must|
  mustNot|should|filter>…</Clause>…</BooleanQuery>`` (BooleanQueryBuilder;
  ``filter`` maps to a constant-score MUST, the reference's FILTER occur)
- ``<RangeQuery lowerTerm=.. upperTerm=.. includeLower=..
  includeUpper=../>`` (RangeQueryBuilder → TermRangeQuery)
- ``<DisjunctionMaxQuery tieBreaker=..>…</DisjunctionMaxQuery>``
- ``<ConstantScoreQuery boost=..>…</ConstantScoreQuery>``
- ``<UserQuery>classic syntax</UserQuery>`` (UserInputQueryBuilder — the
  classic QueryParser callback)
- span family: ``<SpanTerm>``, ``<SpanNear slop=.. inOrder=..>``,
  ``<SpanOr>``, ``<SpanOrTerms>`` (analyzed term disjunction),
  ``<SpanFirst end=..>``, ``<SpanPositionRange start=.. end=..>``,
  ``<SpanNot><Include>…</Include><Exclude>…</Exclude></SpanNot>``

``fieldName`` attributes are accepted and ignored — this engine's default
field carries unprefixed terms (multi-field queries namespace their own
terms). Unknown elements raise, like the reference's ParserException.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from typing import Callable

from .query import (
    BooleanQuery,
    ConstantScoreQuery,
    DisjunctionMaxQuery,
    MatchAllDocsQuery,
    TermQuery,
    TermRangeQuery,
)
from .spans import SpanNear, SpanOr, SpanPositionRange, SpanTerm

__all__ = ["parse_xml_query", "XmlParserError"]


class XmlParserError(ValueError):
    pass


def _default_analyze(text: str) -> list[str]:
    from ..analysis.tokenizer import analyze

    return [t.term for t in analyze(text, stopwords=None)]


def _text_of(e: ET.Element) -> str:
    v = (e.text or "").strip()
    if not v:
        raise XmlParserError(f"<{e.tag}> needs non-blank text")
    return v


def _children(e: ET.Element) -> list[ET.Element]:
    return [c for c in e]


def parse_xml_query(
    xml_text: str,
    analyze: Callable[[str], list[str]] | None = None,
    user_parser: Callable[[str], object] | None = None,
):
    """Parse a CoreParser-style XML query into the engine's AST."""
    an = analyze or _default_analyze
    try:
        root = ET.fromstring(xml_text)
    except ET.ParseError as exc:
        raise XmlParserError(f"malformed XML: {exc}") from exc

    def q(e: ET.Element):
        tag = e.tag
        if tag == "TermQuery":
            return TermQuery(
                _text_of(e), boost=float(e.get("boost", "1.0"))
            )
        if tag == "TermsQuery":
            terms = an(_text_of(e))
            if not terms:
                raise XmlParserError("TermsQuery analyzed to no terms")
            return BooleanQuery(
                should=tuple(TermQuery(t) for t in terms),
                min_should_match=int(e.get("minimumNumberShouldMatch", "0")),
            )
        if tag == "MatchAllDocsQuery":
            return MatchAllDocsQuery()
        if tag == "BooleanQuery":
            must, should, must_not = [], [], []
            for c in _children(e):
                if c.tag != "Clause":
                    continue
                occurs = (c.get("occurs") or "should").lower()
                kids = _children(c)
                if len(kids) != 1:
                    raise XmlParserError("Clause needs exactly one child")
                sub = q(kids[0])
                if occurs == "must":
                    must.append(sub)
                elif occurs == "mustnot":
                    must_not.append(sub)
                elif occurs == "filter":
                    # FILTER occur: required, not scored
                    must.append(ConstantScoreQuery(query=sub, boost=0.0))
                elif occurs == "should":
                    should.append(sub)
                else:
                    raise XmlParserError(f"invalid occurs value: {occurs!r}")
            return BooleanQuery(
                must=tuple(must),
                should=tuple(should),
                must_not=tuple(must_not),
                min_should_match=int(e.get("minimumNumberShouldMatch", "0")),
            )
        if tag == "RangeQuery":
            return TermRangeQuery(
                lower=e.get("lowerTerm") or None,
                upper=e.get("upperTerm") or None,
                include_lower=e.get("includeLower", "true").lower() == "true",
                include_upper=e.get("includeUpper", "true").lower() == "true",
            )
        if tag == "DisjunctionMaxQuery":
            return DisjunctionMaxQuery(
                disjuncts=tuple(q(c) for c in _children(e)),
                tie_breaker=float(e.get("tieBreaker", "0.0")),
            )
        if tag == "ConstantScoreQuery":
            kids = _children(e)
            if len(kids) != 1:
                raise XmlParserError("ConstantScoreQuery needs one child")
            return ConstantScoreQuery(
                query=q(kids[0]), boost=float(e.get("boost", "1.0"))
            )
        if tag == "UserQuery":
            if user_parser is None:
                raise XmlParserError("UserQuery needs a classic-parser callback")
            return user_parser(_text_of(e))
        if tag in (
            "SpanTerm", "SpanNear", "SpanOr", "SpanOrTerms", "SpanFirst",
            "SpanPositionRange", "SpanNot",
        ):
            return span(e)
        raise XmlParserError(f"unknown query element <{tag}>")

    def span(e: ET.Element):
        tag = e.tag
        if tag == "SpanTerm":
            return SpanTerm(_text_of(e))
        if tag == "SpanNear":
            slop = e.get("slop")
            if slop is None:
                raise XmlParserError("SpanNear needs a slop attribute")
            return SpanNear(
                tuple(span(c) for c in _children(e)),
                slop=int(slop),
                in_order=e.get("inOrder", "false").lower() == "true",
            )
        if tag == "SpanOr":
            return SpanOr(tuple(span(c) for c in _children(e)))
        if tag == "SpanOrTerms":
            terms = an(_text_of(e))
            if not terms:
                raise XmlParserError("SpanOrTerms analyzed to no terms")
            return SpanOr(tuple(SpanTerm(t) for t in terms))
        if tag == "SpanFirst":
            kids = _children(e)
            if len(kids) != 1:
                raise XmlParserError("SpanFirst needs one child")
            return SpanPositionRange(
                span(kids[0]), 0, int(e.get("end", "1"))
            )
        if tag == "SpanPositionRange":
            kids = _children(e)
            if len(kids) != 1:
                raise XmlParserError("SpanPositionRange needs one child")
            return SpanPositionRange(
                span(kids[0]),
                int(e.get("start", "0")),
                int(e.get("end", "1")),
            )
        if tag == "SpanNot":
            inc = exc = None
            for c in _children(e):
                if c.tag == "Include":
                    inc = span(_children(c)[0])
                elif c.tag == "Exclude":
                    exc = span(_children(c)[0])
            if inc is None or exc is None:
                raise XmlParserError("SpanNot needs Include and Exclude")
            from .spans import SpanNot

            return SpanNot(inc, exc)
        raise XmlParserError(f"unknown span element <{tag}>")

    return q(root)
