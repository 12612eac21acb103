"""SimpleQueryParser dialect (queryparser/simple/SimpleQueryParser.java):
operator parsing, the operation-change tree wrap, and every leniency rule
— malformed input NEVER raises. The scored end-to-end gate row is
simple_query_parser in test_gate.py."""

import pytest

from lucene_spark.analysis.simple import simple_analyze
from lucene_spark.search.query import (
    BooleanQuery,
    FuzzyQuery,
    MatchAllDocsQuery,
    MatchNoDocsQuery,
    PhraseQuery,
    PrefixQuery,
    TermQuery,
)
from lucene_spark.search.simpleparser import simple_parse


def P(q, **kw):
    return simple_parse(q, simple_analyze, **kw)


def test_single_term_and_default_or():
    assert P("foo") == TermQuery("foo")
    assert P("foo bar") == BooleanQuery(
        should=(TermQuery("foo"), TermQuery("bar"))
    )


def test_default_operator_and():
    assert P("foo bar", default_operator="must") == BooleanQuery(
        must=(TermQuery("foo"), TermQuery("bar"))
    )


def test_explicit_and_or_precedence_wrap():
    # a + b | c : the op change pushes AND(a,b) under the OR
    q = P("a + b | c")
    assert q == BooleanQuery(
        should=(
            BooleanQuery(must=(TermQuery("a"), TermQuery("b"))),
            TermQuery("c"),
        )
    )


def test_not_and_double_not():
    q = P("-foo")
    assert q == BooleanQuery(
        should=(MatchAllDocsQuery(),), must_not=(TermQuery("foo"),)
    )
    assert P("--foo") == TermQuery("foo")  # double negation cancels


def test_phrase_with_and_without_slop():
    assert P('"data stream"') == PhraseQuery(terms=("data", "stream"))
    assert P('"data stream"~3') == PhraseQuery(terms=("data", "stream"), slop=3)
    # single-token phrase degrades to a term (createPhraseQuery)
    assert P('"data"') == TermQuery("data")


def test_prefix_and_fuzzy():
    assert P("foo*") == PrefixQuery(prefix="foo")
    assert P("foo~") == FuzzyQuery(term="foo", max_edits=2)
    assert P("foo~1") == FuzzyQuery(term="foo", max_edits=1)
    assert P("foo~9") == FuzzyQuery(term="foo", max_edits=2)  # capped
    assert P("foo~0") == TermQuery("foo")  # 0 edits = plain term
    assert P("foo~x") == TermQuery("foo")  # unparsable = 0 edits
    assert P("foo~-3") == TermQuery("foo")  # negative = 0 edits


def test_groups():
    q = P("(a | b) + c")
    assert q == BooleanQuery(
        must=(
            BooleanQuery(should=(TermQuery("a"), TermQuery("b"))),
            TermQuery("c"),
        )
    )


@pytest.mark.parametrize(
    "junk",
    ["", "   ", "(", ")", '"', "(unclosed", '"unclosed', ") stray (",
     "+", "|", "-", "+|-", "(()", "a + + b", "~2", "\\"],
)
def test_lenient_never_raises(junk):
    q = P(junk)  # must not raise
    assert q is not None


def test_unmatched_delimiters_degrade_to_terms():
    assert P("(unclosed") == TermQuery("unclosed")
    assert P('"unclosed') == TermQuery("unclosed")
    # empty group resets the pending + so b ORs with a (default op)
    assert P("a + () b") == BooleanQuery(
        should=(TermQuery("a"), TermQuery("b"))
    )


def test_lone_star_and_empty():
    assert P("*") == MatchAllDocsQuery()
    assert P("  *  ") == MatchAllDocsQuery()
    assert P("") == MatchNoDocsQuery()


def test_escape_operator():
    # the escape keeps '+' inside ONE parser token; the analyzer then
    # splits it (createBooleanQuery semantics) into an OR of the parts
    assert P(r"foo\+bar") == BooleanQuery(
        should=(TermQuery("foo"), TermQuery("bar"))
    )
    # escaped star is not a prefix operator
    assert P(r"foo\*") == TermQuery("foo")


def test_searcher_integration(spark, tmp_path):
    from lucene_spark.index import build_index
    from lucene_spark.search import Searcher

    df = spark.createDataFrame(
        [
            ("doc://0", "data stream engine"),
            ("doc://1", "stream window scan"),
            ("doc://2", "window data"),
        ],
        "url string, text string",
    )
    d = str(tmp_path / "sqp_idx")
    build_index(spark, df, d, num_segments=1, analyzer="simple", stopwords=None)
    s = Searcher(spark, d, analyzer="simple")
    hits = {
        r["url"]
        for r in s.search_simple(
            'stream + window | "data stream"', k=10, with_url=True
        ).collect()
    }
    assert hits == {"doc://0", "doc://1"}
