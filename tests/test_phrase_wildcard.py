"""PhraseWildcardQuery: wildcards at any phrase slot (ComplexPhrase form).

Reference behavior: search/PhraseWildcardQuery.java:66 (multi-wildcard
phrase, rewrite-to-MultiPhraseQuery when expansions fit) and
ComplexPhraseQueryParser's quoted-wildcard grammar. The DuckDB-oracle gate
row (bm25_wildcard_phrase) lives in test_gate.py.
"""

import pytest

from lucene_spark.fixtures import generate_webtext
from lucene_spark.index.builder import build_index
from lucene_spark.search.query import (
    PhrasePrefixQuery,
    PhraseWildcardQuery,
    parse_query,
)
from lucene_spark.search.searcher import Searcher
from functools import partial

from lucene_spark.analysis.simple import simple_analyze

AN = partial(simple_analyze, stopwords=None)


def test_parser_routes_wildcard_slots():
    q = parse_query('"s* window"', AN)
    assert isinstance(q, PhraseWildcardQuery)
    assert q.slots == ("s*", "window")
    q = parse_query('"da?a w0001 st*m"', AN)
    assert isinstance(q, PhraseWildcardQuery)
    assert q.slots == ("da?a", "w0001", "st*m")


def test_trailing_star_still_phrase_prefix():
    q = parse_query('"data s*"', AN)
    assert isinstance(q, PhrasePrefixQuery)


def test_escaped_star_is_literal():
    q = parse_query('"data \\*"', AN)
    assert not isinstance(q, PhraseWildcardQuery)


@pytest.fixture(scope="module")
def index_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("pwidx"))
    rows = generate_webtext(300)
    df = spark.createDataFrame(
        [(r["url"], r["text"]) for r in rows], "url string, text string"
    )
    build_index(spark, df, d, num_segments=3, analyzer="simple")
    return d, rows


def _py_match(rows, pred_slots):
    import re

    from lucene_spark.analysis.simple import simple_terms_positions

    out = set()
    for r in rows:
        terms, _ = simple_terms_positions(r["text"], None)
        n = len(pred_slots)
        if any(
            all(pred_slots[j](terms[i + j]) for j in range(n))
            for i in range(len(terms) - n + 1)
        ):
            out.add(r["url"])
    return out


def test_leading_wildcard_slot_matches_oracle(spark, index_dir):
    import re

    d, rows = index_dir
    s = Searcher(spark, d, analyzer="simple")
    got = {
        r["url"] for r in s.search('"w000* w0002"', k=300, with_url=True).collect()
    }
    exp = _py_match(
        rows,
        [lambda t: re.fullmatch(r"w000.*", t) is not None, lambda t: t == "w0002"],
    )
    assert got == exp and got


def test_question_mark_slot(spark, index_dir):
    import re

    d, rows = index_dir
    s = Searcher(spark, d, analyzer="simple")
    got = {
        r["url"] for r in s.search('"w000? w0002"', k=300, with_url=True).collect()
    }
    exp = _py_match(
        rows,
        [lambda t: re.fullmatch(r"w000.", t) is not None, lambda t: t == "w0002"],
    )
    assert got == exp


def test_no_expansion_matches_nothing(spark, index_dir):
    d, _rows = index_dir
    s = Searcher(spark, d, analyzer="simple")
    assert s.search('"zzzz* w0002"', k=10).collect() == []
