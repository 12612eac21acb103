"""Double Metaphone encoder + filter chain.

Reference vectors: analysis/phonetic/src/test/org/apache/lucene/analysis/
phonetic/TestDoubleMetaphoneFilter.java:30-70, plus published examples from
Philips 2000 (the algorithm's own article test names).
"""

import pytest

from lucene_spark.analysis.metaphone import (
    double_metaphone,
    double_metaphone_analyze,
)


# TestDoubleMetaphoneFilter.java reference vectors
def test_size4_international():
    assert double_metaphone("international", 4)[0] == "ANTR"


def test_size8_international():
    assert double_metaphone("international", 8)[0] == "ANTRNXNL"


def test_alternate_kuczewski():
    assert double_metaphone("Kuczewski", 4) == ("KSSK", "KXFS")


def test_hello():
    assert double_metaphone("hello", 8) == ("HL", "HL")


def test_non_convertible_passthrough():
    # "12345 #$%@#^%& hello" -> 12345, #$%@#^%&, HL (testNonConvertable*)
    toks = [t.term for t in double_metaphone_analyze("12345 hello", max_code_len=8)]
    assert toks == ["12345", "HL"]


# published Philips-2000 examples (also commons-codec's test corpus)
@pytest.mark.parametrize(
    "word,primary,alternate",
    [
        ("smith", "SM0", "XMT"),
        ("schmidt", "XMT", "SMT"),
        ("jose", "HS", "HS"),
        ("maurice", "MRS", "MRS"),
        ("aubrey", "APR", "APR"),
        ("katherine", "K0RN", "KTRN"),
        ("catherine", "K0RN", "KTRN"),
        ("richard", "RXRT", "RKRT"),
        ("geoff", "JF", "KF"),
        ("xavier", "SF", "SFR"),
        ("breaux", "PR", "PR"),
        ("giroux", "JR", "KR"),
        ("zhang", "JNK", "JNK"),
        ("school", "SKL", "SKL"),
        ("thames", "TMS", "TMS"),
        ("edge", "AJ", "AJ"),
        ("wright", "RT", "RT"),
        ("knight", "NT", "NT"),
        ("pneumonia", "NMN", "NMN"),
        ("psalm", "SLM", "SLM"),
        ("gnome", "NM", "NM"),
        ("filipowicz", "FLPT", "FLPF"),
        ("otto", "AT", "AT"),
    ],
)
def test_published_vectors(word, primary, alternate):
    assert double_metaphone(word) == (primary, alternate)


def test_alternate_stacks_at_same_position():
    # differing alternate lands at positionIncrement 0
    # (DoubleMetaphoneFilter.java:75-88)
    toks = double_metaphone_analyze("smith college")
    got = [(t.term, t.position) for t in toks]
    assert got == [("SM0", 0), ("XMT", 0), ("KLJ", 1), ("KLK", 1)]


def test_query_stack_becomes_synonym():
    from lucene_spark.search.query import SynonymQuery, parse_query

    q = parse_query("smith", double_metaphone_analyze)
    assert isinstance(q, SynonymQuery)
    assert q.terms == ("SM0", "XMT")


def test_max_code_len_caps_both_codes():
    p, a = double_metaphone("international", 2)
    assert p == "AN" and a == "AN"


def test_match_rating_vectors():
    from lucene_spark.analysis.phonetic import match_rating_encode as m

    # published commons-codec MatchRatingApproachEncoder vectors
    assert m("Smith") == "SMTH"
    assert m("Smyth") == "SMYTH"
    assert m("Catherine") == "CTHRN"
    assert m("Kathryn") == "KTHRYN"
    assert m("Auerbach") == "ARBCH"
    assert m("Williams") == "WLMS"
    assert m("Alexander") == "ALXNDR"
    assert m("Sean") == "SN"
    assert m("") == ""
    assert m("123") == ""
