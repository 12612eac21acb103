"""ClassicAnalyzer (pre-3.1 StandardTokenizer grammar), filter pack 3,
and QueryAutoStopWordAnalyzer.

Classic vectors are replayed from the reference's TestClassicAnalyzer.java
(:84-230) with the same default stop set; filter semantics from the
miscellaneous/* javadocs and incrementToken loops cited in
analysis/filters.py."""

import pytest

from lucene_spark.analysis.classic import classic_analyze, classic_tokenize
from lucene_spark.analysis.filters import (
    capitalization_filter,
    codepoint_count_filter,
    conditional_filter,
    date_recognizer,
    hyphenated_words,
    keyword_repeat,
    limit_token_offset,
    limit_token_position,
    remove_duplicates,
    type_token_filter,
)
from lucene_spark.analysis.tokenizer import Token
from lucene_spark.constants import ENGLISH_STOP_WORDS


def terms(text, stop=None):
    return [t.term for t in classic_analyze(text, stopwords=stop)]


CLASSIC_VECTORS = [
    # TestClassicAnalyzer vectors (stopless unless noted)
    ("B2B", ["b2b"]),
    ("2B", ["2b"]),
    ("some-dashed-phrase", ["some", "dashed", "phrase"]),
    ("dogs,chase,cats", ["dogs", "chase", "cats"]),
    ("ac/dc", ["ac", "dc"]),
    ("O'Reilly", ["o'reilly"]),
    ("you're", ["you're"]),
    ("she's", ["she"]),
    ("Jim's", ["jim"]),
    ("don't", ["don't"]),
    ("O'Reilly's", ["o'reilly"]),
    ("s-class", ["s", "class"]),
    ("t-com", ["t", "com"]),
    ("AT&T", ["at&t"]),
    ("Excite@Home", ["excite@home"]),
    ("www.nutch.org", ["www.nutch.org"]),
    ("test@example.com", ["test@example.com"]),
    ("first.lastname@example.com", ["first.lastname@example.com"]),
    ("first_lastname@example.com", ["first_lastname@example.com"]),
    ("21.35", ["21.35"]),
    ("R2D2 C3PO", ["r2d2", "c3po"]),
    ("216.239.63.104", ["216.239.63.104"]),
    ("1-2-3", ["1-2-3"]),
    ("a1-b2-c3", ["a1-b2-c3"]),
    ("a1-b-c3", ["a1-b-c3"]),
    ("David has 5000 bones", ["david", "has", "5000", "bones"]),
    ("C embedded developers wanted", ["c", "embedded", "developers", "wanted"]),
    ("foo bar FOO BAR", ["foo", "bar", "foo", "bar"]),
    ('"QUOTED" word', ["quoted", "word"]),
    ("U.S.A.", ["usa"]),
    ("C++", ["c"]),
    ("C#", ["c"]),
    ("안녕하세요 한글입니다", ["안녕하세요", "한글입니다"]),
    ("2004.jpg", ["2004.jpg"]),
]


@pytest.mark.parametrize("text,expected", CLASSIC_VECTORS, ids=lambda v: str(v)[:30])
def test_classic_vectors(text, expected):
    assert terms(text) == expected


def test_classic_with_stopwords():
    # testTSADash / testUnderscores use the default English stop set
    assert terms("a-class", ENGLISH_STOP_WORDS) == ["class"]
    assert terms("word_having_underscore") == ["word", "having", "underscore"]
    assert terms("word_with_underscore_and_stopwords", ENGLISH_STOP_WORDS) == [
        "word", "underscore", "stopwords",
    ]


def test_classic_acronym_dep_host():
    # testLucene1140: trailing-dot host goes through ACRONYM_DEP → <HOST>
    toks = classic_tokenize("www.nutch.org.")
    assert [(t.term, t.type) for t in toks] == [("www.nutch.org", "<HOST>")]


# --- filter pack 3 -------------------------------------------------------


def test_capitalization_filter():
    f = capitalization_filter()
    assert f("hello") == "Hello"
    assert f("hello world") == "Hello world"  # onlyFirstWord lowercases rest
    f_all = capitalization_filter(only_first_word=False)
    assert f_all("hello world") == "Hello World"
    f_keep = capitalization_filter(keep=["iPhone"], force_first_letter=False)
    assert f_keep("iPhone") == "iPhone"
    f_keep2 = capitalization_filter(keep=["iphone"], force_first_letter=True)
    assert f_keep2("iphone") == "Iphone"  # wordCount==0 forces first letter
    f_pref = capitalization_filter(ok_prefix=["mc"], only_first_word=False)
    assert f_pref("mcdonald rocks") == "mcdonald Rocks"
    f_min = capitalization_filter(min_word_length=3)
    assert f_min("ab") == "ab"
    f_cnt = capitalization_filter(only_first_word=False, max_word_count=1)
    assert f_cnt("one two") == "one two"  # exceeded: reverts whole term


def test_keyword_repeat_and_remove_duplicates():
    from lucene_spark.analysis.porter import porter_stem

    f = keyword_repeat(porter_stem)
    toks = f([Token("running", 0, 0, 7, "word"), Token("run", 1, 8, 11, "word")])
    got = [(t.term, t.position) for t in toks]
    # running stems to 'run' → both copies; 'run' stems to itself → one
    assert got == [("running", 0), ("run", 0), ("run", 1)]
    dup = remove_duplicates(
        [
            Token("a", 0, 0, 1, "w"),
            Token("a", 0, 0, 1, "w"),
            Token("b", 0, 0, 1, "w"),
            Token("a", 1, 2, 3, "w"),
        ]
    )
    assert [(t.term, t.position) for t in dup] == [("a", 0), ("b", 0), ("a", 1)]


def test_hyphenated_words():
    f = hyphenated_words
    toks = [
        Token("ecologi-", 0, 0, 8, "w"),
        Token("cal", 1, 9, 12, "w"),
        Token("niche", 2, 13, 18, "w"),
    ]
    got = [(t.term, t.position, t.start, t.end) for t in f(toks)]
    assert got == [("ecological", 0, 0, 12), ("niche", 2, 13, 18)]
    # trailing hyphen at end-of-stream gets the hyphen back
    got2 = [(t.term,) for t in f([Token("dang-", 0, 0, 5, "w")])]
    assert got2 == [("dang-",)]


def test_date_recognizer():
    f = date_recognizer()
    assert f("Jan 12, 1952") == "Jan 12, 1952"
    assert f("notadate") is None
    f_iso = date_recognizer(["%Y-%m-%d"])
    assert f_iso("2023-02-15") == "2023-02-15"
    assert f_iso("2023-13-40") is None


def test_codepoint_count_filter():
    f = codepoint_count_filter(2, 4)
    assert f("ab") == "ab"
    assert f("a") is None
    assert f("abcde") is None
    assert f("日本語") == "日本語"  # codepoints, not bytes
    with pytest.raises(ValueError):
        codepoint_count_filter(5, 2)


def test_limit_filters_and_type_filter():
    toks = [
        Token("a", 0, 0, 1, "<ALPHANUM>"),
        Token("b1", 1, 5, 7, "<NUM>"),
        Token("c", 2, 10, 11, "<ALPHANUM>"),
    ]
    assert [t.term for t in limit_token_offset(5)(toks)] == ["a", "b1"]
    assert [t.term for t in limit_token_position(2)(toks)] == ["a", "b1"]
    assert [t.term for t in type_token_filter(["<NUM>"])(toks)] == ["a", "c"]
    assert [t.term for t in type_token_filter(["<NUM>"], use_whitelist=True)(toks)] == ["b1"]


def test_conditional_filter():
    f = conditional_filter(lambda t: t.startswith("x"), lambda t: t.upper())
    assert f("xray") == "XRAY"
    assert f("yankee") == "yankee"


# --- QueryAutoStopWordAnalyzer ------------------------------------------


def test_auto_stopwords(spark, tmp_path_factory):
    from lucene_spark.analysis.autostop import auto_stopwords
    from lucene_spark.index import build_index
    from lucene_spark.index.reader import IndexReader
    from lucene_spark.search import Searcher

    # 'common' in 9/10 docs (df 0.9), 'rare' in 1
    docs = [
        (f"doc://{i}", ("common " if i else "rare ") + f"w{i}")
        for i in range(10)
    ]
    d = str(tmp_path_factory.mktemp("idx_autostop"))
    df = spark.createDataFrame(docs, "url string, text string")
    build_index(spark, df, d, num_segments=2, stopwords=None)
    reader = IndexReader(spark, d)
    stops = auto_stopwords(reader)  # df > 0.4 * 10 = 4
    assert "common" in stops
    assert "rare" not in stops and "w3" not in stops
    # absolute threshold form (QueryAutoStopWordAnalyzer.java:79)
    assert "common" not in auto_stopwords(reader, max_doc_freq=20)
    # composes like the Java wrapper: the query drops the hot term
    s = Searcher(spark, d, stopwords=frozenset(stops))
    hits = s.search("common OR rare", k=10).collect()
    assert len(hits) == 1  # only the 'rare' doc — 'common' auto-stopped
