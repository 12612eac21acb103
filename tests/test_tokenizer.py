"""Golden tokenizations (TestStandardAnalyzer analog, FIXTURES.md §3.2)."""

import pytest

from lucene_spark.analysis.tokenizer import analyze, tokenize
from lucene_spark.constants import ENGLISH_STOP_WORDS


def terms(text, **kw):
    return [t.term for t in analyze(text, **kw)]


def positions(text, **kw):
    return [(t.term, t.position) for t in analyze(text, **kw)]


def test_basic_alphanum():
    assert terms("Hello, World!") == ["hello", "world"]
    assert terms("FooBAR camelCase") == ["foobar", "camelcase"]


def test_numerics():
    assert terms("3.14 is pi, top-100 list, 1,024 bytes") == [
        "3.14", "is", "pi", "top", "100", "list", "1,024", "bytes",
    ]


def test_apostrophes():
    assert terms("O'Neil's book, don't") == ["o'neil's", "book", "don't"]


def test_mid_dot_joins_letters():
    # UAX#29 WB6/7: FULL STOP between letters does not break
    assert terms("visit example.com now") == ["visit", "example.com", "now"]


def test_underscore_extendnumlet():
    assert terms("snake_case_name x_1") == ["snake_case_name", "x_1"]


def test_cjk_single_char_tokens():
    assert terms("日本語") == ["日", "本", "語"]
    assert terms("ひらがな") == ["ひ", "ら", "が", "な"]
    assert terms("カタカナ run") == ["カタカナ", "run"]
    assert terms("안녕하세요 세계") == ["안녕하세요", "세계"]


def test_emoji():
    got = [t.type for t in tokenize("🙂 🇺🇸🇫🇷 👩‍🔬")]
    assert got == ["<EMOJI>"] * 4
    assert terms("🇺🇸🇫🇷") == ["🇺🇸", "🇫🇷"]  # flags pair up (WB15/16)


def test_max_token_length_skip_increments_position():
    # StandardTokenizer.java:152-175: long token skipped, position advances
    text = ("x" * 300) + " after"
    assert positions(text) == [("after", 1)]
    text2 = "before " + ("y" * 256) + " after"
    assert positions(text2) == [("before", 0), ("after", 2)]


def test_stopword_positions_preserved():
    got = positions("the quick brown fox", stopwords=ENGLISH_STOP_WORDS)
    assert got == [("quick", 1), ("brown", 2), ("fox", 3)]


def test_empty_and_punct_only():
    assert terms("") == []
    assert terms("!!! --- ...") == []
    assert terms("   \n\t  ") == []


def test_default_no_stopwords():
    # StandardAnalyzer() defaults to the empty stop set
    assert terms("the quick") == ["the", "quick"]


def test_combining_accents():
    assert terms("café café") == ["café", "café"]


def test_offsets():
    toks = analyze("ab cd")
    assert [(t.start, t.end) for t in toks] == [(0, 2), (3, 5)]


@pytest.mark.parametrize(
    "text,want",
    [
        ("B2B", ["b2b"]),
        ("2B", ["2b"]),
        ("QUICK brown-FOX", ["quick", "brown", "fox"]),
        ("C3PO R2D2", ["c3po", "r2d2"]),
        ("1.2.3.4", ["1.2.3.4"]),
        ("a:b", ["a", "b"]),  # colon is not MidLetter since Unicode 8
    ],
)
def test_golden_mixed(text, want):
    assert terms(text) == want


# --- ASCII fast path ≡ UAX#29 DFA path (differential) -----------------------

def _dfa_tokenize(text, mtl=None):
    import lucene_spark.analysis.tokenizer as T

    mtl = mtl or T.MAX_TOKEN_LENGTH
    cps = [ord(c) for c in text]
    cls = [T._wb_class(c) for c in cps]
    bounds = T._boundaries(cps, cls)
    tokens = []
    position = -1
    skipped = 0
    for a, b in zip(bounds, bounds[1:]):
        ttype = T._segment_type(cls[a:b])
        if ttype is None:
            continue
        if b - a > mtl:
            skipped += 1
            continue
        position += 1 + skipped
        skipped = 0
        tokens.append((text[a:b], position, a, b, ttype))
    return tokens


def test_ascii_fast_path_equals_dfa_random():
    import random
    import string

    from lucene_spark.analysis.tokenizer import MAX_TOKEN_LENGTH, _tokenize_ascii

    alphabet = string.ascii_letters + string.digits + " .,';\"-_()!?/:+%$#\n\t"
    rng = random.Random(42)
    for _ in range(1500):
        s = "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 80)))
        fast = [
            (t.term, t.position, t.start, t.end, t.type)
            for t in _tokenize_ascii(s, MAX_TOKEN_LENGTH)
        ]
        assert fast == _dfa_tokenize(s), repr(s)


def test_ascii_fast_path_equals_dfa_edges():
    from lucene_spark.analysis.tokenizer import MAX_TOKEN_LENGTH, _tokenize_ascii

    for s in [
        "O'Neil's", "3.14", "1,000", "a.b.c", "a.5", "top-100", "__", "_a_",
        "1'000", "a..b", "x" * 256, "x" * 255, ("x" * 300) + " ok", "a'", "'a",
        "a_b_c 9;9 9;a", "", " ", "...", "a,b", "1;2", "_9_",
    ]:
        fast = [
            (t.term, t.position, t.start, t.end, t.type)
            for t in _tokenize_ascii(s, MAX_TOKEN_LENGTH)
        ]
        assert fast == _dfa_tokenize(s), repr(s)


def test_bulk_analyze_matches_token_chain():
    """analyze_terms_positions must be (term, position)-identical to the
    Token-object chain on random ASCII and on fixture/non-ASCII texts."""
    import random

    from lucene_spark.analysis.simple import simple_analyze, simple_terms_positions
    from lucene_spark.analysis.tokenizer import analyze, analyze_terms_positions
    from lucene_spark.constants import ENGLISH_STOP_WORDS
    from lucene_spark.fixtures import generate_webtext

    rng = random.Random(7)
    alphabet = "abcXYZ019 .,'_;-\t\n\"()" + "é漢カ한🙂"
    cases = ["", "   ", "___", "a", "can't", "3.14", "1,000", "a.b.c",
             "x" * 300, "a_b_c 4,5 e'f g.9"]
    cases += ["".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 120)))
              for _ in range(400)]
    cases += [r["text"] for r in generate_webtext(25)]
    for sw in (None, ENGLISH_STOP_WORDS, frozenset({"a", "b", "the"})):
        for text in cases:
            toks = analyze(text, stopwords=sw)
            terms, poss = analyze_terms_positions(text, stopwords=sw)
            assert terms == [t.term for t in toks], (text, sw)
            assert poss == [t.position for t in toks], (text, sw)
            stoks = simple_analyze(text, stopwords=sw)
            sterms, sposs = simple_terms_positions(text, stopwords=sw)
            assert sterms == [t.term for t in stoks], (text, sw)
            assert sposs == [t.position for t in stoks], (text, sw)
