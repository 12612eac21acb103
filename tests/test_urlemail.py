"""UAX29URLEmailTokenizer analog: URL/email spans as single tokens."""

from lucene_spark.analysis.urlemail import (
    TYPE_EMAIL,
    TYPE_URL,
    url_email_analyze,
    url_email_tokenize,
)


def toks(text):
    return [(t.term, t.position, t.type) for t in url_email_tokenize(text)]


def test_url_single_token():
    assert toks("Visit https://Spark.Example.com/docs?q=1 now!") == [
        ("Visit", 0, "<ALPHANUM>"),
        ("https://Spark.Example.com/docs?q=1", 1, TYPE_URL),
        ("now", 2, "<ALPHANUM>"),
    ]


def test_email_with_plus_and_dots():
    got = toks("mail Bob.Smith@example.org, or alice+dev@example.co.UK.")
    assert ("Bob.Smith@example.org", 1, TYPE_EMAIL) in got
    assert ("alice+dev@example.co.UK", 3, TYPE_EMAIL) in got


def test_www_and_scheme_case_insensitive():
    got = toks("see www.Lucene.example.net and HTTPS://X.example.COM/a")
    assert got[1] == ("www.Lucene.example.net", 1, TYPE_URL)
    assert got[3] == ("HTTPS://X.example.COM/a", 3, TYPE_URL)


def test_trailing_punctuation_stripped():
    got = toks("(http://a.example.io/x#frag).")
    assert got == [("http://a.example.io/x#frag", 0, TYPE_URL)]


def test_bare_prefixes_fall_back_to_words():
    got = toks("www. alone and http:// bare")
    assert [g[0] for g in got] == ["www", "alone", "and", "http", "bare"]


def test_ftp_scheme():
    assert toks("ftp://files.example.com/pub done")[0] == (
        "ftp://files.example.com/pub", 0, TYPE_URL,
    )


def test_plain_text_matches_standard_positions():
    got = toks("no urls here")
    assert got == [
        ("no", 0, "<ALPHANUM>"),
        ("urls", 1, "<ALPHANUM>"),
        ("here", 2, "<ALPHANUM>"),
    ]


def test_analyze_lowercases_urls_and_stops():
    got = url_email_analyze(
        "The site HTTPS://X.example.COM/A rocks", stopwords=frozenset({"the"})
    )
    assert [(t.term, t.position) for t in got] == [
        ("site", 1),
        ("https://x.example.com/a", 2),
        ("rocks", 3),
    ]


def test_empty_and_no_spans():
    assert url_email_tokenize("") == []
    assert url_email_analyze("...", None) == []


def test_batch_lane_equals_per_doc_chain():
    from lucene_spark.analysis.vectorized import analyze_batch

    texts = [
        "Visit https://Spark.Example.com/docs?q=1 now",
        "mail Bob.Smith@example.org today",
        None,
        "plain words only",
    ]
    bt = analyze_batch(texts, stopwords=None, analyzer="url_email")
    got = sorted(
        (int(d), int(p), bt.uniques[c])
        for d, p, c in zip(bt.docids, bt.positions, bt.codes)
    )
    exp = []
    for i, t in enumerate(texts):
        if not t:
            continue
        for tok in url_email_analyze(t, None):
            exp.append((i, tok.position, tok.term))
    assert got == sorted(exp)
