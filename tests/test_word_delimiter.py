"""WordDelimiterGraphFilter split-form semantics (analysis/worddelim.py):
case-change / letter-digit splits, possessive strip, delimiter drops, and
the batch lane's equality with the per-document chain."""

import pytest

from lucene_spark.analysis.worddelim import word_delimiter_analyze as wd


@pytest.mark.parametrize(
    "text,expected",
    [
        ("PowerShot500", [("power", 0), ("shot", 1), ("500", 2)]),
        ("HTTPServer", [("http", 0), ("server", 1)]),
        ("Wi-Fi", [("wi", 0), ("fi", 1)]),
        ("O'Neil's", [("o", 0), ("neil", 1)]),
        ("802.11n", [("802", 0), ("11", 1), ("n", 2)]),
        ("snake_caseNot", [("snake", 0), ("case", 1), ("not", 2)]),
        ("", []),
    ],
)
def test_word_delimiter_splits(text, expected):
    assert [(t.term, t.position) for t in wd(text)] == expected


def test_word_delimiter_stopword_keeps_position_gap():
    got = [(t.term, t.position) for t in wd("The WiFi", frozenset({"the"}))]
    assert got == [("wi", 1), ("fi", 2)]


def test_word_delimiter_batch_matches_token_chain(spark):
    from lucene_spark.analysis.vectorized import analyze_batch

    texts = [
        "PowerShot500 vs PowerShot",
        "Wi-Fi O'Neil's HTTPServer", "", "dataBase 802.11n",
    ]
    bt = analyze_batch(texts, analyzer="word_delimiter")
    got = {}
    for c, d, p in zip(bt.codes, bt.docids, bt.positions):
        got.setdefault(int(d), []).append((bt.uniques[int(c)], int(p)))
    exp = {
        i: [(t.term, t.position) for t in wd(txt)]
        for i, txt in enumerate(texts)
        if txt and wd(txt)
    }
    assert {k: sorted(v) for k, v in got.items()} == {
        k: sorted(v) for k, v in exp.items()
    }
