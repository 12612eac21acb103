"""EnglishAnalyzer chain: Porter stemmer golden data, possessive filter,
stop-after-strip ordering, vectorized-batch ≡ per-token differential, and
an end-to-end build+search morphological match.

Golden data: the Porter algorithm's official voc.txt/output.txt sample
(23,531 words), read from the reference test zip when present.
"""

import io
import os
import zipfile

import pytest

from lucene_spark.analysis.en import (
    english_analyze,
    english_terms_positions,
    strip_possessive,
)
from lucene_spark.analysis.porter import porter_stem
from lucene_spark.analysis.vectorized import analyze_batch
from lucene_spark.constants import ENGLISH_STOP_WORDS

PORTER_ZIP = (
    "/root/reference/lucene/analysis/common/src/test/org/apache/lucene/"
    "analysis/en/porterTestData.zip"
)

# full-pipeline outputs (verified against the official sample output)
VECTORS = [
    ("agreed", "agre"), ("caresses", "caress"), ("ponies", "poni"),
    ("ties", "ti"), ("cats", "cat"), ("feed", "feed"),
    ("plastered", "plaster"), ("motoring", "motor"), ("troubled", "troubl"),
    ("sized", "size"), ("hopping", "hop"), ("tanned", "tan"),
    ("falling", "fall"), ("hissing", "hiss"), ("fizzed", "fizz"),
    ("failing", "fail"), ("filing", "file"), ("happy", "happi"),
    ("sky", "sky"), ("relational", "relat"), ("conditional", "condit"),
    ("rational", "ration"), ("digitizer", "digit"), ("operator", "oper"),
    ("feudalism", "feudal"), ("decisiveness", "decis"),
    ("hopefulness", "hope"), ("formality", "formal"),
    ("sensitivity", "sensit"), ("triplicate", "triplic"),
    ("formative", "form"), ("formalize", "formal"),
    ("electricity", "electr"), ("electrical", "electr"),
    ("hopeful", "hope"), ("goodness", "good"), ("revival", "reviv"),
    ("allowance", "allow"), ("inference", "infer"),
    ("adjustable", "adjust"), ("defensible", "defens"),
    ("replacement", "replac"), ("dependent", "depend"),
    ("adoption", "adopt"), ("communism", "commun"), ("activate", "activ"),
    ("effective", "effect"), ("roll", "roll"),
    ("generalizations", "gener"), ("oscillators", "oscil"),
    ("controlling", "control"), ("cease", "ceas"), ("abilities", "abil"),
    # length <= 2 unchanged (PorterStemmer.java k > k0+1 guard)
    ("is", "is"), ("a", "a"), ("be", "be"),
    # digits/underscores pass through mostly untouched
    ("x123", "x123"), ("foo_bar", "foo_bar"),
]


@pytest.mark.parametrize("word,stem", VECTORS)
def test_porter_vectors(word, stem):
    assert porter_stem(word) == stem


@pytest.mark.skipif(not os.path.exists(PORTER_ZIP), reason="golden zip absent")
def test_porter_full_golden_sample():
    with zipfile.ZipFile(PORTER_ZIP) as z:
        voc = io.TextIOWrapper(z.open("voc.txt")).read().split()
        out = io.TextIOWrapper(z.open("output.txt")).read().split()
    assert len(voc) == len(out) == 23531
    bad = [(v, porter_stem(v), o) for v, o in zip(voc, out) if porter_stem(v) != o]
    assert not bad, bad[:10]


def test_possessive_strip():
    assert strip_possessive("john's") == "john"
    assert strip_possessive("john’s") == "john"
    assert strip_possessive("john＇s") == "john"
    assert strip_possessive("johns") == "johns"
    assert strip_possessive("'s") == ""
    assert strip_possessive("s") == "s"


def test_chain_order_possessive_before_stop():
    # "it's" -> possessive strip -> "it" -> stop-filtered (would survive if
    # stop ran first, since "it's" is not in the stop set)
    toks = english_analyze("it's working", stopwords=ENGLISH_STOP_WORDS)
    assert [t.term for t in toks] == ["work"]
    assert [t.position for t in toks] == [1]  # dropped token keeps its slot


def test_positions_preserved_through_stops():
    toks = english_analyze(
        "the cats and the ponies", stopwords=ENGLISH_STOP_WORDS
    )
    assert [(t.term, t.position) for t in toks] == [("cat", 1), ("poni", 4)]


def test_terms_positions_matches_token_chain():
    texts = [
        "The cats' owners are generalizing wildly",
        "it's the engineer's formality",
        "cafés aren’t running tests today",  # non-ASCII path
        "",
        "ROLLING rolled rolls roll",
    ]
    for text in texts:
        toks = english_analyze(text, stopwords=ENGLISH_STOP_WORDS)
        terms, positions = english_terms_positions(
            text, stopwords=ENGLISH_STOP_WORDS
        )
        assert terms == [t.term for t in toks]
        assert positions == [t.position for t in toks]


def test_batch_matches_per_token():
    texts = [
        "The cats' owners are generalizing wildly",
        "it's the engineer's formality",
        "cafés aren’t running tests today",
        None,
        "ROLLING rolled rolls roll",
        "a b c " * 200 + "oscillators",
    ]
    bt = analyze_batch(texts, stopwords=ENGLISH_STOP_WORDS, analyzer="english")
    got = {}
    for code, docid, pos in zip(bt.codes, bt.docids, bt.positions):
        got.setdefault(int(docid), []).append((bt.uniques[code], int(pos)))
    for i, text in enumerate(texts):
        toks = english_analyze(text or "", stopwords=ENGLISH_STOP_WORDS)
        assert got.get(i, []) == [(t.term, t.position) for t in toks], i
        assert bt.doc_lens[i] == len(toks)


def test_build_and_search_english(spark, tmp_path):
    from pyspark.sql import Row

    from lucene_spark.index import build_index
    from lucene_spark.search import Searcher

    docs = spark.createDataFrame(
        [
            Row(url="u1", text="the runner was running many runs"),
            Row(url="u2", text="a run in the park"),
            Row(url="u3", text="walking and walked walks"),
        ]
    )
    idx = str(tmp_path / "en_idx")
    build_index(
        spark, docs, idx, num_segments=2, analyzer="english",
        stopwords=ENGLISH_STOP_WORDS, index_positions=True,
    )
    s = Searcher(
        spark, idx, analyzer="english", stopwords=ENGLISH_STOP_WORDS
    )
    hits = {r["url"] for r in s.search("running", k=10, with_url=True).collect()}
    assert hits == {"u1", "u2"}  # run/running/runs all stem to "run"
    hits = {r["url"] for r in s.search("walked", k=10, with_url=True).collect()}
    assert hits == {"u3"}
    assert s.count("runs") == 2
