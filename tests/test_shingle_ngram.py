"""Shingle + n-gram token filters: Lucene test-vector parity
(TestShingleFilter.java fixtures), vectorized-batch ≡ per-doc chain, and
end-to-end build/search score identity vs PyIndex."""

import numpy as np
import pytest

from lucene_spark.analysis.ngram import (
    edge_ngram_analyze,
    edge_ngram_tokens,
    ngram_analyze,
    ngram_tokens,
)
from lucene_spark.analysis.shingle import shingle_analyze, shingle_tokens
from lucene_spark.analysis.tokenizer import Token, analyze
from lucene_spark.analysis.vectorized import analyze_batch
from lucene_spark.constants import ENGLISH_STOP_WORDS
from lucene_spark.fixtures import generate_webtext
from lucene_spark.index import build_index
from lucene_spark.oracle.pyindex import PyIndex
from lucene_spark.search import Searcher
from lucene_spark.search.query import TermQuery

STOP = ENGLISH_STOP_WORDS


def tok(term, pos):
    return Token(term, pos, 0, 0, "word")


# TestShingleFilter.java testTokenWithHoles (:52-57)
HOLES = [tok("please", 0), tok("divide", 1), tok("sentence", 3), tok("shingles", 5)]
PLAIN = [
    tok(w, i)
    for i, w in enumerate(["please", "divide", "this", "sentence", "into", "shingles"])
]


def tp(tokens):
    return [(t.term, t.position) for t in tokens]


def test_bigram_tokens_lucene_vector():
    # BI_GRAM_TOKENS (:59-77) terms + positions (posIncr-accumulated)
    exp = [
        ("please", 0), ("please divide", 0),
        ("divide", 1), ("divide this", 1),
        ("this", 2), ("this sentence", 2),
        ("sentence", 3), ("sentence into", 3),
        ("into", 4), ("into shingles", 4),
        ("shingles", 5),
    ]
    assert tp(shingle_tokens(PLAIN)) == exp


def test_bigram_with_holes_lucene_vector():
    # BI_GRAM_TOKENS_WITH_HOLES (:83-97)
    exp = [
        ("please", 0), ("please divide", 0),
        ("divide", 1), ("divide _", 1),
        ("_ sentence", 2),
        ("sentence", 3), ("sentence _", 3),
        ("_ shingles", 4),
        ("shingles", 5),
    ]
    assert tp(shingle_tokens(HOLES)) == exp


def test_bigram_without_unigrams_lucene_vectors():
    exp = [
        ("please divide", 0), ("divide this", 1), ("this sentence", 2),
        ("sentence into", 3), ("into shingles", 4),
    ]
    assert tp(shingle_tokens(PLAIN, output_unigrams=False)) == exp
    exp_holes = [
        ("please divide", 0), ("divide _", 1), ("_ sentence", 2),
        ("sentence _", 3), ("_ shingles", 4),
    ]
    assert tp(shingle_tokens(HOLES, output_unigrams=False)) == exp_holes


def test_trigram_sizes():
    # TRI_GRAM_TOKENS (:139-160): sizes 2..3, unigrams on
    got = tp(shingle_tokens(PLAIN, min_size=2, max_size=3))
    exp = [
        ("please", 0), ("please divide", 0), ("please divide this", 0),
        ("divide", 1), ("divide this", 1), ("divide this sentence", 1),
        ("this", 2), ("this sentence", 2), ("this sentence into", 2),
        ("sentence", 3), ("sentence into", 3), ("sentence into shingles", 3),
        ("into", 4), ("into shingles", 4),
        ("shingles", 5),
    ]
    assert got == exp


def test_ngram_and_edge_tokens():
    src = [tok("abcd", 0), tok("xy", 1)]
    got = tp(ngram_tokens(src, 2, 3))
    assert got == [
        ("ab", 0), ("abc", 0), ("bc", 0), ("bcd", 0), ("cd", 0), ("xy", 1)
    ]
    # preserve_original keeps too-short and too-long tokens
    got2 = tp(ngram_tokens([tok("a", 0), tok("abcd", 1)], 2, 2,
                           preserve_original=True))
    assert got2 == [("a", 0), ("ab", 1), ("bc", 1), ("cd", 1), ("abcd", 1)]
    assert tp(edge_ngram_tokens([tok("abcdef", 0)], 2, 4)) == [
        ("ab", 0), ("abc", 0), ("abcd", 0)
    ]


TEXTS = None


def _texts():
    corpus = generate_webtext(60)
    ts = [r["text"] for r in corpus]
    ts += ["", None, "the a the", "één ünïcode the stream",
           "aa the bb the the cc dd", "single"]
    return ts


@pytest.mark.parametrize("analyzer,chain", [
    ("shingle", shingle_analyze),
    ("ngram3", ngram_analyze),
    ("edge_ngram", edge_ngram_analyze),
])
def test_batch_matches_chain(analyzer, chain):
    texts = _texts()
    bt = analyze_batch(texts, stopwords=STOP, analyzer=analyzer)
    got = sorted(
        (int(d), bt.uniques[int(c)], int(p))
        for d, c, p in zip(bt.docids, bt.codes, bt.positions)
    )
    exp = []
    exp_lens = np.zeros(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        if not t:
            continue
        toks = chain(t, STOP)
        exp.extend((i, tk.term, tk.position) for tk in toks)
        exp_lens[i] = len({tk.position for tk in toks})
    assert got == sorted(exp)
    np.testing.assert_array_equal(bt.doc_lens, exp_lens)


@pytest.mark.parametrize("analyzer,chain,probe", [
    ("shingle", shingle_analyze, "w0001 w0002"),
    ("ngram3", ngram_analyze, "000"),
])
def test_end_to_end_scores(spark, tmp_path_factory, analyzer, chain, probe):
    corpus = generate_webtext(120)
    d = str(tmp_path_factory.mktemp(f"idx_{analyzer}"))
    df = spark.createDataFrame(
        [(r["url"], r["text"]) for r in corpus], "url string, text string"
    )
    build_index(spark, df, d, num_segments=3, analyzer=analyzer, stopwords=STOP)
    sc = Searcher(spark, d, analyzer=analyzer, stopwords=STOP)
    dm = sc._docmap_global().select("url", "docid").collect()
    url_to_docid = {r["url"]: r["docid"] for r in dm}
    pyidx = PyIndex(stopwords=STOP, analyzer=chain)
    for r in corpus:
        pyidx.add(url_to_docid[r["url"]], r["text"])
    q = TermQuery(probe)
    got = [(r["docid"], r["score"]) for r in sc.search(q, k=10).collect()]
    exp = pyidx.search_query(q, k=10)
    assert [g for g, _ in got] == [e for e, _ in exp]
    for (gd, gs), (_ed, es) in zip(got, exp):
        assert np.float32(gs) == np.float32(es), (gd, gs, es)
    assert got, f"{analyzer}: probe term should match"
