"""NGramPhraseQuery (search/NGramPhraseQuery.java): the rewrite keeps every
n-th gram plus the last, positions carry the gaps, and matching is
IDENTICAL to the unoptimized phrase over an n-gram tokenizer field.
The exact-score gate (vs a DuckDB gram replay) is test_gate.py's
``ngram_phrase_rewrite`` row."""

import os

import pytest
from pyspark.sql import functions as F

from lucene_spark.analysis.ngram import (
    ngram_tokenizer_tokens,
    register_ngram_tokenizer,
)
from lucene_spark.index import build_index
from lucene_spark.search import Searcher
from lucene_spark.search.query import PhraseQuery, ngram_phrase, ngram_phrase_rewrite

SF_DIR = os.environ.get("GATE_SF_DIR", "/root/testdata/sf0.001")

pytestmark = pytest.mark.skipif(
    not os.path.exists(f"{SF_DIR}/documents.parquet"),
    reason="testdata parquet not present",
)


def test_tokenizer_sequential_positions():
    toks = ngram_tokenizer_tokens("AbCd", 2)
    assert [(t.term, t.position) for t in toks] == [
        ("ab", 0), ("bc", 1), ("cd", 2)
    ]
    assert ngram_tokenizer_tokens("a", 2) == []
    with pytest.raises(ValueError):
        ngram_tokenizer_tokens("abc", 0)


def test_rewrite_rule():
    q = ngram_phrase("abcd", 2)  # grams ab bc cd -> keep ab/0 cd/2
    assert q.terms == ("ab", "cd") and q.positions == (0, 2)
    # 2 terms: not optimizable (short ones can't be optimized)
    q2 = ngram_phrase_rewrite(PhraseQuery(("ab", "bc")), 2)
    assert q2.positions is None and q2.terms == ("ab", "bc")
    # slop > 0: not optimizable
    q3 = ngram_phrase_rewrite(PhraseQuery(("ab", "bc", "cd"), slop=1), 2)
    assert q3.positions is None
    # n=1: non-overlap grams can't be optimized
    q4 = ngram_phrase_rewrite(PhraseQuery(("a", "b", "c")), 1)
    assert q4.positions is None


def test_positions_with_slop_rejected(spark, tmp_path):
    register_ngram_tokenizer("t_ngram2", 2)
    idx = str(tmp_path / "ngidx_err")
    docs = spark.createDataFrame(
        [("doc://0", "abcdef")], "url string, text string"
    )
    build_index(spark, docs, idx, num_segments=1, analyzer="t_ngram2",
                stopwords=None, index_positions=True)
    s = Searcher(spark, idx)
    bad = PhraseQuery(("ab", "cd"), slop=1, positions=(0, 2))
    with pytest.raises(Exception):
        s.search(bad, k=5).collect()


def test_rewritten_matches_equal_full_phrase(spark, tmp_path):
    register_ngram_tokenizer("t_ngram2", 2)
    idx = str(tmp_path / "ngidx")
    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .limit(200)
        .select(
            F.format_string("doc://%012d", F.col("doc_id")).alias("url"),
            "text",
        )
    )
    build_index(spark, docs, idx, num_segments=2, analyzer="t_ngram2",
                stopwords=None, index_positions=True)
    s = Searcher(spark, idx, mode="double")
    t = "data s"
    grams = tuple(t[i : i + 2] for i in range(len(t) - 1))
    full = PhraseQuery(grams)
    opt = ngram_phrase(t, 2)
    assert len(opt.terms) == 3 < len(full.terms)
    got_full = {
        (r["url"], round(r["score"], 6))
        for r in s.search(full, k=100000, with_url=True).collect()
    }
    got_opt = {r["url"] for r in s.search(opt, k=100000, with_url=True).collect()}
    # identical match set (scores differ by design: kept-terms stats)
    assert {u for u, _ in got_full} == got_opt
    assert got_opt  # nonzero
