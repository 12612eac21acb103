"""Term vectors (index/termvectors.py) + FastVectorHighlighter
(search/fvh.py): offsets are exact, fragments follow SimpleFragListBuilder
greedy consumption, snippets slice the stored text."""

import pytest

from lucene_spark.index.termvectors import (
    read_term_vectors,
    term_vectors_df,
    write_term_vectors,
)
from lucene_spark.search.fvh import _best_fragments, fvh_fragments


def test_vectors_positions_and_offsets(spark):
    docs = spark.createDataFrame(
        [("u1", "Alpha beta alpha; gamma ALPHA.")], "url string, text string"
    )
    rows = {r["term"]: r for r in term_vectors_df(docs).collect()}
    a = rows["alpha"]
    assert int(a["freq"]) == 3
    assert list(a["positions"]) == [0, 2, 4]
    assert list(a["starts"]) == [0, 11, 24]
    assert list(a["ends"]) == [5, 16, 29]
    # offsets point at the ORIGINAL surface forms
    text = "Alpha beta alpha; gamma ALPHA."
    assert [text[s:e].lower() for s, e in zip(a["starts"], a["ends"])] == [
        "alpha", "alpha", "alpha",
    ]


def test_write_read_roundtrip(spark, tmp_path):
    d = str(tmp_path / "tv")
    docs = spark.createDataFrame(
        [("u1", "one two two three"), ("u2", "three one")],
        "url string, text string",
    )
    write_term_vectors(docs, d)
    tv = read_term_vectors(spark, d)
    assert tv.count() == 5
    two = tv.filter("url = 'u1' and term = 'two'").collect()[0]
    assert int(two["freq"]) == 2 and list(two["positions"]) == [1, 2]


def test_greedy_fraglist_builder():
    # matches at 0-5, 20-25, 90-95, 300-305; frag size 100, margin 6
    offs = [(0, 5), (20, 25), (90, 95), (300, 305)]
    frags = _best_fragments(offs, 100, 6, 10)
    # first fragment opens at 0 (margin clamp), consumes the first three
    assert frags[0] == (0, 100, 3)
    assert (294, 394, 1) in frags
    # max_frags keeps the best by (score DESC, start ASC)
    assert _best_fragments(offs, 100, 6, 1) == [(0, 100, 3)]


def test_fvh_snippets(spark):
    text = ("filler " * 20) + "needle in the stack " + ("filler " * 20) + "needle end"
    docs = spark.createDataFrame([("u1", text), ("u2", "no match here")],
                                 "url string, text string")
    tv = term_vectors_df(docs)
    out = fvh_fragments(docs, tv, ["needle"], frag_char_size=30, margin=5,
                        max_frags=2).collect()
    assert {r["url"] for r in out} == {"u1"}
    snips = [r["snippet"] for r in out]
    assert all("needle" in s for s in snips)
    starts = sorted(int(r["frag_start"]) for r in out)
    assert starts[0] == text.index("needle") - 5
