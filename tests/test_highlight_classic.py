"""Classic Highlighter (highlight/Highlighter.java + QueryTermScorer +
SimpleFragmenter + SimpleHTMLFormatter). The DuckDB-oracle gate row
(classic_highlight) lives in test_gate.py."""

import pytest

from lucene_spark.search.highlight_classic import (
    get_best_fragments,
    idf_weighted_terms,
)


def test_fragment_boundaries_and_markup():
    # 10 tokens of 6 chars + 1 space = stride 7; fragment_size=35 splits
    # before tokens 5, 10, ... (endOffset 7i+6 >= 35k)
    words = ["stream", "window", "filter", "buffer", "padder"] * 2
    text = " ".join(words)
    frags = get_best_fragments(
        text, {"stream": 1.0}, fragment_size=35, max_fragments=4,
        merge_contiguous=False,
    )
    # both fragments contain one stream -> both score 1
    assert [(s, n) for _, s, n in frags] == [(1.0, 0), (1.0, 1)]
    assert frags[0][0] == "<B>stream</B> window filter buffer padder"
    # inter-fragment gap (the space) travels with the NEW fragment
    assert frags[1][0] == " <B>stream</B> window filter buffer padder"


def test_distinct_term_scoring():
    # QueryTermScorer: a fragment counts each distinct query term ONCE
    text = "alpha alpha beta gamma"
    frags = get_best_fragments(
        text, {"alpha": 2.0, "beta": 0.5}, fragment_size=1000,
    )
    assert len(frags) == 1
    snippet, score, _ = frags[0]
    assert score == pytest.approx(2.5)
    assert snippet == "<B>alpha</B> <B>alpha</B> <B>beta</B> gamma"


def test_merge_contiguous_fragments():
    words = ["stream", "aaaaaa", "bbbbbb", "cccccc", "dddddd",
             "stream", "eeeeee", "ffffff", "gggggg", "hhhhhh",
             "iiiiii", "jjjjjj", "kkkkkk", "llllll", "mmmmmm"]
    text = " ".join(words)
    # 3 fragments of 5 tokens; frags 0 and 1 score 1, frag 2 scores 0.
    merged = get_best_fragments(
        text, {"stream": 1.0}, fragment_size=35, max_fragments=2,
    )
    assert len(merged) == 1
    snippet, score, frag_num = merged[0]
    assert (score, frag_num) == (1.0, 0)
    assert snippet.count("<B>stream</B>") == 2
    assert snippet.endswith("hhhhhh")


def test_zero_score_fragments_dropped():
    assert get_best_fragments("nothing to see here", {"stream": 1.0}) == []


def test_trailing_text_joins_last_fragment():
    text = "stream tail!!!"
    frags = get_best_fragments(text, {"stream": 1.0}, fragment_size=1000)
    assert frags[0][0] == "<B>stream</B> tail!!!"


def test_idf_weighted_terms(spark, tmp_path):
    from lucene_spark.fixtures import generate_webtext
    from lucene_spark.index.builder import build_index
    from lucene_spark.search.searcher import Searcher
    import numpy as np

    corpus = generate_webtext(120)
    d = str(tmp_path / "hlidx")
    df = spark.createDataFrame(
        [(r["url"], r["text"]) for r in corpus], "url string, text string"
    )
    build_index(spark, df, d, num_segments=2, analyzer="simple")
    s = Searcher(spark, d, analyzer="simple")
    w = idf_weighted_terms(s, ["w0001"])
    from lucene_spark.analysis.simple import simple_terms_positions

    df_t = sum(
        1 for r in corpus if "w0001" in simple_terms_positions(r["text"], None)[0]
    )
    assert w["w0001"] == pytest.approx(np.log(120 / (df_t + 1.0)) + 1.0)
