"""UnifiedHighlighter analog: PassageScorer formula checks, formatter
rules (ellipsis, overlap merge, no-match fallback), and the distributed
mapInPandas snippet path."""

import math

import numpy as np
import pytest

from lucene_spark.analysis.tokenizer import analyze
from lucene_spark.constants import ENGLISH_STOP_WORDS
from lucene_spark.fixtures import generate_webtext
from lucene_spark.index import build_index
from lucene_spark.search import Searcher
from lucene_spark.search.highlight import (
    PassageScorer,
    _sentences,
    highlight_hits,
    highlight_text,
)

STOP = ENGLISH_STOP_WORDS


def _an(text, stopwords=None):
    return analyze(text, stopwords=stopwords)


def test_passage_scorer_formulas():
    sc = PassageScorer()
    # weight: (k1+1) * ln(1 + (1 + len/87 + 0.5)/(fd + 0.5))
    assert sc.weight(870, 3) == pytest.approx(
        2.2 * math.log(1 + (1 + 870 / 87.0 + 0.5) / 3.5)
    )
    # tf saturation
    assert sc.tf(2, 87) == pytest.approx(2 / (2 + 1.2 * ((1 - 0.75) + 0.75)))
    # position norm
    assert sc.norm(0) == pytest.approx(1 + 1 / math.log(87.0))
    # score = norm * sum tf*weight over unique terms
    per = {"a": (2, 5), "b": (1, 1)}
    exp = (
        sc.tf(2, 40) * sc.weight(100, 5) + sc.tf(1, 40) * sc.weight(100, 1)
    ) * sc.norm(10)
    assert sc.score(per, 40, 10, 100) == pytest.approx(exp)


def test_sentence_split():
    t = "One two. Three four! Five?  Six"
    spans = _sentences(t)
    assert [t[s:e] for s, e in spans] == [
        "One two. ", "Three four! ", "Five?  ", "Six"
    ]


def test_highlight_basic_and_ellipsis():
    text = "alpha beta gamma. nothing here at all. delta alpha again."
    got = highlight_text(text, {"alpha", "delta"}, _an, max_passages=2)
    # passages 1 and 3 selected; middle skipped -> ellipsis between
    assert got == (
        "<b>alpha</b> beta gamma. ... <b>delta</b> <b>alpha</b> again."
    )
    # single best passage only
    got1 = highlight_text(text, {"alpha", "delta"}, _an, max_passages=1)
    assert got1 in (
        "<b>delta</b> <b>alpha</b> again.",
        "<b>alpha</b> beta gamma. ",
    )
    assert "..." not in got1


def test_highlight_selects_higher_scoring_passage():
    sc = PassageScorer()
    text = "alpha mixed with words here. alpha alpha alpha. tail text."
    # passage 2 has freq 3 -> higher tf -> must win at max_passages=1
    got = highlight_text(text, {"alpha"}, _an, max_passages=1)
    assert got == "<b>alpha</b> <b>alpha</b> <b>alpha</b>. "
    del sc


def test_no_match_fallback():
    text = "First sentence. Second sentence. Third."
    got = highlight_text(text, {"zzz"}, _an)
    assert got == "First sentence."  # first sentence verbatim (rstripped)
    assert (
        highlight_text(text, {"zzz"}, _an, max_no_highlight_passages=0) is None
    )
    assert highlight_text(text, {"zzz"}, _an, max_no_highlight_passages=2) == (
        "First sentence. Second sentence."
    )


def test_custom_tags_and_stopword_analyzer():
    text = "the alpha and the beta."
    got = highlight_text(
        text,
        {"alpha", "beta"},
        lambda t: _an(t, STOP),
        pre_tag="[",
        post_tag="]",
    )
    assert got == "the [alpha] and the [beta]."


def test_distributed_highlight(spark, tmp_path_factory):
    corpus = generate_webtext(200)
    d = str(tmp_path_factory.mktemp("idx_hl"))
    docs = spark.createDataFrame(
        [(r["url"], r["text"]) for r in corpus], "url string, text string"
    )
    build_index(spark, docs, d, num_segments=3, stopwords=STOP)
    s = Searcher(spark, d, stopwords=STOP)
    out = highlight_hits(s, "w0001 OR w0002", docs, k=5).collect()
    assert len(out) == 5
    hits = [
        (r["url"], np.float32(r["score"]))
        for r in s.search("w0001 OR w0002", k=5, with_url=True).collect()
    ]
    assert [(r["url"], np.float32(r["score"])) for r in out] == hits
    for r in out:
        snip = r["snippet"]
        assert snip and "<b>" in snip
        # every highlighted span is a query term
        import re

        for m in re.finditer(r"<b>(.*?)</b>", snip):
            assert m.group(1).lower() in ("w0001", "w0002")


def test_highlight_docs_searcherless(spark):
    from lucene_spark.search.highlight import highlight_docs

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma. delta alpha here."),
            (2, "no match in this one. second sentence."),
            (3, None),
        ],
        "doc_id bigint, text string",
    )
    out = {
        r["doc_id"]: r["snippet"]
        for r in highlight_docs(
            docs, {"alpha", "delta"}, lambda t: analyze(t), max_passages=2
        ).collect()
    }
    assert out[1] == "<b>alpha</b> beta gamma. <b>delta</b> <b>alpha</b> here."
    # no-match fallback: first sentence verbatim
    assert out[2] == "no match in this one."
    # empty/null text -> None snippet
    assert out[3] is None
