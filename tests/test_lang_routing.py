"""Per-document language routing (analyze_batch_routed +
build_index(lang_col=, lang_analyzers=)) — the multilingual-webtext
per-row form of PerFieldAnalyzerWrapper. The exact-value BM25 gate is
multilingual_routed_index in test_gate.py."""

import numpy as np
import pytest

from lucene_spark.analysis.vectorized import analyze_batch, analyze_batch_routed
from lucene_spark.index import build_index
from lucene_spark.search import Searcher
from lucene_spark.search.query import TermQuery


def _doc_tokens(bt, doc: int):
    idx = np.flatnonzero(bt.docids == doc)
    return [
        (bt.uniques[bt.codes[i]], int(bt.positions[i])) for i in idx
    ]


def test_routed_equals_per_language_runs():
    texts = [
        "running quickly", "running schnell", "北京大学",
        "walking slowly", "kotem i koty",
    ]
    route = ["english", "german", "smartcn", "english", "polish"]
    bt = analyze_batch_routed(texts, route)
    for i, (t, an) in enumerate(zip(texts, route)):
        solo = analyze_batch([t], analyzer=an)
        assert _doc_tokens(bt, i) == _doc_tokens(solo, 0), (i, an)
        assert bt.doc_lens[i] == solo.doc_lens[0]


def test_routed_single_group_fast_path():
    texts = ["a b", "c d"]
    bt = analyze_batch_routed(texts, ["standard", "standard"])
    solo = analyze_batch(texts, analyzer="standard")
    assert bt.uniques == solo.uniques
    assert bt.codes.tolist() == solo.codes.tolist()


def test_routed_length_mismatch():
    with pytest.raises(ValueError):
        analyze_batch_routed(["a"], ["standard", "english"])


def test_build_index_lang_routing(spark, tmp_path):
    d = str(tmp_path / "ml")
    docs = spark.createDataFrame(
        [
            ("doc://0", "running fast", "en"),
            ("doc://1", "running schnell", "de"),
            ("doc://2", "jumped high", "en"),
            ("doc://3", "北京大学", "zh"),
            ("doc://4", "koty w miastach", "pl"),
        ],
        "url string, text string, lang string",
    )
    build_index(
        spark, docs, d, num_segments=2, lang_col="lang",
        lang_analyzers={
            "en": "english", "de": "standard", "zh": "smartcn", "pl": "polish",
        },
        stopwords=None,
    )
    s = Searcher(spark, d)

    def hits(term):
        return sorted(
            r["url"] for r in s.search(TermQuery(term), k=10, with_url=True).collect()
        )

    assert hits("run") == ["doc://0"]       # Porter on the en row only
    assert hits("running") == ["doc://1"]   # verbatim on the de row
    assert hits("北京") == ["doc://3"]       # HHMM segmentation
    assert hits("kot") == ["doc://4"]       # stempel stem
    import json
    import os

    meta = json.load(open(os.path.join(d, "index_meta.json")))
    assert meta["lang_col"] == "lang"
    assert meta["lang_analyzers"]["zh"] == "smartcn"


def test_build_index_lang_routing_validation(spark, tmp_path):
    docs = spark.createDataFrame(
        [("doc://0", "x", "en")], "url string, text string, lang string"
    )
    with pytest.raises(ValueError, match="go together"):
        build_index(spark, docs, str(tmp_path / "a"), lang_col="lang")
    with pytest.raises(ValueError, match="single-field"):
        build_index(
            spark, docs, str(tmp_path / "b"), lang_col="lang",
            lang_analyzers={"en": "english"},
            fields={"body": "text"},
        )
    with pytest.raises(KeyError):
        build_index(
            spark, docs, str(tmp_path / "c"), lang_col="lang",
            lang_analyzers={"en": "nosuchanalyzer"},
        )


def test_search_per_call_analyzer_override(spark, tmp_path):
    """Query-side of the multilingual story: search(query, analyzer=)
    analyzes THIS query string with the named chain without touching the
    searcher's default."""
    d = str(tmp_path / "mlq")
    docs = spark.createDataFrame(
        [
            ("doc://0", "running fast", "en"),
            ("doc://1", "laufen schnell", "de"),
        ],
        "url string, text string, lang string",
    )
    build_index(
        spark, docs, d, num_segments=1, lang_col="lang",
        lang_analyzers={"en": "english", "de": "german"}, stopwords=None,
    )
    s = Searcher(spark, d)  # default: standard chain

    def hits(q, **kw):
        return sorted(
            r["url"] for r in s.search(q, k=10, with_url=True, **kw).collect()
        )

    # the German surface 'laufen' indexed under the german chain's stem;
    # the override stems the QUERY the same way — the default chain's
    # verbatim term misses it
    assert hits("laufen", analyzer="german") == ["doc://1"]
    assert hits("laufen") == []
    # english override: 'runs' stems to 'run', matching running->run
    assert hits("runs", analyzer="english") == ["doc://0"]
    assert hits("runs") == []
    # Query objects carry analyzed terms; the override now raises
    # (test_analyzer_override_rejected_for_query_objects) instead of the
    # round-4 silently-ignore behavior ADVICE flagged
    assert hits(TermQuery("run")) == ["doc://0"]


def test_analyzer_override_rejected_for_query_objects(spark, tmp_path):
    # ADVICE r4: a Query object carries already-analyzed terms, so a
    # per-call analyzer= must raise instead of being silently ignored
    from lucene_spark.search.query import TermQuery

    d = str(tmp_path / "qobj")
    docs = spark.createDataFrame(
        [("doc://0", "running fast", "en")],
        "url string, text string, lang string",
    )
    build_index(spark, docs, d, num_segments=1, stopwords=None)
    s = Searcher(spark, d)
    with pytest.raises(ValueError, match="string queries"):
        s.search(TermQuery("running"), k=5, analyzer="english")
