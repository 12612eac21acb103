"""MoreLikeThis: term selection vs an independent python computation and
engine ranking vs the PyIndex oracle, both boost modes
(queries/mlt/MoreLikeThis.java:594-678)."""

import math

import numpy as np
import pytest

from lucene_spark.analysis.tokenizer import analyze
from lucene_spark.constants import ENGLISH_STOP_WORDS
from lucene_spark.fixtures import generate_webtext
from lucene_spark.index import build_index
from lucene_spark.oracle.pyindex import PyIndex
from lucene_spark.search import Searcher
from lucene_spark.search.mlt import MoreLikeThis

N_DOCS = 250
STOP = ENGLISH_STOP_WORDS


@pytest.fixture(scope="module")
def corpus():
    return generate_webtext(N_DOCS)


@pytest.fixture(scope="module")
def searcher(spark, corpus, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("index_mlt"))
    df = spark.createDataFrame(
        [(r["url"], r["text"]) for r in corpus], "url string, text string"
    )
    build_index(spark, df, d, num_segments=3, stopwords=STOP)
    return Searcher(spark, d, stopwords=STOP)


@pytest.fixture(scope="module")
def pyidx(corpus, searcher):
    dm = searcher._docmap_global().select("url", "docid").collect()
    url_to_docid = {r["url"]: r["docid"] for r in dm}
    idx = PyIndex(stopwords=STOP)
    for r in corpus:
        idx.add(url_to_docid[r["url"]], r["text"])
    return idx


def py_interesting(pyidx, text, *, min_term_freq=2, min_doc_freq=5,
                   max_doc_freq=2**31 - 1, max_query_terms=25):
    tf_map = {}
    for t in analyze(text, stopwords=STOP):
        tf_map[t.term] = tf_map.get(t.term, 0) + 1
    out = []
    for w, tf in tf_map.items():
        if tf < min_term_freq:
            continue
        df = pyidx.doc_freq(w)
        if df < min_doc_freq or df > max_doc_freq or df == 0:
            continue
        idf = math.log((pyidx.doc_count + 1) / float(df + 1)) + 1.0
        out.append((w, tf * idf, tf, df))
    out.sort(key=lambda x: (-x[1], x[0]))
    return out[:max_query_terms]


def test_interesting_terms_matches_python(searcher, pyidx, corpus):
    text = corpus[10]["text"]
    got = MoreLikeThis(searcher).interesting_terms(text)
    exp = py_interesting(pyidx, text)
    assert len(exp) > 0
    assert got == pytest.approx(exp) or got == exp
    assert [g[0] for g in got] == [e[0] for e in exp]
    np.testing.assert_allclose(
        [g[1] for g in got], [e[1] for e in exp], rtol=0, atol=0
    )


def test_mlt_search_matches_pyindex(searcher, pyidx, corpus):
    text = corpus[10]["text"]
    for boost in (False, True):
        mlt = MoreLikeThis(searcher, boost=boost, boost_factor=1.5)
        ast = mlt.like_text(text)
        got = [
            (r["docid"], np.float32(r["score"]))
            for r in mlt.search(text, k=10).collect()
        ]
        exp = pyidx.search_query(ast, k=10)
        assert [d for d, _s in got] == [d for d, _s in exp], f"boost={boost}"
        np.testing.assert_array_equal(
            np.array([s for _d, s in got], dtype=np.float32),
            np.array([s for _d, s in exp], dtype=np.float32),
            err_msg=f"boost={boost}",
        )


def test_min_filters_and_empty(searcher, pyidx, corpus):
    text = corpus[10]["text"]
    kw = dict(min_term_freq=3, min_doc_freq=50, max_doc_freq=240,
              max_query_terms=7)
    got = MoreLikeThis(searcher, **kw).interesting_terms(text)
    exp = py_interesting(pyidx, text, **kw)
    assert got == exp
    assert len(got) <= 7
    # a like-text with no qualifying terms yields MatchNoDocs -> no hits
    mlt = MoreLikeThis(searcher)
    assert mlt.search("zzz unseen tokens only", k=5).count() == 0
