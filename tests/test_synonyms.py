"""Index-time synonym expansion: chain/batch parity and end-to-end score
identity vs the python oracle, including phrase matches across stacked
(posIncr 0) synonym positions."""

import numpy as np
import pytest

from lucene_spark.analysis.synonyms import check_rules, synonym_tokens
from lucene_spark.analysis.tokenizer import analyze
from lucene_spark.analysis.vectorized import _synonym_post, analyze_batch
from lucene_spark.index import build_index
from lucene_spark.oracle.pyindex import PyIndex
from lucene_spark.search import Searcher
from lucene_spark.search.query import PhraseQuery, SynonymQuery, TermQuery

RULES = check_rules({"alpha": ("flow",), "beta": ["flow", "creek"], "gone": "x"})


def tp(tokens):
    return [(t.term, t.position) for t in tokens]


def test_chain_keep_and_replace():
    toks = analyze("alpha beta gamma")
    assert tp(synonym_tokens(toks, RULES)) == [
        ("alpha", 0), ("flow", 0),
        ("beta", 1), ("flow", 1), ("creek", 1),
        ("gamma", 2),
    ]
    assert tp(synonym_tokens(toks, RULES, keep_original=False)) == [
        ("flow", 0), ("flow", 1), ("creek", 1), ("gamma", 2),
    ]


def test_rule_validation():
    with pytest.raises(ValueError):
        check_rules({"big data": ("bigdata",)})
    with pytest.raises(ValueError):
        check_rules({"data": ("big data",)})


@pytest.mark.parametrize("keep", [True, False])
def test_batch_matches_chain(keep):
    texts = ["alpha beta gamma", "", "beta beta", "delta", None, "alpha"]
    bt = _synonym_post(
        analyze_batch(texts, analyzer="standard"), RULES, keep
    )
    got = sorted(
        (int(d), bt.uniques[int(c)], int(p))
        for d, c, p in zip(bt.docids, bt.codes, bt.positions)
    )
    exp = []
    exp_lens = np.zeros(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        if not t:
            continue
        toks = synonym_tokens(analyze(t), RULES, keep)
        exp.extend((i, tk.term, tk.position) for tk in toks)
        exp_lens[i] = len({tk.position for tk in toks})
    assert got == sorted(exp)
    np.testing.assert_array_equal(bt.doc_lens, exp_lens)


N_DOCS = 150
VOCAB = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "pad1", "pad2"]


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(5)
    rows = []
    for i in range(N_DOCS):
        n = int(rng.integers(5, 30))
        toks = [VOCAB[int(t)] for t in rng.integers(0, len(VOCAB), size=n)]
        rows.append((f"doc://{i:06d}", " ".join(toks)))
    return rows


@pytest.fixture(scope="module")
def searcher(spark, corpus, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("idx_syn"))
    df = spark.createDataFrame(corpus, "url string, text string")
    build_index(
        spark, df, d, num_segments=3, stopwords=None,
        synonyms={"alpha": ("flow",), "beta": ("flow", "creek")},
    )
    return Searcher(spark, d, stopwords=None)


@pytest.fixture(scope="module")
def pyidx(corpus, searcher):
    dm = searcher._docmap_global().select("url", "docid").collect()
    url_to_docid = {r["url"]: r["docid"] for r in dm}
    rules = check_rules({"alpha": ("flow",), "beta": ("flow", "creek")})
    idx = PyIndex(
        stopwords=None,
        analyzer=lambda t, sw=None: synonym_tokens(analyze(t, sw), rules),
    )
    for url, text in corpus:
        idx.add(url_to_docid[url], text)
    return idx


def _check(searcher, pyidx, q, k=10):
    exp = pyidx.search_query(q, k=k)
    got = [(r["docid"], r["score"]) for r in searcher.search(q, k=k).collect()]
    assert [d for d, _ in got] == [d for d, _ in exp], f"{q}"
    for (gd, gs), (_ed, es) in zip(got, exp):
        assert np.float32(gs) == np.float32(es), (q, gd, gs, es)
    return got


def test_end_to_end_synonym_term(searcher, pyidx):
    # 'flow' matches every doc containing alpha or beta, freq = sum
    got = _check(searcher, pyidx, TermQuery("flow"))
    assert got
    # originals still searchable
    _check(searcher, pyidx, TermQuery("alpha"))
    _check(searcher, pyidx, TermQuery("creek"))


def test_phrase_through_stacked_position(searcher, pyidx):
    # "flow gamma" matches "<alpha|beta> gamma" via the stacked position
    got = _check(searcher, pyidx, PhraseQuery(("flow", "gamma")))
    assert got
    _check(searcher, pyidx, SynonymQuery(("flow", "delta")))
