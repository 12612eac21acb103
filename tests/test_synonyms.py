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


# --- query-time multi-word synonym graph -------------------------------------

def test_graph_paths_multiword_to_single():
    from lucene_spark.analysis.synonyms import synonym_graph_paths

    paths = synonym_graph_paths(
        ["machine", "learning", "rocks"], {"machine learning": "ml"}
    )
    assert set(paths) == {
        ("machine", "learning", "rocks"),
        ("ml", "rocks"),
    }


def test_graph_paths_single_to_multiword():
    from lucene_spark.analysis.synonyms import synonym_graph_paths

    paths = synonym_graph_paths(["ml", "rocks"], {"ml": "machine learning"})
    assert set(paths) == {("ml", "rocks"), ("machine", "learning", "rocks")}


def test_graph_paths_longest_match_wins():
    from lucene_spark.analysis.synonyms import synonym_graph_paths

    paths = synonym_graph_paths(
        ["new", "york", "city"],
        {"new york": "ny", "new york city": "nyc"},
    )
    # the 3-token rule wins; the 2-token rule never fires
    assert set(paths) == {("new", "york", "city"), ("nyc",)}


def test_graph_paths_no_keep_original():
    from lucene_spark.analysis.synonyms import synonym_graph_paths

    paths = synonym_graph_paths(["a", "b"], {"a b": "c"}, keep_original=False)
    assert paths == (("c",),)


def test_graph_paths_multiple_rules_compose():
    from lucene_spark.analysis.synonyms import synonym_graph_paths

    paths = synonym_graph_paths(
        ["fast", "hash", "join"], {"hash join": "merge", "fast": "quick"}
    )
    assert set(paths) == {
        ("fast", "hash", "join"), ("fast", "merge"),
        ("quick", "hash", "join"), ("quick", "merge"),
    }


def test_graph_paths_cap():
    import pytest
    from lucene_spark.analysis.synonyms import synonym_graph_paths

    toks = ["a"] * 12
    with pytest.raises(ValueError, match="paths"):
        synonym_graph_paths(toks, {"a": ["b", "c", "d"]}, max_paths=100)


def test_searcher_synonym_graph_end_to_end(spark, tmp_path):
    """A doc matching only via the synonym alternative is found, and its
    score equals the automaton query's score for the same paths."""
    from lucene_spark.index.builder import build_index
    from lucene_spark.search.query import TermAutomatonQuery
    from lucene_spark.search.searcher import Searcher

    docs = spark.createDataFrame(
        [
            ("doc://000000000000", "the hash join plan wins"),
            ("doc://000000000001", "a merge strategy instead"),
            ("doc://000000000002", "nothing relevant here"),
        ],
        "url string, text string",
    )
    d = str(tmp_path / "syn")
    build_index(spark, docs, d, num_segments=1, analyzer="simple")
    s = Searcher(spark, d, analyzer="simple", mode="double")
    q = s.synonym_graph_query("hash join", {"hash join": "merge"})
    assert isinstance(q, TermAutomatonQuery)
    got = {r["url"]: r["score"] for r in s.search(q, k=10, with_url=True).collect()}
    assert set(got) == {"doc://000000000000", "doc://000000000001"}
    manual = TermAutomatonQuery(paths=(("hash", "join"), ("merge",)))
    manual_scores = {
        r["url"]: r["score"] for r in s.search(manual, k=10, with_url=True).collect()
    }
    assert got == manual_scores
