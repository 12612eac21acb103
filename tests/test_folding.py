"""ASCII folding: term folding table, fold-before-stop chain order,
batch ≡ chain parity, and accented/unaccented cross-matching end-to-end."""

import numpy as np
import pytest

from lucene_spark.analysis.folding import fold_ascii, folded_analyze
from lucene_spark.analysis.vectorized import analyze_batch
from lucene_spark.constants import ENGLISH_STOP_WORDS
from lucene_spark.index import build_index
from lucene_spark.oracle.pyindex import PyIndex
from lucene_spark.search import Searcher
from lucene_spark.search.query import TermQuery

STOP = ENGLISH_STOP_WORDS


def test_fold_cases():
    assert fold_ascii("café") == "cafe"
    assert fold_ascii("naïve") == "naive"
    assert fold_ascii("übermäßig") == "ubermassig"
    assert fold_ascii("œuvre") == "oeuvre"
    assert fold_ascii("smörgåsbord") == "smorgasbord"
    assert fold_ascii("łódź") == "lodz"
    assert fold_ascii("þorn") == "thorn"
    assert fold_ascii("ascii") == "ascii"  # fast path
    assert fold_ascii("русский") == "русский"  # no ASCII equivalent: pass


def test_fold_before_stop():
    # "thé" folds to "the" and is then stop-filtered; position hole remains
    toks = folded_analyze("drink thé now", STOP)
    assert [(t.term, t.position) for t in toks] == [("drink", 0), ("now", 2)]


@pytest.mark.parametrize("stop", [None, STOP])
def test_batch_matches_chain(stop):
    texts = ["Café au lait", "", "the thé thè", "Łódź öre", "plain ascii", None]
    bt = analyze_batch(texts, stopwords=stop, analyzer="ascii_folded")
    got = sorted(
        (int(d), bt.uniques[int(c)], int(p))
        for d, c, p in zip(bt.docids, bt.codes, bt.positions)
    )
    exp = []
    exp_lens = np.zeros(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        if not t:
            continue
        toks = folded_analyze(t, stop)
        exp.extend((i, tk.term, tk.position) for tk in toks)
        exp_lens[i] = len({tk.position for tk in toks})
    assert got == sorted(exp)
    np.testing.assert_array_equal(bt.doc_lens, exp_lens)


def test_end_to_end_cross_matching(spark, tmp_path_factory):
    rows = [
        ("doc://0", "the café on the corner"),
        ("doc://1", "a cafe with cake"),
        ("doc://2", "résumé review"),
        ("doc://3", "resume review session"),
        ("doc://4", "unrelated words here"),
    ]
    d = str(tmp_path_factory.mktemp("idx_fold"))
    df = spark.createDataFrame(rows, "url string, text string")
    build_index(
        spark, df, d, num_segments=2, analyzer="ascii_folded", stopwords=STOP
    )
    s = Searcher(spark, d, analyzer="ascii_folded", stopwords=STOP)
    dm = {
        r["url"]: r["docid"]
        for r in s._docmap_global().select("url", "docid").collect()
    }
    pyidx = PyIndex(stopwords=STOP, analyzer=folded_analyze)
    for url, text in rows:
        pyidx.add(dm[url], text)
    for probe in ("cafe", "resume"):
        got = [(r["docid"], r["score"]) for r in s.search(TermQuery(probe), k=5).collect()]
        exp = pyidx.search_query(TermQuery(probe), k=5)
        assert [g for g, _ in got] == [e for e, _ in exp]
        for (gd, gs), (_ed, es) in zip(got, exp):
            assert np.float32(gs) == np.float32(es), (probe, gd)
        assert len(got) == 2, probe
    # accented query string folds at parse time through the same analyzer
    got = s.search("café", k=5).collect()
    assert len(got) == 2
