"""The round-3 pluggable-Similarity family (Classic TF-IDF, DFR GB2,
IB LL-DF-H2, DFI chi-squared, Axiomatic F2EXP, Indri Dirichlet — see
search/scorers.py for the reference citations). Each mode's scores are
verified on a MULTI-segment index against a direct python re-derivation
from the raw corpus, so global collection stats, the k-way impact
skylines, and the WAND/block-max pruning paths are all exercised per
similarity (the single-segment DuckDB oracle gate covers the same
formulas independently)."""

import numpy as np
import pytest

from lucene_spark.analysis.tokenizer import analyze
from lucene_spark.constants import ENGLISH_STOP_WORDS
from lucene_spark.fixtures import generate_webtext
from lucene_spark.functions.smallfloat import BYTE4_DECODE_TABLE, int_to_byte4
from lucene_spark.index import build_index
from lucene_spark.search import Searcher

STOP = ENGLISH_STOP_WORDS
LOG2 = float(np.log(2.0))


@pytest.fixture(scope="module")
def corpus():
    return generate_webtext(250)


@pytest.fixture(scope="module")
def idx(spark, corpus, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("sim_idx"))
    df = spark.createDataFrame(
        [(r["url"], r["text"]) for r in corpus], "url string, text string"
    )
    build_index(spark, df, d, num_segments=3, stopwords=STOP)
    return d


@pytest.fixture(scope="module")
def model(spark, corpus, idx):
    s = Searcher(spark, idx, stopwords=STOP)
    toks = {
        r["url"]: [t.term for t in analyze(r["text"], stopwords=STOP)]
        for r in corpus
    }
    dm = {
        r["url"]: r["docid"]
        for r in s._docmap_global().select("url", "docid").collect()
    }
    return toks, dm


def _qdl(n: int) -> float:
    return float(BYTE4_DECODE_TABLE[int(int_to_byte4(np.array([n]))[0])])


def _term_stats(toks, term):
    df = sum(1 for v in toks.values() if term in v)
    ttf = sum(v.count(term) for v in toks.values())
    n = len(toks)
    sum_ttf = sum(len(v) for v in toks.values())
    return df, ttf, n, sum_ttf


def _expected(mode, toks, dm, term):
    df, ttf, n, sum_ttf = _term_stats(toks, term)
    avgdl = sum_ttf / n
    out = {}
    for url, v in toks.items():
        f = float(v.count(term))
        if f == 0:
            continue
        dl = _qdl(len(v))
        if mode == "classic":
            idf = np.log((n + 1.0) / (df + 1.0)) + 1.0
            sc = idf * np.sqrt(f) * (1.0 / np.sqrt(dl))
        elif mode == "dfr_gb2":
            lam = (ttf + 1.0) / (n + (ttf + 1.0))
            a = np.log(lam + 1.0) / LOG2
            b = np.log((1.0 + lam) / lam) / LOG2
            tfn = f * (np.log(1.0 + avgdl / dl) / LOG2)
            sc = (b - (b - a) / (1.0 + tfn)) * ((ttf + 2.0) / (df + 1.0))
        elif mode == "ib_ll":
            lam = float(np.float32((df + 1.0) / (n + 1.0)))
            tfn = f * (np.log(1.0 + avgdl / dl) / LOG2)
            sc = -np.log(lam / (tfn + lam))
        elif mode == "dfi_chi2":
            e = (ttf + 1.0) * dl / (sum_ttf + 1.0)
            sc = 0.0 if f <= e else np.log((f - e) * (f - e) / e + 1.0) / LOG2
        elif mode == "axiomatic_f2exp":
            den = 0.25 + (0.25 * dl) / avgdl
            sc = max(0.0, (f / (f + den)) * ((n + 1.0) / df) ** 0.35)
        elif mode == "indri_dirichlet":
            cp = ttf / sum_ttf
            sc = np.log((f + 2000.0 * cp) / (dl + 2000.0))
        elif mode == "sweet_spot":
            idf = np.log((n + 1.0) / (df + 1.0)) + 1.0
            tf = 1.5 if f <= 2.0 else np.sqrt(f + (1.5 * 1.5) - 2.0)
            norm = 1.0 / np.sqrt(
                (0.5 * ((abs(dl - 40) + abs(dl - 120)) - 80)) + 1.0
            )
            sc = idf * tf * norm
        elif mode == "dfr_inl2":
            a = np.log((n + 1.0) / (df + 0.5)) / LOG2
            tfn = f * (np.log(1.0 + avgdl / dl) / LOG2)
            sc = a * (1.0 - 1.0 / (1.0 + tfn))
        elif mode == "ib_spl":
            lam = float(np.float32((ttf + 1.0) / (n + 1.0)))
            tfn = f * (np.log(1.0 + avgdl / dl) / LOG2)
            q = 1.0 - 1.0 / (tfn + 1.0)
            sc = -np.log((lam**q - lam) / (1.0 - lam))
        elif mode == "axiomatic_f1log":
            tf = 1.0 + np.log(1.0 + np.log(f + 1.0))
            ln_c = (avgdl + 0.25) / (avgdl + dl * 0.25)
            sc = max(0.0, tf * ln_c * np.log((n + 1.0) / df))
        elif mode == "multi_bm25_classic":
            idf_b = np.log(1.0 + (n - df + 0.5) / (df + 0.5))
            tfp = 1.0 + f * (
                1.0 / (1.2 * ((1.0 - 0.75) + (0.75 * dl) / avgdl))
            )
            bm25 = idf_b - idf_b / tfp
            idf_c = np.log((n + 1.0) / (df + 1.0)) + 1.0
            classic = idf_c * np.sqrt(f) * (1.0 / np.sqrt(dl))
            sc = bm25 + classic
        else:  # pragma: no cover
            raise ValueError(mode)
        out[dm[url]] = float(sc)
    return out


MODES = [
    "classic",
    "dfr_gb2",
    "ib_ll",
    "dfi_chi2",
    "axiomatic_f2exp",
    "indri_dirichlet",
    "dfr_inl2",
    "ib_spl",
    "axiomatic_f1log",
    "multi_bm25_classic",
    "sweet_spot",
]


@pytest.mark.parametrize("mode", MODES)
def test_term_query_scores(spark, idx, model, mode):
    toks, dm = model
    s = Searcher(spark, idx, stopwords=STOP, mode=mode)
    exp = _expected(mode, toks, dm, "w0001")
    top = sorted(exp.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    got = [(r["docid"], r["score"]) for r in s.search("w0001", k=10).collect()]
    assert [d for d, _ in got] == [d for d, _ in top], mode
    for (gd, gs), (ed, es) in zip(got, top):
        assert gs == pytest.approx(es, abs=1e-9), (mode, gd, gs, es)


@pytest.mark.parametrize("mode", MODES)
def test_or_query_accumulates(spark, idx, model, mode):
    toks, dm = model
    s = Searcher(spark, idx, stopwords=STOP, mode=mode)
    e1 = _expected(mode, toks, dm, "w0001")
    e2 = _expected(mode, toks, dm, "w0004")
    acc = {}
    for d, v in e1.items():
        acc[d] = 0.0 + v
    for d, v in e2.items():
        acc[d] = acc.get(d, 0.0) + v
    top = sorted(acc.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    got = [
        (r["docid"], r["score"])
        for r in s.search("w0001 OR w0004", k=10).collect()
    ]
    assert [d for d, _ in got] == [d for d, _ in top], mode
    for (gd, gs), (ed, es) in zip(got, top):
        assert gs == pytest.approx(es, abs=1e-9), (mode, gd, gs, es)


def test_indri_and_union_with_smoothing(spark, idx, model):
    """IndriAndQuery (core/search/IndriAndQuery.java, IndriAndScorer.java:
    45-73): union of postings, absent terms contribute the smoothing
    score ln(mu·cp/(dl+mu)), combined as the boost-weighted mean."""
    toks, dm = model
    s = Searcher(spark, idx, stopwords=STOP, mode="indri_dirichlet")
    terms, boosts, mu = ["w0001", "w0004"], [1.5, 1.0], 2000.0
    n_tokens = sum(len(v) for v in toks.values())
    exp = {}
    for url, v in toks.items():
        if not any(t in v for t in terms):
            continue
        dl = _qdl(len(v))
        num = 0.0
        for t, b in zip(terms, boosts):
            ttf = sum(vv.count(t) for vv in toks.values())
            mu_cp = mu * (ttf / n_tokens)
            num += b * np.log((v.count(t) + mu_cp) / (dl + mu))
        exp[dm[url]] = num / sum(boosts)
    top = sorted(exp.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    got = [
        (r["docid"], r["score"])
        for r in s.indri_and(terms, boosts=boosts, k=10).collect()
    ]
    assert [d for d, _ in got] == [d for d, _ in top]
    for (gd, gs), (_, es) in zip(got, top):
        assert gs == pytest.approx(es, abs=1e-9)
    # docs holding only ONE of the terms must still appear in the union
    only_one = {
        dm[u] for u, v in toks.items()
        if ("w0001" in v) != ("w0004" in v)
    }
    assert only_one & set(exp)


def test_indri_and_requires_indri_mode(spark, idx):
    s = Searcher(spark, idx, stopwords=STOP, mode="lucene")
    with pytest.raises(ValueError, match="indri_dirichlet"):
        s.indri_and(["w0001"])


def test_indri_scores_are_negative(spark, idx, model):
    """Indri scores are log-probabilities (< 0, no clamp) and must still
    rank correctly through the pruned top-k paths."""
    s = Searcher(spark, idx, stopwords=STOP, mode="indri_dirichlet")
    rows = s.search("w0001", k=10).collect()
    assert rows and all(r["score"] < 0.0 for r in rows)


def test_sweet_spot_plateau_and_classic_degrade():
    """lengthNorm == 1.0 across the plateau; the reference defaults
    (ln 1/1/0.5, tf 0/0) reproduce ClassicSimilarity exactly
    (SweetSpotSimilarity.java:105 'degrades to 1/sqrt(x)')."""
    from lucene_spark.search.scorers import (
        ClassicScorer,
        SweetSpotScorer,
        SWEET_SPOT_FACTORS,
    )

    ss = SweetSpotScorer.create(5, 100, **SWEET_SPOT_FACTORS)
    for dl in (40, 64, 100, 120):
        b = int(int_to_byte4(np.array([dl]))[0])
        assert ss.cache[b] == 1.0, dl
    # outside the plateau the norm falls off and is < 1
    lo = int(int_to_byte4(np.array([4]))[0])
    hi = int(int_to_byte4(np.array([4000]))[0])
    assert ss.cache[lo] < 1.0 and ss.cache[hi] < 1.0
    # floored tf: freq <= 2 -> 1.5; continuous ramp after
    assert list(ss._tf(np.array([0.0, 1.0, 2.0]))) == [0.0, 1.5, 1.5]
    assert ss._tf(np.array([3.0]))[0] == pytest.approx(np.sqrt(3.25))
    # Lucene defaults degrade to Classic (same norm table, same tf)
    dflt = SweetSpotScorer.create(5, 100)
    cls = ClassicScorer.create(5, 100)
    assert np.allclose(dflt.cache, cls.cache)
    assert dflt.weight == cls.weight
    f = np.array([1.0, 2.0, 7.0])
    assert np.allclose(dflt._tf(f), np.sqrt(f))
