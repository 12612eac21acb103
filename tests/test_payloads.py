"""Payloads: index-time per-position ints + PayloadScoreQuery.

Reference behavior: queries/src/java/org/apache/lucene/queries/payloads/
PayloadScoreQuery.java (Sum/Max/MinPayloadFunction, includeSpanScore),
analysis NumericPayloadTokenFilter family for the index-time side. The
DuckDB-oracle gate rows (payload_score / payload_score_span) live in
test_gate.py; these tests cover what the oracle can't: codec round-trip,
survival through merge and compaction, and the degenerate cases.
"""

import shutil

import numpy as np
import pytest

from lucene_spark.codecs.blocks import decode_payloads, encode_term_postings
from lucene_spark.fixtures import generate_webtext
from lucene_spark.index.builder import build_index
from lucene_spark.search.query import PayloadScoreQuery
from lucene_spark.search.searcher import Searcher


# a lambda (not a module-level def): cloudpickle ships it by VALUE, so the
# executor doesn't need this test module on its import path
_payfn = lambda pos, doc: (pos * 31 + 7) % 97  # noqa: E731


def _py_oracle(rows, term, func="sum"):
    from lucene_spark.analysis.simple import simple_terms_positions

    out = {}
    for r in rows:
        terms, poss = simple_terms_positions(r["text"], None)
        vals = [(p * 31 + 7) % 97 for t, p in zip(terms, poss) if t == term]
        if not vals:
            continue
        agg = {"sum": sum, "max": max, "min": min, "first": lambda v: v[0]}[func](
            vals
        )
        out[r["url"]] = float(agg)
    return out


@pytest.fixture(scope="module")
def corpus():
    return generate_webtext(400)


@pytest.fixture(scope="module")
def index_dir(spark, corpus, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("payidx"))
    df = spark.createDataFrame(
        [(r["url"], r["text"]) for r in corpus], "url string, text string"
    )
    build_index(
        spark, df, d, num_segments=3, analyzer="simple", payload_fn=_payfn
    )
    return d


def _hits(spark, d, q, k=400):
    s = Searcher(spark, d, analyzer="simple", mode="double")
    return {
        r["url"]: r["score"]
        for r in s.search(q, k=k, with_url=True).collect()
    }


def test_codec_roundtrip():
    rng = np.random.RandomState(3)
    docids = np.sort(rng.choice(10_000, 400, replace=False)).astype(np.int64)
    freqs = rng.randint(1, 6, 400).astype(np.int64)
    norms = rng.randint(1, 200, 400).astype(np.int64)
    total = int(freqs.sum())
    positions = np.concatenate(
        [np.sort(rng.choice(1000, f, replace=False)) for f in freqs]
    ).astype(np.int64)
    payloads = rng.randint(0, 1 << 20, total).astype(np.int64)
    rows = encode_term_postings(
        docids, freqs, norms, positions=positions, payloads=payloads
    )
    got = np.concatenate(
        [
            decode_payloads(
                r["payloads_enc"],
                # freq split per block comes from the decoded freqs
                __import__("lucene_spark.codecs.blocks", fromlist=["x"])
                .decode_block_freqs(r["encoding"], r["freqs_enc"], r["n_docs"]),
            )
            for r in rows
        ]
    )
    assert np.array_equal(got, payloads)
    assert all(r["payloads_enc"] is not None for r in rows)


@pytest.mark.parametrize("func", ["sum", "max", "min", "first"])
def test_payload_functions_vs_oracle(spark, corpus, index_dir, func):
    got = _hits(spark, index_dir, PayloadScoreQuery("w0001", func=func))
    exp = _py_oracle(corpus, "w0001", func)
    assert got == exp


def test_include_span_score_scales_by_bm25(spark, corpus, index_dir):
    s = Searcher(spark, index_dir, analyzer="simple", mode="double")
    pay = _hits(spark, index_dir, PayloadScoreQuery("w0002", func="sum"))
    span = _hits(
        spark, index_dir,
        PayloadScoreQuery("w0002", func="sum", include_span_score=True),
    )
    bm25 = {
        r["url"]: r["score"]
        for r in s.search("w0002", k=400, with_url=True).collect()
    }
    assert set(span) == set(pay)
    for u, v in span.items():
        assert v == pytest.approx(pay[u] * bm25[u], rel=1e-12)


def test_payloads_survive_merge(spark, corpus, index_dir, tmp_path):
    from lucene_spark.index.merge import merge_segments

    out = str(tmp_path / "merged")
    merge_segments(spark, index_dir, out, target_segments=1)
    got = _hits(spark, out, PayloadScoreQuery("w0001", func="sum"))
    assert got == _py_oracle(corpus, "w0001", "sum")


def test_payloads_with_uncompacted_deletes(spark, corpus, index_dir, tmp_path):
    """PayloadScoreQuery over an index with LIVE tombstones (deletes table
    present, no compaction): the delete pseudo-blocks must carry every
    postings column the payload path selects (payloads_enc included), and
    deleted docs must not score."""
    from lucene_spark.index.deletes import add_deletes_by_url

    d = str(tmp_path / "delidx")
    shutil.copytree(index_dir, d)
    victims = [r["url"] for r in corpus[:25]]
    add_deletes_by_url(
        spark, d, spark.createDataFrame([(u,) for u in victims], "url string")
    )
    got = _hits(spark, d, PayloadScoreQuery("w0001", func="sum"))
    exp = {
        u: v
        for u, v in _py_oracle(corpus, "w0001", "sum").items()
        if u not in set(victims)
    }
    assert got == exp


def test_payloads_survive_compaction(spark, corpus, index_dir, tmp_path):
    from lucene_spark.index.compaction import compact_deletes
    from lucene_spark.index.deletes import add_deletes_by_url

    d = str(tmp_path / "cidx")
    shutil.copytree(index_dir, d)
    victims = [r["url"] for r in corpus[:25]]
    add_deletes_by_url(
        spark, d, spark.createDataFrame([(u,) for u in victims], "url string")
    )
    res = compact_deletes(spark, d, force=True)
    assert res["compacted_segments"] >= 1
    got = _hits(spark, d, PayloadScoreQuery("w0001", func="sum"))
    exp = {
        u: v
        for u, v in _py_oracle(corpus, "w0001", "sum").items()
        if u not in set(victims)
    }
    assert got == exp


def test_index_without_payloads_scores_zero(spark, corpus, tmp_path):
    d = str(tmp_path / "nopay")
    df = spark.createDataFrame(
        [(r["url"], r["text"]) for r in corpus[:100]], "url string, text string"
    )
    build_index(spark, df, d, num_segments=2, analyzer="simple")
    got = _hits(spark, d, PayloadScoreQuery("w0001", func="sum"), k=10)
    assert all(v == 0.0 for v in got.values())


def test_payload_fn_validation(spark, corpus, tmp_path):
    df = spark.createDataFrame(
        [(r["url"], r["text"]) for r in corpus[:50]], "url string, text string"
    )
    with pytest.raises(Exception, match="non-negative|one int per token"):
        build_index(
            spark, df, str(tmp_path / "bad"), num_segments=1,
            analyzer="simple", payload_fn=lambda p, d: p - 10**9,  # noqa: E731
        )


def test_unknown_func_rejected():
    with pytest.raises(ValueError, match="unknown payload function"):
        PayloadScoreQuery("x", func="median")
