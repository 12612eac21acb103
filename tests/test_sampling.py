"""Deterministic hash sampling: reproducibility, fraction bounds, strata."""

import pytest

from lucene_spark.pipeline.sampling import sample_hash, stratified_sample


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(i, "en" if i % 2 else "de") for i in range(400)], "doc_id long, lang string"
    )


def test_deterministic_and_seed_sensitive(docs):
    a = {r["doc_id"] for r in sample_hash(docs, 0.3, seed=1).collect()}
    b = {r["doc_id"] for r in sample_hash(docs, 0.3, seed=1).collect()}
    c = {r["doc_id"] for r in sample_hash(docs, 0.3, seed=2).collect()}
    assert a == b
    assert a != c
    assert 0.15 < len(a) / 400 < 0.45  # loose Bernoulli bound


def test_fraction_edges(docs):
    assert sample_hash(docs, 0.0).count() == 0
    assert sample_hash(docs, 1.0).count() == 400
    with pytest.raises(ValueError):
        sample_hash(docs, 1.5)


def test_stratified(docs):
    out = stratified_sample(docs, "lang", {"en": 1.0}, default_fraction=0.0)
    rows = out.collect()
    assert all(r["lang"] == "en" for r in rows)
    assert len(rows) == 200
    with pytest.raises(ValueError):
        stratified_sample(docs, "lang", {"en": -0.1})


# --- temperature mixture + sequence packing ---------------------------------

from lucene_spark.pipeline.sampling import (  # noqa: E402
    pack_sequences,
    temperature_mixture_sample,
)


@pytest.fixture(scope="module")
def skewed(spark):
    # 900 docs of "web", 100 of "book" — a 9:1 head/tail skew
    rows = [(i, "web" if i < 900 else "book") for i in range(1000)]
    return spark.createDataFrame(rows, "doc_id long, source string")


def test_temperature_flattens_tail(skewed):
    prop = temperature_mixture_sample(skewed, alpha=1.0, total_fraction=0.5)
    flat = temperature_mixture_sample(skewed, alpha=0.25, total_fraction=0.5)
    def share(df, s):
        rows = df.collect()
        return sum(1 for r in rows if r["source"] == s) / len(rows)
    # alpha=1 keeps the 9:1 skew; alpha=0.25 pulls book's share up sharply
    assert share(flat, "book") > share(prop, "book") * 2


def test_temperature_deterministic_and_bounded(skewed):
    a = {r["doc_id"] for r in temperature_mixture_sample(skewed, 0.5, 0.4).collect()}
    b = {r["doc_id"] for r in temperature_mixture_sample(skewed, 0.5, 0.4).collect()}
    assert a == b
    assert 0.2 < len(a) / 1000 < 0.6
    with pytest.raises(ValueError):
        temperature_mixture_sample(skewed, alpha=0.0)


@pytest.fixture(scope="module")
def texts(spark):
    rows = [(i, " ".join(f"t{j}" for j in range(i % 7))) for i in range(200)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_pack_offsets_contiguous(texts):
    rows = sorted(
        pack_sequences(texts, context_len=16, rows_per_shard=32).collect(),
        key=lambda r: r["doc_id"],
    )
    off = 0
    for r in rows:
        assert r["start_off"] == off
        assert r["chunk_first"] == r["start_off"] // 16
        assert r["chunk_last"] == (r["start_off"] + max(r["n_toks"], 1) - 1) // 16
        off += r["n_toks"]


def test_pack_shard_invariance(texts):
    # the two-level scan must equal the single-shard (global window) answer
    a = sorted(map(tuple, pack_sequences(texts, 16, rows_per_shard=13).collect()))
    b = sorted(map(tuple, pack_sequences(texts, 16, rows_per_shard=10**9).collect()))
    assert a == b
