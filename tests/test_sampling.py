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
