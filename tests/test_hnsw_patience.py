"""PatienceKnnVectorQuery (search/PatienceKnnVectorQuery.java:40 +
HnswQueueSaturationCollector; Teofili & Lin, ECIR'25): early-terminate the
beam when the result queue saturates for more than `patience` consecutive
candidates. Contract pins: never-saturating threshold is a no-op; zero
patience still returns usable results; the reference-default setting keeps
high recall on the gate corpus."""

import os

import pytest

from lucene_spark.pipeline import hnsw

SF_DIR = os.environ.get("GATE_SF_DIR", "/root/testdata/sf0.001")
EMB = f"{SF_DIR}/embeddings.parquet"

pytestmark = pytest.mark.skipif(
    not os.path.exists(EMB), reason="testdata parquet not present"
)


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(EMB).cache()


@pytest.fixture(scope="module")
def qvec(emb):
    return [float(x) for x in emb.filter("vec_id = 0").first()["embedding"]]


@pytest.fixture(scope="module")
def graph_path(emb, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("patience") / "g")
    hnsw.hnsw_write(emb, p, n_leaves=2, m=16)
    return p


def _res(df):
    return [(int(r["vec_id"]), r["cos"]) for r in df.collect()]


def test_never_saturating_threshold_is_noop(spark, emb, qvec, graph_path):
    base = _res(hnsw.hnsw_topk_persisted(
        spark, emb, graph_path, qvec, k=10, ef_search=128))
    patient = _res(hnsw.hnsw_topk_persisted(
        spark, emb, graph_path, qvec, k=10, ef_search=128,
        saturation_threshold=1.01))  # saturation <= 1 can never reach it
    assert patient == base


def test_default_patience_keeps_recall(spark, emb, qvec, graph_path):
    base = {i for i, _ in _res(hnsw.hnsw_topk_persisted(
        spark, emb, graph_path, qvec, k=10, ef_search=128))}
    got = {i for i, _ in _res(hnsw.hnsw_topk_persisted(
        spark, emb, graph_path, qvec, k=10, ef_search=128,
        saturation_threshold=0.995))}  # patience defaults to max(7, 0.3k)
    assert len(base & got) >= 8  # early exit may trade a little recall


def test_zero_patience_still_returns(spark, emb, qvec, graph_path):
    got = _res(hnsw.hnsw_topk_persisted(
        spark, emb, graph_path, qvec, k=10, ef_search=128,
        saturation_threshold=0.0, patience=0))
    assert len(got) > 0  # terminated almost immediately, queue still usable
