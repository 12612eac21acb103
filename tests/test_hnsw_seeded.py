"""SeededKnnVectorQuery (search/SeededKnnVectorQuery.java:43, Kulkarni et
al. SIGIR'23): seed ids become layer-0 entry points of the persisted-graph
beam search; leaves holding no seed fall back to the hierarchy descent."""

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
    p = str(tmp_path_factory.mktemp("seeded") / "g")
    hnsw.hnsw_write(emb, p, n_leaves=2, m=16)
    return p


def _res(df):
    return [(int(r["vec_id"]), r["cos"]) for r in df.collect()]


def test_seeded_equals_unseeded_at_generous_ef(spark, emb, qvec, graph_path):
    base = _res(hnsw.hnsw_topk_persisted(
        spark, emb, graph_path, qvec, k=10, ef_search=256))
    seeded = _res(hnsw.hnsw_topk_persisted(
        spark, emb, graph_path, qvec, k=10, ef_search=256,
        seed_ids=[0, 7, 123, 250]))
    assert seeded == base and len(base) == 10


def test_absent_seeds_fall_back_to_descent(spark, emb, qvec, graph_path):
    base = _res(hnsw.hnsw_topk_persisted(
        spark, emb, graph_path, qvec, k=10, ef_search=256))
    seeded = _res(hnsw.hnsw_topk_persisted(
        spark, emb, graph_path, qvec, k=10, ef_search=256,
        seed_ids=[999999, 888888]))  # not in the table
    assert seeded == base


def test_good_seeds_recover_recall_at_tiny_ef(spark, emb, qvec, graph_path):
    # with a tiny beam, seeding AT the true neighbors guarantees they are
    # in the result (they enter `best` before any expansion)
    exact = _res(hnsw.hnsw_topk_persisted(
        spark, emb, graph_path, qvec, k=10, ef_search=256))
    top_ids = [i for i, _ in exact]
    seeded = _res(hnsw.hnsw_topk_persisted(
        spark, emb, graph_path, qvec, k=10, ef_search=10,
        seed_ids=top_ids))
    assert {i for i, _ in seeded} == set(top_ids)
