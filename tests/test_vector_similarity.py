"""Vector similarity surface beyond top-k.

- similarity_threshold (FloatVectorSimilarityQuery, search/
  AbstractVectorSimilarityQuery.java:46): all vectors >= resultSimilarity,
  brute arm — parity vs a numpy replay, metric variants per
  index/VectorSimilarityFunction.java:35-104.
- byte vectors (KnnByteVectorQuery.java:38, ByteVectorSimilarityQuery):
  deterministic int8 quantization + the scaled byte dot similarity
  0.5 + dot/(dim * 2^15).
- diversified_children_topk (join/DiversifyingChildrenFloatKnnVector-
  Query.java:43): one best child per parent, top-k parents.
- similarity_threshold_persisted (VectorSimilarityCollector.java): the
  graph arm — equals the brute arm with an exhaustive traversal bound,
  and the budget-blown fallback equals it too.
"""

import math
import os

import numpy as np
import pytest

from lucene_spark.pipeline import hnsw, simsearch

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
def id_vecs(emb):
    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    vecs = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in rows])
    return ids, vecs


def _np_cos(vecs, q):
    q = np.asarray(q, dtype=np.float64)
    return (vecs @ q) / (np.linalg.norm(vecs, axis=1) * np.linalg.norm(q))


def test_similarity_threshold_matches_numpy(emb, qvec, id_vecs):
    ids, vecs = id_vecs
    cos = _np_cos(vecs, qvec)
    t = float(np.quantile(cos, 0.9))  # nonzero, bounded result set
    want = sorted(
        [(round(c, 4), int(i)) for c, i in zip(cos, ids) if c >= t],
        key=lambda x: (-x[0], x[1]),
    )
    got = [
        (round(r["sim"], 4), int(r["vec_id"]))
        for r in simsearch.similarity_threshold(emb, qvec, t).collect()
    ]
    assert got == want
    assert len(got) > 0


def test_similarity_threshold_metrics(emb, qvec, id_vecs):
    ids, vecs = id_vecs
    q = np.asarray(qvec, dtype=np.float64)
    dots = vecs @ q
    l2sim = 1.0 / (1.0 + ((vecs - q) ** 2).sum(axis=1))
    mip = np.where(dots < 0, 1.0 / (1.0 - dots), dots + 1.0)
    for metric, sims in [("dot", dots), ("l2", l2sim), ("max_inner_product", mip)]:
        t = float(np.quantile(sims, 0.95))
        got = {
            int(r["vec_id"]): r["sim"]
            for r in simsearch.similarity_threshold(
                emb, qvec, t, metric=metric
            ).collect()
        }
        want = {int(i): round(float(s), 4) for i, s in zip(ids, sims) if s >= t}
        assert set(got) == set(want), metric
        for i in want:
            assert math.isclose(got[i], want[i], abs_tol=1e-4), metric


def test_similarity_threshold_unknown_metric(emb, qvec):
    with pytest.raises(ValueError):
        simsearch.similarity_threshold(emb, qvec, 0.5, metric="hamming")


def test_byte_quantize_and_topk(emb, qvec, id_vecs):
    ids, vecs = id_vecs
    b = simsearch.float_to_byte_vectors(emb)
    rows = {int(r["vec_id"]): r["bvec"] for r in b.select("vec_id", "bvec").collect()}
    # quantization rule: floor(x*127 + 0.5) clamped
    want0 = [
        int(max(-127, min(127, math.floor(float(x) * 127.0 + 0.5))))
        for x in vecs[list(ids).index(0)]
    ]
    assert rows[0] == want0

    qb = want0
    dim = len(qb)
    bmat = np.stack([np.asarray(rows[int(i)], dtype=np.float64) for i in ids])
    sims = 0.5 + (bmat @ np.asarray(qb, dtype=np.float64)) / (dim * (1 << 15))
    order = sorted(zip(-sims, ids))[:10]
    want = [(int(i), round(-s, 6)) for s, i in order]
    got = [
        (int(r["vec_id"]), round(r["sim"], 6))
        for r in simsearch.byte_topk(b, qb, k=10).collect()
    ]
    assert got == want

    t = float(np.quantile(sims, 0.9))
    got_t = {int(r["vec_id"]) for r in
             simsearch.byte_similarity_threshold(b, qb, t).collect()}
    want_t = {int(i) for i, s in zip(ids, sims) if s >= t}
    assert got_t == want_t and got_t


def test_diversified_children_one_per_parent(emb, qvec, id_vecs):
    ids, vecs = id_vecs
    labels = {
        int(r["vec_id"]): int(r["label"])
        for r in emb.select("vec_id", "label").collect()
    }
    cos = _np_cos(vecs, qvec)
    best: dict[int, tuple[float, int]] = {}
    for i, c in zip(ids, cos):
        p = labels[int(i)]
        cand = (-c, int(i))
        if p not in best or cand < best[p]:
            best[p] = cand
    ranked = sorted(
        ((-nc, p, i) for p, (nc, i) in best.items()),
        key=lambda t: (-t[0], t[1]),
    )[:5]
    want = [(p, i, round(c, 4)) for c, p, i in ranked]
    got = [
        (int(r["parent"]), int(r["vec_id"]), round(r["cos"], 4))
        for r in simsearch.diversified_children_topk(emb, qvec, k=5).collect()
    ]
    assert got == want
    assert len({p for p, _, _ in got}) == len(got)  # parents are distinct


def test_graph_similarity_threshold_exhaustive_matches_brute(
    spark, emb, qvec, tmp_path
):
    path = str(tmp_path / "simthr_graph")
    hnsw.hnsw_write(emb, path, n_leaves=2, m=16)
    ids, vecs = None, None
    t = 0.35
    brute = [
        (int(r["vec_id"]), r["sim"])
        for r in simsearch.similarity_threshold(emb, qvec, t).collect()
    ]
    # traversal bound -1 => explore every connected node: exact
    got = [
        (int(r["vec_id"]), r["sim"])
        for r in hnsw.similarity_threshold_persisted(
            spark, emb, path, qvec, result_sim=t, traversal_sim=-1.0
        ).collect()
    ]
    assert got == brute and len(got) > 0


def test_graph_similarity_threshold_budget_fallback(spark, emb, qvec, tmp_path):
    path = str(tmp_path / "simthr_graph2")
    hnsw.hnsw_write(emb, path, n_leaves=2, m=16)
    t = 0.35
    brute = [
        (int(r["vec_id"]), r["sim"])
        for r in simsearch.similarity_threshold(emb, qvec, t).collect()
    ]
    # visited_ratio ~0 => budget blows immediately => per-leaf exact arm
    got = [
        (int(r["vec_id"]), r["sim"])
        for r in hnsw.similarity_threshold_persisted(
            spark, emb, path, qvec, result_sim=t, traversal_sim=-1.0,
            visited_ratio=0.001,
        ).collect()
    ]
    assert got == brute
