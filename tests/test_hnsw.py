"""HNSW graph ANN: graph invariants, determinism, recall, leaf merge.

The exact-value gate (Spark vs DuckDB exact-cosine oracle) for
``simsearch_hnsw`` lives in test_gate.py; these tests cover the graph
properties the oracle can't: degree caps, level monotonicity, determinism
of the build under reordering, recall at low/high ef, and the multi-leaf
merge equalling the single-leaf result.

Reference behavior: lucene/core/src/java/org/apache/lucene/util/hnsw/
HnswGraphBuilder.java (build + diversity), HnswGraphSearcher.java (search),
TestHnswFloatVectorGraph-style invariants.
"""

import os

import numpy as np
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
def id_vecs(emb):
    rows = emb.orderBy("vec_id").collect()
    ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    vecs = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in rows])
    return ids, vecs


def test_graph_invariants(id_vecs):
    ids, vecs = id_vecs
    m = 8
    entry, levels, layers = hnsw.build_leaf_graph(ids, vecs, m=m)
    assert 0 <= entry < len(ids)
    # entry node is on the top layer
    assert int(levels[entry]) == len(layers) - 1
    for lvl, layer in enumerate(layers):
        cap = 2 * m if lvl == 0 else m
        for node, nbrs in layer.items():
            # degree cap (HnswGraphBuilder.java:117 M / 2M at level 0)
            assert len(nbrs) <= cap
            # a node only appears at levels <= its assigned level
            assert levels[node] >= lvl
            assert node not in nbrs  # no self loops
            assert len(set(nbrs)) == len(nbrs)  # no duplicate edges
    # layer 0 contains every node that has any link
    linked = set(layers[0])
    assert len(linked) >= len(ids) - 1  # all but possibly isolated entry


def test_build_deterministic_under_input_order(id_vecs):
    ids, vecs = id_vecs
    e1, l1, g1 = hnsw.build_leaf_graph(ids, vecs, m=8)
    perm = np.random.RandomState(7).permutation(len(ids))
    # build sorts by id internally via insertion order = ascending id,
    # so a permuted input must yield the identical graph
    order = np.argsort(ids[perm], kind="stable")
    ids2, vecs2 = ids[perm][order], vecs[perm][order]
    e2, l2, g2 = hnsw.build_leaf_graph(ids2, vecs2, m=8)
    assert e1 == e2
    assert np.array_equal(l1, l2)
    assert len(g1) == len(g2)
    for a, b in zip(g1, g2):
        assert {k: list(v) for k, v in a.items()} == {
            k: list(v) for k, v in b.items()
        }


def test_recall_full_ef_is_exact(emb, qvec):
    assert hnsw.hnsw_recall_at_k(emb, qvec, k=10, ef_search=128) == 1.0


def test_recall_multi_leaf(emb, qvec):
    assert hnsw.hnsw_recall_at_k(emb, qvec, k=10, ef_search=128, n_leaves=4) == 1.0


def test_low_ef_still_reasonable(emb, qvec):
    # ANN regime: tiny beam — recall may drop but must stay useful
    assert hnsw.hnsw_recall_at_k(emb, qvec, k=10, ef_search=16) >= 0.5


def test_topk_matches_exact_rows(emb, qvec):
    from lucene_spark.pipeline.simsearch import cosine_topk

    a = [tuple(r) for r in hnsw.hnsw_topk(emb, qvec, k=10, ef_search=128).collect()]
    b = [tuple(r) for r in cosine_topk(emb, qvec, k=10).collect()]
    assert a == b


def test_persisted_graph_roundtrip(spark, emb, qvec, tmp_path):
    """hnsw_write → hnsw_topk_persisted == in-memory hnsw_topk == exact
    (Lucene99HnswVectorsFormat: graph written at flush, search-only later)."""
    from lucene_spark.pipeline.simsearch import cosine_topk

    path = str(tmp_path / "g")
    meta = hnsw.hnsw_write(emb, path, n_leaves=3, m=16)
    assert meta["n_leaves"] == 3
    a = [
        tuple(r)
        for r in hnsw.hnsw_topk_persisted(
            spark, emb, path, qvec, k=10, ef_search=128
        ).collect()
    ]
    b = [tuple(r) for r in cosine_topk(emb, qvec, k=10).collect()]
    c = [
        tuple(r)
        for r in hnsw.hnsw_topk(
            emb, qvec, k=10, ef_search=128, n_leaves=3
        ).collect()
    ]
    assert a == b == c


def test_persisted_graph_row_shape(spark, emb, tmp_path):
    path = str(tmp_path / "g2")
    hnsw.hnsw_write(emb, path, n_leaves=2, m=8)
    rows = spark.read.parquet(f"{path}/graph")
    n_emb = emb.count()
    # every vector appears at layer 0 exactly once per leaf
    assert rows.filter("lvl = 0").count() == n_emb
    # degree caps respected in the stored rows (2M at layer 0, M above)
    import pyspark.sql.functions as F

    mx0 = rows.filter("lvl = 0").agg(F.max(F.size("nbrs"))).first()[0]
    assert mx0 <= 16
    mx1 = rows.filter("lvl > 0").agg(F.max(F.size("nbrs"))).first()[0]
    assert mx1 is None or mx1 <= 8


def test_persisted_graph_stale_detection(spark, emb, qvec, tmp_path):
    """Vectors appended after hnsw_write must raise a clear 'stale' error,
    not silently go unsearched (meta.json records per-leaf counts)."""
    from pyspark.sql import functions as F

    path = str(tmp_path / "g3")
    meta = hnsw.hnsw_write(emb, path, n_leaves=2, m=8)
    assert meta["n_vectors"] == emb.count()
    dim = len(qvec)
    extra = spark.createDataFrame(
        [(10_000_000, [0.5] * dim)], "vec_id long, embedding array<double>"
    )
    grown = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    ).unionByName(extra)
    with pytest.raises(Exception, match="stale"):
        hnsw.hnsw_topk_persisted(
            spark, grown, path, qvec, k=5, ef_search=64
        ).collect()


def _exact_filtered(emb, qvec, pred, k=10):
    from lucene_spark.pipeline.simsearch import cosine_topk

    return [tuple(r) for r in cosine_topk(emb.filter(pred), qvec, k=k).collect()]


def test_filtered_topk_matches_exact_on_survivors(emb, qvec):
    """acceptDocs end-to-end: filtered graph search == exact cosine over
    the filtered set (selective filter -> the per-leaf cost switch takes
    the exact-over-survivors arm, KnnFloatVectorQuery's fallback)."""
    got = [
        tuple(r)
        for r in hnsw.hnsw_topk(
            emb, qvec, k=10, ef_search=128, n_leaves=2,
            filter_expr="label % 3 = 1",
        ).collect()
    ]
    assert got == _exact_filtered(emb, qvec, "label % 3 = 1")


def test_filtered_persisted_matches_exact(spark, emb, qvec, tmp_path):
    path = str(tmp_path / "gf")
    hnsw.hnsw_write(emb, path, n_leaves=2, m=16)
    got = [
        tuple(r)
        for r in hnsw.hnsw_topk_persisted(
            spark, emb, path, qvec, k=10, ef_search=128,
            filter_expr="label % 3 = 1",
        ).collect()
    ]
    assert got == _exact_filtered(emb, qvec, "label % 3 = 1")


def test_filtered_zero_matches_is_empty(emb, qvec):
    out = hnsw.hnsw_topk(
        emb, qvec, k=10, n_leaves=2, filter_expr="label < 0"
    ).collect()
    assert out == []


def test_graph_arm_recall_floor_10pct_filter(id_vecs):
    """The GRAPH+mask arm itself (no cost switch): ~10%-selectivity accept
    mask, moderate beam, no visited budget — recall@10 vs exact over the
    accepted set must stay useful (HnswGraphSearcher acceptOrds path)."""
    ids, vecs = id_vecs
    acc = (ids % 10) == 3  # ~10% accepted
    entry, levels, layers = hnsw.build_leaf_graph(ids, vecs, m=16)
    q = vecs[0]
    hits = hnsw.search_leaf_graph(
        entry, levels, layers, ids, vecs, q, k=10, ef_search=64, accept=acc
    )
    assert hits is not None
    got = {int(ids[i]) for _, i in hits}
    assert all(i % 10 == 3 for i in got), "only accepted ids may be returned"
    unit = vecs / np.linalg.norm(vecs, axis=1)[:, None]
    qs = unit @ (q / np.linalg.norm(q))
    exact = {
        int(i)
        for i in sorted(ids[acc], key=lambda i: (-qs[np.where(ids == i)[0][0]], i))[:10]
    }
    assert len(got & exact) / 10.0 >= 0.5


def test_visited_budget_triggers_exact_fallback(id_vecs):
    """A tiny visitedLimit must abort the graph search (return None) —
    the signal the caller uses to fall back to exact-over-survivors."""
    ids, vecs = id_vecs
    acc = (ids % 10) == 3
    entry, levels, layers = hnsw.build_leaf_graph(ids, vecs, m=16)
    out = hnsw.search_leaf_graph(
        entry, levels, layers, ids, vecs, vecs[0], k=10, ef_search=64,
        accept=acc, visited_limit=3,
    )
    assert out is None


def test_quantize_leaf_roundtrip_error(id_vecs):
    """7-bit confidence-interval quantization: dequantized unit vectors
    stay close (max per-component error ≤ one quantization step outside
    the clipped tail; cosine of a vector with its own code ≥ 0.99)."""
    _ids, vecs = id_vecs
    codes, lo, hi = hnsw.quantize_leaf(vecs)
    assert codes.dtype == np.uint8 and codes.max() <= 127
    assert hi > lo
    deq = lo + codes.astype(np.float64) * ((hi - lo) / 127.0)
    unit = vecs / np.linalg.norm(vecs, axis=1)[:, None]
    # self-similarity of code vs float vector
    num = (deq * unit).sum(axis=1)
    den = np.linalg.norm(deq, axis=1)
    assert float((num / den).min()) >= 0.97


def test_quantized_search_recall_floor(spark, emb, qvec, tmp_path):
    """Quantized-code graph search + float rescore: recall@10 vs the exact
    float path must be high (the re-rank recovers quantization loss)."""
    from lucene_spark.pipeline.simsearch import cosine_topk

    path = str(tmp_path / "gq")
    meta = hnsw.hnsw_write(emb, path, n_leaves=2, m=16, quantize=True)
    assert meta["quantized"]
    got = {
        int(r[0])
        for r in hnsw.hnsw_topk_quantized(
            spark, emb, path, qvec, k=10, ef_search=128, oversample=3
        ).collect()
    }
    exact = {int(r[0]) for r in cosine_topk(emb, qvec, k=10).collect()}
    assert len(got & exact) / 10.0 >= 0.9
    # rescored scores are EXACT float cosines: any overlap ids agree with
    # the exact rows bit-for-bit
    exact_rows = {int(r[0]): r[1] for r in cosine_topk(emb, qvec, k=10).collect()}
    got_rows = {
        int(r[0]): r[1]
        for r in hnsw.hnsw_topk_quantized(
            spark, emb, path, qvec, k=10, ef_search=128, oversample=3
        ).collect()
    }
    for vid in got & exact:
        assert got_rows[vid] == exact_rows[vid]


def test_quantized_requires_quantized_write(spark, emb, qvec, tmp_path):
    path = str(tmp_path / "gnq")
    hnsw.hnsw_write(emb, path, n_leaves=1, m=8)  # no quantize
    with pytest.raises(ValueError, match="quantize=True"):
        hnsw.hnsw_topk_quantized(spark, emb, path, qvec, k=5)


def test_search_handles_empty_and_singleton():
    ids = np.array([42], dtype=np.int64)
    vecs = np.ones((1, 4), dtype=np.float64)
    entry, levels, layers = hnsw.build_leaf_graph(ids, vecs, m=4)
    hits = hnsw.search_leaf_graph(
        entry, levels, layers, ids, vecs, np.ones(4), k=5, ef_search=10
    )
    assert [ids[i] for _, i in hits] == [42]
    assert hnsw.search_leaf_graph(
        -1, np.array([], dtype=np.int64), [], np.array([], dtype=np.int64),
        np.zeros((0, 4)), np.ones(4), k=5, ef_search=10,
    ) == []


# --- incremental append (hnsw_append: the NRT segment-append analog) --------

def test_append_searches_old_and_new(spark, emb, qvec, tmp_path):
    path = str(tmp_path / "g_app")
    hnsw.hnsw_write(emb.filter("vec_id % 5 != 0"), path, n_leaves=2, m=16)
    meta = hnsw.hnsw_append(
        spark, emb.filter("vec_id % 5 = 0"), path, n_new_leaves=2
    )
    assert meta["appended"] and meta["n_vectors"] == emb.count()
    assert meta["n_leaves"] == 2  # base hash-routing parameter unchanged
    assert meta["n_total_leaves"] == 4
    got = [
        r["vec_id"]
        for r in hnsw.hnsw_topk_persisted(
            spark, emb, path, qvec, k=10, ef_search=256
        ).collect()
    ]
    exact = [
        r["vec_id"]
        for r in __import__(
            "lucene_spark.pipeline.simsearch", fromlist=["cosine_topk"]
        ).cosine_topk(emb, qvec, k=10).collect()
    ]
    assert got == exact  # appended vectors are searchable, merge is global


def test_append_twice_accumulates(spark, emb, qvec, tmp_path):
    path = str(tmp_path / "g_app2")
    hnsw.hnsw_write(emb.filter("vec_id % 3 = 0"), path, n_leaves=1, m=16)
    hnsw.hnsw_append(spark, emb.filter("vec_id % 3 = 1"), path)
    meta = hnsw.hnsw_append(spark, emb.filter("vec_id % 3 = 2"), path)
    assert meta["n_vectors"] == emb.count()
    assert meta["n_total_leaves"] == 3
    got = hnsw.hnsw_topk_persisted(
        spark, emb, path, qvec, k=5, ef_search=256
    ).collect()
    assert len(got) == 5 and got[0]["vec_id"] == 0  # self-match tops


def test_append_quantized_follows(spark, emb, qvec, tmp_path):
    path = str(tmp_path / "g_appq")
    hnsw.hnsw_write(
        emb.filter("vec_id % 5 != 0"), path, n_leaves=1, m=16, quantize=True
    )
    hnsw.hnsw_append(spark, emb.filter("vec_id % 5 = 0"), path)
    got = hnsw.hnsw_topk_quantized(
        spark, emb, path, qvec, k=10, ef_search=256, oversample=4
    ).collect()
    assert got and got[0]["vec_id"] == 0
    # an appended vector must be reachable through the quantized arm too
    ids = {r["vec_id"] for r in got}
    assert any(v % 5 == 0 for v in ids)


def test_append_duplicate_base_id_fails_loudly(spark, emb, qvec, tmp_path):
    path = str(tmp_path / "g_dup")
    hnsw.hnsw_write(emb, path, n_leaves=1, m=16)
    hnsw.hnsw_append(spark, emb.filter("vec_id = 1"), path)  # id 1 re-added
    with pytest.raises(Exception, match="stale"):
        hnsw.hnsw_topk_persisted(
            spark, emb, path, qvec, k=5, ef_search=64
        ).collect()


def test_quantized_filtered_composition(spark, emb, qvec, tmp_path):
    """filter_expr composed with quantized search (KnnFloatVectorQuery
    over a quantized VectorScorer): at 10% selectivity every returned id
    satisfies the predicate, recall@10 vs exact-filtered cosine >= 0.9,
    and overlapping scores are exact float cosines (the rescore
    re-applies the predicate)."""
    from lucene_spark.pipeline.simsearch import cosine_topk

    path = str(tmp_path / "gqf")
    hnsw.hnsw_write(emb, path, n_leaves=2, m=16, quantize=True)
    pred = "label % 10 = 1"
    got_rows = hnsw.hnsw_topk_quantized(
        spark, emb, path, qvec, k=10, ef_search=128, oversample=3,
        filter_expr=pred,
    ).collect()
    ok_ids = {int(r["vec_id"]) for r in emb.where(pred).collect()}
    got = {int(r[0]) for r in got_rows}
    assert got <= ok_ids, "a filtered-out id leaked into the result"
    exact_rows = cosine_topk(emb.where(pred), qvec, k=10).collect()
    exact = {int(r[0]) for r in exact_rows}
    assert len(got & exact) / min(10, len(exact)) >= 0.9
    em = {int(r[0]): r[1] for r in exact_rows}
    gm = {int(r[0]): r[1] for r in got_rows}
    for vid in got & exact:
        assert gm[vid] == em[vid]


def test_quantized_filtered_graph_arm(spark, emb, qvec, tmp_path):
    """A permissive filter (~90%) with small ef forces the graph+mask arm
    (n_acc > ef): results still honor the predicate and hit a recall
    floor against the exact filtered scan."""
    from lucene_spark.pipeline.simsearch import cosine_topk

    path = str(tmp_path / "gqg")
    hnsw.hnsw_write(emb, path, n_leaves=1, m=16, quantize=True)
    pred = "label % 10 != 1"
    got_rows = hnsw.hnsw_topk_quantized(
        spark, emb, path, qvec, k=10, ef_search=64, oversample=3,
        filter_expr=pred,
    ).collect()
    ok_ids = {int(r["vec_id"]) for r in emb.where(pred).collect()}
    got = {int(r[0]) for r in got_rows}
    assert got <= ok_ids
    exact = {int(r[0]) for r in cosine_topk(emb.where(pred), qvec, k=10).collect()}
    assert len(got & exact) / 10.0 >= 0.8


def test_quantized_seeded_and_patience_compose(spark, emb, qvec, tmp_path):
    """Seeds and patience wrap the quantized delegate like any other
    scorer (SeededKnnVectorQuery / PatienceKnnVectorQuery composition):
    both paths return valid top-k with a recall floor vs exact."""
    from lucene_spark.pipeline.simsearch import cosine_topk

    path = str(tmp_path / "gqs")
    hnsw.hnsw_write(emb, path, n_leaves=2, m=16, quantize=True)
    exact = {int(r[0]) for r in cosine_topk(emb, qvec, k=10).collect()}
    seeded = {
        int(r[0])
        for r in hnsw.hnsw_topk_quantized(
            spark, emb, path, qvec, k=10, ef_search=128,
            seed_ids=sorted(exact)[:3],
        ).collect()
    }
    assert len(seeded & exact) / 10.0 >= 0.9
    patient = {
        int(r[0])
        for r in hnsw.hnsw_topk_quantized(
            spark, emb, path, qvec, k=10, ef_search=128,
            saturation_threshold=0.995,
        ).collect()
    }
    assert len(patient & exact) / 10.0 >= 0.8
