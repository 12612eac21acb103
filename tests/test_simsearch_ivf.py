"""IVF ANN: training determinism, assignment totality, probe recall.

The exact-value gate (Spark vs DuckDB oracle) for ``simsearch_ivf`` lives in
test_gate.py; these tests cover the operator properties the oracle can't:
recall vs brute force, stability of the learned centroids, and that every
vector lands in exactly one cell.
"""

import os

import pytest
from pyspark.sql import functions as F

from lucene_spark.pipeline import simsearch as ss

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


def test_train_deterministic(emb):
    c1 = ss.ivf_train(emb, n_centroids=8)
    c2 = ss.ivf_train(emb, n_centroids=8)
    assert c1 == c2
    assert all(len(v) == 64 for _, v in c1)
    assert [cid for cid, _ in c1] == sorted({cid for cid, _ in c1})


def test_assign_total_partition(emb):
    cents = ss.ivf_train(emb, n_centroids=8)
    assigned = ss.ivf_assign(emb, cents)
    n = emb.count()
    assert assigned.filter(F.col("cell").isNull()).count() == 0
    assert assigned.count() == n
    cells = {r["cell"] for r in assigned.select("cell").distinct().collect()}
    assert cells <= {cid for cid, _ in cents}


def test_probe_all_cells_is_exact(emb, qvec):
    cents = ss.ivf_train(emb, n_centroids=8)
    exact = ss.cosine_topk(emb, qvec, k=10).collect()
    full = ss.ivf_topk(
        emb, qvec, k=10, n_probe=len(cents), centroids=cents
    ).collect()
    assert [(r["vec_id"], r["cos"]) for r in exact] == [
        (r["vec_id"], r["cos"]) for r in full
    ]


def test_recall_beats_floor(emb, qvec):
    r = ss.recall_at_k(emb, qvec, k=10, n_centroids=16, n_probe=4)
    assert r >= 0.5, r


# --- incremental append (ivf_append: frozen centroids, partition append) ----

def test_ivf_append_searches_old_and_new(spark, tmp_path):
    import os

    from lucene_spark.pipeline import simsearch as ss

    emb = spark.read.parquet(
        os.environ.get("GATE_SF_DIR", "/root/testdata/sf0.001")
        + "/embeddings.parquet"
    ).cache()
    q = [float(x) for x in emb.filter("vec_id = 0").first()["embedding"]]
    path = str(tmp_path / "ivf_app")
    cents = ss.ivf_train(emb, 8)
    ss.ivf_write(emb.filter("vec_id % 4 != 0"), path, n_centroids=8,
                 centroids=cents)
    meta = ss.ivf_append(spark, emb.filter("vec_id % 4 = 0"), path)
    assert meta["appended"] and meta["n_vectors"] == emb.count()
    got = [
        r["vec_id"]
        for r in ss.ivf_topk_persisted(spark, path, q, k=10, n_probe=8)
        .collect()
    ]
    # probing ALL cells makes the persisted search exhaustive -> exact
    exact = [r["vec_id"] for r in ss.cosine_topk(emb, q, k=10).collect()]
    assert got == exact


def test_ivf_append_twice_accumulates(spark, tmp_path):
    import os

    from lucene_spark.pipeline import simsearch as ss

    emb = spark.read.parquet(
        os.environ.get("GATE_SF_DIR", "/root/testdata/sf0.001")
        + "/embeddings.parquet"
    )
    path = str(tmp_path / "ivf_app2")
    cents = ss.ivf_train(emb, 8)
    ss.ivf_write(emb.filter("vec_id % 3 = 0"), path, n_centroids=8,
                 centroids=cents)
    ss.ivf_append(spark, emb.filter("vec_id % 3 = 1"), path)
    meta = ss.ivf_append(spark, emb.filter("vec_id % 3 = 2"), path)
    assert meta["n_vectors"] == emb.count()


# --- cell-skew observability (ivf_cell_stats) -------------------------------


def test_ivf_cell_stats_balanced(spark, emb, tmp_path):
    """Fresh write: stats return exactly n_centroids rows (empty cells
    included), fractions sum to 1, counts match the cells table, and
    nothing trips the 4x flag on the training distribution itself."""
    path = str(tmp_path / "ivf_stats")
    ss.ivf_write(emb, path, n_centroids=8, vec_col="embedding")
    stats = ss.ivf_cell_stats(spark, path).toPandas()
    assert len(stats) == 8
    assert int(stats["n"].sum()) == emb.count()
    assert abs(float(stats["fraction"].sum()) - 1.0) < 1e-6
    assert not stats["skewed"].any()


def test_ivf_cell_stats_detects_injected_drift(spark, emb, tmp_path):
    """Append a drifted batch — many copies of one existing vector (all
    land in that vector's frozen cell): the ratio_to_mean of that cell
    crosses the threshold and the skew flag fires, the documented
    rebuild trigger for ivf_append."""
    path = str(tmp_path / "ivf_drift")
    ss.ivf_write(emb, path, n_centroids=8, vec_col="embedding")
    seed = emb.filter("vec_id = 7").first()
    n = emb.count()
    drift = spark.createDataFrame(
        [(int(1_000_000 + i), list(seed["embedding"]), 0) for i in range(3 * n)],
        "vec_id long, embedding array<float>, label int",
    )
    ss.ivf_append(spark, drift, path)
    stats = ss.ivf_cell_stats(spark, path, skew_threshold=2.0).toPandas()
    assert len(stats) == 8
    assert int(stats["n"].sum()) == 4 * n
    assert stats["skewed"].any()
    hot = stats[stats["skewed"]]
    assert float(hot["ratio_to_mean"].max()) > 2.0
    # the hot cell is the seed vector's own frozen cell
    import json

    with open(os.path.join(path, "meta.json")) as fh:
        meta = json.load(fh)
    cents = [(int(c), [float(x) for x in v]) for c, v in meta["centroids"]]
    probe = ss._probe_cells([float(x) for x in seed["embedding"]], cents, 1)
    assert probe[0] in set(hot["cell"].tolist())
