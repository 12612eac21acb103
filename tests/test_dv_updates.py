"""In-place numeric doc-value updates (index/dvupdates.py —
updateNumericDocValue / docValuesGen semantics): latest gen wins, sorts and
function scores see updated values, merges bake updates into the merged
docmap, snapshots pin the pre-update state."""

import os

import pytest
from pyspark.sql import functions as F

from lucene_spark.index import build_index, update_numeric_doc_values
from lucene_spark.index.merge import merge_segments
from lucene_spark.index.reader import IndexReader
from lucene_spark.index.snapshots import create_snapshot
from lucene_spark.search import Searcher


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("dvu") / "idx")
    docs = spark.createDataFrame(
        [
            (f"doc://{i:04d}", f"alpha w{i % 3}", float(i * 10))
            for i in range(20)
        ],
        "url string, text string, prio double",
    )
    build_index(
        spark, docs, base, num_segments=3, analyzer="simple",
        stopwords=None, doc_values={"prio": "prio"},
    )
    return base


def _prio(spark, index_dir, **kw):
    s = Searcher(spark, index_dir, analyzer="simple", **kw)
    dm = s._docmap_global()
    return {
        r["url"]: r["p"]
        for r in dm.select("url", F.col("dv").getItem("prio").alias("p")).collect()
    }


def test_update_overrides_and_gen_precedence(spark, idx):
    create_snapshot(idx, "pre_update")

    upd1 = spark.createDataFrame(
        [("doc://0003", 1000.0), ("doc://0007", 2000.0)], "url string, value double"
    )
    assert update_numeric_doc_values(spark, idx, upd1, name="prio") == 2
    got = _prio(spark, idx)
    assert got["doc://0003"] == 1000.0 and got["doc://0007"] == 2000.0
    assert got["doc://0005"] == 50.0  # untouched docs keep base values

    # second gen overrides the first for doc 3 only
    upd2 = spark.createDataFrame(
        [("doc://0003", 5000.0)], "url string, value double"
    )
    assert update_numeric_doc_values(spark, idx, upd2, name="prio") == 1
    got = _prio(spark, idx)
    assert got["doc://0003"] == 5000.0 and got["doc://0007"] == 2000.0

    # unknown url matches nothing (updateNumericDocValue's missing term)
    ghost = spark.createDataFrame([("doc://9999", 1.0)], "url string, value double")
    assert update_numeric_doc_values(spark, idx, ghost, name="prio") == 0

    # sorted search sees updates: doc 3 now sorts first
    s = Searcher(spark, idx, analyzer="simple")
    top = s.search_sorted_by("alpha", sort_col="dv:prio", k=3).collect()
    assert [int(r["dv_prio"]) for r in top] == [5000, 2000, 190]

    # snapshot reader still sees the pre-update values
    pre = _prio(spark, idx, snapshot="pre_update")
    assert pre["doc://0003"] == 30.0 and pre["doc://0007"] == 70.0


def test_merge_bakes_updates(spark, idx, tmp_path_factory):
    merged = str(tmp_path_factory.mktemp("dvu") / "merged")
    merge_segments(spark, idx, merged, target_segments=1)
    # the merged index has NO dv_updates delta, yet carries updated values
    assert not os.path.isdir(os.path.join(merged, "dv_updates"))
    got = _prio(spark, merged)
    assert got["doc://0003"] == 5000.0 and got["doc://0007"] == 2000.0
    assert got["doc://0005"] == 50.0


def test_update_requires_name(spark, idx):
    df = spark.createDataFrame([("doc://0001", 1.0)], "url string, value double")
    with pytest.raises(ValueError):
        update_numeric_doc_values(spark, idx, df)
