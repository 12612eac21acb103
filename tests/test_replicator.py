"""lucene/replicator (nrt) analog (index/replicator.py): a replica syncs
only missing immutable segment partitions, switches commits atomically
(manifest last), serves identical results, and deletes unreferenced
partitions — PrimaryNode/ReplicaNode/CopyJob/ReplicaFileDeleter semantics.
"""

import os

from lucene_spark.index import build_index
from lucene_spark.index.replicator import copy_state, sync_replica
from lucene_spark.search import Searcher


def _docs(spark, rows):
    return spark.createDataFrame(rows, "url string, text string")


def _topk(spark, d, q, k=20):
    s = Searcher(spark, d, analyzer="simple", mode="double")
    return sorted(
        (r["url"], round(r["score"], 6))
        for r in s.search(q, k=k, with_url=True).collect()
    )


def _build(spark, d, rows, **kw):
    build_index(spark, _docs(spark, rows), d, analyzer="simple",
                stopwords=None, **kw)


def test_initial_sync_serves_identical_results(spark, tmp_path):
    pri, rep = str(tmp_path / "pri"), str(tmp_path / "rep")
    rows = [(f"doc://{i}", f"w{i % 4} shared body") for i in range(16)]
    _build(spark, pri, rows, num_segments=3)
    stats = sync_replica(pri, rep)
    assert stats["files_copied"] > 0 and stats["files_reused"] == 0
    for q in ["shared", "w0", "w1 OR w3", '"shared body"']:
        assert _topk(spark, rep, q) == _topk(spark, pri, q)


def test_second_sync_is_zero_copy(spark, tmp_path):
    pri, rep = str(tmp_path / "pri"), str(tmp_path / "rep")
    _build(spark, pri, [(f"doc://{i}", "alpha beta") for i in range(8)],
           num_segments=2)
    sync_replica(pri, rep)
    stats = sync_replica(pri, rep)
    assert stats["files_copied"] == 0 and stats["bytes_copied"] == 0
    assert stats["files_reused"] > 0


def test_incremental_append_copies_only_new_segments(spark, tmp_path):
    pri, rep = str(tmp_path / "pri"), str(tmp_path / "rep")
    _build(spark, pri, [(f"doc://{i}", "alpha beta") for i in range(8)],
           num_segments=2)
    sync_replica(pri, rep)
    base_state = copy_state(pri)
    _build(spark, pri, [(f"doc://{i}", "alpha gamma") for i in range(8, 12)],
           num_segments=1, append=True)
    new_state = copy_state(pri)
    new_files = set(new_state["files"]) - set(base_state["files"])
    assert new_files  # the appended segment's partitions
    stats = sync_replica(pri, rep)
    # every copied file belongs to the NEW segment; old ones are reused
    assert stats["files_copied"] == len(new_files)
    assert stats["files_reused"] == len(base_state["files"])
    assert _topk(spark, rep, "gamma") == _topk(spark, pri, "gamma")
    assert _topk(spark, rep, "alpha") == _topk(spark, pri, "alpha")


def _force_merge_in_place(spark, index_dir):
    from lucene_spark.index.merge import execute_merge_plan
    from lucene_spark.index.mergepolicy import MergePlan

    ids = copy_state(index_dir)["segments"]
    execute_merge_plan(
        spark, index_dir, MergePlan(segment_ids=tuple(ids), total_docs=0)
    )


def test_merge_switch_deletes_unreferenced_partitions(spark, tmp_path):
    pri, rep = str(tmp_path / "pri"), str(tmp_path / "rep")
    _build(spark, pri, [(f"doc://{i}", f"w{i % 4} body") for i in range(16)],
           num_segments=4)
    sync_replica(pri, rep)
    _force_merge_in_place(spark, pri)
    stats = sync_replica(pri, rep)
    assert stats["files_deleted"] > 0  # the pre-merge partitions went away
    assert len(stats["segments"]) == 1
    live = set()
    data = os.path.join(rep, "data")
    for kind in os.listdir(data):
        for seg in os.listdir(os.path.join(data, kind)):
            live.add(seg)
    assert len({s for s in live if s.startswith("segment_id=")}) == 1
    for q in ["body", "w2"]:
        assert _topk(spark, rep, q) == _topk(spark, pri, q)


def test_deletes_replicate(spark, tmp_path):
    from lucene_spark.index.deletes import add_deletes_by_url

    pri, rep = str(tmp_path / "pri"), str(tmp_path / "rep")
    _build(spark, pri, [(f"doc://{i}", "target text") for i in range(8)],
           num_segments=2)
    sync_replica(pri, rep)
    add_deletes_by_url(
        spark, pri,
        spark.createDataFrame([("doc://1",), ("doc://5",)], "url string"),
    )
    sync_replica(pri, rep)
    urls = {u for u, _ in _topk(spark, rep, "target")}
    assert "doc://1" not in urls and "doc://5" not in urls
    assert len(urls) == 6
    assert _topk(spark, rep, "target") == _topk(spark, pri, "target")


def test_replica_snapshot_survives_deleter(spark, tmp_path):
    from lucene_spark.index.snapshots import create_snapshot

    pri, rep = str(tmp_path / "pri"), str(tmp_path / "rep")
    _build(spark, pri, [(f"doc://{i}", f"w{i % 4} body") for i in range(16)],
           num_segments=4)
    sync_replica(pri, rep)
    create_snapshot(rep, "pin")
    before = _topk(spark, rep, "body")
    _force_merge_in_place(spark, pri)
    stats = sync_replica(pri, rep)
    # pinned partitions survive the deleter pass
    assert stats["files_deleted"] == 0
    s = Searcher(spark, rep, analyzer="simple", mode="double",
                 snapshot="pin")
    got = sorted(
        (r["url"], round(r["score"], 6))
        for r in s.search("body", k=20, with_url=True).collect()
    )
    assert got == before
