"""Point-in-time snapshots (SnapshotDeletionPolicy / IndexCommit analog).

A snapshot pins a commit: it copies the COMMIT METADATA — segment manifest,
field_stats, deletes table, index_meta.json — into
``<index_dir>/snapshots/<name>/`` while sharing the immutable data
partitions (reference: lucene/core/src/java/org/apache/lucene/index/
SnapshotDeletionPolicy.java:44-57 — a snapshot holds an IndexCommit so
IndexFileDeleter won't delete its files; IndexCommit = segments_N plus the
files it references).

Readers open a snapshot with ``IndexReader(spark, index_dir,
snapshot=name)`` / ``Searcher(..., snapshot=name)``: the manifest gate then
resolves index membership as of the snapshot, so searches are repeatable
point-in-time even while appends and merges land (DirectoryReader.open(
IndexCommit) semantics).

Reclaim protocol (IndexFileDeleter refcount analog):
- merges skip deleting data partitions whose segment_id is referenced by
  ANY snapshot manifest (``referenced_segments``);
- ``release_snapshot`` drops the pin; ``prune_unreferenced`` then removes
  data partitions referenced by neither the live manifest nor a snapshot
  (the deferred delete IndexFileDeleter runs on commit);
- ``compact_deletes`` is snapshot-safe: it rewrites each compacted segment
  under a NEW segment_id (write-once, like every Lucene merge) and removes
  the old partitions only when no snapshot pins them — pinned ones are
  reclaimed by ``prune_unreferenced`` after release.

Everything here is driver-side metadata I/O: snapshot dirs hold three tiny
parquet tables + one json file; no data bytes are copied, so snapshotting a
10^12-doc index costs the same as snapshotting a test fixture.
"""

from __future__ import annotations

import os
import shutil

import pyarrow.parquet as pq

__all__ = [
    "create_snapshot",
    "release_snapshot",
    "list_snapshots",
    "referenced_segments",
    "prune_unreferenced",
]

_META_TABLES = ("segment_manifest", "field_stats", "deletes", "dv_updates")


def _snap_root(index_dir: str) -> str:
    return os.path.join(index_dir, "snapshots")


def create_snapshot(index_dir: str, name: str) -> str:
    """Pin the current commit under ``snapshots/<name>``. The copy is
    staged in a temp dir and renamed so a crash never leaves a half
    snapshot visible."""
    if not name or "/" in name or name.startswith("."):
        raise ValueError(f"bad snapshot name {name!r}")
    dst = os.path.join(_snap_root(index_dir), name)
    if os.path.exists(dst):
        raise ValueError(f"snapshot {name!r} already exists")
    src_manifest = os.path.join(index_dir, "segment_manifest")
    if not os.path.isdir(src_manifest):
        raise FileNotFoundError(f"no committed index at {index_dir}")
    tmp = dst + ".__tmp__"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp)
    for t in _META_TABLES:
        src = os.path.join(index_dir, t)
        if os.path.isdir(src):
            shutil.copytree(src, os.path.join(tmp, t))
    meta = os.path.join(index_dir, "index_meta.json")
    if os.path.exists(meta):
        shutil.copy2(meta, os.path.join(tmp, "index_meta.json"))
    os.makedirs(_snap_root(index_dir), exist_ok=True)
    os.rename(tmp, dst)
    return dst


def release_snapshot(index_dir: str, name: str) -> None:
    """Drop the pin (SnapshotDeletionPolicy.release). Freed segments are
    reclaimed by the next ``prune_unreferenced`` / merge, not immediately."""
    dst = os.path.join(_snap_root(index_dir), name)
    if not os.path.isdir(dst):
        raise FileNotFoundError(f"no snapshot {name!r}")
    shutil.rmtree(dst)


def list_snapshots(index_dir: str) -> list[str]:
    root = _snap_root(index_dir)
    if not os.path.isdir(root):
        return []
    return sorted(
        d for d in os.listdir(root)
        if os.path.isdir(os.path.join(root, d)) and not d.endswith("__tmp__")
    )


def _manifest_segments(manifest_dir: str) -> set[int]:
    out: set[int] = set()
    for f in os.listdir(manifest_dir):
        if f.endswith(".parquet"):
            tbl = pq.read_table(
                os.path.join(manifest_dir, f), columns=["segment_id"]
            )
            out.update(int(x) for x in tbl.column("segment_id").to_pylist())
    return out


def referenced_segments(index_dir: str) -> set[int]:
    """Segment ids pinned by ANY snapshot (the refcount IndexFileDeleter
    consults before deleting a file)."""
    out: set[int] = set()
    for name in list_snapshots(index_dir):
        man = os.path.join(_snap_root(index_dir), name, "segment_manifest")
        if os.path.isdir(man):
            out |= _manifest_segments(man)
    return out


def prune_unreferenced(index_dir: str) -> list[int]:
    """Delete data partitions referenced by neither the live manifest nor a
    snapshot — the deferred reclaim after ``release_snapshot`` (the commit-
    time sweep of IndexFileDeleter). Returns the reclaimed segment ids."""
    live = _manifest_segments(os.path.join(index_dir, "segment_manifest"))
    keep = live | referenced_segments(index_dir)
    reclaimed: list[int] = []
    data = os.path.join(index_dir, "data")
    if not os.path.isdir(data):
        return reclaimed
    seen: set[int] = set()
    for kind_dir in os.listdir(data):
        kd = os.path.join(data, kind_dir)
        if not os.path.isdir(kd):
            continue
        for seg_dir in os.listdir(kd):
            if not seg_dir.startswith("segment_id="):
                continue
            seg = int(seg_dir.split("=", 1)[1])
            if seg not in keep:
                shutil.rmtree(os.path.join(kd, seg_dir), ignore_errors=True)
                if seg not in seen:
                    seen.add(seg)
                    reclaimed.append(seg)
    return sorted(reclaimed)
