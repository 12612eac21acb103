"""Nearline index replication — the lucene/replicator (nrt) module analog.

Behavioral reference: replicator/nrt/PrimaryNode.java + ReplicaNode.java +
CopyJob.java + FileMetaData.java + ReplicaFileDeleter.java: the primary
publishes a CopyState (its SegmentInfos plus per-file metadata), the
replica diffs that against its local files, copies ONLY the files it is
missing, switches to the new SegmentInfos atomically (a reader on the
replica always sees a complete commit), and finally deletes local files no
longer referenced by any commit.

The Spark-first restatement leans on the layout's write-once discipline:
segment data lives under hive partitions ``data/kind=K/segment_id=S`` that
are IMMUTABLE once committed (merges/compactions always write NEW segment
ids — the same invariant snapshots rely on), so the file diff degenerates
to a set difference on partition-relative paths + size checks; an
up-to-date replica syncs with zero bytes copied. Commit metadata
(field_stats / deletes / dv_updates / index_meta.json) is staged and
swapped with the ``.__tmp__``/``.__old__`` rename dance of
smallio.write_driver_table, and ``segment_manifest`` — the commit point —
swaps LAST, so a crash mid-sync leaves the replica on its previous commit
with at worst some orphan partition dirs (which the manifest gate makes
invisible, and the next sync's deleter removes).

Scale note: file copies here are driver-side shutil (local filesystem);
on an object store each is a server-side copy keyed by the same
partition-relative path — the primary never re-uploads immutable
segments, which is what makes replicating a 10^12-doc index incremental.

Replica-side snapshots are honored like the live deleter honors them:
partition dirs pinned by ``snapshots/`` manifests survive the
ReplicaFileDeleter pass (snapshots.referenced_segments).
"""

from __future__ import annotations

import json
import os
import shutil

import pyarrow.parquet as pq

__all__ = ["copy_state", "sync_replica"]

_META_TABLES = ("field_stats", "deletes", "dv_updates")
_MANIFEST = "segment_manifest"
_META_JSON = "index_meta.json"


def _manifest_segments(index_dir: str) -> list[int]:
    path = os.path.join(index_dir, _MANIFEST)
    if not os.path.isdir(path):
        raise FileNotFoundError(f"no committed index at {index_dir}")
    t = pq.read_table(path, columns=["segment_id"])
    return sorted(int(x) for x in t.column("segment_id").to_pylist())


def _data_files(index_dir: str, segments: set[int]) -> dict[str, int]:
    """{relpath under the index root: size} for every data file of the
    given segments (partition-dir membership is the identity: segment
    data is write-once)."""
    out: dict[str, int] = {}
    data = os.path.join(index_dir, "data")
    if not os.path.isdir(data):
        return out
    for kind in sorted(os.listdir(data)):
        kdir = os.path.join(data, kind)
        if not kind.startswith("kind=") or not os.path.isdir(kdir):
            continue
        for seg in sorted(os.listdir(kdir)):
            if not seg.startswith("segment_id="):
                continue
            try:
                sid = int(seg.split("=", 1)[1])
            except ValueError:
                continue
            if sid not in segments:
                continue
            sdir = os.path.join(kdir, seg)
            for fn in sorted(os.listdir(sdir)):
                fp = os.path.join(sdir, fn)
                if os.path.isfile(fp):
                    out[f"data/{kind}/{seg}/{fn}"] = os.path.getsize(fp)
    return out


def copy_state(index_dir: str) -> dict:
    """The primary's published state (CopyState analog): the commit's
    segment list and the per-file metadata a replica diffs against."""
    segs = _manifest_segments(index_dir)
    return {
        "segments": segs,
        "files": _data_files(index_dir, set(segs)),
        "version": _commit_version(index_dir),
    }


def _commit_version(index_dir: str) -> str:
    """A cheap commit fingerprint: the manifest parquet's (name, size,
    mtime_ns) tuples — any committed change rewrites the manifest dir."""
    path = os.path.join(index_dir, _MANIFEST)
    parts = []
    for fn in sorted(os.listdir(path)):
        st = os.stat(os.path.join(path, fn))
        parts.append(f"{fn}:{st.st_size}:{st.st_mtime_ns}")
    return "|".join(parts)


def _swap_dir_copy(src: str, dst: str) -> None:
    """Stage a copy of ``src`` next to ``dst`` and rename it live (the
    write_driver_table tmp/old dance — never a half-visible table)."""
    tmp, old = f"{dst}.__tmp__", f"{dst}.__old__"
    shutil.rmtree(tmp, ignore_errors=True)
    shutil.copytree(src, tmp)
    shutil.rmtree(old, ignore_errors=True)
    if os.path.exists(dst):
        os.rename(dst, old)
    os.rename(tmp, dst)
    shutil.rmtree(old, ignore_errors=True)


def sync_replica(primary_dir: str, replica_dir: str) -> dict:
    """One replication round (ReplicaNode.sync / CopyJob analog). Returns
    ``{"files_copied", "bytes_copied", "files_reused", "files_deleted",
    "segments"}``. Idempotent: a second call right after copies nothing."""
    state = copy_state(primary_dir)
    segs = set(state["segments"])
    os.makedirs(replica_dir, exist_ok=True)

    # --- CopyJob: fetch missing data files --------------------------------
    copied = reused = bytes_copied = 0
    for rel, size in state["files"].items():
        dst = os.path.join(replica_dir, rel)
        if os.path.isfile(dst) and os.path.getsize(dst) == size:
            reused += 1
            continue
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        shutil.copy2(os.path.join(primary_dir, rel), dst)
        copied += 1
        bytes_copied += size

    # --- commit metadata: stage + swap, manifest LAST ---------------------
    for t in _META_TABLES:
        src = os.path.join(primary_dir, t)
        dst = os.path.join(replica_dir, t)
        if os.path.isdir(src):
            _swap_dir_copy(src, dst)
        elif os.path.isdir(dst):
            # table dropped on the primary (e.g. deletes fully compacted)
            shutil.rmtree(dst)
    src_meta = os.path.join(primary_dir, _META_JSON)
    if os.path.exists(src_meta):
        tmp = os.path.join(replica_dir, _META_JSON + ".__tmp__")
        shutil.copy2(src_meta, tmp)
        os.replace(tmp, os.path.join(replica_dir, _META_JSON))
    _swap_dir_copy(
        os.path.join(primary_dir, _MANIFEST),
        os.path.join(replica_dir, _MANIFEST),
    )

    # --- ReplicaFileDeleter: drop partitions no commit references ---------
    from .snapshots import referenced_segments

    pinned = set(referenced_segments(replica_dir))
    deleted = 0
    data = os.path.join(replica_dir, "data")
    if os.path.isdir(data):
        for kind in os.listdir(data):
            kdir = os.path.join(data, kind)
            if not os.path.isdir(kdir):
                continue
            for seg in os.listdir(kdir):
                if not seg.startswith("segment_id="):
                    continue
                try:
                    sid = int(seg.split("=", 1)[1])
                except ValueError:
                    continue
                if sid in segs or sid in pinned:
                    continue
                n_files = len(os.listdir(os.path.join(kdir, seg)))
                shutil.rmtree(os.path.join(kdir, seg))
                deleted += n_files

    return {
        "files_copied": copied,
        "bytes_copied": bytes_copied,
        "files_reused": reused,
        "files_deleted": deleted,
        "segments": sorted(segs),
        "version": state["version"],
    }
