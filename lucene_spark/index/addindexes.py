"""IndexWriter.addIndexes(Directory...) — absorb separately built indexes
into an existing one WITHOUT decoding a single posting.

Behavioral reference: index/IndexWriter.java addIndexes(Directory... dirs)
(the no-merge path: source segments are copied into the destination under
fresh segment names and the new SegmentInfos is committed; nothing is
re-inverted). Here a source segment's parquet partitions move under a
fresh ``segment_id=<new>`` directory — segment_id is a hive partition
column, so the copied files are reinterpreted by path with ZERO byte
rewrites (the same shift-invariance the merge planner exploits) — then
field_stats rows are remapped, per-segment deletes / docValues-update
deltas follow under the new ids, and the manifest (the commit point,
segments_N semantics) is written LAST with the new doc_bases continuing
after every existing doc. A crash before the manifest write leaves only
orphan partition dirs, which readers ignore (the manifest defines
membership).

Schema compatibility follows the reference's contract: the destination
and sources must agree on index_meta.json (fields / features / index
sort / per-field analyzers / doc_values) — mismatches raise, like
addIndexes' IllegalArgumentException on incompatible segments.

Scale note: the per-partition file copy is driver-side shutil here
(local filesystem); on an object store it is a parallel server-side copy
(one rename/copy per partition file, no data through the driver) — the
metadata-only character is what matters at 100 TB.
"""

from __future__ import annotations

import json
import os
import shutil
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from .reader import IndexReader
from .smallio import FIELD_STATS_SCHEMA, MANIFEST_SCHEMA, write_driver_table

__all__ = ["add_indexes"]


def _read_meta(index_dir: str) -> dict | None:
    p = os.path.join(index_dir, "index_meta.json")
    if not os.path.exists(p):
        return None
    with open(p) as fh:
        return json.load(fh)


def add_indexes(
    spark: SparkSession, dst_dir: str, src_dirs: list[str]
) -> dict:
    """Absorb every live segment of each source index into ``dst_dir``
    under fresh segment ids. Returns {added_segments, n_docs_added,
    n_docs_total}."""
    dst = IndexReader(spark, dst_dir)
    dst_meta = _read_meta(dst_dir)
    dst_rows = dst.manifest_rows
    existing_ids = {int(r["segment_id"]) for r in dst_rows}
    next_id = (max(existing_ids) + 1) if existing_ids else 0
    doc_base = sum(int(r["n_docs"]) for r in dst_rows)

    existing_stats = [
        (
            int(r["segment_id"]), int(r["doc_count"]), int(r["sum_ttf"]),
            int(r["max_docid"]), int(r["min_docid"]),
        )
        for r in dst.field_stats.collect()
    ]
    manifest_rows = [
        (
            int(r["segment_id"]), int(r["n_docs"]), int(r["doc_base"]),
            r["status"], float(r["checkpoint_ts"]), r["lineage"],
            r["metrics_json"],
        )
        for r in dst_rows
    ]

    new_stats: list[tuple] = []
    added = 0
    docs_added = 0
    for src_dir in src_dirs:
        if _read_meta(src_dir) != dst_meta:
            raise ValueError(
                f"addIndexes: {src_dir} has an incompatible index_meta "
                "(fields/features/index_sort/doc_values must match the "
                "destination, like IndexWriter.addIndexes rejects "
                "incompatible segments)"
            )
        src = IndexReader(spark, src_dir)
        src_stats = {
            int(r["segment_id"]): r for r in src.field_stats.collect()
        }
        for row in src.manifest_rows:
            old_id, new_id = int(row["segment_id"]), next_id
            next_id += 1
            # move the four kind partitions by PATH: partition-column
            # reinterpretation, no byte rewrites
            for kind_dir in sorted(os.listdir(os.path.join(src_dir, "data"))):
                src_part = os.path.join(
                    src_dir, "data", kind_dir, f"segment_id={old_id}"
                )
                if not os.path.isdir(src_part):
                    continue
                dst_part = os.path.join(
                    dst_dir, "data", kind_dir, f"segment_id={new_id}"
                )
                os.makedirs(dst_part, exist_ok=True)
                for fn in os.listdir(src_part):
                    if fn.endswith(".parquet"):
                        shutil.copy2(
                            os.path.join(src_part, fn),
                            os.path.join(dst_part, f"src{added}-{fn}"),
                        )
            s = src_stats[old_id]
            new_stats.append(
                (
                    new_id, int(s["doc_count"]), int(s["sum_ttf"]),
                    int(s["max_docid"]), int(s["min_docid"]),
                )
            )
            manifest_rows.append(
                (
                    new_id, int(row["n_docs"]), int(doc_base), "done",
                    float(time.time()),
                    f"addIndexes(src={src_dir},src_segment={old_id});"
                    + str(row["lineage"]),
                    row["metrics_json"],
                )
            )
            doc_base += int(row["n_docs"])
            docs_added += int(row["n_docs"])
            added += 1
            # per-segment delete / dv-update deltas follow the rename
            for aux in ("deletes", "dv_updates"):
                if os.path.isdir(os.path.join(src_dir, aux)):
                    (
                        spark.read.parquet(f"{src_dir}/{aux}")
                        .filter(F.col("segment_id") == old_id)
                        .withColumn("segment_id", F.lit(new_id))
                        .write.mode("append")
                        .parquet(f"{dst_dir}/{aux}")
                    )

    write_driver_table(
        os.path.join(dst_dir, "field_stats"),
        existing_stats + new_stats,
        FIELD_STATS_SCHEMA,
    )
    # the manifest write IS the commit — last
    write_driver_table(
        os.path.join(dst_dir, "segment_manifest"),
        manifest_rows,
        MANIFEST_SCHEMA,
    )
    return {
        "added_segments": added,
        "n_docs_added": docs_added,
        "n_docs_total": doc_base,
    }
