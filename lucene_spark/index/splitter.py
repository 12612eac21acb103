"""Index splitting — MultiPassIndexSplitter re-expressed.

Behavioral reference: misc/src/java/org/apache/lucene/misc/index/
MultiPassIndexSplitter.java:70-117 — N passes over the source, each pass
"deleting" every doc outside the part (FakeDeleteIndexReader) and writing
the survivors as an independent index; ``-seq`` selects contiguous docid
ranges of length maxDoc/numParts (the LAST part takes the remainder,
:86-99), default is round-robin ``docid % numParts == part`` (:100-107).
``undeleteAll`` (:85) means PRE-EXISTING deletes in the source are
resurrected — each part partitions the full docid space.

Spark shape: per part, a filesystem copy of the committed index (cheap
metadata-level copy of immutable parquet), the source deletes table
dropped (undeleteAll), one distributed anti-predicate write of the
out-of-part tombstones (no docid list ever reaches the driver), then the
snapshot-safe physical compaction rewrites only the surviving postings.
Unlike the reference's addIndexes pass, docids are NOT renumbered — each
part keeps the source's global docid coordinates (the engine's manifest
keeps docid spans as immutable reservations), which also makes
part-vs-source result comparison exact."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from .compaction import compact_deletes
from .reader import IndexReader

__all__ = ["split_index"]


def split_index(
    spark: SparkSession,
    index_dir: str,
    out_dir: str,
    num_parts: int,
    seq: bool = False,
) -> list[str]:
    """Split ``index_dir`` into ``num_parts`` standalone indexes under
    ``out_dir/part{i}``. Returns the part paths."""
    if num_parts < 2:
        raise ValueError("num_parts must be >= 2")
    reader = IndexReader(spark, index_dir)
    max_doc = sum(int(r["n_docs"]) for r in reader.manifest_rows)
    if max_doc < 2:
        raise ValueError("not enough documents for splitting")
    part_len = max_doc // num_parts
    bases = [(int(s), int(b)) for s, b in reader.doc_bases.items()]
    out_paths = []
    for i in range(num_parts):
        out = os.path.join(out_dir, f"part{i}")
        shutil.rmtree(out, ignore_errors=True)
        shutil.copytree(index_dir, out)
        # undeleteAll: the split partitions the FULL docid space
        shutil.rmtree(os.path.join(out, "deletes"), ignore_errors=True)
        base_df = F.broadcast(
            spark.createDataFrame(bases, "segment_id int, doc_base long")
        )
        dm = IndexReader(spark, out).docmap.select("segment_id", "docid")
        g = F.col("docid") + F.col("doc_base")
        if seq:
            lo = part_len * i
            hi = (part_len * (i + 1)) if i < num_parts - 1 else max_doc
            keep = (g >= lo) & (g < hi)
        else:
            keep = (g % num_parts) == i
        (
            dm.join(base_df, "segment_id")
            .filter(~keep)
            .select("segment_id", "docid")
            .write.mode("append")
            .parquet(os.path.join(out, "deletes"))
        )
        compact_deletes(spark, out, force=True)
        out_paths.append(out)
    return out_paths
