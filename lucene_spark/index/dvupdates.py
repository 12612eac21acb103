"""In-place numeric doc-value updates — updateNumericDocValue semantics.

Reference behavior: index/IndexWriter.java updateNumericDocValue(Term,
field, value) + index/ReadersAndUpdates.java — a numeric doc-value can be
rewritten for all docs matching a term WITHOUT reindexing the documents;
each update batch gets a docValuesGen, readers resolve field values through
the newest gen, and segment merges bake the updates into the merged
segment's base doc-values.

Spark-first restatement: updates land as delta rows
``(segment_id, docid, name, value, gen)`` in the ``dv_updates`` table; the
reader overlays latest-gen-wins onto the docmap's dv map
(``IndexReader.docmap``), so every consumer — sorted search, function /
expression scoring, merges, compaction — sees updated values, and a merge
or compaction rewrite persists them into its output docmap exactly like a
Lucene merge folding DV gens. Snapshots pin the dv_updates table with the
rest of the commit metadata, so a point-in-time reader sees the values as
of the snapshot.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .reader import IndexReader

__all__ = ["update_numeric_doc_values"]


def update_numeric_doc_values(
    spark: SparkSession,
    index_dir: str,
    updates_df: DataFrame,
    name: str | None = None,
) -> int:
    """Set numeric doc-values by url. ``updates_df`` carries columns
    ``(url, value)`` with the field given by ``name``, or ``(url, name,
    value)`` for mixed-field batches. Docs whose url is not in the index
    are ignored (updateNumericDocValue's term simply matches nothing).
    Returns the number of (doc, field) cells written; the whole batch gets
    one new gen, atomically visible once the parquet append commits."""
    cols = set(updates_df.columns)
    if "name" not in cols:
        if name is None:
            raise ValueError("pass name= or include a 'name' column")
        updates_df = updates_df.withColumn("name", F.lit(name))
    upd = updates_df.select(
        "url",
        F.col("name").cast("string").alias("name"),
        F.col("value").cast("double").alias("value"),
    )
    reader = IndexReader(spark, index_dir)
    gen = 0
    if os.path.isdir(f"{index_dir}/dv_updates"):
        row = (
            spark.read.parquet(f"{index_dir}/dv_updates")
            .agg(F.max("gen"))
            .collect()[0]
        )
        gen = int(row[0]) + 1 if row[0] is not None else 0
    rows = (
        reader.docmap.select("segment_id", "docid", "url")
        .join(F.broadcast(upd), "url")
        .select(
            "segment_id", "docid", "name", "value",
            F.lit(gen).cast("long").alias("gen"),
        )
    )
    n = rows.count()
    if n:
        rows.write.mode("append").parquet(f"{index_dir}/dv_updates")
    return n
