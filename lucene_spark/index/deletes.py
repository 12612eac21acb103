"""Live docs: per-segment delete lists (the .liv bitset analog).

Lucene marks deletions in a per-segment bitset applied by every scorer
(codecs/lucene90/Lucene90LiveDocsFormat.java; liveDocs checks in
search/Weight.java bulk scorers). Here deletes are a small parquet table
``deletes/(segment_id, docid)`` in STORED docid coordinates, appended per
delete batch. At search time they ride into each (segment, slice) task as
postings-shaped pseudo rows (encoding=ENC_DELETE) — the same distribution
path as singleton pulsing, so the whole plan stays shuffle-free on the
driver and a deleted doc is filtered before it can occupy a top-k slot.

``updateDocument(term, doc)`` ≡ append new segment + delete-by-url of the
old doc (index/DocumentsWriterDeleteQueue.java buffered-delete semantics,
applied at flush; here applied at batch commit).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .reader import IndexReader

__all__ = [
    "ENC_DELETE",
    "DELETES_SCHEMA",
    "add_deletes_by_url",
    "add_deletes_by_query",
    "delete_pseudo_blocks",
]

ENC_DELETE = 5
_DELETE_TERM = "\x00deleted"  # NUL prefix: unreachable by any analyzed term

DELETES_SCHEMA = "segment_id int, docid long"


def add_deletes_by_url(
    spark: SparkSession, index_dir: str, urls_df: DataFrame
) -> int:
    """Mark every doc whose url appears in ``urls_df`` (column ``url``)
    deleted. Returns the number of newly marked docs. The docmap join is a
    broadcast of the (small) url batch against the partitioned docmap scan."""
    reader = IndexReader(spark, index_dir)
    hits = (
        reader.docmap.join(F.broadcast(urls_df.select("url").distinct()), "url")
        .select("segment_id", "docid")
    )
    n = hits.count()
    if n:
        hits.write.mode("append").parquet(f"{index_dir}/deletes")
    return n


def delete_pseudo_blocks(deletes: DataFrame) -> DataFrame:
    """POSTINGS_COLS-shaped rows carrying the delete list into the per-
    (segment, slice) search tasks; ``first_docid == last_docid == docid`` so
    docid-slice replication routes each tombstone to exactly its slice."""
    return deletes.select(
        "segment_id",
        F.lit(_DELETE_TERM).alias("term"),
        F.lit(0).alias("block_no"),
        F.lit(1).alias("n_docs"),
        (F.col("docid") - 1).alias("base_docid"),
        F.col("docid").alias("first_docid"),
        F.col("docid").alias("last_docid"),
        F.lit(ENC_DELETE).cast("tinyint").alias("encoding"),
        F.lit(None).cast("binary").alias("docids_enc"),
        F.lit(None).cast("binary").alias("freqs_enc"),
        F.lit(None).cast("binary").alias("norms_enc"),
        F.lit(None).cast("binary").alias("positions_enc"),
        F.lit(None).cast("binary").alias("payloads_enc"),
        F.array().cast("array<long>").alias("impact_freqs"),
        F.array().cast("array<int>").alias("impact_norms"),
    )


def add_deletes_by_query(
    spark: SparkSession,
    index_dir: str,
    query,
    *,
    analyzer: str = "standard",
    stopwords: frozenset[str] | None = None,
) -> int:
    """IndexWriter.deleteDocuments(Query) (index/IndexWriter.java:1560
    deleteDocuments(Query...) — buffered query deletes resolved against a
    reader at flush; here resolved immediately against the committed
    index): every doc matching ``query`` (string or AST) gets a tombstone.
    The match runs the normal distributed evaluation; global docids map
    back to (segment, stored docid) through the broadcast segment-range
    table — no collect of the hit set."""
    from ..search.searcher import Searcher

    s = Searcher(
        spark, index_dir, analyzer=analyzer, stopwords=stopwords
    )
    seg_df = F.broadcast(
        spark.createDataFrame(
            [
                (int(sid), int(b), int(b) + int(mn), int(b) + int(mx))
                for sid, (b, mn, mx) in s._seg_meta().items()
            ],
            "seg int, doc_base long, lo long, hi long",
        )
    )
    hits = s.search_all(query).select("docid")
    mapped = (
        hits.join(seg_df, (hits.docid >= F.col("lo")) & (hits.docid < F.col("hi")))
        .select(
            F.col("seg").alias("segment_id"),
            (F.col("docid") - F.col("doc_base")).alias("docid"),
        )
    )
    # don't double-tombstone already-deleted docs (search_all is already
    # live-docs-filtered, so this is just the idempotent-replay guard)
    n = mapped.count()
    if n:
        mapped.write.mode("append").parquet(f"{index_dir}/deletes")
    return n
