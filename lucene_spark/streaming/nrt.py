"""Near-real-time indexing over Structured Streaming.

Lucene's NRT model (reference: lucene/core/src/java/org/apache/lucene/
search/SearcherManager.java:52, index/DirectoryReader.java openIfChanged,
search/ControlledRealTimeReopenThread.java:36) maps onto micro-batches:

- each micro-batch is a DWPT-flush-sized unit of new documents; the batch
  builds fresh segments APPENDED to the index (builder append mode) — the
  manifest swap at the end of the batch is the commit point, so a reader
  opened after it sees the new segments (openIfChanged ≡ new IndexReader);
- ``update_by_url=True`` gives updateDocument(term) semantics
  (index/DocumentsWriterDeleteQueue.java buffered deletes applied at
  flush): urls in the batch that already exist get their OLD docs
  tombstoned in the live-docs table before the new segments commit (the
  docmap scanned for tombstones still holds only pre-batch segments, so
  the new docs are never self-deleted); a crash between the two steps is
  healed by Structured Streaming's batch replay, which re-appends the same
  tombstones (deduplicated at read) and re-overwrites the same segments;
- max staleness ≡ ``trigger(processingTime=...)``
  (ControlledRealTimeReopenThread's target latency);
- exactly-once per batch, both crash windows: (a) crash BEFORE the
  manifest swap — the builder's per-segment dynamic-partition overwrite +
  id-set-derived labels make the replay overwrite the same uncommitted
  partitions; (b) crash AFTER the swap but before the streaming
  checkpoint advances — the batch_id is recorded in every new segment's
  lineage, and a replayed batch whose tag already appears in the manifest
  is skipped outright (foreachBatch idempotence by transaction id, the
  standard Structured Streaming sink contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..index.builder import build_index
from ..index.deletes import add_deletes_by_url
from ..index.reader import IndexReader

__all__ = ["StreamingIndexWriter", "index_stream"]


class StreamingIndexWriter:
    """foreachBatch sink: each micro-batch appends segments to ``index_dir``.

    Use either directly::

        writer = StreamingIndexWriter(index_dir, stopwords=...)
        q = stream_df.writeStream.foreachBatch(writer).start(...)

    or via :func:`index_stream`.
    """

    def __init__(
        self,
        index_dir: str,
        *,
        segments_per_batch: int = 4,
        analyzer: str = "standard",
        stopwords: frozenset[str] | None = None,
        html_input: bool = False,
        index_positions: bool = True,
        update_by_url: bool = True,
    ):
        self.index_dir = index_dir
        self.segments_per_batch = segments_per_batch
        self.analyzer = analyzer
        self.stopwords = stopwords
        self.html_input = html_input
        self.index_positions = index_positions
        self.update_by_url = update_by_url
        self.batches_done = 0
        self.docs_indexed = 0
        self.docs_updated = 0

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        if len(batch_df.take(1)) == 0:
            return
        import os

        first = not os.path.isdir(f"{self.index_dir}/segment_manifest")
        tag = f"stream_batch={batch_id}"
        if not first:
            # idempotent replay: a crash AFTER the manifest commit but
            # BEFORE the streaming checkpoint advances replays this batch;
            # the batch_id recorded in segment lineage detects that and
            # skips (re-running would tombstone the batch's own docs via
            # update_by_url and then append them a second time)
            man = IndexReader(spark, self.index_dir).manifest_rows
            if any(
                tag in (r["lineage"] or "").split(";") for r in man
            ):
                return
        if self.update_by_url and not first:
            # tombstone before checking: the OLD docs for updated urls (the
            # docmap still only contains pre-batch segments at this point)
            self.docs_updated += add_deletes_by_url(
                spark, self.index_dir, batch_df.select("url")
            )
        metrics = build_index(
            spark,
            batch_df,
            self.index_dir,
            num_segments=self.segments_per_batch,
            analyzer=self.analyzer,
            stopwords=self.stopwords,
            html_input=self.html_input,
            index_positions=self.index_positions,
            append=not first,
            lineage_tag=tag,
        )
        self.batches_done += 1
        self.docs_indexed += metrics.get("new_docs", metrics["n_docs"])

    def reader(self, spark: SparkSession) -> IndexReader:
        """A fresh reader over the latest commit (openIfChanged analog)."""
        return IndexReader(spark, self.index_dir)


def index_stream(
    stream_df: DataFrame,
    index_dir: str,
    checkpoint_dir: str,
    *,
    trigger_once: bool = False,
    processing_time: str | None = None,
    **writer_kwargs,
):
    """Start a Structured Streaming query indexing ``stream_df`` (columns
    url, text[, html, ...]) into ``index_dir``. Returns (query, writer)."""
    writer = StreamingIndexWriter(index_dir, **writer_kwargs)
    ws = stream_df.writeStream.foreachBatch(writer).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_once:
        ws = ws.trigger(availableNow=True)
    elif processing_time:
        ws = ws.trigger(processingTime=processing_time)
    return ws.start(), writer
