"""Streaming percolation — Monitor-style alerting over a document stream.

Reference behavior: the monitor module's intended deployment
(monitor/Monitor.java class javadoc — register queries once, stream
documents through, emit which queries match each document as it arrives).
Lucene runs this single-node; the Spark-first restatement runs the SAME
match flow (TermFilteredPresearcher candidates → MemoryIndex refine,
search/memory.percolate) inside ``foreachBatch`` of a Structured Streaming
query, so each micro-batch of crawled/ingested pages is percolated
against the registered query set and matches append to a parquet alert
log exactly-once per batch (foreachBatch + append sink + checkpoint).

Why foreachBatch and not a streaming join: the presearcher stage is a
broadcast join + distinct + groupBy per batch — trivially re-plannable
per micro-batch, with the static query-term table reused every batch; a
continuous streaming aggregation would force watermark bookkeeping on a
pipeline that is logically stateless per document.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["percolate_stream"]


def percolate_stream(
    stream: DataFrame,
    queries: dict[str, object],
    sink_dir: str,
    checkpoint_dir: str,
    *,
    id_col: str = "url",
    text_col: str = "text",
    analyzer: str = "standard",
    stopwords: frozenset[str] | None = None,
    trigger_available_now: bool = True,
):
    """Start the alerting query: every micro-batch is percolated against
    the registered queries and matches (id, query_id, score, batch_id)
    append to ``sink_dir``. Returns the StreamingQuery (caller awaits)."""
    from pyspark.sql import functions as F

    from ..search.memory import percolate

    def run_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        matches = percolate(
            batch_df,
            queries,
            id_col=id_col,
            text_col=text_col,
            analyzer=analyzer,
            stopwords=stopwords,
        ).withColumn("batch_id", F.lit(int(batch_id)))
        matches.write.mode("append").parquet(sink_dir)

    writer = (
        stream.writeStream.foreachBatch(run_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
