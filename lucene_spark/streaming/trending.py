"""Trending terms over a timestamped document stream — windowed term
frequencies as a NATIVE Structured Streaming stateful aggregation.

Not a reference operator (Lucene has HighFreqTerms for a static index —
index/tools, already implemented in index/highfreq.py); this is its
streaming dual: "what is being said right now", the webtext monitoring op
a crawl pipeline runs next to percolation alerts (streaming/alerts.py).

Design: tokenization is the SAME simple-analyzer expression the DuckDB
gate oracle can replay (lower → split on non-[a-z0-9] runs), kept fully
JVM-side (split + explode, no Python), then the built-in
``window(ts, ...)`` group-by. Batch and stream share one expression
(``term_counts``), so stream output provably equals the batch pass over
the same rows once the watermark closes a window — the same
batch/stream-equivalence contract as streaming/dedup.py and sessions.py.

Scale shape: explode fans out to one row per token occurrence, but the
windowed count is map-side combinable and the state store holds only
(window × distinct-term) counters; late data is bounded by the watermark,
so state is O(active windows · vocabulary), not O(stream)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["term_counts", "trending_stream", "top_trending"]


def _tokens(df: DataFrame, text_col: str) -> F.Column:
    return F.explode(
        F.filter(
            F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"),
            lambda t: t != "",
        )
    )


def term_counts(
    docs: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    window_dur: str = "60 minutes",
    slide: str | None = None,
    stopwords: frozenset[str] | None = None,
) -> DataFrame:
    """(window, term, cnt) — one map-side-combinable aggregation; the
    shared batch/stream expression (pass a streaming df for the stream
    form). ``slide`` makes the windows sliding instead of tumbling."""
    win = (
        F.window(ts_col, window_dur, slide)
        if slide
        else F.window(ts_col, window_dur)
    )
    toks = docs.select(win.alias("window"), _tokens(docs, text_col).alias("term"))
    if stopwords:
        toks = toks.filter(~F.col("term").isin(sorted(stopwords)))
    return toks.groupBy("window", "term").agg(F.count("*").alias("cnt"))


def trending_stream(
    stream_df: DataFrame,
    out_path: str,
    checkpoint: str,
    text_col: str = "text",
    ts_col: str = "ts",
    window_dur: str = "60 minutes",
    watermark: str = "120 minutes",
    stopwords: frozenset[str] | None = None,
):
    """Run the windowed count as a real streaming query: watermark bounds
    state and lateness, append mode emits each window EXACTLY ONCE when
    the watermark passes its end, parquet sink + checkpoint give
    exactly-once recovery. Returns the started StreamingQuery
    (availableNow trigger: drains current input then stops)."""
    counts = term_counts(
        stream_df.withWatermark(ts_col, watermark),
        text_col=text_col,
        ts_col=ts_col,
        window_dur=window_dur,
        stopwords=stopwords,
    ).select(
        F.col("window.start").alias("win_start"),
        F.col("window.end").alias("win_end"),
        "term",
        "cnt",
    )
    return (
        counts.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def top_trending(counts: DataFrame, k: int = 5) -> DataFrame:
    """Top-k terms per window by (cnt DESC, term ASC) — the rank pass a
    dashboard runs over the emitted counts (≤ windows·vocab rows, tiny
    next to the stream)."""
    w = Window.partitionBy("window").orderBy(F.desc("cnt"), F.asc("term"))
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= int(k))
    )
