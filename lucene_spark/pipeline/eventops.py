"""Event-stream operators (batch form; streaming/ holds the incremental
versions). Time arithmetic is done on epoch microseconds (unix_micros /
epoch_us) so engine and oracle agree independent of session timezones."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["hourly_rollup", "sessionize", "props_rollup", "sliding_rollup"]

_US_PER_HOUR = 3_600_000_000

# epoch micros for TIMESTAMP_NTZ columns, independent of the session timezone
# (unix_micros only accepts LTZ; NTZ wallclock is treated as UTC, matching the
# oracle's epoch_us on naive timestamps)
_EPOCH_US = "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"


def hourly_rollup(events: DataFrame) -> DataFrame:
    """(hour, event_type, n, sum_value): tumbling 1h windows keyed on
    floor(epoch_us / 3600e6) — the batch equivalent of a Structured
    Streaming window('1 hour') aggregation."""
    return (
        events.withColumn(
            "hour", F.expr(f"{_EPOCH_US} div {_US_PER_HOUR}")
        )
        .groupBy("hour", "event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
    )


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """(user_id, n_events, n_sessions): gap-based sessions — a new session
    starts when the inter-event gap exceeds ``gap_minutes`` (the batch analog
    of a session window with that gap)."""
    gap_us = gap_minutes * 60 * 1_000_000
    w = Window.partitionBy("user_id").orderBy("e", "event_id")
    e = events.withColumn("e", F.expr(_EPOCH_US))
    marked = e.withColumn(
        "new_session",
        F.when(
            F.lag("e").over(w).isNull() | (F.col("e") - F.lag("e").over(w) > gap_us),
            1,
        ).otherwise(0),
    )
    return marked.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.sum("new_session").alias("n_sessions"),
    )


def props_rollup(events: DataFrame) -> DataFrame:
    """(event_type, n, sum_k, avg_k): extract integer ``k`` from the JSON
    props string via regex (schema-on-read) and aggregate."""
    k = F.regexp_extract(F.col("props"), '"k": (\\d+)', 1).cast("long")
    return (
        events.withColumn("k", k)
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("k").alias("sum_k"),
            F.round(
                F.sum("k").cast("double") / F.count("*").cast("double"), 4
            ).alias("avg_k"),
        )
    )


def sliding_rollup(
    events: DataFrame,
    window_minutes: int = 60,
    slide_minutes: int = 15,
) -> DataFrame:
    """(w_start, event_type, n, sum_value): SLIDING windows — each event
    lands in window_minutes/slide_minutes overlapping windows, the batch
    equivalent of a Structured Streaming ``window(ts, '60 minutes',
    '15 minutes')`` aggregation, and expressed with exactly that built-in
    (Catalyst expands the window assignment; no explode is written here).
    ``w_start`` is the window start in epoch seconds, aligned to the epoch
    like Spark's window() (NTZ wallclock treated as UTC, matching the
    oracle's epoch_us arithmetic)."""
    if window_minutes % slide_minutes:
        raise ValueError("slide must divide window")
    w = F.window(
        "ts", f"{window_minutes} minutes", f"{slide_minutes} minutes"
    )
    return (
        events.groupBy(w.alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.expr(
                "timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', w.start)"
            ).alias("w_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )
