"""Stateful streaming sessionization (applyInPandasWithState).

The custom-stateful-operator surface of Structured Streaming: per-user
session windows with a gap timeout, maintained across micro-batches in the
state store and flushed either by a later event (gap exceeded) or by an
event-time timeout once the watermark passes the session's gap horizon.

This is the streaming twin of the batch operator
``pipeline.eventops.sessionize`` (same gap semantics, verified equivalent
in tests): the batch version is a gap-window over a per-user sort; the
streaming version holds ONE open session per user in the state store —
state size is O(active users), independent of history length, which is
what makes it run forever on an unbounded stream at web scale.

Reference shape: Lucene itself has no streaming layer; the analog here is
Spark's own FlatMapGroupsWithState contract (SPARK-40434
applyInPandasWithState) applied to the classic sessionization example.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["sessionize_stream", "SESSION_SCHEMA"]

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("session_start", T.LongType(), False),  # epoch seconds
        T.StructField("session_end", T.LongType(), False),
        T.StructField("n_events", T.LongType(), False),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start", T.LongType(), False),
        T.StructField("last", T.LongType(), False),
        T.StructField("n", T.LongType(), False),
    ]
)


def _session_fn(gap_sec: int):
    def fn(key, pdf_iter, state):
        import pandas as pd

        user = int(key[0])

        def row(start: int, last: int, n: int) -> "pd.DataFrame":
            return pd.DataFrame(
                {
                    "user_id": [user],
                    "session_start": [int(start)],
                    "session_end": [int(last)],
                    "n_events": [int(n)],
                }
            )

        if state.hasTimedOut:
            # watermark passed last+gap with no new events: the open
            # session is final (GroupState.EventTimeTimeout contract)
            start, last, n = state.get
            state.remove()
            yield row(start, last, n)
            return

        ts = []
        for pdf in pdf_iter:
            ts.extend(
                int(t.timestamp()) for t in pd.to_datetime(pdf["ts"])
            )
        ts.sort()
        cur = state.get if state.exists else None
        closed = []
        for t in ts:
            if cur is None:
                cur = (t, t, 1)
            elif t - cur[1] > gap_sec:
                closed.append(cur)
                cur = (t, t, 1)
            else:
                # cross-batch out-of-order event (ts < state.last but
                # >= watermark): extend, never REGRESS the open session —
                # last is the max event time seen so the gap test and the
                # timeout horizon only move forward, matching the batch
                # operator's global sort semantics
                cur = (min(cur[0], t), max(cur[1], t), cur[2] + 1)
        if cur is not None:
            state.update(cur)
            # flush horizon: if no event arrives before last+gap (event
            # time), the session is over — timeout fires once the
            # watermark passes it (milliseconds, per the GroupState API)
            state.setTimeoutTimestamp((cur[1] + gap_sec) * 1000)
        for start, last, n in closed:
            yield row(start, last, n)

    return fn


def sessionize_stream(
    events: DataFrame,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
    watermark_delay: str | None = None,
) -> DataFrame:
    """Streaming sessionize: ``events`` is a STREAMING DataFrame with
    (user_id, ts:timestamp). Returns the stream of CLOSED sessions
    (user_id, session_start, session_end, n_events — epochs in seconds).

    A session closes when a later event of the same user arrives more than
    ``gap_minutes`` after the previous one, or when the event-time
    watermark (default delay = the gap) passes the open session's horizon
    with no new events. Grouping is by user — the state-store shuffle is
    the stream's only wide operation, and state is one row per active
    user."""
    delay = watermark_delay or f"{gap_minutes} minutes"
    gap_sec = gap_minutes * 60
    prepared = events.select(
        F.col(user_col).cast("long").alias("user_id"),
        F.col(ts_col).alias("ts"),
    ).withWatermark("ts", delay)
    return prepared.groupBy("user_id").applyInPandasWithState(
        _session_fn(gap_sec),
        SESSION_SCHEMA,
        _STATE_SCHEMA,
        "append",
        "EventTimeTimeout",
    )
