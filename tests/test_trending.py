"""Streaming trending terms (streaming/trending.py): a real Structured
Streaming windowed aggregation with watermark — append mode emits each
window exactly once, the emitted counts equal the batch pass, and state
recovery works across runs sharing one checkpoint. The batch form's
DuckDB-oracle gate row (trending_terms) lives in test_gate.py."""

import os

import pytest
from pyspark.sql import functions as F

from lucene_spark.streaming.trending import (
    term_counts,
    top_trending,
    trending_stream,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "ts timestamp, text string").select(
        F.col("ts"), "text"
    )


def _rows(*pairs):
    import datetime as dt

    base = dt.datetime(2026, 1, 1, 0, 0, 0)
    return [
        (base + dt.timedelta(minutes=m), text) for m, text in pairs
    ]


def test_batch_term_counts_and_topk(spark):
    docs = _docs(spark, _rows(
        (5, "spark spark flink"),
        (20, "spark duck"),
        (70, "flink flink flink duck"),
    ))
    counts = term_counts(docs, window_dur="60 minutes")
    got = {
        (r["window"]["start"].minute + r["window"]["start"].hour * 60,
         r["term"]): r["cnt"]
        for r in counts.collect()
    }
    assert got[(0, "spark")] == 3
    assert got[(0, "flink")] == 1
    assert got[(0, "duck")] == 1
    assert got[(60, "flink")] == 3
    top = top_trending(counts, k=1).collect()
    by_win = {r["window"]["start"].hour: r["term"] for r in top}
    assert by_win == {0: "spark", 1: "flink"}


def test_stopwords_and_sliding(spark):
    docs = _docs(spark, _rows((5, "the spark the flink")))
    counts = term_counts(
        docs, window_dur="60 minutes", slide="30 minutes",
        stopwords=frozenset({"the"}),
    )
    rows = counts.collect()
    # sliding 60/30: minute-5 event lands in 2 windows; no stopword rows
    assert {r["term"] for r in rows} == {"spark", "flink"}
    assert all(r["cnt"] == 1 for r in rows)
    assert len(rows) == 4


def test_streaming_equals_batch_after_watermark(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)

    def write_batch(name, pairs):
        _docs(spark, _rows(*pairs)).coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(src, name))

    def run():
        stream = (
            spark.readStream.schema("ts timestamp, text string")
            .option("recursiveFileLookup", "true")
            .parquet(src)
        )
        q = trending_stream(
            stream, out, ckpt,
            window_dur="60 minutes", watermark="30 minutes",
        )
        q.awaitTermination(120)

    write_batch("b0", [(5, "spark spark flink"), (20, "spark duck")])
    run()
    # second batch advances event time far enough (watermark 30m) to CLOSE
    # the hour-0 window; its counts emit exactly once
    write_batch("b1", [(150, "flink closer")])
    run()
    emitted = spark.read.parquet(out)
    hour0 = {
        r["term"]: r["cnt"]
        for r in emitted.filter(F.hour("win_start") == 0).collect()
    }
    assert hour0 == {"spark": 3, "flink": 1, "duck": 1}
    # replaying with no new input adds nothing (exactly-once)
    run()
    assert spark.read.parquet(out).count() == emitted.count()
