"""Streaming percolation (streaming/alerts.py): a document stream matched
against registered queries via foreachBatch; alerts equal the batch
percolation, and a second run with the same checkpoint reprocesses
nothing (exactly-once per batch)."""

import os

import pytest

from lucene_spark.search.memory import percolate
from lucene_spark.streaming.alerts import percolate_stream

QUERIES = {
    "q_stream": "stream",
    "q_and": "stream AND window",
    "q_phrase": '"table scan"',
}

BATCH1 = [
    ("u0", "a stream of events"),
    ("u1", "the window closes on the stream"),
    ("u2", "full table scan tonight"),
]
BATCH2 = [
    ("u3", "scan the table scan plan"),
    ("u4", "nothing relevant"),
]


def _write(spark, src, name, rows):
    spark.createDataFrame(rows, "url string, text string").coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(src, name))


def _run(spark, src, out, ckpt):
    stream = spark.readStream.schema("url string, text string").option(
        "recursiveFileLookup", "true"
    ).parquet(src)
    q = percolate_stream(stream, QUERIES, out, ckpt)
    q.awaitTermination(120)


def _alerts(spark, out):
    return {
        (r["url"], r["query_id"])
        for r in spark.read.parquet(out).collect()
    }


def test_stream_alerts_match_batch_percolation(spark, tmp_path):
    src, out, ckpt = (str(tmp_path / d) for d in ("src", "out", "ckpt"))
    os.makedirs(src)
    _write(spark, src, "b1", BATCH1)
    _run(spark, src, out, ckpt)
    got = _alerts(spark, out)
    want = {
        (r["url"], r["query_id"])
        for r in percolate(
            spark.createDataFrame(BATCH1, "url string, text string"),
            QUERIES,
            id_col="url",
        ).collect()
    }
    assert got == want
    assert ("u1", "q_and") in got and ("u2", "q_phrase") in got

    # second run, same checkpoint: new file only — no reprocessing
    _write(spark, src, "b2", BATCH2)
    _run(spark, src, out, ckpt)
    got2 = _alerts(spark, out)
    assert got2 - got == {("u3", "q_phrase")}
    rows = spark.read.parquet(out).collect()
    # exactly-once: u1/u2 alerts appear once despite two runs
    assert len(rows) == len(got2)
