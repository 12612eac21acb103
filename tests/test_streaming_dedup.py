"""Streaming incremental MinHash-LSH dedup (streaming/dedup.py).

Drives a real Structured Streaming query (file source → foreachBatch
deduper → parquet store) across THREE runs sharing one checkpoint, proving:
(a) duplicates of documents accepted in EARLIER batches are caught without
rescanning them, (b) within-batch duplicates resolve to the min-id
canonical, (c) replaying a committed batch is a no-op, and (d) the streamed
duplicate set equals the batch LSH pass over the union of all batches.
"""

import os

import pytest
from pyspark.sql import functions as F

from lucene_spark.pipeline.dedup import (
    connected_components,
    lsh_candidate_pairs,
    minhash_signatures,
)
from lucene_spark.streaming.dedup import StreamingDeduper, dedup_stream

# four distinct base texts; near-dups share the token multiset exactly
# (MinHash over DISTINCT tokens -> estimate 1.0) or differ entirely (0.0)
_BASE = {
    "a": "alpha beta gamma delta epsilon zeta",
    "b": "one two three four five six seven",
    "c": "red green blue yellow purple orange",
    "d": "spark flink trino presto duck goose",
}


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _write(spark, src, name, rows):
    _docs(spark, rows).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(src, name)
    )


def _run_once(spark, src, store, ckpt):
    stream = spark.readStream.schema("doc_id long, text string").option(
        "recursiveFileLookup", "true"
    ).parquet(src)
    q = dedup_stream(stream, store, ckpt, min_est_jaccard=0.9)
    q.awaitTermination(120)


@pytest.fixture(scope="module")
def dirs(tmp_path_factory):
    base = tmp_path_factory.mktemp("sdedup")
    src, store, ckpt = str(base / "src"), str(base / "store"), str(base / "ckpt")
    os.makedirs(src)
    os.makedirs(store)
    return src, store, ckpt


def test_streaming_dedup_end_to_end(spark, dirs):
    src, store, ckpt = dirs
    deduper = StreamingDeduper(store, min_est_jaccard=0.9)

    # batch 1: two distinct docs + one within-batch dup of doc 0
    rows1 = [(0, _BASE["a"]), (1, _BASE["b"]), (2, _BASE["a"])]
    _write(spark, src, "b1", rows1)
    _run_once(spark, src, store, ckpt)
    d1 = {
        (r["doc_id"], r["dup_of"])
        for r in deduper.duplicates(spark).collect()
    }
    assert d1 == {(2, 0)}

    # batch 2: a dup of batch-1's doc 1 (cross-batch, store join) + fresh doc
    rows2 = [(3, _BASE["b"]), (4, _BASE["c"])]
    _write(spark, src, "b2", rows2)
    _run_once(spark, src, store, ckpt)
    d2 = {
        (r["doc_id"], r["dup_of"])
        for r in deduper.duplicates(spark).collect()
    }
    assert d2 == {(2, 0), (3, 1)}

    # batch 3: dup of a CANONICAL from each earlier batch + a fresh doc +
    # a within-batch pair
    rows3 = [
        (5, _BASE["a"]), (6, _BASE["c"]),
        (7, _BASE["d"]), (8, _BASE["d"]),
    ]
    _write(spark, src, "b3", rows3)
    _run_once(spark, src, store, ckpt)
    d3 = {
        (r["doc_id"], r["dup_of"])
        for r in deduper.duplicates(spark).collect()
    }
    assert d3 == {(2, 0), (3, 1), (5, 0), (6, 4), (8, 7)}

    # estimates on exact-duplicate token sets are exactly 1.0
    ests = {
        r["doc_id"]: r["est_jaccard"]
        for r in deduper.duplicates(spark).collect()
    }
    assert all(e == 1.0 for e in ests.values()), ests

    # (c) replaying an already-committed batch id is a no-op
    n_before = deduper.duplicates(spark).count()
    deduper(_docs(spark, rows1), 0)
    assert deduper.duplicates(spark).count() == n_before

    # (d) batch/stream equivalence: batch LSH over the union gives the
    # same duplicate mapping (component root = min id = first-seen)
    union = _docs(spark, rows1 + rows2 + rows3)
    sig = minhash_signatures(union)
    pairs = lsh_candidate_pairs(union)
    arr = sig.select(
        "doc_id", F.array(*[F.col(f"sig_{i}") for i in range(8)]).alias("s")
    )
    verified = (
        pairs.join(arr.select(F.col("doc_id").alias("a"), F.col("s").alias("sa")), "a")
        .join(arr.select(F.col("doc_id").alias("b"), F.col("s").alias("sb")), "b")
        .withColumn(
            "e",
            F.aggregate(
                F.zip_with("sa", "sb", lambda x, y: (x == y).cast("int")),
                F.lit(0),
                lambda acc, v: acc + v,
            )
            / F.lit(8.0),
        )
        .filter(F.col("e") >= 0.9)
        .select("a", "b")
    )
    comp = connected_components(verified)
    batch_dups = {
        (r["node"], r["component"])
        for r in comp.filter(F.col("node") != F.col("component")).collect()
    }
    assert batch_dups == d3


def test_streaming_dedup_rejects_bad_bands():
    with pytest.raises(ValueError):
        StreamingDeduper("/tmp/x", num_hashes=8, bands=3)
