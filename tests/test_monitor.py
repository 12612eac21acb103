"""monitor_matches (percolator) semantics vs hand oracles."""

import pytest

from lucene_spark.search.monitor import MonitorQuery, monitor_matches


DOCS = [
    (0, "alpha beta gamma"),
    (1, "beta alpha"),               # has both terms, wrong order
    (2, "alpha Beta!"),              # analyzer: lowercase + split on punct
    (3, "alpha alpha beta"),         # repeated lead term
    (4, "gamma delta"),
    (5, "alphabeta"),                # single token: must NOT match phrase
    (6, ""),
]


def _matches(spark, queries):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    return {
        (r["doc_id"], r["query_id"])
        for r in monitor_matches(docs, queries).collect()
    }


def test_term_and_or_kinds(spark):
    got = _matches(
        spark,
        [
            MonitorQuery("t", "term", ("alpha",)),
            MonitorQuery("o", "or", ("gamma", "delta")),
            MonitorQuery("a", "and", ("alpha", "gamma")),
        ],
    )
    assert {(0, "t"), (1, "t"), (2, "t"), (3, "t")} == {p for p in got if p[1] == "t"}
    assert {(0, "o"), (4, "o")} == {p for p in got if p[1] == "o"}
    assert {(0, "a")} == {p for p in got if p[1] == "a"}


def test_phrase_requires_adjacent_in_order(spark):
    got = _matches(spark, [MonitorQuery("p", "phrase", ("alpha", "beta"))])
    # 0: adjacent; 2: punctuation stripped -> adjacent; 3: second alpha
    # adjacent to beta; 1 (wrong order) and 5 (one fused token) must not
    assert got == {(0, "p"), (2, "p"), (3, "p")}


def test_phrase_repeated_term(spark):
    got = _matches(spark, [MonitorQuery("pp", "phrase", ("alpha", "alpha"))])
    assert got == {(3, "pp")}


def test_kind_validation():
    with pytest.raises(ValueError):
        MonitorQuery("x", "near", ("a",))
    with pytest.raises(ValueError):
        MonitorQuery("x", "term", ("a", "b"))
    with pytest.raises(ValueError):
        MonitorQuery("x", "and", ())


def test_empty_doc_and_no_phrase_queries_path(spark):
    # the no-phrase fast path returns direct matches only
    got = _matches(spark, [MonitorQuery("t", "term", ("gamma",))])
    assert got == {(0, "t"), (4, "t")}


def test_percolation_over_structured_stream(spark, tmp_path):
    """Alerting shape: the registered-query set is static; each micro-batch
    of a document stream percolates through monitor_matches inside
    foreachBatch (the monitor module's streaming deployment)."""
    import json
    import os

    src = tmp_path / "in"
    out = tmp_path / "out.jsonl"
    os.makedirs(src)
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    docs.coalesce(1).write.mode("overwrite").parquet(str(src))

    queries = [
        MonitorQuery("t", "term", ("alpha",)),
        MonitorQuery("p", "phrase", ("alpha", "beta")),
    ]

    def percolate(batch_df, batch_id):
        rows = [
            (r["doc_id"], r["query_id"])
            for r in monitor_matches(batch_df, queries).collect()
        ]
        with open(out, "a") as f:
            for row in rows:
                f.write(json.dumps(row) + "\n")

    q = (
        spark.readStream.schema("doc_id long, text string")
        .parquet(str(src))
        .writeStream.foreachBatch(percolate)
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(120)
    streamed = {tuple(json.loads(line)) for line in open(out)}
    want = _matches(spark, queries)
    assert streamed == want and streamed
