"""QualityStats semantics (benchmark/quality/QualityStats.java): the
corner-case rules the judged-run gate corpus doesn't necessarily hit —
MRR only counts a first relevant hit at rank ≤ 5, recall falls back to the
final running precision when a query has no judged docs, and precision@n
with fewer than n results uses |found|/n."""

from lucene_spark.search.quality import quality_stats


def _run(spark, results, judgments):
    r = spark.createDataFrame(results, "query_id string, doc_id long, rank long")
    j = spark.createDataFrame(judgments, "query_id string, doc_id long")
    return {
        row["query_id"]: row.asDict() for row in quality_stats(r, j).collect()
    }


def test_quality_stats_semantics(spark):
    results = (
        # q1: relevant at ranks 1 and 3 of 4; one judged doc never retrieved
        [("q1", 10, 1), ("q1", 11, 2), ("q1", 12, 3), ("q1", 13, 4)]
        # q2: first relevant at rank 6 -> MRR is 0 by the within-5 rule
        + [("q2", 20 + i, i) for i in range(1, 7)]
        # q3: no judgments at all -> recall falls back to final precision
        + [("q3", 30, 1), ("q3", 31, 2)]
        # q4: only 3 results, all relevant -> p@5 = 3/5, p@10 = 3/10
        + [("q4", 40, 1), ("q4", 41, 2), ("q4", 42, 3)]
    )
    judgments = (
        [("q1", 10), ("q1", 12), ("q1", 99)]  # 99 never retrieved
        + [("q2", 26)]
        + [("q4", 40), ("q4", 41), ("q4", 42)]
    )
    out = _run(spark, results, judgments)

    q1 = out["q1"]
    assert q1["n_found"] == 2 and q1["max_good"] == 3
    assert q1["recall"] == round(2 / 3, 6)
    assert q1["mrr"] == 1.0  # first relevant at rank 1
    # avp = (p@1 + p@3)/maxGood = (1 + 2/3)/3
    assert q1["avp"] == round((1.0 + 2.0 / 3.0) / 3.0, 6)
    assert q1["p_at_5"] == round(2 / 5, 6)

    q2 = out["q2"]
    assert q2["mrr"] == 0.0  # rank 6 > 5
    assert q2["recall"] == 1.0
    assert q2["p_at_5"] == 0.0
    assert q2["p_at_10"] == round(1 / 10, 6)

    q3 = out["q3"]
    assert q3["max_good"] == 0
    assert q3["recall"] == 0.0  # final running precision: 0 relevant
    assert q3["avp"] == 0.0 and q3["mrr"] == 0.0

    q4 = out["q4"]
    # fewer results than n: QualityStats.getPrecisionAt returns found/n
    assert q4["p_at_5"] == round(3 / 5, 6)
    assert q4["p_at_10"] == round(3 / 10, 6)
    assert q4["recall"] == 1.0 and q4["avp"] == 1.0
