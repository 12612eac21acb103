"""Search-quality evaluation — the benchmark/quality module analog.

Reference behavior: benchmark/src/java/org/apache/lucene/benchmark/quality/
QualityStats.java — for one judged query over a ranked result list:

- precision@n  = |relevant within first n| / n (:97); when fewer than n
  results were returned, (numPoints · pAt[numPoints]) / n (:116), which
  equals |relevant found| / n;
- recall       = |relevant found| / maxGoodPoints, or the final running
  precision when the query has no judged-relevant docs (:100);
- MRR          = 1 / rank of the FIRST relevant hit, but only when that
  rank is ≤ 5 — otherwise 0 (:88, the "first point, but only within 5 top
  scores" rule);
- average precision = Σ (running precision at each relevant hit's rank)
  / maxGoodPoints, 0 when maxGoodPoints = 0 (:122 getAvp).

The Spark-first restatement scores EVERY judged query in one job: ranked
results join the judgment set, running precision is one window sum over
(query, rank), and the per-query stats are a single aggregation — where
the reference replays addResult() doc by doc per query on the driver.
All arithmetic is integer counts and one final division per stat, so a
DuckDB oracle reproduces the values exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["quality_stats"]


def quality_stats(
    results: DataFrame,
    judgments: DataFrame,
    query_col: str = "query_id",
    doc_col: str = "doc_id",
    rank_col: str = "rank",
    p_at: tuple[int, ...] = (5, 10, 20),
) -> DataFrame:
    """Per-query QualityStats over ranked ``results`` (query, doc, rank —
    ranks dense from 1) against ``judgments`` (query, doc) relevant pairs
    (a TREC qrels table; docs never retrieved still count in the recall
    denominator). Returns one row per query appearing in ``results``:
    (query, n_results, n_found, max_good, recall, mrr, avp, p_at_<n>...),
    doubles rounded to 6."""
    q, d, r = query_col, doc_col, rank_col
    rel = (
        judgments.select(q, d)
        .distinct()
        .withColumn("_rel", F.lit(1))
    )
    max_good = judgments.select(q, d).distinct().groupBy(q).agg(
        F.count("*").alias("_maxgood")
    )
    scored = (
        results.select(q, d, F.col(r).cast("long").alias("_rank"))
        .join(rel, [q, d], "left")
        .withColumn("_rel", F.coalesce("_rel", F.lit(0)))
    )
    w = (
        Window.partitionBy(q)
        .orderBy("_rank")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    scored = scored.withColumn(
        "_p", F.sum("_rel").over(w) / F.col("_rank").cast("double")
    )
    aggs = [
        F.max("_rank").alias("n_results"),
        F.sum("_rel").alias("n_found"),
        F.sum(F.when(F.col("_rel") == 1, F.col("_p"))).alias("_prelsum"),
        F.min(F.when(F.col("_rel") == 1, F.col("_rank"))).alias("_first"),
    ]
    aggs += [
        F.sum(F.when(F.col("_rank") <= n, F.col("_rel"))).alias(f"_rel{n}")
        for n in p_at
    ]
    per_q = (
        scored.groupBy(q)
        .agg(*aggs)
        .join(max_good, q, "left")
        .withColumn("_maxgood", F.coalesce("_maxgood", F.lit(0)))
    )
    recall = F.when(
        F.col("_maxgood") <= 0,
        F.col("n_found").cast("double") / F.col("n_results").cast("double"),
    ).otherwise(
        F.col("n_found").cast("double") / F.col("_maxgood").cast("double")
    )
    mrr = F.when(
        F.col("_first") <= 5, F.lit(1.0) / F.col("_first").cast("double")
    ).otherwise(F.lit(0.0))
    avp = F.when(F.col("_maxgood") == 0, F.lit(0.0)).otherwise(
        F.coalesce("_prelsum", F.lit(0.0)) / F.col("_maxgood").cast("double")
    )
    cols = [
        F.col(q),
        F.col("n_results").cast("long").alias("n_results"),
        F.col("n_found").cast("long").alias("n_found"),
        F.col("_maxgood").cast("long").alias("max_good"),
        F.round(recall, 6).alias("recall"),
        F.round(F.coalesce(mrr, F.lit(0.0)), 6).alias("mrr"),
        F.round(avp, 6).alias("avp"),
    ]
    cols += [
        F.round(
            F.coalesce(F.col(f"_rel{n}"), F.lit(0)).cast("double") / F.lit(float(n)), 6
        ).alias(f"p_at_{n}")
        for n in p_at
    ]
    return per_q.select(*cols)
