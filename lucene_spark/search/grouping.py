"""Grouping & diversity collectors as DataFrame compositions.

Behavioral references:
- misc/src/java/org/apache/lucene/misc/search/DiversifiedTopDocsCollector.java:67
  — global top-k where at most ``maxHitsPerKey`` hits share a key: per-key
  priority queues feed the global queue, so the final list equals "keep each
  key's best maxHitsPerKey, then take the global top numHits".
- grouping/src/java/org/apache/lucene/search/grouping/AllGroupHeadsCollector.java:38
  — the single most-competitive doc per group under the sort (scoring sort
  here: score DESC, docid ASC).
- grouping/src/java/org/apache/lucene/search/grouping/AllGroupsCollector.java:33
  — the count (and set) of distinct group values among matching docs.
- grouping/src/java/org/apache/lucene/search/grouping/DistinctValuesCollector.java:30
  — second-pass collector: for each top group, the distinct values of a
  second field over the group's matching docs.

Spark-first shapes: every collector is ONE hash partitioning on the group
key (window or groupBy with map-side partial aggregation) over the hits
DataFrame — no driver-side iteration, no second scan of the corpus. The
``keys`` input is a (doc_id, <key>) DataFrame (the doc-values column), so
the join is broadcastable when the corpus is small and co-partitioned when
it is not.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = [
    "diversified_topk",
    "all_group_heads",
    "all_groups_count",
    "distinct_values_counts",
]


def _scored_window(key_col: str):
    return Window.partitionBy(key_col).orderBy(
        F.desc("score"), F.asc("doc_id")
    )


def diversified_topk(
    hits: DataFrame,
    keys: DataFrame,
    key_col: str,
    k: int = 10,
    max_per_key: int = 1,
) -> DataFrame:
    """DiversifiedTopDocsCollector: the global top ``k`` hits with no more
    than ``max_per_key`` sharing a key. Rows missing a key behave like
    Lucene's absent doc-value ordinal: they form their own null group.
    Output: (doc_id, <key_col>, rank, score)."""
    ranked = (
        hits.join(keys, "doc_id", "left")
        .withColumn("_rk", F.row_number().over(_scored_window(key_col)))
        .filter(F.col("_rk") <= max_per_key)
        .drop("_rk")
    )
    gw = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        ranked.withColumn("rank", F.row_number().over(gw))
        .filter(F.col("rank") <= k)
        .select("doc_id", key_col, "rank", "score")
    )


def all_group_heads(
    hits: DataFrame, keys: DataFrame, key_col: str
) -> DataFrame:
    """AllGroupHeadsCollector.newCollector with a score sort: one row per
    group — its most competitive doc (score DESC, docid ASC).
    Output: (<key_col>, doc_id, score)."""
    return (
        hits.join(keys, "doc_id", "left")
        .withColumn("_rk", F.row_number().over(_scored_window(key_col)))
        .filter(F.col("_rk") == 1)
        .select(key_col, "doc_id", "score")
    )


def all_groups_count(
    hits: DataFrame, keys: DataFrame, key_col: str
) -> DataFrame:
    """AllGroupsCollector: the distinct group values among matches and
    their match counts (getGroupCount / getGroups). Output:
    (<key_col>, n_hits) — one partial-aggregated shuffle."""
    return (
        hits.join(keys, "doc_id", "left")
        .groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )


def distinct_values_counts(
    hits: DataFrame,
    keys: DataFrame,
    key_col: str,
    values: DataFrame,
    value_col: str,
    top_groups: int | None = None,
) -> DataFrame:
    """DistinctValuesCollector: for each group (optionally only the
    ``top_groups`` most competitive by group-head score, the first-pass
    collector's job), the number of distinct ``value_col`` values among the
    group's hits. Output: (<key_col>, n_distinct)."""
    joined = hits.join(keys, "doc_id", "left").join(values, "doc_id", "left")
    agg = joined.groupBy(key_col).agg(
        F.countDistinct(value_col).alias("n_distinct"),
        F.max("score").alias("_head"),
    )
    if top_groups is not None:
        gw = Window.orderBy(F.desc("_head"), F.asc(key_col))
        agg = agg.withColumn("_rk", F.row_number().over(gw)).filter(
            F.col("_rk") <= top_groups
        )
    return agg.select(key_col, "n_distinct")
