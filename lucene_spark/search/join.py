"""Query-time join — JoinUtil.createJoinQuery analog, Spark-first.

Reference semantics (join/src/java/org/apache/lucene/search/join/
JoinUtil.java:56): collect the ``fromField`` values of every document
matching ``fromQuery``, aggregate the from-side scores per value
(join/ScoreMode.java: None/Avg/Max/Total/Min), then match every to-side
document whose ``toField`` holds one of the collected values, scored by
that value's aggregate.

Scale shape: the aggregated value table has |distinct join values| rows —
tiny next to either side — so it is BROADCAST to the to-side scan and the
join adds no shuffle of the (much larger) to side. The only wide operation
is the map-side-combinable groupBy on the from hits. At 100 TB the to-side
scan stays a pruned parquet scan + broadcast hash join; nothing is
collected to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["join_search", "SCORE_MODES"]

SCORE_MODES = ("none", "avg", "max", "total", "min")

_AGGS = {"avg": F.avg, "max": F.max, "total": F.sum, "min": F.min}


def join_search(
    from_hits: DataFrame,
    from_side: DataFrame,
    from_field: str,
    to_side: DataFrame,
    to_field: str,
    score_mode: str = "max",
    id_col: str = "doc_id",
) -> DataFrame:
    """Join the scored ``from_hits`` (``id_col``, ``score``) through
    ``from_side``'s ``from_field`` onto every ``to_side`` row whose
    ``to_field`` matches, scored per join/ScoreMode.java:

    - ``none``  → constant 1.0 (ScoreMode.None: "do no scoring")
    - ``avg`` / ``max`` / ``total`` / ``min`` → that aggregate of the
      matching from-doc scores per join value.

    Returns ``to_side``'s columns plus ``score``. Rows whose ``to_field``
    is NULL or matches no collected value are absent (inner-join
    semantics, as in TermsQuery's seek-only matching).
    """
    if score_mode not in SCORE_MODES:
        raise ValueError(f"score_mode must be one of {SCORE_MODES}")
    keyed = from_hits.select(id_col, "score").join(
        from_side.select(id_col, from_field), id_col
    )
    if score_mode == "none":
        vals = (
            keyed.select(F.col(from_field).alias("__join_val"))
            .where(F.col("__join_val").isNotNull())
            .distinct()
            .withColumn("score", F.lit(1.0))
        )
    else:
        vals = (
            keyed.where(F.col(from_field).isNotNull())
            .groupBy(F.col(from_field).alias("__join_val"))
            .agg(_AGGS[score_mode]("score").alias("score"))
        )
    out = to_side.join(
        F.broadcast(vals), to_side[to_field] == vals["__join_val"]
    )
    return out.select(*[to_side[c] for c in to_side.columns], vals["score"])
