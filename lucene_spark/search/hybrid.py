"""Hybrid retrieval fusion — Reciprocal Rank Fusion over N result lists.

Not a reference operator (Lucene leaves fusion to the application layer);
included because a webtext engine with both BM25 (search/) and ANN
(pipeline/simsearch.py, hnsw.py) needs the standard way to combine them.
Method: RRF, Cormack/Clarke/Büttcher SIGIR 2009 — fused(d) = Σ_runs
1/(k + rank_run(d)), rank 1-based within each run, documents missing from
a run contribute nothing; k=60 is the paper's constant.

Scale shape: each input run is already top-n (tiny); ranks are
row_number windows over those tiny frames, the fusion is one union +
groupBy — nothing here ever touches the corpus."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["rrf_fuse"]


def rrf_fuse(
    runs: list[DataFrame],
    k: int = 60,
    top: int = 10,
    id_col: str = "docid",
) -> DataFrame:
    """Fuse (id, score) result lists: rank within each run by
    (score DESC, id ASC), fused score = Σ 1/(k + rank), output the
    ``top`` fused rows (fused DESC, id ASC) as (id, score, n_runs)."""
    if not runs:
        raise ValueError("rrf_fuse needs at least one run")
    w = Window.orderBy(F.desc("score"), F.asc(id_col))
    ranked = [
        r.select(id_col, "score")
        .withColumn("rank", F.row_number().over(w))
        .select(
            id_col,
            (1.0 / (F.lit(float(k)) + F.col("rank"))).alias("rrf"),
        )
        for r in runs
    ]
    allr = ranked[0]
    for r in ranked[1:]:
        allr = allr.unionByName(r)
    return (
        allr.groupBy(id_col)
        .agg(
            F.sum("rrf").alias("score"),
            F.count("*").alias("n_runs"),
        )
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(top)
    )
