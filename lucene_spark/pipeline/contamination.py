"""Benchmark-contamination detection for pretraining corpora.

The GPT-3 appendix-C recipe: a training document is contaminated when it
shares long n-grams with an evaluation benchmark. Here: build the distinct
word-n-gram set of the (small) probe/benchmark corpus, then score every
candidate document by the fraction of its distinct n-grams that appear in
the probe set.

Scale shape (the whole point at 100 TB): the probe side is benchmark-sized
(thousands of docs), so its distinct n-gram set is BROADCAST — the scan of
the 100-TB candidate side is map-only n-gram slicing (no window shuffle)
plus a broadcast-hash semi-probe, and the only wide op is the final per-doc
aggregation. No part of the plan grows with corpus x benchmark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Column

__all__ = ["doc_ngrams", "ngram_contamination"]

TOKEN_SPLIT = "[^a-z0-9]+"


def _token_array(text_col: str) -> Column:
    return F.filter(
        F.split(F.lower(F.col(text_col)), TOKEN_SPLIT), lambda x: x != ""
    )


def doc_ngrams(
    docs: DataFrame, n: int = 5, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, ngram): DISTINCT overlapping word n-grams per doc, sliced from
    the token array (map-only; no posexplode+window renumbering)."""
    arr = _token_array(text_col)
    idx = F.when(
        F.size(arr) >= n, F.sequence(F.lit(1), F.size(arr) - n + 1)
    ).otherwise(F.array().cast("array<int>"))
    grams = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(arr, i, n)))
    return docs.select(
        id_col, F.explode(F.array_distinct(grams)).alias("ngram")
    )


def ngram_contamination(
    candidates: DataFrame,
    probes: DataFrame,
    n: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, n_ngrams, n_hit, contamination) per candidate doc with >=1
    full n-gram: n_hit = how many of the doc's distinct n-grams occur
    anywhere in the probe corpus, contamination = n_hit / n_ngrams
    (rounded 4). Filter on ``contamination`` downstream to drop or flag.
    """
    probe_grams = (
        doc_ngrams(probes, n=n, id_col=id_col, text_col=text_col)
        .select("ngram")
        .distinct()
    )
    cand = doc_ngrams(candidates, n=n, id_col=id_col, text_col=text_col)
    hits = cand.join(F.broadcast(probe_grams), "ngram", "left_semi")
    per_doc = cand.groupBy(id_col).agg(F.count("*").alias("n_ngrams"))
    hit_per_doc = hits.groupBy(id_col).agg(F.count("*").alias("n_hit"))
    return (
        per_doc.join(hit_per_doc, id_col, "left")
        .select(
            id_col,
            "n_ngrams",
            F.coalesce("n_hit", F.lit(0)).cast("long").alias("n_hit"),
            F.round(
                F.coalesce("n_hit", F.lit(0)).cast("double")
                / F.col("n_ngrams").cast("double"),
                4,
            ).alias("contamination"),
        )
    )
