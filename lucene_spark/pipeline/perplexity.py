"""CCNet-style LM-perplexity quality filtering (Wenzek et al. 2020, "CCNet:
Extracting High Quality Monolingual Datasets from Web Crawl Data",
arXiv:1911.00359): score each raw document by its perplexity under a
language model trained on a clean reference corpus, then split the corpus
into head / middle / tail buckets at perplexity quantiles (CCNet keeps
head+middle for training). CCNet uses a KenLM 5-gram; this engine's model
is an interpolated bigram LM — Jelinek-Mercer smoothing (Jelinek & Mercer
1980; Chen & Goodman 1999 §2.4):

    P(w | v) = lam * c(v,w)/c(v,·) + (1 - lam) * P_uni(w)
    P_uni(w) = (c(w) + 1) / (T + V)        (add-one over the ref vocab + OOV)

so every token has nonzero probability (OOV tokens and unseen bigrams fall
through to the smoothed unigram floor).

Spark shape — every stage map-side-combinable, no driver materialization:
two aggregations over the reference token stream fit the model (unigram +
bigram counts; at 100 TB fit once per corpus snapshot and persist), scoring
is the doc bigram stream joined against the two model tables (Zipf-skewed
join keys — broadcast the hot head or let AQE skew-split), one ordered
per-doc fold for the mean NLL. Bucketing is two quantiles (approx at scale,
exact here for the oracle) + one map-only comparison.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import tokens

__all__ = ["bigram_lm", "perplexity_scores", "ccnet_buckets"]


def bigram_lm(
    ref: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> tuple[DataFrame, DataFrame, int, int]:
    """Fit the model on the reference corpus: returns (unigrams(term, c),
    bigrams(prev, term, c2, c1 = c(prev,·)), T total tokens, V vocab+1)."""
    t = tokens(ref, id_col=id_col, text_col=text_col)
    uni = t.groupBy("term").agg(F.count("*").alias("c"))
    totals = uni.agg(
        F.sum("c").alias("t"), F.count("*").alias("v")
    ).first()
    total_t, vocab = int(totals["t"] or 0), int(totals["v"] or 0) + 1
    nxt = t.select(
        F.col(id_col).alias("_id"), F.col("term").alias("prev"), "pos"
    ).join(
        t.select(
            F.col(id_col).alias("_id"),
            F.col("term"),
            (F.col("pos") - 1).alias("pos"),
        ),
        ["_id", "pos"],
    )
    big = nxt.groupBy("prev", "term").agg(F.count("*").alias("c2"))
    ctx = big.groupBy("prev").agg(F.sum("c2").alias("c1"))
    return uni, big.join(ctx, "prev"), total_t, vocab


def perplexity_scores(
    docs: DataFrame,
    ref: DataFrame,
    lam: float = 0.9,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, ppl): exp of the mean token negative log-probability under the
    reference bigram LM. The first token of a doc is scored by the unigram
    term alone; empty docs get the pure-OOV unigram floor. The per-doc mean
    folds in position order (deterministic doubles for the oracle)."""
    uni, big, total_t, vocab = bigram_lm(ref, id_col=id_col, text_col=text_col)
    denom = float(total_t + vocab)

    t = tokens(docs, id_col=id_col, text_col=text_col)
    prevd = t.select(
        F.col(id_col).alias("_id"), F.col("term").alias("prev"), "pos"
    )
    curd = t.select(
        F.col(id_col).alias("_id"), "term", (F.col("pos") - 1).alias("pos")
    )
    pairs = curd.join(prevd, ["_id", "pos"], "left")  # pos=-1 row = first token
    scored = (
        pairs.join(uni.withColumnRenamed("c", "cu"), "term", "left")
        .join(
            big.select("prev", "term", "c2", "c1"),
            ["prev", "term"],
            "left",
        )
        .select(
            "_id",
            "pos",
            (
                -F.log(
                    F.when(
                        F.col("prev").isNotNull() & F.col("c1").isNotNull(),
                        F.lit(lam)
                        * (
                            F.coalesce(F.col("c2"), F.lit(0)).cast("double")
                            / F.col("c1").cast("double")
                        ),
                    ).otherwise(F.lit(0.0))
                    + F.lit(1.0 - lam)
                    * (
                        (F.coalesce(F.col("cu"), F.lit(0)) + 1).cast("double")
                        / F.lit(denom)
                    )
                )
            ).alias("nll"),
        )
    )
    per_doc = scored.groupBy("_id").agg(
        F.exp(
            F.aggregate(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "nll"))),
                    lambda s: s["nll"],
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            / F.count("*")
        ).alias("ppl")
    )
    ids = docs.select(F.col(id_col).alias("_id"))
    floor = math.exp(-math.log((1.0 - lam) * (1.0 / denom)))
    return ids.join(per_doc, "_id", "left").select(
        F.col("_id").alias(id_col),
        F.coalesce("ppl", F.lit(floor)).alias("ppl"),
    )


def ccnet_buckets(
    docs: DataFrame,
    ref: DataFrame,
    lam: float = 0.9,
    head: float = 0.3,
    middle: float = 0.3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, ppl, bucket): CCNet's head/middle/tail split at the head and
    head+middle perplexity quantiles (lower perplexity = cleaner). Exact
    quantiles via percent_rank keep the oracle bit-exact; at 100 TB swap in
    approxQuantile cutoffs (two scalars) and a map-only comparison — the
    bucket boundary error is the sketch epsilon, the shape is identical."""
    from pyspark.sql.window import Window

    sc = perplexity_scores(docs, ref, lam=lam, id_col=id_col, text_col=text_col)
    pr = F.percent_rank().over(Window.orderBy(F.col("ppl"), F.col(id_col)))
    return sc.select(
        id_col,
        "ppl",
        pr.alias("_pr"),
    ).select(
        id_col,
        "ppl",
        F.when(F.col("_pr") < head, F.lit("head"))
        .when(F.col("_pr") < head + middle, F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("bucket"),
    )
