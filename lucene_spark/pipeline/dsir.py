"""DSIR — Data Selection with Importance Resampling (Xie et al. 2023,
"Data Selection for Language Models via Importance Resampling",
arXiv:2302.03169): select raw web documents whose hashed n-gram feature
distribution looks like a small TARGET corpus, by scoring each raw doc
with the log importance ratio sum Σ_w count_w(doc) · log(p_target(w) /
p_raw(w)) under smoothed bag-of-feature models.

Spark shape: two map-combinable token-count aggregations fit the models
(the target sample is small; the raw model is one pass), the per-bucket
log ratios broadcast, and scoring is one join + per-doc sum — every stage
map-side-combinable, no driver materialization.

``num_buckets`` hashes features into a fixed-width table (the paper's
hashed n-grams, here via xxhash64 — the memory bound at web scale);
``num_buckets=None`` keeps exact unigram features (the SQL-oracle-exact
configuration the gate uses).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import _token_array

__all__ = ["dsir_log_ratios", "dsir_scores", "dsir_select"]


def _features(docs: DataFrame, id_col: str, text_col: str, num_buckets):
    t = docs.select(
        F.col(id_col).alias("_id"),
        F.explode(_token_array(text_col)).alias("term"),
    )
    if num_buckets is not None:
        t = t.select("_id", (F.pmod(F.xxhash64("term"), F.lit(num_buckets))).alias("feat"))
    else:
        t = t.select("_id", F.col("term").alias("feat"))
    return t


def dsir_log_ratios(
    raw: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int | None = None,
) -> DataFrame:
    """Per-feature ``log((tc+1)/(t_total+V) · (r_total+V)/(rc+1))`` —
    add-one-smoothed target/raw log probability ratios over the UNION
    feature vocabulary (V = its size). Returns (feat, log_ratio)."""
    rf = _features(raw, id_col, text_col, num_buckets)
    tf = _features(target, id_col, text_col, num_buckets)
    rc = rf.groupBy("feat").agg(F.count("*").alias("rc"))
    tc = tf.groupBy("feat").agg(F.count("*").alias("tc"))
    both = rc.join(tc, "feat", "full").select(
        "feat",
        F.coalesce("rc", F.lit(0)).alias("rc"),
        F.coalesce("tc", F.lit(0)).alias("tc"),
    )
    totals = both.agg(
        F.sum("rc").alias("rt"), F.sum("tc").alias("tt"), F.count("*").alias("v")
    ).first()
    rt, tt, v = int(totals["rt"]), int(totals["tt"]), int(totals["v"])
    # log(p_t) - log(p_r), each add-one smoothed over the union vocab —
    # written as one ln of a product of exact-integer ratios so the SQL
    # oracle reproduces the doubles bit-for-bit
    return both.select(
        "feat",
        F.log(
            ((F.col("tc") + 1).cast("double") / F.lit(float(tt + v)))
            * (F.lit(float(rt + v)) / (F.col("rc") + 1).cast("double"))
        ).alias("log_ratio"),
    )


def dsir_scores(
    docs: DataFrame,
    log_ratios: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int | None = None,
) -> DataFrame:
    """Per-doc importance score Σ over token occurrences of the feature's
    log ratio (docs with no in-vocabulary token score 0). Accumulation is
    count·ratio per feature, summed in feature order — deterministic for
    the oracle."""
    feats = _features(docs, id_col, text_col, num_buckets)
    per_feat = feats.groupBy("_id", "feat").agg(F.count("*").alias("n"))
    joined = per_feat.join(log_ratios, "feat", "left").select(
        "_id",
        "feat",
        (F.col("n") * F.coalesce("log_ratio", F.lit(0.0))).alias("part"),
    )
    scored = joined.groupBy("_id").agg(
        F.aggregate(
            F.transform(
                F.array_sort(F.collect_list(F.struct("feat", "part"))),
                lambda s: s["part"],
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("dsir_score")
    )
    ids = docs.select(F.col(id_col).alias("_id"))
    return ids.join(scored, "_id", "left").select(
        F.col("_id").alias(id_col),
        F.coalesce("dsir_score", F.lit(0.0)).alias("dsir_score"),
    )


def dsir_select(
    raw: DataFrame,
    target: DataFrame,
    n: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int | None = None,
) -> DataFrame:
    """Top-``n`` raw docs by importance score (the paper resamples with
    Gumbel noise; the deterministic top-n is the no-noise limit and keeps
    the gate reproducible — at scale add the noise column before the
    TakeOrderedAndProject). Ties break by id ASC."""
    lr = dsir_log_ratios(raw, target, id_col, text_col, num_buckets)
    sc = dsir_scores(raw, lr, id_col, text_col, num_buckets)
    return sc.orderBy(F.desc("dsir_score"), F.asc(id_col)).limit(n)
