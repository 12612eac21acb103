"""Deterministic sampling operators for training-data curation.

Hash-based Bernoulli sampling: a row survives iff
``u(seed, id) < fraction`` where u = the first 8 md5 hex digits of
``seed:id`` scaled to [0, 1). Fully deterministic given (seed, id) — no
RNG state, no partition sensitivity, reproducible in ANSI SQL — and
map-only (no shuffle, no sort): at 100 TB the sample is a codegen filter
over the scan. Per-stratum fractions make it the standard
quality/language rebalancing step for web-corpus curation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "sample_hash",
    "stratified_sample",
    "temperature_mixture_sample",
    "pack_sequences",
]

_SCALE = float(1 << 32)


def _u(seed: int, id_col: str) -> F.Column:
    """Uniform-[0,1) deterministic hash of (seed, id) — JVM-side md5."""
    h = F.conv(
        F.substring(
            F.md5(F.concat_ws(":", F.lit(str(seed)), F.col(id_col).cast("string"))),
            1,
            8,
        ),
        16,
        10,
    ).cast("double")
    return h / F.lit(_SCALE)


def sample_hash(
    docs: DataFrame, fraction: float, seed: int = 0, id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic Bernoulli sample: keep iff u(seed, id) < fraction."""
    if not (0.0 <= fraction <= 1.0):
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    return docs.filter(_u(seed, id_col) < fraction)


def stratified_sample(
    docs: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    seed: int = 0,
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-stratum deterministic sampling: stratum s keeps each row iff
    u(seed, id) < fractions.get(s, default_fraction). Strata missing from
    ``fractions`` get ``default_fraction`` (0.0 = dropped)."""
    for s, f in fractions.items():
        if not (0.0 <= f <= 1.0):
            raise ValueError(f"fraction for {s!r} must be in [0, 1], got {f}")
    if not (0.0 <= default_fraction <= 1.0):
        raise ValueError(f"default_fraction must be in [0, 1]")
    frac = F.lit(float(default_fraction))
    for s, f in sorted(fractions.items()):
        frac = F.when(F.col(strata_col) == s, F.lit(float(f))).otherwise(frac)
    return docs.filter(_u(seed, id_col) < frac)


def budget_sample(
    docs: DataFrame,
    token_budget: int,
    stratum_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: int = 0,
) -> DataFrame:
    """Token-budget sampling: per stratum, admit docs in deterministic
    hash order until the stratum's cumulative simple-analyzer token count
    reaches ``token_budget`` — the "take N tokens of each source" step of
    training-mixture assembly (the per-source budgets usually come from
    ``textstats.source_stats`` + mixture weights).

    A doc is admitted iff the cumulative tokens of all docs BEFORE it (in
    hash order) are < budget, so the sample overshoots by at most one doc
    and never depends on partitioning. One window per stratum (shuffle
    keyed by stratum; at 100 TB strata are domains — many and bounded) —
    no driver-side loop, no collect. Returns (id, stratum, n_toks,
    cum_before)."""
    from .dedup import _token_array

    u = _u(seed, id_col)
    n_toks = F.size(_token_array(text_col)).cast("long")
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy(stratum_col)
        .orderBy(u.asc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    out = docs.select(
        id_col,
        F.col(stratum_col).alias("stratum"),
        n_toks.alias("n_toks"),
        F.coalesce(F.sum(n_toks).over(w), F.lit(0)).alias("cum_before"),
    )
    return out.filter(F.col("cum_before") < token_budget)


def temperature_mixture_sample(
    docs: DataFrame,
    alpha: float,
    total_fraction: float = 1.0,
    stratum_col: str = "source",
    id_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Temperature-scaled mixture sampling — the multilingual/LM-corpus
    rebalancing step (exponentiated sampling of "Exploring the Limits of
    Transfer Learning" §3.4.1 / multilingual-BERT's alpha-smoothing):
    stratum ``s`` with mass share ``q_s`` is targeted at share
    ``p_s = q_s^alpha / Σ q_t^alpha`` of an output of size
    ``total_fraction · N``, so its per-row keep rate is
    ``min(1, total_fraction · N · p_s / m_s)``. ``alpha < 1`` upsamples the
    tail strata relative to the head, ``alpha = 1`` is proportional.

    Deterministic hash admission (same ``u`` as :func:`sample_hash`), so
    the sample is reproducible and partition-independent. Plan: one
    partial-aggregated groupBy over strata (tiny result, broadcast back) +
    a codegen filter over the scan — no global sort, no driver loop."""
    if alpha <= 0:
        raise ValueError(f"alpha must be > 0, got {alpha}")
    if not (0.0 < total_fraction <= 1.0):
        raise ValueError(f"total_fraction must be in (0, 1], got {total_fraction}")
    masses = docs.groupBy(stratum_col).agg(F.count(F.lit(1)).alias("_m"))
    tot = masses.select(
        F.sum("_m").alias("_n"),
        F.sum(F.pow(F.col("_m").cast("double"), F.lit(float(alpha)))).alias(
            "_z"
        ),
    )
    rates = masses.crossJoin(F.broadcast(tot)).select(
        stratum_col,
        F.least(
            F.lit(1.0),
            F.lit(float(total_fraction))
            * F.col("_n").cast("double")
            * (F.pow(F.col("_m").cast("double"), F.lit(float(alpha))) / F.col("_z"))
            / F.col("_m").cast("double"),
        ).alias("_keep_rate"),
    )
    return (
        docs.join(F.broadcast(rates), stratum_col)
        .filter(_u(seed, id_col) < F.col("_keep_rate"))
        .drop("_keep_rate")
    )


def pack_sequences(
    docs: DataFrame,
    context_len: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    rows_per_shard: int = 1 << 20,
) -> DataFrame:
    """Concat-and-chunk sequence packing (the GPT-style pretraining
    batcher): documents concatenate in ``id_col`` order into one token
    stream that is cut into fixed ``context_len`` windows; each doc lands
    at a global token offset and spans chunks
    ``start_off // L .. (start_off + n_toks - 1) // L``.

    The global prefix-sum is the scale hazard (a bare unpartitioned window
    = one task). Two-level scan instead: shard by ``id_col`` range
    (``rows_per_shard`` ids per shard preserves the global order as
    (shard, id)), cumsum inside each shard with a window, then add the
    shard-prefix offsets — a #shards-row aggregate cumsum broadcast back.
    Returns (id, n_toks, start_off, chunk_first, chunk_last); an empty doc
    occupies zero tokens and reports the chunk of its offset on both
    ends."""
    if context_len <= 0:
        raise ValueError(f"context_len must be > 0, got {context_len}")
    from pyspark.sql.window import Window

    from .dedup import _token_array

    shard = (F.col(id_col) / F.lit(int(rows_per_shard))).cast("long")
    n_toks = F.size(_token_array(text_col)).cast("long")
    base = docs.select(
        F.col(id_col), shard.alias("_shard"), n_toks.alias("n_toks")
    )
    w_in = (
        Window.partitionBy("_shard")
        .orderBy(F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    within = base.withColumn(
        "_cum_in", F.coalesce(F.sum("n_toks").over(w_in), F.lit(0))
    )
    shard_tot = base.groupBy("_shard").agg(F.sum("n_toks").alias("_tot"))
    w_sh = (
        Window.orderBy(F.col("_shard").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    shard_off = shard_tot.select(
        "_shard", F.coalesce(F.sum("_tot").over(w_sh), F.lit(0)).alias("_off")
    )
    out = within.join(F.broadcast(shard_off), "_shard").select(
        id_col,
        "n_toks",
        (F.col("_cum_in") + F.col("_off")).alias("start_off"),
    )
    L = F.lit(int(context_len))
    return out.select(
        id_col,
        "n_toks",
        "start_off",
        (F.col("start_off") / L).cast("long").alias("chunk_first"),
        (
            (F.col("start_off") + F.greatest(F.col("n_toks"), F.lit(1)) - 1) / L
        ).cast("long").alias("chunk_last"),
    )
