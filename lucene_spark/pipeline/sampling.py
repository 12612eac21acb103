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

__all__ = ["sample_hash", "stratified_sample"]

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
