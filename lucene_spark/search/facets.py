"""Facet counting over search hits — the facets-module analogs that are
not already native Spark group-bys.

Value facets (SortedSetDocValuesFacetCounts) are a plain
``groupBy(dim).count()`` over the hits join (see gate facet_lang). Range
facets (facets/range/LongRangeFacetCounts.java:42: each requested range is
counted independently, overlaps allowed, both endpoints optionally
inclusive) need one conditional-sum aggregation pass — NO explode, NO per
range scan: a single map-side-combinable agg over the hit rows, then an
unpivot of the one result row. At 100 TB this is one pass over the hits
with a k-column reduce, the same shape Lucene gets from one pass over the
matching docs' doc values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["range_facets", "LongRange", "drill_sideways", "taxonomy_facets"]


class LongRange:
    """(label, min, max, min_inclusive, max_inclusive) — mirrors
    facets/range/LongRange.java:28-47 (inclusive-flag endpoint
    adjustment)."""

    def __init__(
        self,
        label: str,
        lo: int,
        hi: int,
        lo_inclusive: bool = True,
        hi_inclusive: bool = False,
    ):
        self.label = label
        self.lo = lo
        self.hi = hi
        self.lo_inclusive = lo_inclusive
        self.hi_inclusive = hi_inclusive

    def condition(self, col):
        c_lo = (col >= self.lo) if self.lo_inclusive else (col > self.lo)
        c_hi = (col <= self.hi) if self.hi_inclusive else (col < self.hi)
        return c_lo & c_hi


def range_facets(
    hits: DataFrame, value_col: str, ranges: list[LongRange]
) -> DataFrame:
    """Count hits per requested range → (bucket:string, n_docs:long).

    Ranges are counted independently (a doc in two overlapping ranges
    counts in both) and every requested range appears in the output even
    at count 0 — LongRangeFacetCounts semantics.
    """
    if not ranges:
        raise ValueError("at least one range required")
    labels = [r.label for r in ranges]
    if len(set(labels)) != len(labels):
        raise ValueError("range labels must be distinct")
    col = F.col(value_col)
    row = hits.agg(
        *[
            F.coalesce(
                F.sum(F.when(r.condition(col), 1).otherwise(0)), F.lit(0)
            ).cast("long").alias(f"_r{i}")
            for i, r in enumerate(ranges)
        ]
    )
    stack_args = ", ".join(
        f"'{r.label.replace(chr(39), '')}', _r{i}" for i, r in enumerate(ranges)
    )
    return row.selectExpr(
        f"stack({len(ranges)}, {stack_args}) AS (bucket, n_docs)"
    )


def long_value_facets(hits: DataFrame, value_col: str) -> DataFrame:
    """Facet counts per distinct long value of ``value_col``
    (facet/src/java/org/apache/lucene/facet/LongValueFacetCounts.java:47
    — "Computes facets counts ... for all long values", here the
    getAllChildrenSortByValue view: every distinct value with its count,
    value ascending). One map-side-combinable groupBy — no driver state,
    no hash-vs-array backing distinction needed (Spark's aggregate IS the
    sparse path)."""
    return (
        hits.filter(F.col(value_col).isNotNull())
        .groupBy(F.col(value_col).cast("long").alias("value"))
        .agg(F.count("*").alias("n_docs"))
        .orderBy("value")
    )


def sampled_facets(
    hits: DataFrame,
    dim_col: str,
    doc_id_col: str = "doc_id",
    rate_pct: int = 10,
    amortize: bool = True,
) -> DataFrame:
    """RandomSamplingFacetsCollector analog (facet/src/java/org/apache/
    lucene/facet/RandomSamplingFacetsCollector.java): facet counts over a
    ~``rate_pct``% SAMPLE of the hit set, optionally amortized back to the
    full population by 1/samplingRate (:158-180 amortizeFacetCounts) — the
    cheap approximate facets used when the hit set is huge and exact
    counts don't pay for themselves.

    Deliberate deviation: the reference samples with an XORShift64 RNG
    over the in-order hit stream (createSample, :94-139), which is not
    reproducible across partitionings; here membership is a deterministic
    function of the doc key — keep iff (doc_id·48271) mod 100 < rate_pct
    (a MINSTD multiplicative hash) — so the sample is identical on any
    cluster layout, re-runs are stable, and an exact SQL oracle can
    recompute it. Amortized counts are DOUBLE (the reference also emits
    float counts after amortization). One filtered map-side-combinable
    groupBy; the filter prunes before the shuffle, so the shuffle carries
    only the sample."""
    keep = F.pmod(F.col(doc_id_col) * F.lit(48271), F.lit(100)) < F.lit(
        int(rate_pct)
    )
    out = (
        hits.filter(keep)
        .groupBy(dim_col)
        .agg(F.count("*").alias("n_docs"))
    )
    if amortize:
        out = out.select(
            dim_col,
            (F.col("n_docs") * (100.0 / float(rate_pct))).alias("n_docs"),
        )
    return out.orderBy(dim_col)


def dynamic_range_facets(
    hits: DataFrame, value_col: str, weight_col: str, top_n: int
) -> DataFrame:
    """Equal-weight dynamic ranges (facet/src/java/org/apache/lucene/facet/
    range/DynamicRangeUtil.java:204-266 computeDynamicNumericRanges):
    rows sort by (value, weight), zero-weight rows are skipped (:161-163),
    and a greedy scan emits a range every time the accumulated weight
    reaches ``totalWeight / min(topN, len)``, plus a tail range; each
    range reports (count, weight, min, max, centroid = value mean).

    Distributed shape: one sort-shuffle builds running prefix weights
    (window), then each greedy boundary is resolved by a short
    min-aggregation on the cached prefix column — the boundary chain is
    sequential in the reference too, and only ≤ topN scalar lookups cross
    to the driver, never rows. Assignment + per-range aggregates are one
    final groupBy against the broadcast boundary list."""
    from pyspark.sql.window import Window

    if top_n <= 0:
        raise ValueError("top_n must be > 0")
    rows = hits.select(
        F.col(value_col).cast("long").alias("v"),
        F.col(weight_col).cast("long").alias("w"),
    ).filter(F.col("w") != 0)
    # two-level prefix sum (the sequence-packing pattern): range-partition
    # by the sort key, within-shard running sums, then broadcast the tiny
    # per-shard offsets — no single-partition global window at any scale.
    # Equal (v, w) rows split across a shard edge are interchangeable
    # (only counts enter the result), so shard-local tie order is free.
    nparts = max(hits.sparkSession.sparkContext.defaultParallelism, 2)
    sharded = rows.repartitionByRange(nparts, "v", "w").withColumn(
        "_shard", F.spark_partition_id()
    )
    w_in = (
        Window.partitionBy("_shard")
        .orderBy("v", "w")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    within = sharded.withColumn("_ws_local", F.sum("w").over(w_in))
    shard_tot = sharded.groupBy("_shard").agg(F.sum("w").alias("_tot"))
    w_sh = Window.orderBy(F.col("_shard").asc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    shard_off = shard_tot.select(
        "_shard", F.coalesce(F.sum("_tot").over(w_sh), F.lit(0)).alias("_off")
    )
    pref = (
        within.join(F.broadcast(shard_off), "_shard")
        .select("v", "w", (F.col("_ws_local") + F.col("_off")).alias("ws"))
        .cache()
    )
    try:
        tot = pref.agg(
            F.coalesce(F.max("ws"), F.lit(0)).alias("tw"),
            F.count("*").alias("n"),
        ).first()
        total_w, n = int(tot["tw"]), int(tot["n"])
        if n == 0:
            return hits.sparkSession.createDataFrame(
                [],
                "count long, weight long, vmin long, vmax long, centroid double",
            )
        target = float(total_w) / min(top_n, n)
        bounds: list[int] = []
        prev = 0
        while len(bounds) < top_n:
            nxt = (
                pref.filter(F.col("ws") - F.lit(prev) >= F.lit(target))
                .agg(F.min("ws").alias("b"))
                .first()["b"]
            )
            if nxt is None:
                break
            bounds.append(int(nxt))
            prev = int(nxt)
        # bucket = number of boundaries strictly below this row's ws
        bucket = sum(
            (F.when(F.col("ws") > F.lit(b), 1).otherwise(0) for b in bounds),
            F.lit(0),
        )
        out = (
            pref.withColumn("bucket", bucket)
            .groupBy("bucket")
            .agg(
                F.count("*").alias("count"),
                F.sum("w").alias("weight"),
                F.min("v").alias("vmin"),
                F.max("v").alias("vmax"),
                (F.sum("v").cast("double") / F.count("*")).alias("centroid"),
            )
            .orderBy("bucket")
            .drop("bucket")
        )
        out = out.collect()
    finally:
        pref.unpersist()
    return hits.sparkSession.createDataFrame(
        out, "count long, weight long, vmin long, vmax long, centroid double"
    )


def drill_sideways(
    docs: DataFrame, constraints: dict[str, str]
) -> DataFrame:
    """DrillSideways counting (facet/DrillSideways.java:63): for each
    constrained dimension D, facet counts over docs that match the base
    query AND every OTHER dimension's constraint — but not D's own — so
    the UI can show what the D filter is hiding. Output rows
    (dim, value, n_docs) for every dim, plus one ('__drilldown__', '', n)
    row counting docs matching ALL constraints (the drill-down hits).

    One-pass formulation (vs Lucene's per-scorer sideways collectors):
    each doc computes a per-dim satisfied flag and the satisfied total,
    stacks one (dim, value, sat) struct per dim (a bounded ndims-way
    explode), and a doc contributes to dim D iff it satisfies the other
    ndims-1 constraints. Single shuffle: the groupBy(dim, value) — no
    per-dim rescans of the base hits at any corpus size.
    """
    if not constraints:
        raise ValueError("at least one constrained dimension required")
    dims = list(constraints)
    nd = len(dims)
    sat_cols = [
        F.when(F.col(d) == constraints[d], 1).otherwise(0).alias(f"_sat_{i}")
        for i, d in enumerate(dims)
    ]
    base = docs.select(*dims, *sat_cols)
    nsat = sum((F.col(f"_sat_{i}") for i in range(nd)), F.lit(0))
    base = base.withColumn("_nsat", nsat)
    stacked = base.select(
        "_nsat",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("dim"),
                        F.col(d).cast("string").alias("value"),
                        F.col(f"_sat_{i}").alias("sat"),
                    )
                    for i, d in enumerate(dims)
                ]
            )
        ).alias("x"),
    )
    side = (
        stacked.filter(F.col("_nsat") - F.col("x.sat") == nd - 1)
        .groupBy(F.col("x.dim").alias("dim"), F.col("x.value").alias("value"))
        .agg(F.count("*").alias("n_docs"))
    )
    drill = base.filter(F.col("_nsat") == nd).agg(
        F.lit("__drilldown__").alias("dim"),
        F.lit("").alias("value"),
        F.count("*").alias("n_docs"),
    )
    return side.unionByName(drill)


def association_facets(
    docs: DataFrame, dim_col: str, assoc_col: str
) -> DataFrame:
    """Association facets (facet/taxonomy/TaxonomyFacetSumIntAssociations.java,
    TaxonomyFacetSumValueSource.java:47): each matching doc contributes a
    per-doc association VALUE to its label instead of a bare count — e.g.
    total chars per language over the hit set. One map-side-combinable
    groupBy; the association rides the docs DataFrame as an ordinary column
    (Lucene stores it in the BinaryDocValues payload of the assoc field).
    Sums are integer-exact (no float accumulation-order dependence)."""
    return docs.groupBy(dim_col).agg(
        F.sum(F.col(assoc_col).cast("long")).alias("sum_assoc"),
        F.count("*").alias("n_docs"),
    )


def taxonomy_facets(
    docs: DataFrame, path_col: str, sep: str = "/"
) -> DataFrame:
    """Hierarchical facet counts with ancestor rollup
    (facet/taxonomy/FastTaxonomyFacetCounts.java semantics: a doc counts
    at its category ordinal AND every ancestor): input rows carry a
    ``sep``-joined category path; output (path, n_docs) for every prefix
    at every depth. One bounded depth-way explode (paths are shallow) and
    one groupBy(path) aggregation — the map-side combine does the rollup,
    no per-level rescans."""
    parts = F.split(F.col(path_col), sep)
    prefixes = F.transform(
        F.sequence(F.lit(1), F.size(parts)),
        lambda d: F.array_join(F.slice(parts, 1, d), sep),
    )
    return (
        docs.select(F.explode(prefixes).alias("path"))
        .groupBy("path")
        .agg(F.count("*").alias("n_docs"))
    )
