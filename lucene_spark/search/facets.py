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
