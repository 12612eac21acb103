"""Index-inspection utilities (the reference's misc module tools).

Behavioral reference: misc/src/java/org/apache/lucene/misc/HighFreqTerms.java:33
— "Extracts the top n most frequent terms by document frequency", with
``-t`` switching the order to totalTermFreq (DocFreqComparator /
TotalTermFreqComparator, ties broken by term text). Stats aggregate across
segments like MultiTerms does.

Spark shape: one partial-aggregated groupBy over the (already tiny relative
to postings) term-dict table, then a global top-k — a TakeOrderedAndProject,
no full sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..index.builder import FIELD_SEP

__all__ = ["high_freq_terms", "doc_values_stats", "range_field_query"]


def doc_values_stats(searcher, query, name: str) -> DataFrame:
    """DocValuesStats over the docs matching ``query`` (misc/src/java/org/
    apache/lucene/misc/search/DocValuesStats.java:29-146 +
    DocValuesStatsCollector): count (docs with a value), missing, min,
    max, sum, mean, population variance, stdev — one row.

    The reference accumulates mean/variance incrementally (Welford) on a
    single thread; this computes the same statistics with the
    distributed-friendly moment form (variance = E[v²] − mean², written
    as one explicit expression so a SQL oracle reproduces the float path
    term for term)."""
    hits = searcher.search_all(query).select("docid")
    dm = searcher._docmap_global().select(
        "docid", F.col("dv").getItem(name).alias("v")
    )
    j = hits.join(dm, "docid")
    cnt = F.count("v")
    vsum = F.sum("v")
    return j.agg(
        cnt.alias("count"),
        (F.count("*") - cnt).alias("missing"),
        F.min("v").alias("vmin"),
        F.max("v").alias("vmax"),
        vsum.alias("vsum"),
        (vsum / cnt).alias("mean"),
        (F.sum(F.col("v") * F.col("v")) / cnt - (vsum / cnt) * (vsum / cnt))
        .alias("variance"),
        F.sqrt(
            F.sum(F.col("v") * F.col("v")) / cnt - (vsum / cnt) * (vsum / cnt)
        ).alias("stdev"),
    )


def high_freq_terms(
    reader,
    k: int = 100,
    by: str = "df",
    field: str | None = None,
) -> DataFrame:
    """Top ``k`` terms by docFreq (``by="df"``) or totalTermFreq
    (``by="ttf"``), ties by term ASC. ``field`` selects one field's
    namespace on a multi-field index (None = the classic single-field
    terms); existence/feature pseudo-terms never appear."""
    if by not in ("df", "ttf"):
        raise ValueError("by must be 'df' or 'ttf'")
    td = reader.term_dict
    if field is None:
        td = td.filter(~F.col("term").contains(FIELD_SEP))
    else:
        pref = field + FIELD_SEP
        td = td.filter(
            F.col("term").startswith(pref)
            & (F.length("term") > len(pref))  # exclude the existence list
        ).withColumn("term", F.expr(f"substring(term, {len(pref) + 1})"))
    agg = td.groupBy("term").agg(
        F.sum("df").alias("df"), F.sum("ttf").alias("ttf")
    )
    return agg.orderBy(F.desc(by), F.asc("term")).limit(k)


def range_field_query(
    df: DataFrame,
    lo_col: str,
    hi_col: str,
    q_lo,
    q_hi,
    relation: str = "intersects",
) -> DataFrame:
    """RangeFieldQuery (document/RangeFieldQuery.java:60 QueryType enum,
    built by IntRange/LongRange/DoubleRange.newIntersectsQuery &co):
    documents store an interval [lo, hi] (here two columns) and the query
    relates it to [q_lo, q_hi]:

    - INTERSECTS: doc.lo <= q.hi AND doc.hi >= q.lo
    - WITHIN:     doc.lo >= q.lo AND doc.hi <= q.hi
    - CONTAINS:   doc.lo <= q.lo AND doc.hi >= q.hi
    - CROSSES:    intersects AND NOT within AND NOT contains
      (RangeFieldQuery.QueryType.CROSSES javadoc: ranges that overlap the
      query but are neither contained by it nor containing it)

    Lucene evaluates these against a 2·dim-dimensional points tree; the
    Spark-first shape is a pair of comparison predicates that reach the
    parquet scan (PushedFilters) — map-only, no shuffle, and at 100 TB the
    scan prunes row groups on the lo/hi column statistics exactly like the
    BKD tree prunes cells."""
    lo, hi = F.col(lo_col), F.col(hi_col)
    intersects = (lo <= q_hi) & (hi >= q_lo)
    within = (lo >= q_lo) & (hi <= q_hi)
    contains = (lo <= q_lo) & (hi >= q_hi)
    rel = relation.lower()
    if rel == "intersects":
        pred = intersects
    elif rel == "within":
        pred = within
    elif rel == "contains":
        pred = contains
    elif rel == "crosses":
        pred = intersects & ~within & ~contains
    else:
        raise ValueError(f"unknown range relation: {relation}")
    return df.filter(pred)
