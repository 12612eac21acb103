"""QueryAutoStopWordAnalyzer — stopwords derived from index statistics.

Behavioral reference: analysis/common/src/java/org/apache/lucene/analysis/
query/QueryAutoStopWordAnalyzer.java:50-120 — wrap a delegate analyzer and
DROP, at query time, every term whose document frequency in the live index
exceeds a threshold: an absolute ``maxDocFreq`` or a fraction
``maxPercentDocs`` of the index (``defaultMaxDocFreqPercent = 0.4f``,
:56). The reference materializes the stop set once per (reader, field) by
iterating the field's TermsEnum; here the same set comes from ONE
aggregate over the term dictionary table (df summed across segments,
thresholded) — a pushdown scan of term_dict, no postings touched.

Usage::

    stops = auto_stopwords(reader)                # df > 0.4 * docCount
    s = Searcher(spark, idx, stopwords=base | stops)

The returned set composes with the analyzer's own stopword set exactly
like the Java wrapper composes StopFilter over the delegate chain."""

from __future__ import annotations

from pyspark.sql import functions as F

__all__ = ["DEFAULT_MAX_DOC_FREQ_PERCENT", "auto_stopwords"]

DEFAULT_MAX_DOC_FREQ_PERCENT = 0.4  # QueryAutoStopWordAnalyzer.java:56


def auto_stopwords(
    reader,
    max_doc_freq: int | None = None,
    max_percent_docs: float = DEFAULT_MAX_DOC_FREQ_PERCENT,
    field: str | None = None,
) -> frozenset[str]:
    """Terms with index df above the threshold (absolute ``max_doc_freq``
    wins when given, else ``max_percent_docs`` × live docCount —
    QueryAutoStopWordAnalyzer.java:79,:98). ``field`` restricts to one
    field's namespaced terms and returns them bare, mirroring the
    per-field stop sets the Java class keeps."""
    from ..index.builder import FIELD_SEP

    doc_count, _ = reader.global_stats
    threshold = (
        int(max_doc_freq)
        if max_doc_freq is not None
        else int(max_percent_docs * doc_count)
    )
    td = reader.term_dict
    if field is not None:
        td = td.filter(F.col("term").startswith(field + FIELD_SEP))
    rows = (
        td.groupBy("term")
        .agg(F.sum("df").alias("df"))
        .filter(F.col("df") > threshold)
        .select("term")
        .collect()
    )
    strip = (field + FIELD_SEP) if field is not None else None
    out = set()
    for r in rows:
        t = r["term"]
        if strip is not None:
            t = t[len(strip):]
        elif FIELD_SEP in t:
            continue  # default-field set excludes namespaced fields
        out.add(t)
    return frozenset(out)
