"""URL canonicalization for web-corpus dedup (the crawl-side complement
to content dedup: the same page fetched as HTTP/HTTPS, with tracking
params, stray fragments, default ports, or case-varied hosts must
collapse to one canonical key before any content pass runs).

Canonical form applied, in order:
1. scheme and host lowercased;
2. default port dropped (``:80`` for http, ``:443`` for https);
3. fragment dropped;
4. tracking params dropped (``utm_*``, ``fbclid``, ``gclid``), remaining
   query params sorted bytewise;
5. trailing slashes stripped from the path.

Everything is Spark built-ins (regexp_extract / filter / array_sort —
JVM codegen, map-only, no UDF), and every construct has a semantically
identical DuckDB twin (the gate oracle re-implements the same steps), so
the canonicalization is verified string-exact end to end.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["canonical_url", "canonicalize_urls", "url_dup_groups"]

_TRACKING_PREFIXES = ("utm_", "fbclid", "gclid")


def _keep_param(x: Column) -> Column:
    cond = x != ""
    for p in _TRACKING_PREFIXES:
        cond = cond & (F.substring(x, 1, len(p)) != p)
    return cond


def canonical_url(url: Column) -> Column:
    """Canonical form of a URL column (see module docstring)."""
    scheme = F.lower(F.regexp_extract(url, r"^([A-Za-z][A-Za-z0-9+.\-]*)://", 1))
    host = F.lower(F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/:?#]*)", 1))
    port = F.regexp_extract(
        url, r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/:?#]*:([0-9]+)", 1
    )
    path = F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*([^?#]*)", 1)
    query = F.regexp_extract(url, r"\?([^#]*)", 1)
    path = F.regexp_replace(path, "/+$", "")
    params = F.array_sort(
        F.filter(F.split(query, "&"), _keep_param)
    )
    default_port = ((scheme == "http") & (port == "80")) | (
        (scheme == "https") & (port == "443")
    )
    port_part = F.when(
        (port == "") | default_port, F.lit("")
    ).otherwise(F.concat(F.lit(":"), port))
    query_part = F.when(F.size(params) == 0, F.lit("")).otherwise(
        F.concat(F.lit("?"), F.concat_ws("&", params))
    )
    return F.concat(scheme, F.lit("://"), host, port_part, path, query_part)


def canonicalize_urls(
    df: DataFrame, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """(id, canon_url) — map-only."""
    return df.select(id_col, canonical_url(F.col(url_col)).alias("canon_url"))


def url_dup_groups(
    df: DataFrame, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """(canon_url, n_docs, keep_id) for canonical-URL groups with more
    than one member — same contract as dedup.exact_dup_groups; one
    map-side-combinable shuffle on the canonical key."""
    return (
        canonicalize_urls(df, url_col, id_col)
        .groupBy("canon_url")
        .agg(F.count("*").alias("n_docs"), F.min(id_col).alias("keep_id"))
        .filter(F.col("n_docs") > 1)
    )
