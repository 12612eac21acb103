"""Input adapter for the engine's canonical source table.

The canonical input is an Iceberg (or any catalog-registered) table of
Common-Crawl-style web pages with the schema

    (url: string, warc_ts: timestamp, html: binary, text: string,
     lang: string)

``read_webtext`` accepts either a catalog table name (``db.webtext`` — on a
production cluster an Iceberg table: snapshot-isolated reads, partition
pruning on e.g. days(warc_ts), hidden-partition evolution) or a plain
path (parquet), validates the schema, and normalizes ``html`` bytes to the
string column ``build_index(html_input=True)`` consumes. Everything after
this adapter is source-agnostic DataFrame code, which is exactly why the
engine needs no Iceberg-specific logic: Catalyst sees the same relation
either way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["WEBTEXT_COLUMNS", "read_webtext"]

WEBTEXT_COLUMNS = ("url", "warc_ts", "html", "text", "lang")


def read_webtext(
    spark: SparkSession,
    source: str,
    *,
    html_as_string: bool = True,
    require: tuple[str, ...] = ("url",),
) -> DataFrame:
    """Load the webtext input table from a catalog table name or a path.

    ``source`` containing a ``/`` (or ending ``.parquet``) reads as a
    parquet path; anything else resolves through the session catalog
    (``spark.read.table`` — Iceberg/Hive/temp view alike). Columns beyond
    the canonical five pass through untouched; ``require`` lists columns
    that must exist (default: just ``url`` — builds can run on text-only
    or html-only tables). ``html_as_string=True`` decodes a binary
    ``html`` column to UTF-8 string (the shape the HTML extraction UDF
    batches over)."""
    if "/" in source or source.endswith(".parquet"):
        df = spark.read.parquet(source)
    else:
        df = spark.read.table(source)
    missing = [c for c in require if c not in df.columns]
    if missing:
        raise ValueError(
            f"webtext source {source!r} lacks required columns {missing}; "
            f"found {df.columns}"
        )
    if html_as_string and "html" in df.columns:
        html_type = dict(df.dtypes).get("html")
        if html_type == "binary":
            df = df.withColumn("html", F.decode(F.col("html"), "UTF-8"))
    return df
