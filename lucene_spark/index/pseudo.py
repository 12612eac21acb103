"""Singleton (pulsed) term_dict rows → postings-shaped pseudo-block rows.

Pulsing stores df==1 postings inline in the term dictionary
(Lucene103PostingsWriter.java:564-571); the search and merge paths expand
them back into one-doc pseudo blocks (encoding=ENC_SINGLETON) so the rest of
the pipeline sees a uniform block stream — fully distributed, no driver
round-trip.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["ENC_SINGLETON", "singleton_pseudo_blocks"]

ENC_SINGLETON = 4


def singleton_pseudo_blocks(term_dict: DataFrame, with_positions: bool) -> DataFrame:
    """POSTINGS_COLS-shaped rows for every pulsed term in ``term_dict``
    (pre-filter the input if only some terms are needed)."""
    return term_dict.filter(F.col("singleton_docid").isNotNull()).select(
        "segment_id",
        "term",
        F.lit(0).alias("block_no"),
        F.lit(1).alias("n_docs"),
        (F.col("singleton_docid") - 1).alias("base_docid"),
        F.col("singleton_docid").alias("first_docid"),
        F.col("singleton_docid").alias("last_docid"),
        F.lit(ENC_SINGLETON).cast("tinyint").alias("encoding"),
        F.lit(None).cast("binary").alias("docids_enc"),
        F.lit(None).cast("binary").alias("freqs_enc"),
        F.lit(None).cast("binary").alias("norms_enc"),
        (
            F.col("singleton_positions")
            if with_positions
            else F.lit(None).cast("binary")
        ).alias("positions_enc"),
        F.col("singleton_payloads").alias("payloads_enc"),
        F.array(F.col("singleton_freq").cast("long")).alias("impact_freqs"),
        F.array(F.col("singleton_norm")).alias("impact_norms"),
    )
