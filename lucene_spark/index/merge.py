"""Segment merge: N per-partition segments → one global segment.

The SegmentMerger / MultiTermsEnum k-way merge (reference:
lucene/core/src/java/org/apache/lucene/index/SegmentMerger.java:113-153,
MultiTermsEnum.java:252-281, DocIDMerger.java:32-45) re-expressed Spark-first.

The crucial observation that makes merge METADATA-ONLY: every block payload
is **shift-invariant** under docid rebase. Deltas (FOR/VByte) don't change
when all docids shift by a constant; the unary bitset is relative to
``base_docid``; ``ENC_CONSECUTIVE`` stores nothing. So remapping local →
global docids (global = doc_base(segment) + local,
codecs/FieldsConsumer.java:76-88 docBase semantics) is three column adds on
(base_docid, first_docid, last_docid) — postings payloads are never decoded,
the merge moves only encoded rows:

- postings: rebase columns + ``row_number() over (partition by term order by
  first_docid)`` to renumber blocks (segment docid ranges are disjoint, so
  rebased blocks of one term never overlap — the k-way merge order IS the
  docid order);
- per-segment pulsed singletons (Lucene103PostingsWriter.java:564-571) whose
  term has global df>1 are materialized as standard 1-doc VByte tail blocks
  (a tiny mapInPandas over only those rows); terms with global df==1 stay
  inline in the merged term_dict;
- term_dict: ``groupBy(term).agg(sum(df), sum(ttf), ...)``;
- blocks may hold <128 docs mid-stream after merge (each source segment
  contributes one ragged tail); all decode paths are per-row self-contained,
  so this costs only a little compression — the price of an O(metadata)
  merge. A future ``compact=True`` pass can re-encode hot terms into full
  blocks (TieredMergePolicy-style background work).

Skew: the only per-term operation is the window renumber over df/128
*encoded* rows — ~1/128th of the data, AQE-manageable even for stopwords.
"""

from __future__ import annotations

import json
import time
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

from ..codecs.intcodecs import vbyte_encode
from .pseudo import singleton_pseudo_blocks
from .reader import IndexReader
from .schemas import POSTINGS_COLS, TERM_DICT_COLS

__all__ = ["merge_segments"]

ENC_VBYTE_TAIL = 3


def _materialize_singletons(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Pulsed rows → standard 1-doc VByte tail blocks (docid already global)."""
    for pdf in batches:
        n = len(pdf)
        if n == 0:
            yield pdf
            continue
        docids = pdf["first_docid"].to_numpy()
        freqs = pdf["impact_freqs"].map(lambda a: int(a[0])).to_numpy()
        norms = pdf["impact_norms"].map(lambda a: int(a[0])).to_numpy()
        pdf = pdf.copy()
        pdf["encoding"] = np.int8(ENC_VBYTE_TAIL)
        pdf["docids_enc"] = [
            bytes(vbyte_encode(np.array([1], dtype=np.int64))) for _ in range(n)
        ]
        # base_docid = docid-1 so the single delta is 1 (pseudo rows already
        # carry base_docid = singleton_docid - 1)
        pdf["freqs_enc"] = [
            bytes(vbyte_encode(np.array([f], dtype=np.int64))) for f in freqs
        ]
        pdf["norms_enc"] = [bytes([int(m) & 0xFF]) for m in norms]
        yield pdf


def merge_segments(
    spark: SparkSession,
    index_dir: str,
    out_dir: str,
    *,
    group_size: int = 8,  # kept for API compat; unused by the O(metadata) path
) -> dict:
    """Merge all segments of ``index_dir`` into a single-segment index at
    ``out_dir`` (forceMerge(1)). Returns merge metrics."""
    t0 = time.time()
    reader = IndexReader(spark, index_dir)
    manifest = reader.manifest_rows
    doc_bases = reader.doc_bases
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")

    base_df = F.broadcast(
        spark.createDataFrame(
            [(int(s), int(b)) for s, b in doc_bases.items()],
            "seg int, doc_base long",
        )
    )

    # --- docmap: rebase to global ids ----------------------------------
    (
        reader.docmap.join(base_df, F.col("segment_id") == F.col("seg"))
        .select(
            F.lit(0).alias("segment_id"),
            (F.col("docid") + F.col("doc_base")).alias("docid"),
            "url",
            "doc_len",
            "norm",
        )
        .repartitionByRange(max(len(manifest) // 4, 1), "docid")
        .sortWithinPartitions("docid")
        .write.mode("overwrite")
        .partitionBy("segment_id")
        .parquet(f"{out_dir}/docmap")
    )

    # --- term_dict: global stats + pulsing re-decision ------------------
    td = reader.term_dict.join(base_df, F.col("segment_id") == F.col("seg"))
    merged_td = td.groupBy("term").agg(
        F.sum("df").alias("df"),
        F.sum("ttf").alias("ttf"),
        (
            F.sum("n_blocks")
            + F.sum(F.when(F.col("singleton_docid").isNotNull(), 1).otherwise(0))
        ).cast("int").alias("n_blocks_raw"),
        F.first(F.col("singleton_docid") + F.col("doc_base"), ignorenulls=True).alias(
            "g_singleton_docid"
        ),
        F.first("singleton_freq", ignorenulls=True).alias("g_singleton_freq"),
        F.first("singleton_norm", ignorenulls=True).alias("g_singleton_norm"),
        F.first("singleton_positions", ignorenulls=True).alias("g_singleton_positions"),
    )
    keep_pulsed = F.col("df") == 1
    (
        merged_td.select(
            F.lit(0).alias("segment_id"),
            "term",
            "df",
            "ttf",
            F.when(keep_pulsed, F.lit(0)).otherwise(F.col("n_blocks_raw")).alias("n_blocks"),
            F.when(keep_pulsed, F.col("g_singleton_docid")).alias("singleton_docid"),
            F.when(keep_pulsed, F.col("g_singleton_freq")).alias("singleton_freq"),
            F.when(keep_pulsed, F.col("g_singleton_norm")).alias("singleton_norm"),
            F.when(keep_pulsed, F.col("g_singleton_positions")).alias(
                "singleton_positions"
            ),
        )
        .select(*TERM_DICT_COLS)
        .sortWithinPartitions(F.encode("term", "utf-8"))
        .write.mode("overwrite")
        .partitionBy("segment_id")
        .parquet(f"{out_dir}/term_dict")
    )

    # --- postings: shift-invariant rebase, no payload decode ------------
    rebased = (
        reader.postings.join(base_df, F.col("segment_id") == F.col("seg"))
        .select(
            F.lit(0).alias("segment_id"),
            "term",
            "block_no",
            "n_docs",
            (F.col("base_docid") + F.col("doc_base")).alias("base_docid"),
            (F.col("first_docid") + F.col("doc_base")).alias("first_docid"),
            (F.col("last_docid") + F.col("doc_base")).alias("last_docid"),
            "encoding",
            "docids_enc",
            "freqs_enc",
            "norms_enc",
            "positions_enc",
            "impact_freqs",
            "impact_norms",
        )
    )
    # pulsed singletons whose term has global df > 1 become real tail blocks.
    # (plain shuffle join on term: the multi-term dictionary is NOT small —
    # broadcasting it would ship the whole term dict to every task)
    multi_terms = merged_td.filter(F.col("df") > 1).select("term")
    demoted = (
        singleton_pseudo_blocks(reader.term_dict, True)
        .join(base_df, F.col("segment_id") == F.col("seg"))
        .join(multi_terms, "term")
        .select(
            F.lit(0).alias("segment_id"),
            "term",
            "block_no",
            "n_docs",
            (F.col("base_docid") + F.col("doc_base")).alias("base_docid"),
            (F.col("first_docid") + F.col("doc_base")).alias("first_docid"),
            (F.col("last_docid") + F.col("doc_base")).alias("last_docid"),
            "encoding",
            "docids_enc",
            "freqs_enc",
            "norms_enc",
            "positions_enc",
            "impact_freqs",
            "impact_norms",
        )
        .mapInPandas(_materialize_singletons, schema=rebased.schema)
    )
    win = Window.partitionBy("term").orderBy("first_docid")
    (
        rebased.unionByName(demoted)
        .withColumn("block_no", (F.row_number().over(win) - 1).cast("int"))
        .select(*POSTINGS_COLS)
        .sortWithinPartitions(F.encode("term", "utf-8"), "block_no")
        .write.mode("overwrite")
        .partitionBy("segment_id")
        .parquet(f"{out_dir}/postings")
    )

    # --- field_stats + manifest (commit point) --------------------------
    docmap = spark.read.parquet(f"{out_dir}/docmap")
    stats = docmap.agg(
        F.count("*").alias("doc_count"),
        F.sum("doc_len").alias("sum_ttf"),
        F.max("docid").alias("max_docid"),
    ).collect()[0]
    spark.createDataFrame(
        [(0, int(stats["doc_count"]), int(stats["sum_ttf"]), int(stats["max_docid"]))],
        "segment_id int, doc_count long, sum_ttf long, max_docid long",
    ).write.mode("overwrite").parquet(f"{out_dir}/field_stats")
    spark.createDataFrame(
        [
            (
                0,
                int(stats["doc_count"]),
                0,
                "done",
                float(time.time()),
                f"merge(from={index_dir},segments={len(manifest)})",
                json.dumps({"merged_from": len(manifest)}),
            )
        ],
        "segment_id int, n_docs long, doc_base long, status string, "
        "checkpoint_ts double, lineage string, metrics_json string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{out_dir}/segment_manifest")
    return {
        "merged_segments": len(manifest),
        "n_docs": int(stats["doc_count"]),
        "merge_secs": time.time() - t0,
    }
