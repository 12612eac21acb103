"""Distributed index build: webtext DataFrame → index tables.

Spark-first design (NOT a port of Lucene's IndexWriter):

- one shuffle total: rows are hash-assigned to ``num_segments`` segments by
  url and grouped with ``groupBy(segment_id).applyInPandas`` — each group
  builds one complete, self-contained segment exactly like a
  DocumentsWriterPerThread flush (reference:
  lucene/core/src/java/org/apache/lucene/index/DocumentsWriterPerThread.java:242-274 —
  per-thread independence is what licenses per-partition independence here);
- inside the group everything is vectorized numpy/pandas over Arrow batches:
  tokenize → factorize terms → lexsort (term, docid, position) → run-length
  encode (term, doc) freqs → per-term 128-doc block encoding
  (codecs/blocks.py, mirroring Lucene103PostingsWriter.java:388-489);
- docids are deterministic: rank of url within the segment
  (``IndexingChain.processDocument(numDocsInRAM++)`` analog,
  index/DocumentsWriterPerThread.java:274);
- norms: ``SmallFloat.intToByte4(doc_len)``
  (search/similarities/Similarity.java:152-162);
- singleton pulsing: df==1 terms live inline in term_dict, no postings rows
  (Lucene103PostingsWriter.java:564-571);
- all tables are written partitioned by segment_id with dynamic partition
  overwrite → per-segment idempotence; the manifest (segments_N analog,
  index/SegmentInfos.java:55-64) is swapped last, so a crashed build leaves
  the previous commit point intact and ``resume=True`` skips segments the
  manifest already marks done.

Scale notes (the design target is 10^12 docs / 1000 executors):
- segment size is bounded by ``num_segments`` — pick ~input partition count
  so each group ≈ one HDFS-split of text (the 16MB-DWPT analog scaled to
  Spark task memory);
- the single shuffle is on ``pmod(xxhash64(url), num_segments)`` — uniform
  by construction, no skew regardless of content;
- per-segment builds never coordinate; failures re-run one partition.
"""

from __future__ import annotations

import json
import time
from typing import Callable, Iterable

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..analysis.simple import simple_analyze
from ..analysis.tokenizer import analyze as standard_analyze
from ..analysis.html_extract import extract_text
from ..codecs.blocks import encode_positions, encode_term_postings
from ..functions.smallfloat import int_to_byte4
from .schemas import (
    DOCMAP_COLS,
    KIND_BLOCK,
    KIND_DOC,
    KIND_TERM,
    POSTINGS_COLS,
    TERM_DICT_COLS,
    UNIFIED_BUILD_SCHEMA,
)

__all__ = ["build_index", "get_analyzer", "TABLES"]

TABLES = ("docmap", "postings", "term_dict", "field_stats", "segment_manifest")

_ANALYZERS: dict[str, Callable] = {
    "standard": standard_analyze,
    "simple": simple_analyze,
}


def get_analyzer(name: str) -> Callable:
    return _ANALYZERS[name]


def _invert_segment(
    pdf: pd.DataFrame,
    analyzer_name: str,
    stopwords: frozenset[str] | None,
    html_input: bool,
    index_positions: bool,
) -> pd.DataFrame:
    """Build one segment from its documents (runs on an executor)."""
    analyzer = get_analyzer(analyzer_name)
    seg = int(pdf["segment_id"].iloc[0])
    pdf = pdf.sort_values("url", kind="mergesort").reset_index(drop=True)
    n_docs = len(pdf)

    flat_terms: list[str] = []
    flat_docids_parts: list[np.ndarray] = []
    flat_positions_parts: list[np.ndarray] = []
    doc_lens = np.zeros(n_docs, dtype=np.int64)
    texts = pdf["html"] if html_input else pdf["text"]
    for docid, raw in enumerate(texts):
        text = extract_text(raw) if html_input else raw
        toks = analyzer(text, stopwords=stopwords) if text else []
        doc_lens[docid] = len(toks)
        if toks:
            flat_terms.extend(t.term for t in toks)
            flat_docids_parts.append(np.full(len(toks), docid, dtype=np.int64))
            flat_positions_parts.append(
                np.fromiter((t.position for t in toks), dtype=np.int64, count=len(toks))
            )
    norms = int_to_byte4(doc_lens)

    out: dict[str, list] = {f.name: [] for f in UNIFIED_BUILD_SCHEMA.fields}

    def emit(kind: int, **kw) -> None:
        out["kind"].append(kind)
        out["segment_id"].append(seg)
        for f in UNIFIED_BUILD_SCHEMA.fieldNames()[2:]:
            out[f].append(kw.get(f))

    urls = pdf["url"].tolist()
    for docid in range(n_docs):
        emit(
            KIND_DOC,
            docid=docid,
            url=urls[docid],
            doc_len=int(doc_lens[docid]),
            norm=int(norms[docid]),
        )

    if flat_terms:
        docids_flat = np.concatenate(flat_docids_parts)
        positions_flat = np.concatenate(flat_positions_parts)
        codes, uniques = pd.factorize(pd.array(flat_terms))
        # unsigned UTF-8 byte term order (CheckIndex.java:1619-1621)
        uniq_list = list(uniques)
        term_order = sorted(range(len(uniq_list)), key=lambda i: uniq_list[i].encode("utf-8"))
        remap = np.empty(len(uniq_list), dtype=np.int64)
        remap[np.array(term_order)] = np.arange(len(uniq_list))
        codes = remap[codes]
        sorted_terms = [uniq_list[i] for i in term_order]

        order = np.lexsort((positions_flat, docids_flat, codes))
        c = codes[order]
        d = docids_flat[order]
        p = positions_flat[order]
        # run-length over (term, doc) → freq
        change = np.empty(c.size, dtype=bool)
        change[0] = True
        np.logical_or(c[1:] != c[:-1], d[1:] != d[:-1], out=change[1:])
        run_starts = np.flatnonzero(change)
        run_ends = np.concatenate((run_starts[1:], [c.size]))
        run_freqs = run_ends - run_starts
        run_docids = d[run_starts]
        run_codes = c[run_starts]
        # per-term group boundaries over the runs
        tchange = np.empty(run_codes.size, dtype=bool)
        tchange[0] = True
        np.not_equal(run_codes[1:], run_codes[:-1], out=tchange[1:])
        t_starts = np.flatnonzero(tchange)
        t_ends = np.concatenate((t_starts[1:], [run_codes.size]))

        for ts, te in zip(t_starts, t_ends):
            term = sorted_terms[run_codes[ts]]
            t_docids = run_docids[ts:te]
            t_freqs = run_freqs[ts:te]
            t_norms = norms[t_docids]
            df = int(t_docids.size)
            ttf = int(t_freqs.sum())
            if df == 1:
                spos = None
                if index_positions:
                    spos = encode_positions(
                        t_freqs, p[run_starts[ts] : run_ends[te - 1]]
                    )
                emit(
                    KIND_TERM,
                    term=term,
                    df=1,
                    ttf=ttf,
                    n_blocks=0,
                    singleton_docid=int(t_docids[0]),
                    singleton_freq=int(t_freqs[0]),
                    singleton_norm=int(t_norms[0]),
                    singleton_positions=spos,
                )
                continue
            t_positions = None
            if index_positions:
                t_positions = p[run_starts[ts] : run_ends[te - 1]]
            rows = encode_term_postings(t_docids, t_freqs, t_norms, t_positions)
            emit(KIND_TERM, term=term, df=df, ttf=ttf, n_blocks=len(rows))
            for r in rows:
                impacts = r["impacts"]
                emit(
                    KIND_BLOCK,
                    term=term,
                    block_no=r["block_no"],
                    n_docs=r["n_docs"],
                    base_docid=r["base_docid"],
                    first_docid=r["first_docid"],
                    last_docid=r["last_docid"],
                    encoding=r["encoding"],
                    docids_enc=r["docids_enc"],
                    freqs_enc=r["freqs_enc"],
                    norms_enc=r["norms_enc"],
                    positions_enc=r["positions_enc"],
                    impact_freqs=[int(f) for f, _ in impacts],
                    impact_norms=[int(n) for _, n in impacts],
                )
    return pd.DataFrame(out)


def _table_path(index_dir: str, name: str) -> str:
    return f"{index_dir}/{name}"


def build_index(
    spark: SparkSession,
    df: DataFrame,
    index_dir: str,
    *,
    num_segments: int | None = None,
    analyzer: str = "standard",
    stopwords: frozenset[str] | None = None,
    html_input: bool = False,
    index_positions: bool = True,
    resume: bool = False,
) -> dict:
    """Build (or resume) the index at ``index_dir`` from a webtext DataFrame
    with columns (url, text[, html, warc_ts, lang]). Returns build metrics.
    """
    if num_segments is None:
        num_segments = max(df.rdd.getNumPartitions(), 1)

    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")

    cols = ["url", "html"] if html_input else ["url", "text"]
    docs = df.select(*cols).withColumn(
        "segment_id", F.pmod(F.xxhash64("url"), F.lit(num_segments)).cast("int")
    )

    done: set[int] = set()
    if resume:
        try:
            man = spark.read.parquet(_table_path(index_dir, "segment_manifest"))
            done = {
                r["segment_id"]
                for r in man.filter(F.col("status") == "done").collect()
            }
        except Exception:
            done = set()
        if done:
            docs = docs.filter(~F.col("segment_id").isin(list(done)))

    t0 = time.time()
    sw = stopwords
    an, hi, ip = analyzer, html_input, index_positions

    def _builder(pdf: pd.DataFrame) -> pd.DataFrame:
        return _invert_segment(pdf, an, sw, hi, ip)

    unified = (
        docs.groupBy("segment_id")
        .applyInPandas(_builder, schema=UNIFIED_BUILD_SCHEMA)
        .persist()
    )
    try:
        (
            unified.filter(F.col("kind") == KIND_DOC)
            .select(*DOCMAP_COLS)
            .sortWithinPartitions("docid")
            .write.mode("overwrite")
            .partitionBy("segment_id")
            .parquet(_table_path(index_dir, "docmap"))
        )
        (
            unified.filter(F.col("kind") == KIND_TERM)
            .select(*TERM_DICT_COLS)
            .sortWithinPartitions(F.encode("term", "utf-8"))
            .write.mode("overwrite")
            .partitionBy("segment_id")
            .parquet(_table_path(index_dir, "term_dict"))
        )
        (
            unified.filter(F.col("kind") == KIND_BLOCK)
            .select(*POSTINGS_COLS)
            .sortWithinPartitions(F.encode("term", "utf-8"), "block_no")
            .write.mode("overwrite")
            .partitionBy("segment_id")
            .parquet(_table_path(index_dir, "postings"))
        )
    finally:
        unified.unpersist()
    build_secs = time.time() - t0

    # --- stats + manifest (commit point) --------------------------------
    docmap = spark.read.parquet(_table_path(index_dir, "docmap"))
    field_stats = docmap.groupBy("segment_id").agg(
        F.count("*").alias("doc_count"),
        F.sum("doc_len").alias("sum_ttf"),
        F.max("docid").alias("max_docid"),
    )
    field_stats.write.mode("overwrite").parquet(_table_path(index_dir, "field_stats"))

    term_dict = spark.read.parquet(_table_path(index_dir, "term_dict"))
    n_terms = (
        term_dict.groupBy("segment_id").agg(F.count("*").alias("n_terms")).collect()
    )
    n_terms_map = {r["segment_id"]: r["n_terms"] for r in n_terms}
    stats = sorted(
        (r["segment_id"], r["doc_count"], r["sum_ttf"]) for r in field_stats.collect()
    )
    manifest_rows = []
    doc_base = 0
    for seg, cnt, sttf in stats:
        manifest_rows.append(
            (
                int(seg),
                int(cnt),
                int(doc_base),
                "done",
                float(time.time()),
                f"build(analyzer={analyzer},positions={index_positions},"
                f"segments={num_segments},resumed={seg in done})",
                json.dumps(
                    {
                        "n_terms": int(n_terms_map.get(seg, 0)),
                        "sum_ttf": int(sttf),
                        "build_secs": round(build_secs, 3),
                    }
                ),
            )
        )
        doc_base += int(cnt)
    manifest = spark.createDataFrame(
        manifest_rows,
        "segment_id int, n_docs long, doc_base long, status string, "
        "checkpoint_ts double, lineage string, metrics_json string",
    )
    # atomic-ish swap: write to a temp dir then overwrite (Iceberg snapshot
    # commit in production)
    manifest.coalesce(1).write.mode("overwrite").parquet(
        _table_path(index_dir, "segment_manifest")
    )
    total_docs = sum(r[1] for r in manifest_rows)
    return {
        "num_segments": len(manifest_rows),
        "n_docs": total_docs,
        "build_secs": build_secs,
        "docs_per_sec": total_docs / build_secs if build_secs > 0 else float("inf"),
        "resumed_segments": len(done),
    }
