"""Read-side view of an index directory (DirectoryReader analog).

Collection-global statistics are summed across segments exactly like
``IndexSearcher.collectionStatistics`` sums across leaves (reference:
lucene/core/src/java/org/apache/lucene/search/IndexSearcher.java:1140-1150) —
IDF/avgdl are collection-wide, so any per-segment shortcut would break rank
identity with the reference.

All driver-side collects here are *planning-sized*: per-query terms (a
handful of rows from term_dict via predicate-pushdown parquet scans) and the
segment manifest (one row per segment). Postings are never collected.
"""

from __future__ import annotations

from functools import cached_property

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .schemas import DOCMAP_COLS, KIND_BLOCK, KIND_DOC, KIND_TERM, POSTINGS_COLS, TERM_DICT_COLS

__all__ = ["IndexReader"]


def _sql_term_literal(t: str) -> str:
    """One Spark-SQL single-quoted string literal for ``t``: backslash
    and quote use C-style escapes, ASCII control chars (e.g. the \\x1f
    multi-field separator of field_term) use \\uXXXX — both are standard
    Spark string-literal escape processing."""
    out = []
    for ch in t:
        o = ord(ch)
        if ch == "\\":
            out.append("\\\\")
        elif ch == "'":
            out.append("\\'")
        elif o < 0x20 or o == 0x7F:
            out.append(f"\\u{o:04X}")
        else:
            out.append(ch)
    return "'" + "".join(out) + "'"


def term_in_filter(col: str, terms: list[str]):
    """``col IN (...)`` as ONE parsed SQL expression instead of
    ``Column.isin(*terms)``.

    isin builds one py4j literal object per term — ~0.6 s of driver
    round-trips for a 4k-term batched query set, paid per search_many
    call at EVERY parallelism level (a scaling-efficiency constant, not
    just latency). A single F.expr string is one round-trip and parses
    JVM-side to the same In/InSet predicate with the same parquet
    pushdown. Multi-field term keys (``field\\x1ftoken``) and arbitrary
    user terms are covered via string-literal escapes; the only
    unsupported configuration is the legacy
    ``spark.sql.parser.escapedStringLiterals=true`` mode, detected via
    the active session and routed back to isin."""
    try:
        from pyspark.sql import SparkSession

        sess = SparkSession.getActiveSession()
        if sess is not None and (
            sess.conf.get("spark.sql.parser.escapedStringLiterals", "false")
            == "true"
        ):
            return F.col(col).isin(terms)
    except Exception:
        pass
    quoted = ",".join(_sql_term_literal(t) for t in terms)
    return F.expr(f"`{col}` IN ({quoted})")


class IndexReader:
    """The physical layout is ONE partitioned tree ``data/kind=K/segment_id=N``
    (a single write+commit at build time); the three logical tables are
    partition-pruned views of it."""

    def __init__(
        self, spark: SparkSession, index_dir: str, snapshot: str | None = None
    ):
        self.spark = spark
        self.index_dir = index_dir
        # point-in-time commit (DirectoryReader.open(IndexCommit)): commit
        # metadata resolves from the snapshot dir, data partitions are
        # shared with the live index (see index/snapshots.py)
        self.snapshot = snapshot
        self._meta_root = (
            f"{index_dir}/snapshots/{snapshot}" if snapshot else index_dir
        )

    def _table(self, name: str) -> DataFrame:
        root = self._meta_root if name in (
            "segment_manifest", "field_stats", "deletes", "dv_updates"
        ) else self.index_dir
        return self.spark.read.parquet(f"{root}/{name}")

    @cached_property
    def _data(self) -> DataFrame:
        """The unified data tree, gated on the manifest's segment list: a
        crash between a data write and the manifest swap (append or in-place
        merge) leaves orphan partition dirs, and the manifest — the commit
        point (segments_N semantics) — is what defines index membership.
        segment_id is a partition column, so the isin prunes directories."""
        live = [int(r["segment_id"]) for r in self.manifest_rows]
        return self._table("data").filter(F.col("segment_id").isin(live))

    @cached_property
    def docmap(self) -> DataFrame:
        base = self._select_compat(
            self._data.filter(F.col("kind") == KIND_DOC), DOCMAP_COLS
        )
        upd = self.dv_updates
        if upd is None:
            return base
        # overlay numeric doc-value updates (IndexWriter.updateNumericDocValue
        # semantics, index/ReadersAndUpdates.java docValuesGen): latest gen
        # per (segment, docid, name) wins over the stored dv map. Applied
        # HERE so every docmap consumer — sorts, function scores, merges,
        # compaction — sees updated values, and a merge/compaction rewrite
        # bakes them into its output docmap (Lucene merges fold DV gens in
        # the same way).
        from pyspark.sql.window import Window as _W

        latest = (
            upd.withColumn(
                "_rk",
                F.row_number().over(
                    _W.partitionBy("segment_id", "docid", "name").orderBy(
                        F.desc("gen")
                    )
                ),
            )
            .filter(F.col("_rk") == 1)
            .groupBy("segment_id", "docid")
            .agg(
                F.map_from_entries(
                    F.collect_list(F.struct("name", "value"))
                ).alias("_upd")
            )
        )
        joined = base.join(latest, ["segment_id", "docid"], "left")
        kept = F.map_filter(
            F.coalesce(
                F.col("dv"), F.create_map().cast("map<string,double>")
            ),
            lambda k, _v: ~F.array_contains(F.map_keys(F.col("_upd")), k),
        )
        new_dv = F.when(F.col("_upd").isNull(), F.col("dv")).otherwise(
            F.map_concat(kept, F.col("_upd"))
        )
        return joined.withColumn("dv", new_dv).select(*DOCMAP_COLS)

    @cached_property
    def dv_updates(self) -> DataFrame | None:
        """Numeric doc-value update deltas (segment_id, docid, name, value,
        gen), or None when the index has none (one os.path check)."""
        import os

        if not os.path.isdir(f"{self._meta_root}/dv_updates"):
            return None
        live = [int(r["segment_id"]) for r in self.manifest_rows]
        return self._table("dv_updates").filter(F.col("segment_id").isin(live))

    @staticmethod
    def _select_compat(df: DataFrame, cols: list[str]) -> DataFrame:
        """Select ``cols``, filling columns an older-format index lacks with
        typed nulls (schema evolution: payloads/doc-values were added after
        v1 — old indexes stay readable, the new queries just see nulls)."""
        from .schemas import UNIFIED_BUILD_SCHEMA

        have = set(df.columns)
        types = {f.name: f.dataType for f in UNIFIED_BUILD_SCHEMA.fields}
        return df.select(
            *[
                F.col(c)
                if c in have
                else F.lit(None).cast(types[c]).alias(c)
                for c in cols
            ]
        )

    @cached_property
    def postings(self) -> DataFrame:
        return self._select_compat(
            self._data.filter(F.col("kind") == KIND_BLOCK), POSTINGS_COLS
        )

    @cached_property
    def term_dict(self) -> DataFrame:
        return self._select_compat(
            self._data.filter(F.col("kind") == KIND_TERM), TERM_DICT_COLS
        )

    @cached_property
    def field_stats(self) -> DataFrame:
        """Per-segment stats, gated on the manifest's segment list like the
        data tree: a compaction/merge may stage stats rows for segments it
        has not committed yet (the manifest write IS the commit), and those
        rows must not leak into CollectionStatistics."""
        live = [int(r["segment_id"]) for r in self.manifest_rows]
        return self._table("field_stats").filter(F.col("segment_id").isin(live))

    @cached_property
    def deletes(self) -> DataFrame | None:
        """Live-docs delete list (segment_id, stored docid), or None when the
        index has no deletions (the common case costs one os.path check)."""
        import os

        if not os.path.isdir(f"{self._meta_root}/deletes"):
            return None
        live = [int(r["segment_id"]) for r in self.manifest_rows]
        return self._table("deletes").filter(F.col("segment_id").isin(live))

    @cached_property
    def segment_bounds(self) -> dict[int, tuple[int, int]]:
        """segment_id → (min_docid, max_docid) of stored docids."""
        return {
            int(r["segment_id"]): (int(r["min_docid"]), int(r["max_docid"]))
            for r in self.field_stats.collect()
        }

    @cached_property
    def doc_counts(self) -> dict[int, int]:
        """segment_id → live doc_count (the bloom staleness fingerprint)."""
        return {
            int(r["segment_id"]): int(r["doc_count"])
            for r in self.field_stats.select("segment_id", "doc_count").collect()
        }

    @cached_property
    def term_blooms(self) -> dict:
        """Per-segment term Bloom filters (index/blooms.py), {} when the
        index has none. Advisory only: consulted to PRUNE segment partitions
        from term scans, never to assert membership."""
        from .blooms import load_term_blooms

        return load_term_blooms(self.spark, self.index_dir, self.doc_counts)

    @cached_property
    def manifest_rows(self) -> list[dict]:
        rows = self._table("segment_manifest").collect()
        return sorted((r.asDict() for r in rows), key=lambda r: r["segment_id"])

    @cached_property
    def doc_bases(self) -> dict[int, int]:
        return {r["segment_id"]: r["doc_base"] for r in self.manifest_rows}

    @cached_property
    def global_stats(self) -> tuple[int, int]:
        """(doc_count, sum_total_term_freq) across all segments."""
        row = self.field_stats.agg(
            F.sum("doc_count").alias("dc"), F.sum("sum_ttf").alias("sttf")
        ).collect()[0]
        return int(row["dc"] or 0), int(row["sttf"] or 0)

    def term_stats(self, terms: list[str]) -> dict[str, tuple[int, int]]:
        """Global (docFreq, totalTermFreq) per term (TermStatistics analog)."""
        if not terms:
            return {}
        rows = (
            self.term_dict.filter(term_in_filter("term", terms))
            .groupBy("term")
            .agg(F.sum("df").alias("df"), F.sum("ttf").alias("ttf"))
            .collect()
        )
        return {r["term"]: (int(r["df"]), int(r["ttf"])) for r in rows}

    def expand_terms(
        self,
        prefix: str | None = None,
        pattern: str | None = None,
        low: str | None = None,
        high: str | None = None,
        include_low: bool = True,
        include_high: bool = True,
        length_band: tuple[int, int] | None = None,
        max_terms: int = 128,
    ) -> list[str]:
        """MultiTermQuery expansion (PrefixQuery/RegexpQuery/TermRangeQuery →
        SHOULD terms, ScoringRewrite/TopTermsRewrite analog). Ranked by
        global df desc so a cap keeps the highest-df terms
        (TopTermsRewrite.java heap semantics)."""
        return [t for t, _df in self.expand_terms_df(
            prefix=prefix, pattern=pattern, low=low, high=high,
            include_low=include_low, include_high=include_high,
            length_band=length_band, max_terms=max_terms,
        )]

    def expand_terms_df(
        self,
        prefix: str | None = None,
        pattern: str | None = None,
        low: str | None = None,
        high: str | None = None,
        include_low: bool = True,
        include_high: bool = True,
        length_band: tuple[int, int] | None = None,
        max_terms: int = 128,
    ) -> list[tuple[str, int]]:
        """expand_terms returning (term, global df) pairs — FuzzyQuery's
        blended-frequency rewrite needs the dfs of the whole expanded set.
        prefix/low/high push into the parquet scan (row-group min/max on the
        sorted term column); pattern/length filter after the scan."""
        td = self.term_dict
        if prefix is not None and prefix:
            td = td.filter(F.col("term").startswith(prefix))
        if pattern is not None:
            td = td.filter(F.col("term").rlike(pattern))
        if low is not None:
            td = td.filter(
                F.col("term") >= low if include_low else F.col("term") > low
            )
        if high is not None:
            td = td.filter(
                F.col("term") <= high if include_high else F.col("term") < high
            )
        if length_band is not None:
            td = td.filter(F.length("term").between(*length_band))
        rows = (
            td.groupBy("term")
            .agg(F.sum("df").alias("df"))
            .orderBy(F.desc("df"), F.asc("term"))
            .limit(max_terms)
            .collect()
        )
        return [(r["term"], int(r["df"])) for r in rows]

    def singleton_rows(self, terms: list[str]) -> list[dict]:
        """Pulsed (df==1) postings for the given terms, tiny by construction."""
        if not terms:
            return []
        rows = (
            self.term_dict.filter(
                F.col("term").isin(terms) & F.col("singleton_docid").isNotNull()
            )
            .select(
                "segment_id",
                "term",
                "singleton_docid",
                "singleton_freq",
                "singleton_norm",
                "singleton_positions",
            )
            .collect()
        )
        return [r.asDict() for r in rows]
