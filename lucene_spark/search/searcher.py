"""Distributed top-k search over the index tables.

Execution model = Lucene's per-leaf search + TopDocs.merge, Spark-first:

- planning (Weight creation) happens on the driver: parse → rewrite →
  multi-term expansion → one tiny predicate-pushdown scan of ``term_dict``
  for global TermStatistics and one of ``field_stats`` for
  CollectionStatistics (IndexSearcher.java:1140-1150 — stats are summed
  across segments BEFORE scoring; per-segment IDF would break rank identity);
- postings for the query terms are read with ``term IN (...)`` pushed into
  the Parquet scan (row-group pruning via the term min/max stats written by
  the builder's sortWithinPartitions) and only the needed columns
  (positions are read ONLY for phrase queries — column pruning);
- singleton (pulsed) terms are joined in as pseudo-blocks from term_dict, so
  the whole plan stays distributed — nothing posting-sized ever reaches the
  driver;
- each segment group evaluates locally (segment.py) and emits ≤ k hits;
  the global answer is ``orderBy(score DESC, docid ASC).limit(k)`` over
  n_segments·k rows — Spark's TakeOrderedAndProject, the TopDocs.merge
  analog (search/TopDocs.java:206-234).

Multi-term queries expand on the driver against term_dict (the rewrite
layer of ScoringRewrite.java / TopTermsRewrite.java):
- PrefixQuery → SHOULD-of-terms (prefix pushed down as startswith);
- WildcardQuery → regex translation (WildcardQuery.java:38 toAutomaton:
  ``*``→any run, ``?``→any char), literal prefix extracted for pushdown;
- RegexpQuery → anchored rlike on term_dict;
- TermRangeQuery → range pushdown with bound inclusivity;
- FuzzyQuery → prefix+length-band pushdown, OSA edit-distance verify, then
  TopTermsBlendedFreqScoringRewrite: per-term boost = similarity, every
  expanded term scores with the blended docFreq = max over the set
  (BlendedTermQuery.adjustFrequencies).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..index.builder import (
    FIELD_SEP,
    _balanced_segment_labels,
    exists_term,
    field_term,
)
from ..index.pseudo import singleton_pseudo_blocks
from ..index.reader import IndexReader, term_in_filter
from ..index.schemas import POSTINGS_COLS, SEARCH_HIT_SCHEMA
from .fuzzy import fuzzy_similarity
from .query import (
    BooleanQuery,
    CombinedFieldQuery,
    ConstantScoreQuery,
    DisjunctionMaxQuery,
    FieldExistsQuery,
    FuzzyQuery,
    MatchAllDocsQuery,
    MatchNoDocsQuery,
    PhrasePrefixQuery,
    PhraseWildcardQuery,
    PhraseQuery,
    PrefixQuery,
    RegexpQuery,
    SynonymQuery,
    TermInSetQuery,
    TermQuery,
    TermRangeQuery,
    WildcardQuery,
    boosted,
    collect_terms,
    contains_block_join,
    parse_query,
    rewrite,
    wildcard_to_regex,
)
from .scorers import build_scorers, scoring_leaves
from .segment import (
    WINDOW_DOCS,
    SegmentContext,
    batch_search_segment,
    search_segment,
)

__all__ = ["Searcher", "wildcard_to_regex"]

# analyzer output never contains NUL, so this term matches no posting —
# the stand-in for an interval slot whose multiterm leaf expanded to
# nothing (the slot stays in place; it simply never has occurrences)
_NO_MATCH_TERM = "\x00no-match"


def _needs_positions(q) -> bool:
    from .query import (
        IntervalAtLeast,
        IntervalFilter,
        IntervalNear,
        IntervalOr,
        MultiPhraseQuery,
        TermAutomatonQuery,
    )

    from .spans import is_span

    return any(
        isinstance(
            leaf,
            (
                PhraseQuery,
                MultiPhraseQuery,
                PhrasePrefixQuery,
                IntervalNear,
                IntervalFilter,
                IntervalAtLeast,
                IntervalOr,
                TermAutomatonQuery,
            ),
        )
        or is_span(leaf)
        for leaf in scoring_leaves(q)
    )


def _needs_payloads(q) -> bool:
    from .query import PayloadScoreQuery
    from .spans import PayloadFilteredTerm, is_span

    def span_has_payload_node(node) -> bool:
        if isinstance(node, PayloadFilteredTerm):
            return True
        for attr in ("clauses",):
            for c in getattr(node, attr, ()):
                if span_has_payload_node(c):
                    return True
        for attr in ("include", "exclude", "match", "big", "little", "clause"):
            c = getattr(node, attr, None)
            if c is not None and is_span(c) and span_has_payload_node(c):
                return True
        return False

    return any(
        isinstance(leaf, PayloadScoreQuery)
        or (is_span(leaf) and span_has_payload_node(leaf))
        for leaf in scoring_leaves(q)
    )


def _slice_bounds(pdf: pd.DataFrame, seg_meta, span):
    """(doc_base, lo, hi) of this task's docid slice — the intersection of
    the segment's stored-docid range with the slice's span window."""
    seg = int(pdf["segment_id"].iloc[0])
    doc_base, min_doc, max_doc = seg_meta[seg]
    if span:
        sl = int(pdf["slice_id"].iloc[0])
        min_doc = max(min_doc, sl * span)
        max_doc = min(max_doc, (sl + 1) * span)
    return doc_base, min_doc, max_doc


def _segment_search_fn(
    pdf: pd.DataFrame, query, scorers, seg_meta, k, prune, after=None,
    span=None, cache_tag=None,
) -> pd.DataFrame:
    doc_base, min_doc, max_doc = _slice_bounds(pdf, seg_meta, span)
    ctx = SegmentContext.from_pdf(
        pdf, scorers, min_doc, max_doc, prune, cache_tag=cache_tag,
        doc_base=doc_base,
    )
    d, s = search_segment(ctx, query, k, after=after)
    return pd.DataFrame(
        {"docid": d + doc_base, "score": s.astype(np.float64)}
    )


class _PerFieldQueryAnalyzer:
    """Query-time PerFieldAnalyzerWrapper (analysis/miscellaneous/
    PerFieldAnalyzerWrapper.java:51): callable like the default analyzer;
    the parser calls ``for_field(field)`` on fielded tokens."""

    def __init__(self, default, per_field: dict):
        self._default = default
        self.per_field = per_field

    def __call__(self, text):
        return self._default(text)

    def for_field(self, field: str):
        return self.per_field.get(field, self._default)


class Searcher:
    def __init__(
        self,
        spark: SparkSession,
        index_dir: str,
        *,
        analyzer: str = "standard",
        stopwords: frozenset[str] | None = None,
        mode: str = "lucene",
        prune: bool = True,
        slice_docs: int | None = None,
        snapshot: str | None = None,
    ):
        self.spark = spark
        self.reader = IndexReader(spark, index_dir, snapshot=snapshot)
        self.mode = mode
        self.prune = prune
        # intra-segment search concurrency (IndexSearcher leaf slices,
        # IndexSearcher.java:106-108): None = auto-pick a docid span so a
        # few merged segments still fan out across every core; 0 = disable
        self.slice_docs = slice_docs
        self._term_stats_cache: dict[str, tuple[int, int]] = {}
        self._expand_cache: dict[object, object] = {}
        from ..index.builder import get_analyzer

        self._analyzer = partial(get_analyzer(analyzer), stopwords=stopwords)
        self._stopwords = stopwords
        # multi-field index: field list + default field from the build's
        # index_meta.json; None for classic single-field indexes
        import json as _json
        import os as _os

        # snapshot readers resolve the build metadata as of the snapshot
        meta_path = _os.path.join(self.reader._meta_root, "index_meta.json")
        self.fields: list[str] | None = None
        self.default_field: str | None = None
        self.index_sort: str | None = None
        if _os.path.exists(meta_path):
            with open(meta_path) as fh:
                meta = _json.load(fh)
            self.fields = list(meta.get("fields") or []) or None
            self.default_field = meta.get("primary") or (
                self.fields[0] if self.fields else None
            )
            self.index_sort = meta.get("index_sort")
            fa = meta.get("field_analyzers") or {}
            if fa:
                # PerFieldAnalyzerWrapper: the query parser analyzes a
                # ``field:token`` with that field's chain (the reference
                # QueryParser consults the wrapper per field)
                self._analyzer = _PerFieldQueryAnalyzer(
                    self._analyzer,
                    {
                        f: partial(get_analyzer(n), stopwords=self._stopwords)
                        for f, n in fa.items()
                    },
                )
        # Open-time metadata, loaded eagerly the way SegmentReader/
        # DirectoryReader.open does (collection statistics and the bloom
        # tables live with the commit point, not with any one query):
        # each is a tiny driver collect, but as lazy properties they fire
        # as separate Spark jobs inside the FIRST search call — a
        # parallelism-independent constant that lands in the query path.
        self.reader.global_stats
        self.reader.term_blooms

    def _fmap(self):
        """(field | None, token) -> internal term key for parse_query."""
        if not self.fields:
            return None
        fields, default = set(self.fields), self.default_field

        def key(field: str | None, token: str) -> str:
            f = field if field in fields else default
            return field_term(f, token)

        return key

    def _slice_span(self) -> int | None:
        """Docid span per search slice, or None for one slice per segment."""
        if self.slice_docs is not None:
            return self.slice_docs or None
        n_seg = len(self.reader.manifest_rows)
        par = self.spark.sparkContext.defaultParallelism
        target = par * 2
        if n_seg >= target:
            return None  # segment-level parallelism already saturates cores
        total = self.reader.global_stats[0]
        span = max(WINDOW_DOCS, -(-total // target))
        return ((span + WINDOW_DOCS - 1) // WINDOW_DOCS) * WINDOW_DOCS

    # --- planning -------------------------------------------------------
    def parse(self, query_str: str):
        return parse_query(query_str, self._analyzer, fmap=self._fmap())

    def parse_simple(self, query_str: str, default_operator: str = "should"):
        """SimpleQueryParser dialect (queryparser/simple/
        SimpleQueryParser.java): lenient end-user syntax — + | - "…"~N
        trailing-* ~N ( ) \\ — that never raises on malformed input."""
        from .simpleparser import simple_parse

        return simple_parse(
            query_str, self._analyzer, default_operator=default_operator
        )

    def search_simple(
        self,
        query_str: str,
        k: int = 10,
        with_url: bool = False,
        default_operator: str = "should",
    ) -> DataFrame:
        return self.search(
            self.parse_simple(query_str, default_operator), k=k,
            with_url=with_url,
        )

    def synonym_graph_query(
        self,
        text: str,
        rules: dict,
        keep_original: bool = True,
        boost: float = 1.0,
        max_paths: int = 256,
    ):
        """Query-time MULTI-WORD synonyms: analyze ``text``, overlay
        {phrase: phrase(s)} rules as a synonym token graph
        (analysis/common/.../synonym/SynonymGraphFilter.java:41 — held
        positions + posLength), and match it with TermAutomatonQuery
        (sandbox/search/TermAutomatonQuery.java:64), whose accepted paths
        may consume different numbers of positions — "machine learning" ≡
        "ml" works in both directions. This is Lucene's own split: index
        time cannot faithfully flatten a graph (SynonymGraphFilter javadoc),
        so multi-word rules apply at query time via the automaton."""
        from ..analysis.synonyms import synonym_graph_paths
        from .query import TermAutomatonQuery

        terms = [t.term for t in self._analyzer(text)]
        if not terms:
            return MatchNoDocsQuery()
        paths = synonym_graph_paths(
            terms, rules, keep_original=keep_original, max_paths=max_paths
        )
        return TermAutomatonQuery(paths=paths, boost=boost)

    def surround_query(self, text: str, max_terms: int = 128):
        """Parse a surround-language query (W/N proximity + boolean, see
        search/surround.py) with truncation terms expanded against this
        index's term dictionary (df-descending, capped — the
        BasicQueryFactory bounded budget)."""
        from .surround import parse_surround

        def expand(pat: str) -> list[str]:
            lit, rx = wildcard_to_regex(pat)
            return self.reader.expand_terms(
                prefix=lit or None, pattern=rx, max_terms=max_terms
            )

        return parse_surround(text, expand=expand)

    def function_match(self, predicate: str, boost: float = 1.0) -> DataFrame:
        """FunctionMatchQuery (queries/src/java/org/apache/lucene/queries/
        function/FunctionMatchQuery.java:86-116): match every doc whose
        doc-value passes the predicate, constant score = boost.
        ``predicate`` is a Spark SQL boolean over ``dv['<name>']`` (the
        DoubleValuesSource + DoublePredicate pair); evaluation is one
        codegen filter over the docmap scan — no postings touched, and a
        missing doc-value never matches (advanceExact semantics: SQL NULL
        comparisons are false). Returns (docid, score) rows."""
        out = (
            self._docmap_global()
            .filter(F.expr(predicate))
            .select("docid", F.lit(float(boost)).alias("score"))
        )
        return self._minus_deletes(out)

    def _minus_deletes(self, out: DataFrame) -> DataFrame:
        """Anti-join live tombstones out of a (docid, ...) result — the
        acceptDocs/liveDocs mask for doc-value-driven queries that never
        touch the postings scan (which applies deletes itself)."""
        if self.reader.deletes is not None:
            bases = [
                (int(s), int(b)) for s, b in self.reader.doc_bases.items()
            ]
            base_df = self.spark.createDataFrame(
                bases, "segment_id int, doc_base long"
            )
            dele = self.reader.deletes.join(
                F.broadcast(base_df), "segment_id"
            ).select((F.col("docid") + F.col("doc_base")).alias("docid"))
            out = out.join(dele, "docid", "left_anti")
        return out

    def doc_values_numbers(
        self, name: str, values: list[float], boost: float = 1.0
    ) -> DataFrame:
        """DocValuesNumbersQuery (sandbox/src/java/org/apache/lucene/
        sandbox/search/DocValuesNumbersQuery.java:55): constant-score match
        of every doc whose named numeric doc-value is IN the given set —
        the dv-side dual of TermInSetQuery, used when the set is too large
        to expand into postings lookups. One codegen ``isin`` filter over
        the docmap scan; a doc missing the value never matches
        (advanceExact). Returns (docid, score)."""
        out = (
            self._docmap_global()
            .filter(F.col("dv").getItem(name).isin([float(v) for v in values]))
            .select("docid", F.lit(float(boost)).alias("score"))
        )
        return self._minus_deletes(out)

    def multi_range(
        self,
        name: str,
        ranges: list[tuple[float, float]],
        boost: float = 1.0,
    ) -> DataFrame:
        """MultiRangeQuery (sandbox/src/java/org/apache/lucene/sandbox/
        search/MultiRangeQuery.java:60): OR of [lo, hi] inclusive ranges
        over one numeric field evaluated in a SINGLE pass. Mirrors the
        reference's rewrite (:169 mergeOverlappingRanges): ranges are
        sorted and overlapping/adjacent ones coalesced driver-side, so the
        scan evaluates the minimal disjunction. Constant score = boost."""
        if not ranges:
            return self._empty_hits().select("docid", "score")
        merged: list[list[float]] = []
        for lo, hi in sorted((float(a), float(b)) for a, b in ranges):
            if merged and lo <= merged[-1][1]:
                merged[-1][1] = max(merged[-1][1], hi)
            else:
                merged.append([lo, hi])
        v = F.col("dv").getItem(name)
        cond = None
        for lo, hi in merged:
            c = (v >= F.lit(lo)) & (v <= F.lit(hi))
            cond = c if cond is None else (cond | c)
        out = (
            self._docmap_global()
            .filter(cond)
            .select("docid", F.lit(float(boost)).alias("score"))
        )
        return self._minus_deletes(out)

    def function_range(
        self,
        value_expr: str,
        lower: float,
        upper: float,
        include_lower: bool = True,
        include_upper: bool = True,
    ) -> DataFrame:
        """FunctionRangeQuery (queries/src/java/org/apache/lucene/queries/
        function/FunctionRangeQuery.java:43 via FunctionValues
        .getRangeScorer): match docs whose ValueSource value falls in
        [lower, upper] and score each match with the VALUE ITSELF — the
        "score by static rank within a band" pattern. ``value_expr`` is a
        Spark SQL double over ``dv['<name>']`` / docmap columns; NULL
        (missing doc-value) never matches."""
        v = F.expr(value_expr)
        lo_ok = v >= F.lit(float(lower)) if include_lower else v > F.lit(float(lower))
        hi_ok = v <= F.lit(float(upper)) if include_upper else v < F.lit(float(upper))
        out = (
            self._docmap_global()
            .filter(lo_ok & hi_ok)
            .select("docid", v.cast("double").alias("score"))
        )
        return self._minus_deletes(out)

    def sort_rescore(
        self,
        query,
        sort_dv: str,
        window: int = 100,
        k: int = 10,
        ascending: bool = False,
    ) -> DataFrame:
        """SortRescorer (core/src/java/org/apache/lucene/search/
        SortRescorer.java:35): run the relevance query, keep its top
        ``window`` hits, then RE-SORT that window by the named numeric
        doc-value (missing values last, ties by docid ASC — the
        FieldSortedHitQueue tie-break) and return the top ``k`` with the
        first-pass score preserved in ``score`` (the reference carries the
        original ScoreDoc.score through). The window is ≤``window`` rows,
        so the second pass is a broadcast-sized join + local sort."""
        first = self.search(query, k=window)
        dm = self._docmap_global().select(
            "docid", F.col("dv").getItem(sort_dv).alias("sort_val")
        )
        key = F.asc_nulls_last("sort_val") if ascending else (
            F.desc_nulls_last("sort_val")
        )
        return (
            first.join(dm, "docid", "left")
            .orderBy(key, F.asc("docid"))
            .limit(k)
            .select("docid", "sort_val", "score")
        )

    def blended_term_query(
        self,
        terms: list[str],
        boosts: list[float] | None = None,
        rewrite_method: str = "dismax",
        tie_breaker: float = 0.01,
    ):
        """BlendedTermQuery (core/src/java/org/apache/lucene/search/
        BlendedTermQuery.java:271-302): every term scores with ARTIFICIAL
        blended statistics — docFreq = max over the set, totalTermFreq =
        the sum (adjustFrequencies) — so cross-field/synonym variants rank
        as one term; the blended TermQueries combine per the rewrite
        method: ``"dismax"`` = DisjunctionMaxQuery with tie-break 0.01
        (DISJUNCTION_MAX_REWRITE, :190) or ``"boolean"`` = SHOULD sum
        (BOOLEAN_REWRITE, :138-148)."""
        if not terms:
            return MatchNoDocsQuery()
        if boosts is None:
            boosts = [1.0] * len(terms)
        stats = self._cached_term_stats(list(terms))
        df = max(stats[t][0] for t in terms)
        ttf = sum(stats[t][1] for t in terms)
        subs = tuple(
            TermQuery(t, boost=b, df_override=df, ttf_override=ttf)
            for t, b in zip(terms, boosts)
        )
        if rewrite_method == "dismax":
            return DisjunctionMaxQuery(subs, tie_breaker=tie_breaker)
        if rewrite_method == "boolean":
            return BooleanQuery(should=subs)
        raise ValueError(f"unknown rewrite_method {rewrite_method!r}")

    def common_terms_query(
        self,
        text: str,
        max_term_frequency: float = 0.01,
        low_freq_occur: str = "should",
        high_freq_occur: str = "should",
        low_freq_min_should_match: float = 0.0,
        high_freq_min_should_match: float = 0.0,
        low_freq_boost: float = 1.0,
        high_freq_boost: float = 1.0,
    ):
        """CommonTermsQuery (queries/src/java/org/apache/lucene/queries/
        CommonTermsQuery.java:105-205): classify each analyzed term by its
        ACTUAL docFreq — high-frequency iff ``df > maxTermFrequency`` (when
        ≥1, an absolute count) or ``df > ceil(maxTermFrequency * maxDoc)``
        — then score low-freq terms as a required clause and high-freq
        terms as an optional boost, so stopword-like terms never gate
        recall but still contribute. Single term → plain TermQuery; all
        terms high-freq → the high-freq group becomes MUST (the
        slow-query guard, CommonTermsQuery.java:176-182)."""
        import math

        terms = [t.term for t in self._analyzer(text)]
        if not terms:
            return MatchNoDocsQuery()
        if len(terms) == 1:
            return TermQuery(terms[0])
        stats = self._cached_term_stats(terms)
        max_doc = self.reader.global_stats[0]
        # (int) Math.ceil(maxTermFrequency * (float) maxDoc) — float32 mul
        cutoff = int(
            math.ceil(float(np.float32(max_term_frequency) * np.float32(max_doc)))
        )
        low, high = [], []
        for t in terms:
            df = stats[t][0]
            if (max_term_frequency >= 1.0 and df > max_term_frequency) or (
                df > cutoff
            ):
                high.append(TermQuery(t))
            else:
                low.append(TermQuery(t))

        def _msm(v: float, n_opt: int) -> int:
            if v >= 1.0 or v == 0.0:
                return int(v)
            return int(math.floor(v * n_opt + 0.5))  # Java Math.round

        low_msm = (
            _msm(low_freq_min_should_match, len(low))
            if low_freq_occur == "should" and low
            else 0
        )
        high_msm = (
            _msm(high_freq_min_should_match, len(high))
            if high_freq_occur == "should" and high
            else 0
        )
        if not low and high_msm == 0 and high_freq_occur != "must":
            high_freq_occur = "must"  # conjunction guard
        must, should = [], []
        if low:
            grp = (
                BooleanQuery(must=tuple(low))
                if low_freq_occur == "must"
                else BooleanQuery(should=tuple(low), min_should_match=low_msm)
            )
            must.append(boosted(grp, low_freq_boost))
        if high:
            grp = (
                BooleanQuery(must=tuple(high))
                if high_freq_occur == "must"
                else BooleanQuery(should=tuple(high), min_should_match=high_msm)
            )
            should.append(boosted(grp, high_freq_boost))
        return BooleanQuery(must=tuple(must), should=tuple(should))

    def combined_field_query(
        self,
        text: str,
        field_weights: dict[str, float] | None = None,
        boost: float = 1.0,
    ):
        """BM25F over ``field_weights`` (default: every field, weight 1.0)
        for each analyzed token of ``text`` — tokens combine as SHOULD
        clauses (CombinedFieldQuery.Builder.addTerm per token)."""
        if not self.fields:
            raise ValueError("combined_field_query needs a multi-field index")
        fw = field_weights or {f: 1.0 for f in self.fields}
        items = sorted(fw.items())
        toks = self._analyzer(text)
        leaves = tuple(
            CombinedFieldQuery(
                terms=tuple(field_term(f, t.term) for f, _w in items),
                exists_terms=tuple(exists_term(f) for f, _w in items),
                weights=tuple(float(w) for _f, w in items),
                boost=boost,
            )
            for t in toks
        )
        if not leaves:
            return MatchNoDocsQuery()
        if len(leaves) == 1:
            return leaves[0]
        return BooleanQuery(should=leaves)

    def _docmap_global(self) -> DataFrame:
        bases = [(int(s), int(b)) for s, b in self.reader.doc_bases.items()]
        base_df = self.spark.createDataFrame(bases, "segment_id int, doc_base long")
        return (
            self.reader.docmap.join(F.broadcast(base_df), "segment_id")
            .withColumn("docid", F.col("docid") + F.col("doc_base"))
            .drop("doc_base")
        )

    def _cached_term_stats(self, terms: list[str]) -> dict[str, tuple[int, int]]:
        missing = [t for t in terms if t not in self._term_stats_cache]
        if missing:
            got = self.reader.term_stats(missing)
            for t in missing:
                self._term_stats_cache[t] = got.get(t, (0, 0))
        return {t: self._term_stats_cache[t] for t in terms}

    def _cache_tag(self) -> str:
        """Index-generation tag for the worker-level filter LRU: digest of
        the manifest rows (the commit point), so any append/merge/rebuild
        — a new segments_N in Lucene terms — keys a fresh cache namespace
        with no cross-executor coordination."""
        tag = self.__dict__.get("_cache_tag_v")
        if tag is None:
            import hashlib

            sig = repr(self.reader.manifest_rows).encode()
            tag = (
                self.reader.index_dir
                + "#"
                + hashlib.md5(sig).hexdigest()[:16]
                + f"#{self.mode}"
            )
            self.__dict__["_cache_tag_v"] = tag
        return tag

    def _seg_meta(self) -> dict[int, tuple[int, int, int]]:
        """segment_id → (doc_base, min_docid, max_docid+1) — doc_base remaps
        local→global ids (0 when ids are already global, i.e. post-merge);
        the [min,max) stored-docid range bounds MatchAll and the block-max
        window array."""
        bounds = self.reader.segment_bounds
        out: dict[int, tuple[int, int, int]] = {}
        for r in self.reader.manifest_rows:
            seg = int(r["segment_id"])
            lo, hi = bounds.get(seg, (0, -1))
            out[seg] = (int(r["doc_base"]), lo, hi + 1)
        return out

    # --- multi-term expansion (ScoringRewrite / TopTermsRewrite layer) ---
    def expand_multiterm(self, q, max_terms: int = 128):
        if isinstance(
            q,
            (
                PrefixQuery,
                WildcardQuery,
                RegexpQuery,
                TermRangeQuery,
                FuzzyQuery,
                PhrasePrefixQuery,
                PhraseWildcardQuery,
            ),
        ):
            # memoize per (node, cap): expansion is a term_dict collect (a
            # Spark job) and the index is immutable for this reader's life
            key = (q, max_terms)
            got = self._expand_cache.get(key)
            if got is None:
                got = self._expand_leaf(q, max_terms)
                self._expand_cache[key] = got
            return got
        if isinstance(q, BooleanQuery):
            return BooleanQuery(
                must=tuple(self.expand_multiterm(c, max_terms) for c in q.must),
                should=tuple(self.expand_multiterm(c, max_terms) for c in q.should),
                must_not=tuple(self.expand_multiterm(c, max_terms) for c in q.must_not),
                min_should_match=q.min_should_match,
            )
        if isinstance(q, DisjunctionMaxQuery):
            return DisjunctionMaxQuery(
                disjuncts=tuple(self.expand_multiterm(c, max_terms) for c in q.disjuncts),
                tie_breaker=q.tie_breaker,
            )
        if isinstance(q, ConstantScoreQuery):
            return ConstantScoreQuery(
                query=self.expand_multiterm(q.query, max_terms), boost=q.boost
            )
        from .query import ToChildBlockJoinQuery, ToParentBlockJoinQuery

        if isinstance(q, ToParentBlockJoinQuery):
            return ToParentBlockJoinQuery(
                self.expand_multiterm(q.child, max_terms),
                self.expand_multiterm(q.parents, max_terms),
                q.score_mode,
                q.boost,
            )
        if isinstance(q, ToChildBlockJoinQuery):
            return ToChildBlockJoinQuery(
                self.expand_multiterm(q.parent, max_terms),
                self.expand_multiterm(q.parents, max_terms),
                q.boost,
            )
        from .query import ParentChildrenBlockJoinQuery

        if isinstance(q, ParentChildrenBlockJoinQuery):
            return ParentChildrenBlockJoinQuery(
                self.expand_multiterm(q.child, max_terms),
                self.expand_multiterm(q.parents, max_terms),
                q.parent_docid,
                q.boost,
            )
        if isinstance(q, FieldExistsQuery):
            # constant-score over the per-field existence list
            # (FieldExistsQuery.java:39 — norms-existence there)
            return ConstantScoreQuery(
                query=TermQuery(exists_term(q.field)), boost=q.boost
            )
        from .query import (
            IntervalAtLeast,
            IntervalFilter,
            IntervalNear,
            IntervalOr,
        )

        if isinstance(q, IntervalNear):
            return self._expand_interval_leaves(q)
        if isinstance(q, IntervalOr):
            return IntervalOr(
                tuple(self._expand_side(s) for s in q.sources),
                q.pivot,
                q.boost,
            )
        if isinstance(q, IntervalFilter):
            return IntervalFilter(
                self._expand_side(q.source),
                self._expand_side(q.reference),
                q.kind,
                q.pivot,
                q.boost,
            )
        if isinstance(q, IntervalAtLeast):
            return self._expand_atleast(q)
        return q

    def _expand_side(self, side):
        """Expand one IntervalFilter side (an IntervalNear or an
        IntervalAtLeast)."""
        from .query import IntervalAtLeast, IntervalFilter, IntervalOr

        if isinstance(side, IntervalAtLeast):
            return self._expand_atleast(side)
        if isinstance(side, IntervalOr):
            return IntervalOr(
                tuple(self._expand_side(s) for s in side.sources),
                side.pivot,
                side.boost,
            )
        if isinstance(side, IntervalFilter):
            return IntervalFilter(
                self._expand_side(side.source),
                self._expand_side(side.reference),
                side.kind,
                side.pivot,
                side.boost,
            )
        return self._expand_interval_leaves(side)

    def _expand_atleast(self, q):
        """Term-dict expansion inside Intervals.atLeast sources. A source
        whose multiterm leaf expands to nothing keeps its place in the
        source list (the reference's per-source intervals() just returns
        no intervals for it) as a never-matching sentinel term."""
        from .query import IntervalAtLeast, IntervalNear

        if not q._has_multiterm():
            return q
        new_sources = []
        for s in q.sources:
            near = s if isinstance(s, IntervalNear) else IntervalNear((s,))
            ex = self._expand_interval_leaves(near)
            if not isinstance(ex, IntervalNear):  # impossible slot
                new_sources.append(_NO_MATCH_TERM)
            elif isinstance(s, IntervalNear):
                new_sources.append(ex)
            else:
                new_sources.append(ex.terms[0])
        return dataclasses.replace(q, sources=tuple(new_sources))

    def _expand_interval_leaves(self, q):
        """Resolve Intervals.prefix / Intervals.wildcard slot leaves
        (Intervals.java:236,255) against the term dict: each becomes the
        Intervals.or tuple of its matching terms (sorted — deterministic
        weight). Zero matches → MatchNoDocsQuery is NOT correct here (the
        slot is conjunctive), so the slot becomes impossible and the whole
        source matches nothing; more than max_expansions matches raises,
        like the reference's too-many-terms IllegalStateException."""
        from .query import (
            IntervalPrefix,
            IntervalWildcard,
            MatchNoDocsQuery,
        )

        if not q._has_multiterm():
            return q

        def expand(leaf):
            if isinstance(leaf, IntervalPrefix):
                terms = self.reader.expand_terms(
                    prefix=leaf.prefix, max_terms=leaf.max_expansions + 1
                )
            elif isinstance(leaf, IntervalWildcard):
                lit, rx = wildcard_to_regex(leaf.pattern)
                terms = self.reader.expand_terms(
                    prefix=lit or None, pattern=rx,
                    max_terms=leaf.max_expansions + 1,
                )
            else:
                return (leaf,)
            if len(terms) > leaf.max_expansions:
                raise ValueError(
                    f"interval leaf {leaf!r} expands to more than "
                    f"{leaf.max_expansions} terms"
                )
            return tuple(sorted(terms))

        new_slots = []
        for s in q.terms:
            items = s if isinstance(s, tuple) else (s,)
            alts: list = []
            for it in items:
                alts.extend(expand(it))
            if not alts:
                return MatchNoDocsQuery()
            new_slots.append(tuple(alts) if len(alts) > 1 else alts[0])
        return dataclasses.replace(q, terms=tuple(new_slots))

    def _expand_leaf(self, q, max_terms: int):
        if isinstance(q, PrefixQuery):
            terms = self.reader.expand_terms(prefix=q.prefix, max_terms=max_terms)
            if not terms:
                return MatchNoDocsQuery()
            return BooleanQuery(should=tuple(TermQuery(t, q.boost) for t in terms))
        if isinstance(q, WildcardQuery):
            lit, rx = wildcard_to_regex(q.pattern)
            terms = self.reader.expand_terms(
                prefix=lit or None, pattern=rx, max_terms=max_terms
            )
            if not terms:
                return MatchNoDocsQuery()
            return BooleanQuery(should=tuple(TermQuery(t, q.boost) for t in terms))
        if isinstance(q, RegexpQuery):
            rx = q.pattern
            if not rx.startswith("^"):
                rx = "^" + rx
            if not rx.endswith("$"):
                rx = rx + "$"
            if self.fields:
                # regex applies to the token; anchor it inside the default
                # field's namespace
                import re as _re

                pfx = field_term(self.default_field, "")
                rx = "^" + _re.escape(pfx) + rx[1:]
            terms = self.reader.expand_terms(pattern=rx, max_terms=max_terms)
            if not terms:
                return MatchNoDocsQuery()
            return BooleanQuery(should=tuple(TermQuery(t, q.boost) for t in terms))
        if isinstance(q, TermRangeQuery):
            terms = self.reader.expand_terms(
                low=q.lower,
                high=q.upper,
                include_low=q.include_lower,
                include_high=q.include_upper,
                max_terms=max_terms,
            )
            if not terms:
                return MatchNoDocsQuery()
            return BooleanQuery(should=tuple(TermQuery(t, q.boost) for t in terms))
        if isinstance(q, PhrasePrefixQuery):
            # final slot = prefix expansion, sorted for a deterministic
            # MultiPhraseQuery weight (PhraseWildcardQuery.java:155-163
            # rewrite-to-MultiPhraseQuery path)
            from .query import MultiPhraseQuery

            terms = self.reader.expand_terms(
                prefix=q.prefix, max_terms=min(max_terms, q.max_expansions)
            )
            if not terms:
                return MatchNoDocsQuery()
            slots = tuple((t,) for t in q.terms) + (tuple(sorted(terms)),)
            return MultiPhraseQuery(slots=slots, boost=q.boost)
        if isinstance(q, PhraseWildcardQuery):
            # wildcard at ANY slot → per-slot dict expansion, then the
            # MultiPhraseQuery rewrite (PhraseWildcardQuery.java:155-163)
            from .query import MultiPhraseQuery

            slots: list[tuple[str, ...]] = []
            for s in q.slots:
                if "*" in s or "?" in s:
                    lit, rx = wildcard_to_regex(s)
                    terms = self.reader.expand_terms(
                        prefix=lit or None,
                        pattern=rx,
                        max_terms=min(max_terms, q.max_expansions),
                    )
                    if not terms:
                        return MatchNoDocsQuery()
                    slots.append(tuple(sorted(terms)))
                else:
                    slots.append((s,))
            return MultiPhraseQuery(slots=tuple(slots), boost=q.boost)
        return self._expand_fuzzy(q, max_terms)  # FuzzyQuery (only leaf left)

    def _fuzzy_matches(
        self, target: str, max_edits: int, prefix_length: int, ns: str = ""
    ) -> list[tuple[str, int, int]]:
        """All within-max_edits term-dict entries of ``target`` as
        (term, edits, df): prefix + length-band pushdown, OSA verification
        executor-side (the shared FuzzyTermsEnum analog)."""
        pl = min(prefix_length, len(target))
        band = (
            len(ns) + max(0, len(target) - max_edits),
            len(ns) + len(target) + max_edits,
        )
        td = self.reader.term_dict
        td = td.filter(F.col("term").startswith(ns + target[:pl]))
        td = td.filter(F.length("term").between(*band))
        tgt, me, ns_len = target, max_edits, len(ns)

        @F.pandas_udf("int")
        def osa_udf(terms: pd.Series) -> pd.Series:
            from lucene_spark.search.fuzzy import osa_distance as _osa

            return terms.map(lambda t: _osa(tgt, t[ns_len:], me))

        rows = (
            td.groupBy("term")
            .agg(F.sum("df").alias("df"))
            .withColumn("edits", osa_udf("term"))
            .filter(F.col("edits") <= me)
            .collect()
        )
        return [(r["term"], int(r["edits"]), int(r["df"])) for r in rows]

    def fuzzy_like_this(
        self,
        query_text: str,
        max_num_terms: int = 50,
        max_edits: int = 1,
        prefix_length: int = 0,
        max_variants_per_term: int = 10,
    ):
        """FuzzyLikeThisQuery (sandbox/src/java/org/apache/lucene/sandbox/
        queries/FuzzyLikeThisQuery.java:192-333): for each analyzed query
        term, enumerate fuzzy variants and keep the best
        MAX_VARIANTS_PER_TERM by similarity boost; the per-source idf
        factor uses the SOURCE term's docFreq, falling back to the
        integer-average of all variant dfs when the source is absent
        (:235-240); each kept variant scores
        ``boost² · ClassicSimilarity.idf(df, numDocs)`` (:248) and the
        global best ``maxNumTerms`` variants become SHOULD TermQueries
        whose df and ttf are overridden to 1 (newTermQuery:258-274), so
        rare-typo variants don't dominate through their own idf.

        Deviation (documented): the reference nests each source term's
        variants in an inner SHOULD group; this flattens to one SHOULD
        list sorted by term — identical scores up to float association,
        which the flat term-ascending order fixes deterministically for
        the SQL oracle."""
        import math

        seen: set[str] = set()
        terms: list[str] = []
        for t in self._analyzer(query_text):
            if t.term not in seen:
                seen.add(t.term)
                terms.append(t.term)
        n_docs = int(self.reader.global_stats[0])
        selected: list[tuple[float, str]] = []
        for src in terms:
            variants = self._fuzzy_matches(src, max_edits, prefix_length)
            if not variants:
                continue
            df0 = next((df for t, e, df in variants if t == src), 0)
            if df0 == 0:
                df0 = sum(df for _t, _e, df in variants) // len(variants)
            idf = math.log((n_docs + 1) / (df0 + 1)) + 1.0
            scored = sorted(
                ((fuzzy_similarity(e, t, src), t) for t, e, _df in variants),
                key=lambda x: (-x[0], x[1]),
            )[:max_variants_per_term]
            selected.extend((b * b * idf, t) for b, t in scored)
        if not selected:
            return MatchNoDocsQuery()
        selected.sort(key=lambda x: (-x[0], x[1]))
        selected = selected[:max_num_terms]
        selected.sort(key=lambda x: x[1])
        return BooleanQuery(
            should=tuple(
                TermQuery(t, boost=s, df_override=1, ttf_override=1)
                for s, t in selected
            )
        )

    def _expand_fuzzy(self, q: FuzzyQuery, max_terms: int):
        """Prefix+length-band pushdown, then OSA verification EXECUTOR-side
        (a pandas UDF over the filtered term_dict scan), so only true
        within-max_edits terms are ever collected — no pre-verification
        candidate cap to silently drop matches on a large vocabulary, the
        distributed analog of FuzzyQuery's automaton-intersects-term-dict
        (search/FuzzyQuery.java:52); ranking + max_terms cap happen after,
        as in TopTermsBlendedFreqScoringRewrite."""
        target = q.term
        ns = ""  # field namespace: edit distance applies to the token only
        if FIELD_SEP in target:
            f, target = target.split(FIELD_SEP, 1)
            ns = f + FIELD_SEP
        matched = self._fuzzy_matches(target, q.max_edits, q.prefix_length, ns)
        if not matched:
            return MatchNoDocsQuery()
        # TopTermsRewrite heap: best boost first, then highest df
        matched.sort(key=lambda m: (-fuzzy_similarity(m[1], m[0], target), -m[2], m[0]))
        matched = matched[:max_terms]
        blended_df = max(df for _t, _e, df in matched)
        return BooleanQuery(
            should=tuple(
                TermQuery(
                    t,
                    boost=q.boost * fuzzy_similarity(e, t, target),
                    df_override=blended_df,
                )
                for t, e, _df in matched
            )
        )

    def _prepared(self, query, max_terms: int = 128, analyzer: str | None = None):
        if isinstance(query, str):
            if analyzer is not None:
                # per-call analyzer override: analyze THIS query with the
                # named chain (the query-side of per-document language
                # routing — pick the chain per query language; index-side
                # routing is build_index lang_col/lang_analyzers)
                from functools import partial as _partial

                from ..index.builder import get_analyzer

                query = parse_query(
                    query,
                    _partial(get_analyzer(analyzer), stopwords=self._stopwords),
                    fmap=self._fmap(),
                )
            else:
                query = self.parse(query)
        elif analyzer is not None:
            # a Query object carries its terms already analyzed — silently
            # ignoring the override would mask a caller bug
            raise ValueError(
                "analyzer= applies only to string queries; "
                f"got {type(query).__name__}"
            )
        return rewrite(self.expand_multiterm(query, max_terms))

    def _postings_blocks(
        self,
        terms: list[str],
        need_positions: bool,
        span: int | None = None,
        need_payloads: bool = False,
    ) -> DataFrame:
        # column pruning: positions/payloads reach the parquet scan only for
        # queries that consume them (ReadSchema stays narrow otherwise)
        drop = set()
        if not need_positions:
            drop.add("positions_enc")
        if not need_payloads:
            drop.add("payloads_enc")
        cols = [c for c in POSTINGS_COLS if c not in drop]
        blocks = self.reader.postings.filter(
            term_in_filter("term", terms)
        ).select(*cols)
        singles = singleton_pseudo_blocks(
            self.reader.term_dict.filter(term_in_filter("term", terms)),
            need_positions,
        ).select(*cols)
        out = blocks.unionByName(singles)
        if self.reader.deletes is not None:
            from ..index.deletes import delete_pseudo_blocks

            out = out.unionByName(
                delete_pseudo_blocks(self.reader.deletes).select(*cols)
            )
        # Bloom segment-skip (BloomFilteringPostingsFormat semantics,
        # index/blooms.py): segments whose bloom rules out EVERY query term
        # can contribute no postings rows to this scan, so dropping them is
        # a plan-only change — segment_id is a partition column and the isin
        # prunes whole directories. False positives only add segments back.
        from ..index.blooms import bloom_candidate_segments

        cand = bloom_candidate_segments(
            self.reader.term_blooms,
            [int(r["segment_id"]) for r in self.reader.manifest_rows],
            terms,
        )
        if cand is not None:
            out = out.filter(F.col("segment_id").isin(cand))
        if span:
            # replicate each block to every docid slice its [first,last]
            # range overlaps; slice tasks mask decoded docs to their range
            out = out.withColumn(
                "slice_id",
                F.explode(
                    F.sequence(
                        (F.col("first_docid") / span).cast("int"),
                        (F.col("last_docid") / span).cast("int"),
                    )
                ),
            )
        else:
            out = out.withColumn("slice_id", F.lit(0))
        return out

    def _balanced_grouping(self, blocks: DataFrame, seg_meta, span):
        """Group block rows by (segment, slice) with every group on its OWN
        shuffle partition.

        ``groupBy(segment_id, slice_id)`` hashes G leaf-slice groups into
        ``spark.sql.shuffle.partitions`` buckets; birthday collisions put
        2-3 groups on one core and none on another, and the straggler sets
        the stage time at EVERY parallelism level (the dominant query-stage
        scaling loss measured on this engine). Fix = the builder's balanced
        labels applied query-side: a driver-planned gkey per group whose
        Murmur3 hash lands on a distinct residue mod G, then
        ``repartition(G, gkey)`` (explicit numPartitions — AQE never
        coalesces it) so the exchange assigns exactly one leaf slice per
        task and the scheduler balances the waves. Beyond the map-literal
        budget (at web scale, G ≫ cores), plain hash grouping is already
        balanced by the law of large numbers."""
        pairs: list[tuple[int, int]] = []
        widths: list[int] = []
        for seg in sorted(seg_meta):
            _base, lo, hi = seg_meta[seg]
            if hi <= lo:
                continue
            if span:
                for sl in range(lo // span, (hi - 1) // span + 1):
                    pairs.append((seg, sl))
                    widths.append(
                        min((sl + 1) * span, hi) - max(sl * span, lo)
                    )
            else:
                pairs.append((seg, 0))
                widths.append(hi - lo)
        n = len(pairs)
        if n == 0 or n > 8192:
            return blocks.groupBy("segment_id", "slice_id")
        # LPT task order: pairs[i] executes as partition i (labels below put
        # group i on residue i, and the scheduler launches partitions in
        # order), so widest slices first lets the short partial slices fill
        # the ragged final wave instead of starting one — measured ~6% of
        # the batched-query stage at 8 cores with 66 groups (the makespan
        # loss when G/cores has a fractional tail). Stable on ties, so
        # full-width slices keep (segment, slice) order.
        order = sorted(range(n), key=lambda i: -widths[i])
        pairs = [pairs[i] for i in order]
        stride = max(sl for _seg, sl in pairs) + 1
        labels = _balanced_segment_labels(n)
        entries: list = []
        for i, (seg, sl) in enumerate(pairs):
            entries.append(F.lit(seg * stride + sl))
            entries.append(F.lit(labels[i]))
        key = F.col("segment_id").cast("long") * F.lit(stride) + F.col("slice_id")
        # coalesce fallback: an unplanned (segment, slice) pair keeps its own
        # distinct group key rather than collapsing into a null group
        gkey = F.coalesce(F.create_map(*entries)[key], key).cast("int")
        blocks = blocks.withColumn("gkey", gkey)
        return blocks.repartition(n, "gkey").groupBy("gkey")

    def _make_scorers(self, queries: list) -> dict:
        all_terms = sorted(set().union(*(collect_terms(q) for q in queries)))
        doc_count, sum_ttf = self.reader.global_stats
        if doc_count == 0:
            return {}
        field_stats = None
        if self.fields:
            # per-field CollectionStatistics from the existence lists
            # (df = docCount(field), ttf = sumTotalTermFreq(field))
            est = self._cached_term_stats([exists_term(f) for f in self.fields])
            field_stats = {f: est[exists_term(f)] for f in self.fields}
        tstats = self._cached_term_stats(all_terms)
        return build_scorers(
            queries, tstats, doc_count, sum_ttf, self.mode, field_stats=field_stats
        )

    # --- search ---------------------------------------------------------
    def search(
        self,
        query,
        k: int = 10,
        with_url: bool = False,
        after: tuple[float, int] | None = None,
        analyzer: str | None = None,
    ) -> DataFrame:
        query = self._prepared(query, analyzer=analyzer)

        if isinstance(query, MatchNoDocsQuery):
            return self._empty_hits()
        if isinstance(query, MatchAllDocsQuery):
            dm = self._docmap_global().withColumn(
                "score", F.lit(float(query.boost))
            )
            out = dm.select("docid", "score")
            if self.reader.deletes is not None:
                # live-docs check, still at DataFrame level (anti-join on the
                # globalized delete list)
                bases = [
                    (int(s), int(b)) for s, b in self.reader.doc_bases.items()
                ]
                base_df = self.spark.createDataFrame(
                    bases, "segment_id int, doc_base long"
                )
                dele = (
                    self.reader.deletes.join(F.broadcast(base_df), "segment_id")
                    .select((F.col("docid") + F.col("doc_base")).alias("docid"))
                )
                out = out.join(dele, "docid", "left_anti")
            if after is not None:
                out = out.filter(F.col("docid") > int(after[1]))
            out = out.orderBy(F.asc("docid")).limit(k)
            return self._maybe_url(out, with_url)

        terms = sorted(collect_terms(query))
        if not terms:
            return self._empty_hits()
        scorers = self._make_scorers([query])
        if not scorers and not terms:
            return self._empty_hits()
        seg_meta = self._seg_meta()
        # doc blocks never cross segments but may straddle docid slices:
        # block-join trees evaluate on whole segments
        span = None if contains_block_join(query) else self._slice_span()
        blocks = self._postings_blocks(
            terms, _needs_positions(query), span,
            need_payloads=_needs_payloads(query),
        )

        fn = partial(
            _segment_search_fn,
            query=query,
            scorers=scorers,
            seg_meta=seg_meta,
            k=k,
            prune=self.prune,
            after=after,
            span=span,
            cache_tag=self._cache_tag(),
        )
        hits = self._balanced_grouping(blocks, seg_meta, span).applyInPandas(
            lambda pdf: fn(pdf), schema=SEARCH_HIT_SCHEMA
        )
        out = hits.orderBy(F.desc("score"), F.asc("docid")).limit(k)
        return self._maybe_url(out, with_url)

    def search_many(self, queries: dict[str, object], k: int = 10) -> DataFrame:
        """Batched top-k for many queries in ONE Spark job.

        This is the engine's query-throughput path: postings for the union
        of all query terms are scanned once, each segment evaluates every
        query against its per-term decode cache, and a single window takes
        top-k per query — amortizing job/scan overhead across the batch
        (the Spark analog of Lucene's SearchTask loop throughput,
        benchmark/byTask/tasks/SearchTask.java).

        Returns (query_id, docid, score), k rows per query, ordered within
        each query by (score DESC, docid ASC).
        """
        from pyspark.sql.window import Window

        parsed: dict[str, object] = {}
        for qid, q in queries.items():
            q = self._prepared(q)
            if not isinstance(q, (MatchNoDocsQuery, MatchAllDocsQuery)):
                parsed[qid] = q
        all_terms = sorted(
            set().union(*(collect_terms(q) for q in parsed.values())) if parsed else set()
        )
        if not all_terms:
            return self.spark.createDataFrame(
                [], "query_id string, docid long, score double"
            )
        scorers = self._make_scorers(list(parsed.values()))
        seg_meta = self._seg_meta()
        span = (
            None
            if any(contains_block_join(q) for q in parsed.values())
            else self._slice_span()
        )
        need_positions = any(_needs_positions(q) for q in parsed.values())
        need_payloads = any(_needs_payloads(q) for q in parsed.values())
        blocks = self._postings_blocks(
            all_terms, need_positions, span, need_payloads=need_payloads
        )
        prune = self.prune
        # broadcast the (large) query batch + scorer table: deserialized once
        # per python worker and reused across its tasks, instead of being
        # unpickled from the task command for every (segment, slice) group
        bc = self.spark.sparkContext.broadcast((parsed, scorers, seg_meta))

        tag = self._cache_tag()

        def many_fn(pdf: pd.DataFrame) -> pd.DataFrame:
            b_parsed, b_scorers, b_meta = bc.value
            doc_base, min_doc, max_doc = _slice_bounds(pdf, b_meta, span)
            ctx = SegmentContext.from_pdf(
                pdf, b_scorers, min_doc, max_doc, prune, cache_tag=tag,
                doc_base=doc_base,
            )
            qids, docids, scores = batch_search_segment(ctx, b_parsed, k)
            return pd.DataFrame(
                {"query_id": qids, "docid": docids + doc_base, "score": scores}
            )

        hits = self._balanced_grouping(blocks, seg_meta, span).applyInPandas(
            many_fn, schema="query_id string, docid long, score double"
        )
        w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("docid"))
        return (
            hits.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= k)
            .drop("rk")
        )

    def search_all(self, query) -> DataFrame:
        """All matching (docid, score) rows, distributed (no top-k cut) —
        the building block for field-sort / rescoring / function scoring."""
        query = self._prepared(query)
        if isinstance(query, MatchNoDocsQuery):
            return self._empty_hits()
        if isinstance(query, MatchAllDocsQuery):
            return self._docmap_global().select(
                "docid", F.lit(float(query.boost)).alias("score")
            )
        terms = sorted(collect_terms(query))
        if not terms:
            return self._empty_hits()
        scorers = self._make_scorers([query])
        seg_meta = self._seg_meta()
        span = None if contains_block_join(query) else self._slice_span()
        blocks = self._postings_blocks(
            terms, _needs_positions(query), span,
            need_payloads=_needs_payloads(query),
        )
        fn = partial(
            _segment_search_fn,
            query=query,
            scorers=scorers,
            seg_meta=seg_meta,
            k=2**31,
            prune=False,
            span=span,
        )
        return self._balanced_grouping(blocks, seg_meta, span).applyInPandas(
            lambda pdf: fn(pdf), schema=SEARCH_HIT_SCHEMA
        )

    def search_sorted_by(
        self,
        query,
        sort_col: str = "doc_len",
        ascending: bool = False,
        k: int = 10,
        after: tuple | None = None,
    ) -> DataFrame:
        """Top-k by an arbitrary stored field instead of relevance — the
        TopFieldCollector analog (search/TopFieldCollector.java): matching
        doc set joined to the docmap column, ``orderBy(field, docid)`` →
        Spark's TakeOrderedAndProject. Returns (docid, <sort_col>).

        On an index built with ``index_sort`` matching the requested sort,
        the query EARLY-TERMINATES per segment (TopFieldCollector
        canEarlyTerminate): docid order within a segment IS the sort order,
        so only the k lowest matching docids per segment survive to the
        docmap join — the join input shrinks from |matches| to segments·k
        rows, and the global cut stays a TakeOrderedAndProject. BOTH paths
        tie-break equal field values by url ASC — the stable doc key, so
        the result is identical whichever path runs AND invariant to the
        index's physical layout (segment count / docid assignment), unlike
        Lucene's docid tie-break which differs between a sorted and an
        unsorted index of the same corpus.

        ``after=(field_value, docid)`` pages past a previous page's last hit
        — the FieldDoc form of searchAfter (IndexSearcher.searchAfter with a
        Sort, search/FieldComparator analog): strictly worse in the sort
        order; ties resolved by the anchor doc's url so paging follows the
        same url-secondary total order.

        ``sort_col="dv:<name>"`` sorts by the named numeric doc-value
        stored at build time (``build_index(doc_values=...)``, the
        SortField(name, Type.DOUBLE) analog); docs missing the value sort
        after every present value in either direction (nulls-last, Lucene's
        missing-value default). Output column is ``dv_<name>``."""
        requested = sort_col
        if sort_col.startswith("dv:"):
            dv_name = sort_col.split(":", 1)[1]
            out_name = f"dv_{dv_name}"
            sort_expr = F.col("dv").getItem(dv_name).alias(out_name)
            sort_col = out_name
        else:
            sort_expr = F.col(sort_col)
        hits = self.search_all(query).select("docid")
        if after is not None:
            av, ad = float(after[0]), int(after[1])
            if ad < 0:
                # sentinel anchor (docid -1): before every url
                a_url = ""
            else:
                a_row = (
                    self._docmap_global()
                    .filter(F.col("docid") == ad)
                    .select("url")
                    .first()
                )
                if a_row is None:
                    raise ValueError(
                        f"searchAfter anchor docid {ad} not in index"
                    )
                a_url = a_row["url"]
            dm_a = self._docmap_global().select("docid", sort_expr, "url")
            strictly = (
                (F.col(sort_col) > av) if ascending else (F.col(sort_col) < av)
            )
            tie = (F.col(sort_col) == av) & (F.col("url") > a_url)
            hits = (
                hits.join(dm_a, "docid").filter(strictly | tie).select("docid")
            )
        if self.index_sort == requested and not ascending and after is None:
            from pyspark.sql.window import Window as _W

            seg_df = self.spark.createDataFrame(
                [
                    (int(s), int(b) + int(mn), int(b) + int(mx))
                    for s, (b, mn, mx) in self._seg_meta().items()
                ],
                "segment_id int, lo long, hi long",
            )
            h = hits.join(
                F.broadcast(seg_df),
                (hits.docid >= F.col("lo")) & (hits.docid < F.col("hi")),
            )
            rn = F.row_number().over(
                _W.partitionBy("segment_id").orderBy(F.asc("docid"))
            )
            top = h.withColumn("_rn", rn).filter(F.col("_rn") <= k)
            dm = self._docmap_global().select("docid", sort_expr, "url")
            out = top.join(dm, "docid")
            return (
                out.orderBy(F.desc_nulls_last(sort_col), F.asc("url"))
                .limit(k)
                .select("docid", sort_col)
            )
        dm = self._docmap_global().select("docid", sort_expr, "url")
        out = hits.join(dm, "docid")
        order = (
            F.asc_nulls_last(sort_col) if ascending else F.desc_nulls_last(sort_col)
        )
        return (
            out.orderBy(order, F.asc("url")).limit(k).select("docid", sort_col)
        )

    def rescore(
        self,
        query,
        rescore_query,
        k: int = 10,
        window: int = 100,
        weight: float = 1.0,
    ) -> DataFrame:
        """QueryRescorer (search/QueryRescorer.java): re-rank the top
        ``window`` first-pass hits with ``first + weight·second`` where
        ``second`` is the rescore query's score on those docs (0 when it
        doesn't match). The window is driver-sized (≤ window rows); the
        second pass joins it against the rescore query's distributed
        scores."""
        first = self.search(query, k=window).withColumnRenamed("score", "s1")
        second = self.search_all(rescore_query).withColumnRenamed("score", "s2")
        return (
            first.join(second, "docid", "left")
            .select(
                "docid",
                (
                    F.col("s1") + F.lit(float(weight)) * F.coalesce("s2", F.lit(0.0))
                ).alias("score"),
            )
            .orderBy(F.desc("score"), F.asc("docid"))
            .limit(k)
        )

    def indri_and(
        self,
        terms: list[str],
        boosts: list[float] | None = None,
        k: int = 10,
        mu: float = 2000.0,
    ) -> DataFrame:
        """IndriAndQuery (core/src/java/org/apache/lucene/search/
        IndriAndQuery.java + IndriAndScorer.java:45-73): the boost-weighted
        MEAN of per-term Indri Dirichlet log-probabilities over the UNION
        of the terms' postings — a term absent from a doc contributes its
        SMOOTHING score, TermScorer.smoothingScore(:98-104) = score(freq=0,
        that doc's norm) = ln(mu·cp/(dl+mu)). This is Indri's #combine:
        every union doc gets a full query likelihood, so documents missing
        a rare term are penalized by that term's collection probability
        instead of being excluded (AND semantics in log-space).

        Requires ``mode='indri_dirichlet'`` (the reference query only
        accepts IndriScorer children). Spark shape: one postings scan per
        term through the standard scorer path, full-outer-joined on docid
        (the union), smoothing filled JVM-side from the docmap's norm byte
        — no Python in the per-doc path; top-k is a
        TakeOrderedAndProject."""
        from ..functions.smallfloat import BYTE4_DECODE_TABLE
        from .query import TermQuery

        if self.mode != "indri_dirichlet":
            raise ValueError("indri_and requires mode='indri_dirichlet'")
        boosts = [float(b) for b in (boosts or [1.0] * len(terms))]
        ns = self.default_field + FIELD_SEP if self.fields else ""
        stats = self._cached_term_stats([ns + t for t in terms])
        _, sum_ttf = self.reader.global_stats
        sum_ttf = max(sum_ttf, 1)
        joined = None
        for i, t in enumerate(terms):
            df_t = self.search_all(TermQuery(t)).withColumnRenamed(
                "score", f"s_{i}"
            )
            joined = (
                df_t if joined is None else joined.join(df_t, "docid", "full")
            )
        qdl_arr = F.array(*[F.lit(float(v)) for v in BYTE4_DECODE_TABLE])
        out = (
            joined.join(self._docmap_global().select("docid", "norm"), "docid")
            .withColumn(
                "qdl",
                F.element_at(
                    qdl_arr, F.col("norm").bitwiseAND(F.lit(255)) + F.lit(1)
                ),
            )
        )
        num = F.lit(0.0)
        for i, (t, b) in enumerate(zip(terms, boosts)):
            _, ttf = stats[ns + t]
            mu_cp = mu * (ttf / sum_ttf)
            smooth = F.log(F.lit(mu_cp) / (F.col("qdl") + F.lit(mu)))
            num = num + F.lit(b) * F.coalesce(F.col(f"s_{i}"), smooth)
        bsum = sum(boosts)
        return (
            out.select("docid", (num / F.lit(bsum)).alias("score"))
            .orderBy(F.desc("score"), F.asc("docid"))
            .limit(k)
        )

    def function_score(
        self, query, score_expr: str, k: int = 10
    ) -> DataFrame:
        """FunctionScoreQuery (queries/function/FunctionScoreQuery.java:44):
        replace the relevance score with a SQL expression over ``score`` and
        docmap columns (url, doc_len, norm) — Spark SQL is the
        DoubleValuesSource. Ranking is by the NEW score, so evaluation is
        exhaustive-then-top-k (a FunctionScoreQuery cannot use relevance
        pruning either)."""
        hits = self.search_all(query)
        dm = self._docmap_global()
        return (
            hits.join(dm, "docid")
            .withColumn("fscore", F.expr(score_expr))
            .select("docid", F.col("fscore").alias("score"))
            .orderBy(F.desc("score"), F.asc("docid"))
            .limit(k)
        )

    def distance_feature(
        self,
        query,
        field: str,
        origin: float,
        pivot: float,
        weight: float = 1.0,
        k: int = 10,
    ) -> DataFrame:
        """DistanceFeatureQuery over a numeric doc-value
        (document/LongDistanceFeatureQuery.java:121,265-266, built by
        LongField.newDistanceFeatureQuery): the feature clause scores

            weight · pivot / (pivot + |value − origin|)

        and is combined as the canonical BooleanQuery SHOULD next to the
        matching ``query`` (the boost-by-recency/proximity pattern), so a
        hit's score is ``query_score + feature``; a doc missing the
        doc-value gets no feature contribution (the SHOULD simply doesn't
        match, LongDistanceFeatureQuery's DocValuesIterator skip).

        Lucene prunes via point-tree distance buckets; here the feature is
        one whole-stage-codegen expression over the docmap join the scoring
        already pays, and ranking by the combined score is
        exhaustive-then-top-k like function_score."""
        if not (pivot > 0):
            raise ValueError(f"pivotDistance must be > 0, got {pivot}")
        expr = (
            f"score + coalesce({float(weight)!r} * ({float(pivot)!r}"
            f" / ({float(pivot)!r} + abs(dv['{field}'] - {float(origin)!r})))"
            ", 0.0)"
        )
        return self.function_score(query, expr, k=k)

    def expression_score(
        self,
        query,
        source: str,
        bindings: dict[str, str] | None = None,
        k: int = 10,
    ) -> DataFrame:
        """Expression-language FunctionScoreQuery (expressions/Expression.java,
        js/JavascriptCompiler.java): ``source`` is a Lucene-expressions string
        (``_score * (prio > 100 ? 1.5 : 1.0) + ln(1 + prio)``), compiled once
        to a Spark SQL arithmetic tree — Catalyst is the bytecode compiler,
        so the expression runs JVM-side inside whole-stage codegen.

        Bindings (expressions/Bindings.java): ``_score`` is pre-bound to the
        relevance score; any other free variable defaults to the numeric
        doc-value of the same name (``DoubleValuesSource.fromDoubleField``),
        overridable via ``bindings`` with any SQL over the docmap columns."""
        from .expressions import compile_expression

        expr = compile_expression(source)
        b = {"_score": "score"}
        for v in expr.variables:
            if v == "_score":
                continue
            b[v] = (bindings or {}).get(v, f"dv['{v}']")
        return self.function_score(query, expr.sql(b), k=k)

    def covering(
        self, queries: list, min_match_expr: str, k: int = 10
    ) -> DataFrame:
        """CoveringQuery (queries/CoveringQuery.java:47): a doc matches when
        at least ``minimumNumberMatch`` of the clauses match it, where the
        threshold is a PER-DOC long — here a Spark SQL expression over the
        docmap columns (url, doc_len, norm), the LongValuesSource.fromLongField
        analog. Score = sum of the matching clauses' scores, accumulated
        left-associatively in clause order (CoveringScorer sums subscorers in
        iteration order), so double-mode scores are bit-comparable to an
        oracle using the same chain."""
        per_clause = [
            self.search_all(q).select(
                "docid", F.col("score").alias(f"_cs{i}")
            )
            for i, q in enumerate(queries)
        ]
        joined = per_clause[0]
        for d in per_clause[1:]:
            joined = joined.join(d, "docid", "outer")
        score = F.lit(0.0)
        matched = F.lit(0)
        for i in range(len(queries)):
            c = F.col(f"_cs{i}")
            score = score + F.coalesce(c, F.lit(0.0))
            matched = matched + c.isNotNull().cast("int")
        dm = self._docmap_global()
        out = (
            joined.withColumn("score", score)
            .withColumn("_matched", matched)
            .join(dm, "docid")
            .filter(F.col("_matched") >= F.expr(min_match_expr))
            .select("docid", "score")
        )
        return out.orderBy(F.desc("score"), F.asc("docid")).limit(k)

    def count(self, query) -> int:
        """Total hit count (TotalHitCountCollector analog) — per-segment
        docid-set sizes summed, no scoring, no top-k."""
        query = self._prepared(query)
        if isinstance(query, MatchNoDocsQuery):
            return 0
        if isinstance(query, MatchAllDocsQuery):
            n = self.reader.global_stats[0]
            if self.reader.deletes is not None:
                n -= self.reader.deletes.distinct().count()
            return n
        terms = sorted(collect_terms(query))
        if not terms:
            return 0
        seg_meta = self._seg_meta()
        span = None if contains_block_join(query) else self._slice_span()
        blocks = self._postings_blocks(
            terms, _needs_positions(query), span,
            need_payloads=_needs_payloads(query),
        )

        tag = self._cache_tag()

        def count_fn(pdf: pd.DataFrame) -> pd.DataFrame:
            # docid-set algebra only (TotalHitCountCollector): no scorers,
            # no top-k, no float work
            from .segment import _SegmentSearcher

            doc_base, min_doc, max_doc = _slice_bounds(pdf, seg_meta, span)
            ctx = SegmentContext.from_pdf(
                pdf, {}, min_doc, max_doc, False, cache_tag=tag,
                doc_base=doc_base,
            )
            d = _SegmentSearcher(ctx, 0).matching_docs(query)
            d = d[(d >= min_doc) & (d < max_doc)]
            if ctx.deleted is not None and d.size:
                d = d[np.isin(d, ctx.deleted, invert=True)]
            return pd.DataFrame({"n": [int(d.size)]})

        rows = (
            self._balanced_grouping(blocks, seg_meta, span)
            .applyInPandas(count_fn, schema="n long")
            .agg(F.sum("n").alias("n"))
            .collect()
        )
        return int(rows[0]["n"] or 0)

    def explain(self, query, docid: int) -> dict:
        """IndexSearcher.explain analog (search/IndexSearcher.java explain →
        Weight.explain): a nested explanation tree for why ``docid`` scores
        what it scores — {match, value, description, details}. Every node's
        value comes from the REAL evaluator restricted to the doc (not a
        re-derivation), so ``explain(q, d)["value"]`` equals the score
        ``search(q)`` would give d, clause by clause. A debugging API: one
        small job per query node."""
        q = self._prepared(query)
        return self._explain_node(q, int(docid))

    def _node_value(self, q, docid: int):
        rows = (
            self.search_all(q).filter(F.col("docid") == docid).collect()
        )
        return float(rows[0]["score"]) if rows else None

    def _explain_node(self, q, docid: int) -> dict:
        name = type(q).__name__
        details: list[dict] = []
        if isinstance(q, BooleanQuery):
            for c in q.must:
                details.append({**self._explain_node(c, docid), "clause": "MUST"})
            for c in q.should:
                details.append({**self._explain_node(c, docid), "clause": "SHOULD"})
            for c in q.must_not:
                sub = self._explain_node(c, docid)
                details.append(
                    {
                        "match": not sub["match"],
                        "value": 0.0,
                        "description": f"MUST_NOT({sub['description']})",
                        "clause": "MUST_NOT",
                        "details": [sub],
                    }
                )
            desc = (
                f"BooleanQuery(must={len(q.must)}, should={len(q.should)}, "
                f"must_not={len(q.must_not)}, msm={q.min_should_match}): "
                "sum of matching clauses"
            )
        elif isinstance(q, DisjunctionMaxQuery):
            for c in q.disjuncts:
                details.append(self._explain_node(c, docid))
            desc = f"DisjunctionMax(tie={q.tie_breaker}): max + tie·others"
        elif isinstance(q, ConstantScoreQuery):
            details.append(self._explain_node(q.query, docid))
            desc = f"ConstantScore(boost={q.boost})"
        else:
            term = getattr(q, "term", None) or getattr(q, "terms", None)
            desc = f"{name}({term!r})" if term is not None else name
        v = self._node_value(q, docid)
        return {
            "match": v is not None,
            "value": v if v is not None else 0.0,
            "description": desc,
            "details": details,
        }

    def count_with_relation(
        self, query, total_hits_threshold: int = 1_000
    ) -> tuple[int, str]:
        """TotalHits semantics (search/TotalHits.java, IndexSearcher
        TOTAL_HITS_THRESHOLD=1000 default — IndexSearcher.java:100): an exact
        count is only promised up to the threshold; past it the collector
        reports a LOWER BOUND and stops counting. Returns ``(value,
        relation)`` with relation ``"EQUAL_TO"`` or
        ``"GREATER_THAN_OR_EQUAL_TO"``. The distributed count is already
        scoring-free set algebra (one long per slice), so unlike Lucene
        there is nothing left to early-terminate — the threshold here fixes
        the REPORTING contract callers rely on when swapping engines."""
        n = self.count(query)  # per-slice docid-set sizes, no scoring
        if n <= total_hits_threshold:
            return n, "EQUAL_TO"
        return total_hits_threshold, "GREATER_THAN_OR_EQUAL_TO"

    def _maybe_url(self, hits: DataFrame, with_url: bool) -> DataFrame:
        if not with_url:
            return hits
        # hits is ≤ k rows: broadcast it against the docmap scan
        dm = self._docmap_global().select("docid", "url")
        return (
            dm.join(F.broadcast(hits), "docid")
            .select("docid", "url", "score")
            .orderBy(F.desc("score"), F.asc("docid"))
        )

    def _empty_hits(self) -> DataFrame:
        return self.spark.createDataFrame([], SEARCH_HIT_SCHEMA)
