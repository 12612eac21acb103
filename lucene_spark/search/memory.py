"""MemoryIndex — a single-document, in-memory index scored with its own
one-document statistics.

Reimplements the contract of the memory module
(memory/src/java/org/apache/lucene/memory/MemoryIndex.java:78 — "a
high-performance single-document main memory index [...] float score =
index.search(query)", the percolator/alerting building block): the one
document IS the whole index, so docCount=1, every present term has df=1,
and avgFieldLength is that document's own length. ``search`` returns the
query's BM25 score against that index (0.0 for no match), exactly what an
IndexSearcher over a one-doc index returns — pytest holds that invariant
against this engine's real Searcher, float32 both sides.

The evaluator is the same pure-Python AST walker the test oracle uses
(oracle/pyindex.py — full boolean/msm/NOT, exact+sloppy phrase, synonym,
dismax, intervals, spans), so every query shape the engine parses can be
percolated, not just the term/AND/phrase subset the Monitor presearcher
covers (search/monitor.py).

Distributed percolation (``memory_index_matches``) is mapInPandas over the
document stream: queries parse once per task, each batch row gets a one-doc
MemoryIndex, output is the matching (doc, query) pairs. Per-partition
imperative logic is the POINT here (the reference runs candidate queries
against a single-doc RAM index the same way); at web scale, pre-filter
candidates per document with monitor_matches (the presearcher economics)
and percolate only those — this operator is the exact refinement stage.
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["MemoryIndex", "memory_index_matches", "percolate"]


class MemoryIndex:
    """One document, indexed in memory; ``search(query)`` scores the parsed
    or string query against it with single-document statistics."""

    def __init__(
        self,
        text: str,
        *,
        analyzer: str = "standard",
        stopwords: frozenset[str] | None = None,
    ):
        from ..index.builder import get_analyzer
        from ..oracle.pyindex import PyIndex

        an = get_analyzer(analyzer)
        self._analyzer_fn = an
        self._stopwords = stopwords
        self._idx = PyIndex(stopwords=stopwords, analyzer=an)
        self._idx.add(0, text)

    def _parsed(self, query):
        if isinstance(query, str):
            from .query import parse_query

            def an(text, stopwords=None, **kw):
                return self._analyzer_fn(text, stopwords=self._stopwords, **kw)

            return parse_query(query, an)
        return query

    def search(self, query) -> float:
        """BM25 score of the one document, 0.0 when it doesn't match —
        MemoryIndex.search(Query) semantics."""
        q = self._parsed(query)
        q = self._idx.expand_multiterm(q)
        scores = self._idx.eval_query(q)
        return float(scores.get(0, 0.0))

    def matches(self, query) -> bool:
        q = self._parsed(query)
        q = self._idx.expand_multiterm(q)
        return 0 in self._idx.matching_docs(q)


def memory_index_matches(
    docs: DataFrame,
    queries: dict[str, object],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    analyzer: str = "standard",
    stopwords: frozenset[str] | None = None,
) -> DataFrame:
    """Percolate every registered query (query_id -> query string or AST)
    against every document through one-doc MemoryIndexes; returns the
    matching (id_col, query_id) pairs. Map-only — no shuffle; each task
    parses the query set once and streams its document batches through."""
    items = sorted(queries.items())
    out_schema = T.StructType(
        [
            docs.schema[id_col],
            T.StructField("query_id", T.StringType(), False),
        ]
    )

    def run(batches: Iterable) -> Iterable:
        import pandas as pd

        parsed = None
        for pdf in batches:
            ids, qids = [], []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                mi = MemoryIndex(
                    text if text is not None else "",
                    analyzer=analyzer,
                    stopwords=stopwords,
                )
                if parsed is None:
                    parsed = [(qid, mi._parsed(q)) for qid, q in items]
                for qid, q in parsed:
                    if mi.matches(q):
                        ids.append(did)
                        qids.append(qid)
            yield pd.DataFrame({id_col: ids, "query_id": qids})

    return docs.select(id_col, text_col).mapInPandas(run, schema=out_schema)


def _needs_full_scan(q) -> bool:
    """True when term-based candidate selection could MISS a match for this
    query — it must then be checked against every document (the reference
    presearcher's ANYTOKEN path, TermFilteredPresearcher.java:79: queries
    that cannot be term-filtered index a catch-all token).

    Safe by construction: only node types known to be fully covered by
    their collect_terms() keep the term filter; anything else (multi-term
    expansion, match-all, field-exists, unknown nodes) scans."""
    from .query import (
        BooleanQuery,
        ConstantScoreQuery,
        DisjunctionMaxQuery,
        MultiPhraseQuery,
        PhraseQuery,
        SynonymQuery,
        TermInSetQuery,
        TermQuery,
    )

    if isinstance(q, (TermQuery, PhraseQuery, MultiPhraseQuery, SynonymQuery,
                      TermInSetQuery)):
        return False
    if isinstance(q, ConstantScoreQuery):
        return _needs_full_scan(q.query)
    if isinstance(q, DisjunctionMaxQuery):
        return any(_needs_full_scan(c) for c in q.queries)
    if isinstance(q, BooleanQuery):
        if not q.must and not q.should:
            return True  # pure negation matches docs with NO query terms
        return any(_needs_full_scan(c) for c in (*q.must, *q.should))
    return True


def percolate(
    docs: DataFrame,
    queries: dict[str, object],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    analyzer: str = "standard",
    stopwords: frozenset[str] | None = None,
) -> DataFrame:
    """The full Monitor match flow (monitor/Monitor.java match path +
    TermFilteredPresearcher.java:79): SELECT candidate (document, query)
    pairs by joining the document's distinct terms against the queries'
    term sets JVM-side, then REFINE only the candidates with one-doc
    MemoryIndexes. Returns (id_col, query_id, score).

    Scale shape: the presearcher join touches (distinct doc terms) x
    (broadcast query-term table) and the refine stage evaluates each doc
    against only its candidate queries — the same economics that let the
    reference monitor thousands of registered queries per document. Queries
    the term filter cannot cover (match-all, pure negation, multi-term
    expansion) fall back to checking every document, exactly like the
    reference's ANYTOKEN.
    """
    from functools import partial

    from ..index.builder import get_analyzer
    from .query import collect_terms, parse_query

    spark = docs.sparkSession
    an_fn = get_analyzer(analyzer)
    an = partial(an_fn, stopwords=stopwords)
    parsed = {
        qid: (parse_query(q, an) if isinstance(q, str) else q)
        for qid, q in sorted(queries.items())
    }
    term_rows, full_ids = [], []
    for qid, q in parsed.items():
        if _needs_full_scan(q):
            full_ids.append(qid)
        else:
            for t in sorted(collect_terms(q)):
                term_rows.append((qid, t))

    base = docs.select(id_col, text_col)
    if term_rows:
        qterms = spark.createDataFrame(term_rows, "query_id string, term string")
        if analyzer == "simple":
            from ..pipeline.dedup import _token_array

            dterms = base.select(
                id_col, F.explode(F.array_distinct(_token_array(text_col))).alias("term")
            )
        else:
            tok_schema = T.StructType(
                [base.schema[id_col], T.StructField("term", T.StringType())]
            )

            def toks(batches):
                import pandas as pd

                for pdf in batches:
                    ids, terms = [], []
                    for did, text in zip(pdf[id_col], pdf[text_col]):
                        seen = {t.term for t in an(text or "")}
                        ids.extend([did] * len(seen))
                        terms.extend(sorted(seen))
                    yield pd.DataFrame({id_col: ids, "term": terms})

            dterms = base.mapInPandas(toks, schema=tok_schema)
        cand = (
            dterms.join(F.broadcast(qterms), "term")
            .select(id_col, "query_id")
            .distinct()
        )
    else:
        cand = None
    if full_ids:
        allq = base.select(id_col).crossJoin(
            spark.createDataFrame([(q,) for q in full_ids], "query_id string")
        )
        cand = allq if cand is None else cand.unionByName(allq).distinct()
    if cand is None:
        return spark.createDataFrame(
            [], T.StructType([docs.schema[id_col],
                              T.StructField("query_id", T.StringType()),
                              T.StructField("score", T.DoubleType())])
        )

    per_doc = cand.groupBy(id_col).agg(F.collect_set("query_id").alias("_qids"))
    joined = base.join(per_doc, id_col)
    out_schema = T.StructType(
        [
            docs.schema[id_col],
            T.StructField("query_id", T.StringType(), False),
            T.StructField("score", T.DoubleType(), False),
        ]
    )

    def refine(batches):
        import pandas as pd

        for pdf in batches:
            ids, qids, scores = [], [], []
            for did, text, cqs in zip(pdf[id_col], pdf[text_col], pdf["_qids"]):
                mi = MemoryIndex(
                    text if text is not None else "",
                    analyzer=analyzer,
                    stopwords=stopwords,
                )
                for qid in sorted(cqs):
                    s = mi.search(parsed[qid])
                    if s > 0.0 or mi.matches(parsed[qid]):
                        ids.append(did)
                        qids.append(qid)
                        scores.append(s)
            yield pd.DataFrame({id_col: ids, "query_id": qids, "score": scores})

    return joined.mapInPandas(refine, schema=out_schema)
