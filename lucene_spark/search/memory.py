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

__all__ = ["MemoryIndex", "memory_index_matches"]


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
