"""Monitor / percolator: reverse search (queries are registered, documents
stream through, output = which queries match which documents).

Reference behavior: the monitor module (monitor/src/java/org/apache/lucene/
monitor/Monitor.java, QueryIndex.java, TermFilteredPresearcher.java).
Lucene's design: index the QUERIES by their terms (the "presearcher"), use
each incoming document's tokens to select candidate queries, then run only
those candidates against the single-doc index.

The Spark-first restatement keeps exactly that shape but distributes both
sides: the query set is a DataFrame exploded to (query_id, term) rows —
the presearcher index — and candidate selection is a join between the
distinct doc-term stream and that term table, aggregated per (doc, query):

- kind='term'/'or': candidate iff >=1 term hit (already a match);
- kind='and':       match iff every query term hit (n_matched == n_terms
                    checked IN the aggregation — no second pass);
- kind='phrase':    the AND check first, then adjacency verified on the
                    candidate pairs only via a substring probe on the
                    space-joined token string (candidates are rare, the
                    verify join is small — mirroring the presearcher's
                    'only run candidate queries' economics).

Shuffles: one on term (candidate join; the query side is usually
broadcast-sized — millions of registered queries is still tiny next to
the doc stream), one per-(doc, query) aggregation. For alerting on a live
stream, run the same function inside foreachBatch of a Structured
Streaming query — the query-side table is static and reused each batch.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["MonitorQuery", "monitor_matches"]

TOKEN_SPLIT = "[^a-z0-9]+"


@dataclass(frozen=True)
class MonitorQuery:
    """A registered query: MonitorQuery(Monitor.java:user-facing analog).
    kind: 'term' (single term), 'or' (any term), 'and' (all terms),
    'phrase' (all terms, adjacent, in order)."""

    query_id: str
    kind: str
    terms: tuple

    def __post_init__(self):
        if self.kind not in ("term", "or", "and", "phrase"):
            raise ValueError(f"unknown monitor query kind: {self.kind}")
        if not self.terms:
            raise ValueError("monitor query needs at least one term")
        if self.kind == "term" and len(self.terms) != 1:
            raise ValueError("kind='term' takes exactly one term")


def _token_array(text_col: str):
    return F.filter(
        F.split(F.lower(F.col(text_col)), TOKEN_SPLIT), lambda x: x != ""
    )


def monitor_matches(
    docs: DataFrame,
    queries: list,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, query_id) for every registered query matching each doc."""
    spark = docs.sparkSession
    qrows = [
        (q.query_id, q.kind, list(dict.fromkeys(q.terms)), len(set(q.terms)))
        for q in queries
    ]
    qdf = spark.createDataFrame(
        qrows, "query_id string, kind string, terms array<string>, n_terms int"
    )
    qterms = qdf.select(
        "query_id", "kind", "n_terms", F.explode("terms").alias("term")
    )
    toks = docs.select(
        F.col(id_col), _token_array(text_col).alias("_toks")
    )
    dt = toks.select(id_col, F.explode(F.array_distinct("_toks")).alias("term"))
    cand = (
        dt.join(F.broadcast(qterms), "term")
        .groupBy(id_col, "query_id")
        .agg(
            F.count("*").alias("n_matched"),
            F.first("kind").alias("kind"),
            F.first("n_terms").alias("n_terms"),
        )
    )
    direct = cand.filter(
        (F.col("kind").isin("term", "or"))
        | ((F.col("kind") == "and") & (F.col("n_matched") == F.col("n_terms")))
    ).select(id_col, "query_id")
    phrase_cand = cand.filter(
        (F.col("kind") == "phrase") & (F.col("n_matched") == F.col("n_terms"))
    ).select(id_col, "query_id")
    if not any(q.kind == "phrase" for q in queries):
        return direct
    # adjacency verify on candidates only: ' t1 t2 ... ' must appear in
    # the space-joined token string (token boundaries guarded by spaces)
    needles = spark.createDataFrame(
        [
            (q.query_id, " " + " ".join(q.terms) + " ")
            for q in queries
            if q.kind == "phrase"
        ],
        "query_id string, needle string",
    )
    joined = toks.select(
        id_col, F.concat(F.lit(" "), F.concat_ws(" ", "_toks"), F.lit(" ")).alias("_s")
    )
    verified = (
        phrase_cand.join(F.broadcast(needles), "query_id")
        .join(joined, id_col)
        .filter(F.instr(F.col("_s"), F.col("needle")) > 0)
        .select(id_col, "query_id")
    )
    return direct.unionByName(verified)
