"""FastVectorHighlighter — fragment selection from stored term vectors.

Reference behavior: highlighter/vectorhighlight/FastVectorHighlighter.java
(highlights from term vectors with positions+offsets, never re-analyzing
the stored text), FieldPhraseList.java (match occurrences -> weighted
phrase infos, query boost 1 per occurrence), SimpleFragListBuilder.java:35
(greedy fragments in offset order: a fragment opens at the first
unconsumed match, with up to ``margin`` chars of left context, and closes
fragCharSize later; every match inside is consumed) and
SimpleFieldFragList.java:32 (fragment score = sum of the consumed phrase
boosts — occurrence count at query boost 1). ScoreOrderFragmentsBuilder
then emits the top-N fragments by score.

Spark shape: hits (or the whole corpus) join the vectors table on the doc
key — the ".tvd seek" — then fragment selection is a per-row loop over
that doc's few match offsets inside one Arrow batch; the text join brings
the stored field for snippet slicing. No per-query re-analysis, which is
the entire point of the FVH over the re-analyzing highlighter
(search/highlight.py) for long documents.
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["fvh_fragments"]


def _best_fragments(
    offsets: list[tuple[int, int]],
    frag_char_size: int,
    margin: int,
    max_frags: int,
) -> list[tuple[int, int, int]]:
    """SimpleFragListBuilder: consume sorted match offsets greedily into
    windows of frag_char_size; returns (start, end, score) per fragment,
    best ``max_frags`` by (score DESC, start ASC)."""
    frags: list[tuple[int, int, int]] = []
    i, n = 0, len(offsets)
    while i < n:
        s0 = max(0, offsets[i][0] - margin)
        end = s0 + frag_char_size
        score = 0
        while i < n and offsets[i][1] <= end:
            score += 1
            i += 1
        frags.append((s0, end, score))
    frags.sort(key=lambda f: (-f[2], f[0]))
    return frags[:max_frags]


def fvh_fragments(
    docs: DataFrame,
    vectors: DataFrame,
    terms: list[str],
    *,
    id_col: str = "url",
    text_col: str = "text",
    frag_char_size: int = 100,
    margin: int = 6,
    max_frags: int = 1,
) -> DataFrame:
    """(id, frag_start, frag_end, score, snippet) — the best fragments of
    each doc that matches at least one query term, selected purely from
    the vectors' offsets and sliced from the stored text."""
    tv = vectors.filter(F.col("term").isin(list(terms))).select(
        id_col, "starts", "ends"
    )
    merged = tv.groupBy(id_col).agg(
        F.flatten(F.collect_list("starts")).alias("_ss"),
        F.flatten(F.collect_list("ends")).alias("_es"),
    )
    joined = merged.join(docs.select(id_col, text_col), id_col)
    schema = T.StructType(
        [
            docs.schema[id_col],
            T.StructField("frag_start", T.IntegerType(), False),
            T.StructField("frag_end", T.IntegerType(), False),
            T.StructField("score", T.IntegerType(), False),
            T.StructField("snippet", T.StringType(), False),
        ]
    )

    def run(batches: Iterable) -> Iterable:
        import pandas as pd

        for pdf in batches:
            out = {k: [] for k in (id_col, "frag_start", "frag_end", "score", "snippet")}
            for did, ss, es, text in zip(
                pdf[id_col], pdf["_ss"], pdf["_es"], pdf[text_col]
            ):
                offs = sorted(zip((int(x) for x in ss), (int(x) for x in es)))
                text = text or ""
                for s0, e0, sc in _best_fragments(
                    offs, frag_char_size, margin, max_frags
                ):
                    out[id_col].append(did)
                    out["frag_start"].append(s0)
                    out["frag_end"].append(e0)
                    out["score"].append(sc)
                    out["snippet"].append(text[s0:e0])
            yield pd.DataFrame(out)

    return joined.mapInPandas(run, schema=schema)
