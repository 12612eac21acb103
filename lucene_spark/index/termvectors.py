"""Term vectors — per-document (term, freq, positions, char offsets).

Reference behavior: Lucene's term-vector format (codecs/lucene90/
Lucene90CompressingTermVectorsFormat via core's TermVectorsReader;
enabled per field with FieldType.setStoreTermVectors/Positions/Offsets —
index/FieldType.java) — the per-DOCUMENT transpose of the inverted index
that powers the FastVectorHighlighter and MoreLikeThis without re-analyzing
stored text at query time.

Spark shape: one mapInPandas over the corpus (Arrow-batched analyzer run,
the same chain the index build uses) producing one row per (doc, term);
written as a parquet table keyed by the doc key. At scale the write is
map-only (no shuffle) and readers join hits against it on the doc key —
the same "seek the doc's vector" economics as the reference's .tvd reads.
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["term_vectors_df", "write_term_vectors", "read_term_vectors"]

_TV_FIELDS = [
    T.StructField("term", T.StringType(), False),
    T.StructField("freq", T.IntegerType(), False),
    T.StructField("positions", T.ArrayType(T.IntegerType()), False),
    T.StructField("starts", T.ArrayType(T.IntegerType()), False),
    T.StructField("ends", T.ArrayType(T.IntegerType()), False),
]


def term_vectors_df(
    docs: DataFrame,
    *,
    id_col: str = "url",
    text_col: str = "text",
    analyzer: str = "standard",
    stopwords: frozenset[str] | None = None,
) -> DataFrame:
    """(id, term, freq, positions, starts, ends) — one row per distinct
    term of each document, occurrence lists in position order. Offsets are
    char offsets into the ORIGINAL text (OffsetAttribute semantics: token
    filters keep the surface offsets of the token they derived from).
    Analyzer chains that run on the batched vocabulary lane don't carry
    offsets and emit -1 — the analog of a field indexed without
    setStoreTermVectorOffsets; use the per-document 'standard' chain (or
    any offset-bearing chain) when the FVH needs them."""
    from ..index.builder import get_analyzer

    an = get_analyzer(analyzer)
    schema = T.StructType([docs.schema[id_col], *_TV_FIELDS])

    def run(batches: Iterable) -> Iterable:
        import pandas as pd

        for pdf in batches:
            out = {k: [] for k in (id_col, "term", "freq", "positions", "starts", "ends")}
            for did, text in zip(pdf[id_col], pdf[text_col]):
                per: dict[str, list] = {}
                for t in an(text or "", stopwords=stopwords):
                    per.setdefault(t.term, []).append((t.position, t.start, t.end))
                for term in sorted(per):
                    occ = sorted(per[term])
                    out[id_col].append(did)
                    out["term"].append(term)
                    out["freq"].append(len(occ))
                    out["positions"].append([o[0] for o in occ])
                    out["starts"].append([o[1] for o in occ])
                    out["ends"].append([o[2] for o in occ])
            yield pd.DataFrame(out)

    return docs.select(id_col, text_col).mapInPandas(run, schema=schema)


def write_term_vectors(
    docs: DataFrame,
    out_dir: str,
    *,
    id_col: str = "url",
    text_col: str = "text",
    analyzer: str = "standard",
    stopwords: frozenset[str] | None = None,
) -> None:
    """Materialize the vectors table (the .tvd analog). Map-only write."""
    term_vectors_df(
        docs, id_col=id_col, text_col=text_col, analyzer=analyzer,
        stopwords=stopwords,
    ).write.mode("overwrite").parquet(out_dir)


def read_term_vectors(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.parquet(out_dir)
