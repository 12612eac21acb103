"""Similarity search over an embedding column (array<float>).

- ``cosine_topk``: brute-force exact top-k — the correctness baseline. The
  dot product is a built-in ``aggregate(zip_with(...))`` fold (JVM-side,
  deterministic left-to-right order → SQL-reproducible).
- ``signbucket_topk``: the scale path — sign-bit LSH (random-hyperplane LSH
  degenerate to axis hyperplanes on the first ``n_bits`` dims): candidates
  restricted to the query's bucket, then exact cosine within. At 10^12 rows
  the bucket key becomes the partition/cluster key so a query touches one
  bucket instead of the full table. An IVF variant would replace the sign
  key with a learned-centroid id — same plumbing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["cosine_topk", "signbucket_topk"]


def _dot(a, b) -> F.Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _cosine(vec_col: str, qvec: list[float]) -> F.Column:
    q = F.array(*[F.lit(float(v)) for v in qvec])
    v = F.col(vec_col)
    return _dot(v, q) / (F.sqrt(_dot(v, v)) * F.sqrt(_dot(q, q)))


def cosine_topk(
    emb: DataFrame,
    qvec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine, tie-break (cosine DESC, id ASC); cosine output
    rounded to 4 (cut happens on the unrounded value)."""
    scored = emb.select(id_col, _cosine(vec_col, qvec).alias("cos"))
    top = scored.orderBy(F.desc("cos"), F.asc(id_col)).limit(k)
    return top.select(id_col, F.round("cos", 4).alias("cos"))


def _sign_key(vec_col: str, n_bits: int) -> F.Column:
    bits = [
        F.when(F.element_at(F.col(vec_col), i + 1) >= 0, F.lit("1")).otherwise(
            F.lit("0")
        )
        for i in range(n_bits)
    ]
    return F.concat(*bits)


def signbucket_topk(
    emb: DataFrame,
    qvec: list[float],
    k: int = 10,
    n_bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: only candidates in the query's sign-bit bucket."""
    qkey = "".join("1" if float(v) >= 0 else "0" for v in qvec[:n_bits])
    cands = emb.filter(_sign_key(vec_col, n_bits) == qkey)
    return cosine_topk(cands, qvec, k=k, id_col=id_col, vec_col=vec_col)
