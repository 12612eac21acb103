"""Deduplication operators for large-scale text pipelines.

All hashing uses md5 via Spark built-ins (JVM-side, no Python UDF) so every
operator is reproducible in ANSI SQL for the oracle gate AND stays in
whole-stage codegen. Scale notes per operator:

- exact: one shuffle on the 128-bit content hash. At 10^12 docs the hash
  groupBy is the canonical map-side-combinable aggregation.
- n-gram Jaccard: shingle inverted join. Pair count is Σ_s df(s)^2 — bounded
  in practice by dropping ultra-common shingles (like stopword pruning);
  ``max_shingle_df`` caps the blowup explicitly (logged, not silent).
- MinHash/LSH: k independent permutations approximated by
  min(md5(seed:token)); band signatures bucket-join candidates so the pair
  join is per-band-bucket (classic MinHash-LSH: Broder '97; banding per the
  MMDS formulation).
- SimHash: 60-bit (fits a signed BIGINT) charikar-style sketch; bit
  aggregation is an explode over 60 bits — fully vectorized in codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = [
    "tokens",
    "exact_dup_groups",
    "shingles",
    "ngram_jaccard_pairs",
    "minhash_signatures",
    "lsh_candidate_pairs",
    "simhash",
]

TOKEN_SPLIT = "[^a-z0-9]+"


def tokens(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, term, pos) token stream — JVM-side regex split (simple analyzer)."""
    w = Window.partitionBy(id_col).orderBy("ord")
    return (
        docs.select(
            id_col,
            F.posexplode(F.split(F.lower(F.col(text_col)), TOKEN_SPLIT)).alias(
                "ord", "term"
            ),
        )
        .filter(F.col("term") != "")
        .withColumn("pos", F.row_number().over(w) - 1)
        .drop("ord")
    )


def exact_dup_groups(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact-duplicate groups by content hash: (text_md5, n_docs, keep_id)
    for groups with >1 member; keep_id = min id (the canonical survivor)."""
    return (
        docs.groupBy(F.md5(F.col(text_col)).alias("text_md5"))
        .agg(
            F.count("*").alias("n_docs"),
            F.min(id_col).alias("keep_id"),
        )
        .filter(F.col("n_docs") > 1)
    )


def shingles(docs: DataFrame, n: int = 3, id_col: str = "doc_id") -> DataFrame:
    """Distinct word n-gram shingles per doc: (id, shingle)."""
    t = tokens(docs, id_col=id_col)
    w = Window.partitionBy(id_col).orderBy("pos")
    cols = [F.col("term")] + [F.lead("term", i).over(w) for i in range(1, n)]
    return (
        t.withColumn("shingle", F.concat_ws(" ", *cols))
        .filter(F.size(F.split(F.col("shingle"), " ")) == n)
        .select(id_col, "shingle")
        .distinct()
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    n: int = 3,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Near-dup pairs (a, b, jaccard) with Jaccard(shingle sets) >= threshold.

    ``max_shingle_df`` drops shingles appearing in more docs than the cap
    before the pair join (the skew guard at web scale)."""
    sh = shingles(docs, n=n, id_col=id_col)
    if max_shingle_df is not None:
        keep = (
            sh.groupBy("shingle").count().filter(F.col("count") <= max_shingle_df)
        ).select("shingle")
        sh = sh.join(keep, "shingle")
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("sz"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, "shingle")
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .groupBy(
            F.col(f"a.{id_col}").alias("a"), F.col(f"b.{id_col}").alias("b")
        )
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col(id_col).alias("a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col(id_col).alias("b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(sa, "a")
        .join(sb, "b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter").cast("double")
                / (F.col("sz_a") + F.col("sz_b") - F.col("inter")).cast("double"),
                4,
            ),
        )
        .filter(
            F.col("inter").cast("double")
            / (F.col("sz_a") + F.col("sz_b") - F.col("inter")).cast("double")
            >= threshold
        )
        .select("a", "b", "jaccard")
    )


def _hash_expr(seed: int, col: str = "term") -> F.Column:
    """Deterministic 32-bit hash from md5(seed:token) — SQL-reproducible:
    ('0x' || substr(md5(seed || ':' || term), 1, 8))::bigint."""
    return F.conv(
        F.substring(F.md5(F.concat_ws(":", F.lit(str(seed)), F.col(col))), 1, 8),
        16,
        10,
    ).cast("long")


def minhash_signatures(
    docs: DataFrame, num_hashes: int = 8, id_col: str = "doc_id"
) -> DataFrame:
    """(id, sig_0..sig_{k-1}): min over tokens of the seeded token hash —
    the permutation-min approximation of MinHash."""
    t = tokens(docs, id_col=id_col).select(id_col, "term").distinct()
    aggs = [
        F.min(_hash_expr(i)).alias(f"sig_{i}") for i in range(num_hashes)
    ]
    return t.groupBy(id_col).agg(*aggs)


def lsh_candidate_pairs(
    docs: DataFrame,
    num_hashes: int = 8,
    bands: int = 4,
    id_col: str = "doc_id",
) -> DataFrame:
    """Distinct candidate pairs (a, b) sharing at least one LSH band
    (rows-per-band = num_hashes // bands)."""
    sig = minhash_signatures(docs, num_hashes=num_hashes, id_col=id_col)
    rows_per = num_hashes // bands
    pair_dfs = []
    for b in range(bands):
        cols = [f"sig_{b * rows_per + r}" for r in range(rows_per)]
        band = sig.select(
            F.col(id_col),
            F.concat_ws("_", *[F.col(c) for c in cols]).alias("band_key"),
        )
        x = band.alias("x")
        y = band.alias("y")
        pair_dfs.append(
            x.join(y, "band_key")
            .filter(F.col(f"x.{id_col}") < F.col(f"y.{id_col}"))
            .select(
                F.col(f"x.{id_col}").alias("a"), F.col(f"y.{id_col}").alias("b")
            )
        )
    out = pair_dfs[0]
    for p in pair_dfs[1:]:
        out = out.unionByName(p)
    return out.distinct()


def simhash(docs: DataFrame, bits: int = 60, id_col: str = "doc_id") -> DataFrame:
    """(id, simhash): 60-bit Charikar sketch. Each term votes ±count on every
    bit of its 60-bit md5-derived hash; bit b of the sketch is 1 iff the
    weighted vote is positive."""
    t = (
        tokens(docs, id_col=id_col)
        .groupBy(id_col, "term")
        .agg(F.count("*").alias("c"))
        .withColumn(
            "h",
            F.conv(F.substring(F.md5(F.col("term")), 1, 15), 16, 10).cast("long"),
        )
    )
    bitsdf = t.select(
        id_col,
        "c",
        "h",
        F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("b"),
    ).withColumn(
        "w",
        F.when(
            F.expr("(h >> b) & 1") == 1, F.col("c")
        ).otherwise(-F.col("c")),
    )
    per_bit = bitsdf.groupBy(id_col, "b").agg(F.sum("w").alias("w"))
    return per_bit.groupBy(id_col).agg(
        F.sum(
            F.when(F.col("w") > 0, F.expr("shiftleft(cast(1 as bigint), b)")).otherwise(
                F.lit(0).cast("long")
            )
        ).alias("simhash")
    )
