"""Deduplication operators for large-scale text pipelines.

All hashing uses md5 via Spark built-ins (JVM-side, no Python UDF) so every
operator is reproducible in ANSI SQL for the oracle gate AND stays in
whole-stage codegen. Scale notes per operator:

- exact: one shuffle on the 128-bit content hash. At 10^12 docs the hash
  groupBy is the canonical map-side-combinable aggregation.
- n-gram Jaccard: shingle inverted join. Pair count is Σ_s df(s)^2 — bounded
  in practice by dropping ultra-common shingles (like stopword pruning);
  ``max_shingle_df`` caps the blowup explicitly, ON by default (an uncapped
  hot shingle is a cartesian bomb at web scale), with dropped-shingle
  counts logged.
- MinHash/LSH: k independent permutations approximated by
  min(md5(seed:token)); band signatures bucket-join candidates so the pair
  join is per-band-bucket (classic MinHash-LSH: Broder '97; banding per the
  MMDS formulation).
- SimHash: 60-bit (fits a signed BIGINT) charikar-style sketch; the 60 bit
  votes are 60 aggregate expressions in ONE groupBy pass — no explode, no
  60x shuffle amplification.

Token/shingle extraction is map-only: empty tokens are filtered on the
ARRAY before posexplode and n-grams are sliced from the array, so position
renumbering never shuffles the ~100x-doc-count token stream (the window
formulation here would have been the largest shuffle in the pipeline).
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_LOG = logging.getLogger(__name__)

__all__ = [
    "tokens",
    "exact_dup_groups",
    "shingles",
    "ngram_jaccard_pairs",
    "minhash_signatures",
    "lsh_candidate_pairs",
    "simhash",
    "connected_components",
    "duplicated_chunks",
    "duplicated_substring_spans",
    "remove_duplicated_substrings",
]

TOKEN_SPLIT = "[^a-z0-9]+"


def _token_array(text_col: str) -> F.Column:
    """Empty-token-free array of lowercased tokens (simple analyzer) —
    filtering on the array keeps downstream position numbering map-only."""
    return F.filter(
        F.split(F.lower(F.col(text_col)), TOKEN_SPLIT), lambda x: x != ""
    )


def tokens(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, term, pos) token stream — JVM-side regex split (simple
    analyzer). Map-only: positions come straight from posexplode over the
    pre-filtered array (no window/shuffle to renumber)."""
    return docs.select(
        id_col, F.posexplode(_token_array(text_col)).alias("pos", "term")
    ).select(id_col, "term", "pos")


def duplicated_substring_spans(
    docs: DataFrame,
    k: int = 50,
    min_df: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_gram_df: int | None = 100_000,
) -> DataFrame:
    """Exact substring-duplication spans (Lee et al. 2021, "Deduplicating
    Training Data Makes Language Models Better" — the ExactSubstr
    criterion: any run of >= k consecutive tokens that also appears in
    another document is a duplicate). The paper builds a suffix array;
    the distributed equivalent marks every k-token window whose k-gram
    occurs in >= ``min_df`` DISTINCT documents — a maximal duplicated
    run of length L >= k is exactly a run of L-k+1 consecutive
    duplicated windows, so merging overlapping/adjacent windows
    (gaps-and-islands) recovers the same spans.

    Returns (id, span_start, span_end) in token positions, end EXCLUSIVE,
    maximal disjoint spans.

    Scale shape: k-grams slice from the token array (map-only), the df
    count is one map-combinable groupBy on a 64-bit gram hash, the hot
    boilerplate guard ``max_gram_df`` bounds any single gram's join
    fan-out, and the island merge is a per-doc window over only the
    DUPLICATED windows (a small fraction of tokens on real corpora)."""
    from pyspark.sql.window import Window

    arr = _token_array(text_col)
    idx = F.when(
        F.size(arr) >= k, F.sequence(F.lit(1), F.size(arr) - k + 1)
    ).otherwise(F.array().cast("array<int>"))
    # (id, gpos 0-based, gram hash) — xxhash64 keyed windows; collisions
    # at 64 bits are negligible against 10^12-token corpora and only ever
    # ADD a span conservatively
    grams = docs.select(
        F.col(id_col).alias("_id"),
        F.posexplode(
            F.transform(idx, lambda i: F.xxhash64(F.concat_ws(" ", F.slice(arr, i, k))))
        ).alias("gpos", "gh"),
    )
    gdf = grams.groupBy("gh").agg(F.count_distinct("_id").alias("df"))
    keep = gdf.filter(F.col("df") >= min_df)
    if max_gram_df is not None:
        keep = keep.filter(F.col("df") <= max_gram_df)
    hits = grams.join(keep.select("gh"), "gh").select("_id", "gpos")
    w = Window.partitionBy("_id").orderBy("gpos")
    brk = (
        F.when(
            F.lag("gpos").over(w).isNull()
            | (F.col("gpos") > F.lag("gpos").over(w) + k),
            1,
        ).otherwise(0)
    )
    isl = hits.withColumn("_brk", brk).withColumn(
        "_gid", F.sum("_brk").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        isl.groupBy("_id", "_gid")
        .agg(
            F.min("gpos").alias("span_start"),
            (F.max("gpos") + k).alias("span_end"),
        )
        .select(F.col("_id").alias(id_col), "span_start", "span_end")
    )


def remove_duplicated_substrings(
    docs: DataFrame,
    k: int = 50,
    min_df: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Cleaned corpus per the ExactSubstr recipe: tokens inside any
    duplicated span drop, the rest re-join with single spaces. Returns
    (id, clean_text) for EVERY input doc (docs with no duplicated span
    keep their full token stream)."""
    spans = duplicated_substring_spans(
        docs, k=k, min_df=min_df, id_col=id_col, text_col=text_col
    )
    toks = docs.select(
        F.col(id_col).alias("_id"),
        F.posexplode(_token_array(text_col)).alias("pos", "term"),
    )
    sp = spans.select(
        F.col(id_col).alias("_sid"), "span_start", "span_end"
    )
    kept = toks.join(
        sp,
        (toks["_id"] == sp["_sid"])
        & (toks["pos"] >= sp["span_start"])
        & (toks["pos"] < sp["span_end"]),
        "left_anti",
    )
    cleaned = kept.groupBy("_id").agg(
        F.concat_ws(
            " ", F.transform(F.array_sort(F.collect_list(F.struct("pos", "term"))), lambda s: s["term"])
        ).alias("clean_text")
    )
    ids = docs.select(F.col(id_col).alias("_id"))
    return (
        ids.join(cleaned, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
        )
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


def shingles(
    docs: DataFrame, n: int = 3, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Distinct word n-gram shingles per doc: (id, shingle). Map-only:
    n-grams are sliced from the token array (array_distinct before the
    explode), not assembled with lead() windows over an exploded stream."""
    arr = _token_array(text_col)
    idx = F.when(
        F.size(arr) >= n, F.sequence(F.lit(1), F.size(arr) - n + 1)
    ).otherwise(F.array().cast("array<int>"))
    grams = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(arr, i, n)))
    return docs.select(
        id_col, F.explode(F.array_distinct(grams)).alias("shingle")
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    n: int = 3,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    max_shingle_df: int | None = 1000,
    log_drops: bool = True,
) -> DataFrame:
    """Near-dup pairs (a, b, jaccard) with Jaccard(shingle sets) >= threshold.

    ``max_shingle_df`` drops shingles appearing in more docs than the cap
    before the pair join — the skew guard at web scale (each shingle
    contributes df² candidate pairs; one boilerplate 3-gram across 10^6
    docs is 10^12 pairs), so it is ON by default. Pass None to disable
    (exact Jaccard over every shingle, small corpora only).
    ``log_drops`` counts and logs the capped shingles (one cheap action
    over the persisted shingle-df table, which the pair join reuses)."""
    sh = shingles(docs, n=n, id_col=id_col)
    if max_shingle_df is not None:
        cnt = sh.groupBy("shingle").count()
        if log_drops:
            cnt = cnt.persist()
            dropped = cnt.filter(F.col("count") > max_shingle_df).count()
            if dropped:
                _LOG.warning(
                    "ngram_jaccard_pairs: skew cap df<=%d dropped %d distinct "
                    "shingles before the pair join",
                    max_shingle_df,
                    dropped,
                )
        keep = cnt.filter(F.col("count") <= max_shingle_df).select("shingle")
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
    # all 60 bit votes as aggregate expressions of ONE groupBy — the
    # (doc, term) row is never amplified 60x through a shuffle
    votes = [
        F.sum(
            F.when(F.expr(f"(h >> {b}) & 1") == 1, F.col("c")).otherwise(
                -F.col("c")
            )
        ).alias(f"v{b}")
        for b in range(bits)
    ]
    per_doc = t.groupBy(id_col).agg(*votes)
    sketch = F.lit(0).cast("long")
    for b in range(bits):
        sketch = sketch + F.when(
            F.col(f"v{b}") > 0, F.lit(1 << b).cast("long")
        ).otherwise(F.lit(0).cast("long"))
    return per_doc.select(id_col, sketch.alias("simhash"))


def connected_components(
    pairs: DataFrame,
    id_a: str = "a",
    id_b: str = "b",
    max_iter: int = 50,
) -> DataFrame:
    """(node, component) over the near-dup pair graph: component = the
    minimum doc id reachable from the node — the step that turns pairwise
    candidates (``ngram_jaccard_pairs`` / ``lsh_candidate_pairs``) into
    duplicate CLUSTERS (keep the min id as canonical, drop the rest).

    Algorithm: hash-min label propagation — each round every node takes
    the minimum label in its closed neighborhood (one shuffle per round:
    an edges-to-labels join + min-aggregate). Rounds needed = graph
    diameter; near-dup clusters are near-cliques, so 2-3 rounds in
    practice. Labels are monotonically non-increasing, so the early-stop
    test is ONE cheap aggregate (sum of labels unchanged == fixpoint) —
    no change-count join. Each round's frontier is localCheckpoint()ed to
    truncate the iterative-join lineage (at web scale use a reliable
    checkpoint dir instead; the loop body is otherwise the standard
    MapReduce-style hash-min CC).
    """
    fwd = pairs.select(F.col(id_a).alias("s"), F.col(id_b).alias("d"))
    rev = pairs.select(F.col(id_b).alias("s"), F.col(id_a).alias("d"))
    edges = fwd.union(rev).distinct().persist()
    labels = (
        edges.select(F.col("s").alias("node"))
        .distinct()
        .withColumn("comp", F.col("node"))
        .localCheckpoint()
    )
    prev_sum = labels.agg(F.sum("comp")).collect()[0][0]
    for _ in range(max_iter):
        nbr = (
            edges.join(labels, edges["d"] == labels["node"])
            .groupBy("s")
            .agg(F.min("comp").alias("nmin"))
        )
        labels = (
            labels.join(nbr, labels["node"] == nbr["s"], "left")
            .select(
                "node",
                F.least(F.col("comp"), F.coalesce("nmin", "comp")).alias("comp"),
            )
            .localCheckpoint()
        )
        cur_sum = labels.agg(F.sum("comp")).collect()[0][0]
        if cur_sum == prev_sum:  # labels only decrease: fixpoint reached
            break
        prev_sum = cur_sum
    edges.unpersist()
    return labels.select(F.col("node"), F.col("comp").alias("component"))


def duplicated_chunks(
    docs: DataFrame,
    chunk: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """C4-style chunk-level dedup stats: (id, n_chunks, n_dup_chunks,
    dup_frac) over non-overlapping ``chunk``-token windows (full windows
    only). A chunk instance is "duplicated" when its text occurs more than
    once in the corpus (any doc, including the same one) — the C4 recipe
    removes any three-sentence span that occurs twice; punctuation-free
    corpora use fixed token windows instead.

    Scale shape: chunking is map-only (array slices, no window shuffle);
    the global chunk count is one map-side-combinable aggregation on the
    chunk hash; only the *duplicated* chunk hashes (rare by construction)
    come back in the semi-join, so the second join's build side is small
    at any corpus size. Docs shorter than one full chunk drop out.
    """
    arr = _token_array(text_col)
    n_full = (F.size(arr) / chunk).cast("int")
    idx = F.when(
        n_full > 0, F.sequence(F.lit(0), n_full - 1)
    ).otherwise(F.array().cast("array<int>"))
    grams = F.transform(
        idx, lambda i: F.concat_ws(" ", F.slice(arr, i * chunk + 1, chunk))
    )
    ch = docs.select(
        id_col, F.explode(grams).alias("chunk_text")
    ).select(id_col, F.md5("chunk_text").alias("chunk_hash"))
    dup_hashes = (
        ch.groupBy("chunk_hash")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") > 1)
        .select("chunk_hash")
    )
    flagged = ch.join(F.broadcast(dup_hashes), "chunk_hash", "left_semi")
    per_doc = ch.groupBy(id_col).agg(F.count("*").alias("n_chunks"))
    dup_per_doc = flagged.groupBy(id_col).agg(
        F.count("*").alias("n_dup_chunks")
    )
    return (
        per_doc.join(dup_per_doc, id_col, "left")
        .select(
            id_col,
            "n_chunks",
            F.coalesce("n_dup_chunks", F.lit(0)).cast("long").alias("n_dup_chunks"),
            F.round(
                F.coalesce("n_dup_chunks", F.lit(0)).cast("double")
                / F.col("n_chunks").cast("double"),
                4,
            ).alias("dup_frac"),
        )
    )
