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

__all__ = [
    "cosine_topk",
    "signbucket_topk",
    "ivf_train",
    "ivf_assign",
    "ivf_topk",
    "ivf_write",
    "ivf_topk_persisted",
    "recall_at_k",
    "semantic_dup_pairs",
    "semantic_dup_pairs_ivf",
    "similarity_threshold",
    "float_to_byte_vectors",
    "byte_topk",
    "byte_similarity_threshold",
    "diversified_children_topk",
]


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


def knn_filtered(
    emb: DataFrame,
    qvec: list[float],
    filter_expr: str,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Filtered KNN (search/KnnFloatVectorQuery.java:61 filter ctor): Lucene
    pre-filters the candidate bitset and falls back to exact scoring over the
    survivors when the filter is selective. Here the filter is a Catalyst
    predicate — pushed into the parquet scan when it references scan columns
    — and scoring is the exact-cosine baseline over the filtered set, so
    recall is 1.0 by construction (the brute-force arm Lucene uses below the
    visit threshold). At 100 TB the same predicate prunes IVF cells first."""
    return cosine_topk(emb.filter(F.expr(filter_expr)), qvec, k, id_col, vec_col)


def _sign_key(vec_col: str, n_bits: int) -> F.Column:
    bits = [
        F.when(F.element_at(F.col(vec_col), i + 1) >= 0, F.lit("1")).otherwise(
            F.lit("0")
        )
        for i in range(n_bits)
    ]
    return F.concat(*bits)


# --- IVF (inverted-file) ANN ----------------------------------------------
#
# The scale path beyond sign-bucket LSH: learned-centroid cells. Training is
# one distributed pass (seed = first n_centroids vectors by id, one Lloyd
# refinement as 64 map-side-combinable avg aggregates — no explode, no
# per-row Python); centroids are tiny (C x dim floats) and broadcast as
# literals into the assignment expression, so assignment is pure JVM codegen.
#
# At 100 TB the workflow is: ivf_train on a sample -> ivf_assign once at
# write time -> store partitioned/bucketed by `cell` -> a query computes its
# n_probe nearest cells driver-side (C-sized math) and reads only those
# partitions (partition pruning), then exact-cosine re-ranks within. Here
# the same operators run the assignment query-time at test scale.
#
# Determinism contract (gate-oracle reproducible): seeds are the
# n_centroids smallest vec_ids; refined centroids are per-dim avgs rounded
# to 6 decimals (absorbs f64 summation-order differences between engines);
# all argmins tie-break on the smaller cell id via lexicographic
# (dist, cell) ordering.


def _sq_l2(vec_col, centroid: list[float]) -> F.Column:
    c = F.array(*[F.lit(float(x)) for x in centroid])
    return F.aggregate(
        F.zip_with(
            vec_col, c, lambda x, y: (x.cast("double") - y) * (x.cast("double") - y)
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _argmin_cell(vec_col, centroids: list[tuple[int, list[float]]]) -> F.Column:
    """Id of the nearest centroid (squared-L2, ties -> smaller cell id)."""
    structs = F.array(
        *[
            F.struct(
                _sq_l2(vec_col, c).alias("d"), F.lit(int(cid)).alias("c")
            )
            for cid, c in centroids
        ]
    )
    return F.array_min(structs)["c"]


def ivf_train(
    emb: DataFrame,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> list[tuple[int, list[float]]]:
    """One-iteration k-means: deterministic seeds (the ``n_centroids``
    smallest ids), one Lloyd refinement. Returns [(cell_id, centroid)]
    sorted by cell_id; cells that lose all members are dropped. The
    refinement is a single groupBy with ``dim`` avg aggregates (partial
    aggregation, no shuffle amplification)."""
    if dim is None:
        dim = len(emb.select(vec_col).first()[0])
    seeds = [
        (i, [float(x) for x in r[vec_col]])
        for i, r in enumerate(
            emb.orderBy(F.asc(id_col)).limit(n_centroids).collect()
        )
    ]
    v = F.col(vec_col)
    assigned = emb.select(_argmin_cell(v, seeds).alias("cell"), vec_col)
    rows = (
        assigned.groupBy("cell")
        .agg(
            *[
                F.round(F.avg(F.element_at(v, i + 1).cast("double")), 6).alias(f"d{i}")
                for i in range(dim)
            ]
        )
        .collect()
    )
    return sorted(
        (int(r["cell"]), [float(r[f"d{i}"]) for i in range(dim)]) for r in rows
    )


def ivf_assign(
    emb: DataFrame,
    centroids: list[tuple[int, list[float]]],
    vec_col: str = "embedding",
) -> DataFrame:
    """Add a ``cell`` column: nearest-centroid id. At scale, run once at
    write time and partition/bucket the table by ``cell``."""
    return emb.withColumn("cell", _argmin_cell(F.col(vec_col), centroids))


def _probe_cells(
    qvec: list[float], centroids: list[tuple[int, list[float]]], n_probe: int
) -> list[int]:
    """The query's ``n_probe`` nearest cell ids — driver-side C-sized math
    (squared-L2 to each centroid, ties -> smaller cell id)."""
    return sorted(
        cid
        for _, cid in sorted(
            (sum((float(q) - c) ** 2 for q, c in zip(qvec, cvec)), cid)
            for cid, cvec in centroids
        )[:n_probe]
    )


def ivf_topk(
    emb: DataFrame,
    qvec: list[float],
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list[tuple[int, list[float]]] | None = None,
) -> DataFrame:
    """Approximate top-k: exact cosine within the query's ``n_probe``
    nearest IVF cells. Pass precomputed ``centroids`` (from ivf_train) to
    skip training; probe selection is driver-side C-sized math.

    NOTE: this form recomputes the cell assignment over ``emb`` per query —
    fine for one-off queries, wrong as a steady state. The scale path is
    ``ivf_write`` once at write time + ``ivf_topk_persisted`` per query,
    which reads only the ``n_probe`` probed partitions."""
    if centroids is None:
        centroids = ivf_train(emb, n_centroids, id_col=id_col, vec_col=vec_col)
    probes = _probe_cells(qvec, centroids, n_probe)
    cands = ivf_assign(emb, centroids, vec_col=vec_col).filter(
        F.col("cell").isin(probes)
    )
    return cosine_topk(cands, qvec, k=k, id_col=id_col, vec_col=vec_col)


def ivf_write(
    emb: DataFrame,
    path: str,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list[tuple[int, list[float]]] | None = None,
) -> dict:
    """Train + assign ONCE and materialize the table partitioned by
    ``cell`` — the write-time half of IVF (the inverted-file analog of
    Lucene writing vector data at segment flush,
    codecs/lucene99/Lucene99HnswVectorsFormat.java's write-time contract).
    Centroids go to ``<path>/meta.json``; vectors go to ``<path>/cells``
    partitioned by cell so a query's partition filter prunes to its
    ``n_probe`` directories. Returns the meta dict."""
    import json
    import os

    if centroids is None:
        centroids = ivf_train(emb, n_centroids, id_col=id_col, vec_col=vec_col)
    assigned = ivf_assign(emb, centroids, vec_col=vec_col).select(
        F.col(id_col), F.col(vec_col), "cell"
    )
    assigned.write.mode("overwrite").partitionBy("cell").parquet(f"{path}/cells")
    meta = {
        "n_centroids": int(n_centroids),
        "centroids": [[int(cid), [float(x) for x in cvec]] for cid, cvec in centroids],
        "id_col": id_col,
        "vec_col": vec_col,
        "n_vectors": int(emb.count()),
    }
    with open(os.path.join(path, "meta.json"), "w") as fh:
        json.dump(meta, fh)
    return meta


def ivf_append(spark, emb_new: DataFrame, path: str) -> dict:
    """Incrementally index appended vectors into a persisted IVF table —
    the inverted-file twin of ``hnsw_append``: assign against the FROZEN
    write-time centroids (IVF appends never retrain, matching the
    published IVF-add contract — Jégou et al., "Product quantization for
    nearest neighbor search", and Lucene's append-only segment model) and
    parquet-APPEND into the existing cell partitions. Queries need no
    routing change: the n_probe partition filter already covers appended
    rows, so recall over appended vectors is identical to a full rebuild
    with the same centroids. meta.json is atomically rewritten with the
    updated count (observability — correctness never depends on it).

    Cell skew note for 100 TB: appends drift the data distribution away
    from the frozen centroids; monitor per-cell counts in the parquet
    partition sizes and rebuild (ivf_write) when the largest cell exceeds
    the mean by the usual 4-8x re-cluster threshold."""
    import json
    import os

    with open(os.path.join(path, "meta.json")) as fh:
        meta = json.load(fh)
    centroids = [
        (int(cid), [float(x) for x in cvec]) for cid, cvec in meta["centroids"]
    ]
    id_col, vec_col = meta["id_col"], meta["vec_col"]
    assigned = ivf_assign(emb_new, centroids, vec_col=vec_col).select(
        F.col(id_col), F.col(vec_col), "cell"
    )
    assigned.write.mode("append").partitionBy("cell").parquet(f"{path}/cells")
    meta["n_vectors"] = int(meta.get("n_vectors", 0)) + int(emb_new.count())
    meta["appended"] = True
    tmp = os.path.join(path, "meta.json.tmp")
    with open(tmp, "w") as fh:
        json.dump(meta, fh)
    os.replace(tmp, os.path.join(path, "meta.json"))
    return meta


def ivf_cell_stats(
    spark, path: str, skew_threshold: float = 4.0
) -> DataFrame:
    """Cell-skew observability for a persisted IVF table: one aggregate
    over the cells table (n_centroids rows out — empty cells included
    with count 0) with per-cell count, fraction, count/mean ratio, and a
    ``skewed`` flag at ``skew_threshold``×mean (the 4-8× re-cluster
    threshold documented on ``ivf_append``). Drive a rebuild decision
    from ``WHERE skewed`` — at 100 TB this is one map-combinable groupBy
    over the partition column, no vector payload touched."""
    import json
    import os

    from pyspark.sql import Window

    with open(os.path.join(path, "meta.json")) as fh:
        meta = json.load(fh)
    n_centroids = len(meta["centroids"])
    all_cells = spark.range(n_centroids).select(
        F.col("id").cast("int").alias("cell")
    )
    counts = (
        spark.read.parquet(f"{path}/cells")
        .groupBy(F.col("cell").cast("int").alias("cell"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    filled = (
        all_cells.join(counts, "cell", "left")
        .select("cell", F.coalesce("n", F.lit(0)).alias("n"))
    )
    total = F.sum("n").over(Window.partitionBy())
    mean = total / F.lit(n_centroids)
    return filled.select(
        "cell",
        "n",
        F.round(F.col("n") / total, 6).alias("fraction"),
        F.round(F.col("n") / mean, 4).alias("ratio_to_mean"),
        (F.col("n") / mean > F.lit(float(skew_threshold))).alias("skewed"),
    ).orderBy("cell")


def ivf_topk_persisted(
    spark,
    path: str,
    qvec: list[float],
    k: int = 10,
    n_probe: int = 4,
) -> DataFrame:
    """Query-time half of persisted IVF: pick the ``n_probe`` nearest cells
    driver-side, read ONLY those partitions of the write-time table (the
    cell filter is a partition filter — ``n_probe/n_centroids`` of a scan),
    exact-cosine re-rank within. Score-identical to ``ivf_topk`` with the
    same centroids by construction."""
    import json
    import os

    with open(os.path.join(path, "meta.json")) as fh:
        meta = json.load(fh)
    centroids = [
        (int(cid), [float(x) for x in cvec]) for cid, cvec in meta["centroids"]
    ]
    probes = _probe_cells(qvec, centroids, n_probe)
    cells = spark.read.parquet(f"{path}/cells").filter(F.col("cell").isin(probes))
    return cosine_topk(
        cells, qvec, k=k, id_col=meta["id_col"], vec_col=meta["vec_col"]
    )


def recall_at_k(
    emb: DataFrame,
    qvec: list[float],
    k: int = 10,
    **ivf_kwargs,
) -> float:
    """|ivf_topk ∩ exact topk| / k — the ANN quality metric for BENCH."""
    exact = {r[0] for r in cosine_topk(emb, qvec, k=k).collect()}
    approx = {r[0] for r in ivf_topk(emb, qvec, k=k, **ivf_kwargs).collect()}
    return len(exact & approx) / float(k)


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


def semantic_dup_pairs(
    emb: DataFrame,
    threshold: float = 0.9,
    n_bits: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup-style embedding near-duplicate pairs: (a, b, cos) for
    pairs in the SAME sign-bit bucket with cosine >= threshold (a < b).

    The bucket key bounds the pair join exactly like MinHash-LSH bands
    bound the Jaccard join: candidates are per-bucket, never all-pairs —
    at 10^12 rows the bucket (or an IVF cell id via ``ivf_assign``)
    becomes the table's partition key so each task joins one bucket.
    Residual risk is intra-bucket blowup (standard for LSH); raise
    ``n_bits`` (or switch the key to an IVF cell) to split hot buckets.
    Recall caveat mirrors signbucket_topk: near-dups differing in an early
    dim's sign are missed; multi-probe or IVF keys recover them.
    """
    keyed = emb.select(
        F.col(id_col), F.col(vec_col), _sign_key(vec_col, n_bits).alias("bkey")
    )
    a, b = keyed.alias("a"), keyed.alias("b")
    pairs = a.join(b, "bkey").filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
    av, bv = F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}")
    cos = _dot(av, bv) / (F.sqrt(_dot(av, av)) * F.sqrt(_dot(bv, bv)))
    return (
        pairs.select(
            F.col(f"a.{id_col}").alias("a"),
            F.col(f"b.{id_col}").alias("b"),
            cos.alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
        .select("a", "b", F.round("cos", 4).alias("cos"))
    )


# --- Vector similarity surface beyond top-k --------------------------------
#
# Threshold retrieval (search/AbstractVectorSimilarityQuery.java:46 — the
# Float/ByteVectorSimilarityQuery pair): return EVERY vector whose
# similarity to the query meets ``resultSimilarity``, not a fixed k. The
# Spark-first form is a filter over the scored scan — at 100 TB this is one
# map-only pass (no shuffle at all; the similarity expression is JVM
# codegen), and the same predicate composes with IVF cell pruning when the
# table is ivf_write-partitioned. Lucene's graph arm of the same query
# (traversalSimilarity + visitedLimit) lives in pipeline/hnsw.py as
# ``similarity_threshold_persisted``.


def _metric_sim(vec_col: str, qvec: list[float], metric: str) -> F.Column:
    """Similarity column per index/VectorSimilarityFunction.java:35-104:
    COSINE, DOT_PRODUCT (raw), EUCLIDEAN -> 1/(1+squared distance), and
    MAXIMUM_INNER_PRODUCT's positive scaling (dot<0 -> 1/(1-dot), else
    dot+1)."""
    q = F.array(*[F.lit(float(v)) for v in qvec])
    v = F.col(vec_col)
    if metric == "cosine":
        return _dot(v, q) / (F.sqrt(_dot(v, v)) * F.sqrt(_dot(q, q)))
    if metric == "dot":
        return _dot(v, q)
    if metric == "l2":
        d2 = F.aggregate(
            F.zip_with(
                v, q, lambda x, y: (x.cast("double") - y) * (x.cast("double") - y)
            ),
            F.lit(0.0),
            lambda acc, t: acc + t,
        )
        return F.lit(1.0) / (F.lit(1.0) + d2)
    if metric == "max_inner_product":
        d = _dot(v, q)
        return F.when(d < 0, F.lit(1.0) / (F.lit(1.0) - d)).otherwise(d + F.lit(1.0))
    raise ValueError(f"unknown metric: {metric}")


def similarity_threshold(
    emb: DataFrame,
    qvec: list[float],
    threshold: float,
    metric: str = "cosine",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """FloatVectorSimilarityQuery (search/FloatVectorSimilarityQuery.java:33):
    all vectors with similarity >= ``threshold`` (resultSimilarity), ordered
    (sim DESC, id ASC). The cut happens on the unrounded value; output sim
    is rounded to 4 like the top-k family."""
    scored = emb.select(
        F.col(id_col), _metric_sim(vec_col, qvec, metric).alias("sim")
    )
    return (
        scored.filter(F.col("sim") >= float(threshold))
        .orderBy(F.desc("sim"), F.asc(id_col))
        .select(id_col, F.round("sim", 4).alias("sim"))
    )


# Byte vectors (search/KnnByteVectorQuery.java:38 + ByteVectorSimilarity-
# Query.java:30): int8 vectors with DOT_PRODUCT similarity scaled into
# [0,1] as 0.5 + dot / (dim * 2^15) (VectorSimilarityFunction.java:66 byte
# branch). Quantization from a float column is deterministic
# floor(x*127 + 0.5) clamped to [-127,127] — reproducible in any SQL engine
# (no round-half-even ambiguity), standing in for an app-chosen quantizer.


def float_to_byte_vectors(
    emb: DataFrame,
    vec_col: str = "embedding",
    out_col: str = "bvec",
) -> DataFrame:
    """Deterministic int8 view of a float vector column (the input shape
    KnnByteVectorQuery consumes; Lucene stores these via
    KnnByteVectorField)."""
    return emb.withColumn(
        out_col,
        F.transform(
            F.col(vec_col),
            lambda x: F.greatest(
                F.lit(-127),
                F.least(F.lit(127), F.floor(x.cast("double") * 127.0 + 0.5)),
            ).cast("int"),
        ),
    )


def _byte_dot_sim(vec_col: str, qbytes: list[int]) -> F.Column:
    q = F.array(*[F.lit(int(v)) for v in qbytes])
    v = F.col(vec_col)
    dot = F.aggregate(
        F.zip_with(v, q, lambda x, y: (x * y).cast("double")),
        F.lit(0.0),
        lambda acc, t: acc + t,
    )
    return F.lit(0.5) + dot / F.lit(float(len(qbytes) * (1 << 15)))


def byte_topk(
    emb_bytes: DataFrame,
    qbytes: list[int],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "bvec",
) -> DataFrame:
    """KnnByteVectorQuery: exact top-k over int8 vectors by the scaled
    byte dot-product similarity, tie-break (sim DESC, id ASC)."""
    scored = emb_bytes.select(
        F.col(id_col), _byte_dot_sim(vec_col, qbytes).alias("sim")
    )
    top = scored.orderBy(F.desc("sim"), F.asc(id_col)).limit(k)
    return top.select(id_col, F.round("sim", 6).alias("sim"))


def byte_similarity_threshold(
    emb_bytes: DataFrame,
    qbytes: list[int],
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "bvec",
) -> DataFrame:
    """ByteVectorSimilarityQuery: every int8 vector whose scaled dot
    similarity meets resultSimilarity."""
    scored = emb_bytes.select(
        F.col(id_col), _byte_dot_sim(vec_col, qbytes).alias("sim")
    )
    return (
        scored.filter(F.col("sim") >= float(threshold))
        .orderBy(F.desc("sim"), F.asc(id_col))
        .select(id_col, F.round("sim", 6).alias("sim"))
    )


def diversified_children_topk(
    emb: DataFrame,
    qvec: list[float],
    k: int = 10,
    parent_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """DiversifyingChildrenFloatKnnVectorQuery (join/DiversifyingChildren-
    FloatKnnVectorQuery.java:43): kNN over CHILD vectors deduplicated by
    parent — each parent is represented by its single best-scoring child,
    then the top ``k`` parents win. One window shuffle on the parent key
    (map-side combinable at scale via a per-partition pre-topk), never
    all-pairs; ties (cos DESC, child id ASC), parents ranked the same way."""
    from pyspark.sql import Window

    scored = emb.select(
        F.col(parent_col).alias("parent"),
        F.col(id_col),
        _cosine(vec_col, qvec).alias("cos"),
    )
    w = Window.partitionBy("parent").orderBy(F.desc("cos"), F.asc(id_col))
    best = scored.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") == 1
    )
    top = best.orderBy(F.desc("cos"), F.asc("parent")).limit(k)
    return top.select("parent", id_col, F.round("cos", 4).alias("cos"))


def semantic_dup_pairs_ivf(
    emb: DataFrame,
    threshold: float = 0.9,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list[tuple[int, list[float]]] | None = None,
) -> DataFrame:
    """SemDeDup with LEARNED clusters (Abbas et al. 2023, arXiv:2303.09540
    — k-means the embeddings, compare pairs only within a cluster): the
    sign-bucket key of ``semantic_dup_pairs`` replaced by the IVF cell id
    (``ivf_train``'s k-means cells), which adapts to the data distribution
    instead of axis hyperplanes — the paper's actual recipe. Emits
    (a, b, cos) with a < b and cosine >= threshold, same contract as the
    sign-bucket form.

    Scale shape: one assignment pass (JVM codegen against broadcast
    centroid literals), then a per-cell self-join — never all-pairs; at
    10^12 rows the cell id is the table's partition key (ivf_write) so
    each task joins one cell. Recall caveat: near-dups straddling a cell
    boundary are missed — the paper accepts this; raise n_centroids'
    n_probe-style multi-assignment or rerun with reseeded centroids to
    tighten."""
    if centroids is None:
        centroids = ivf_train(emb, n_centroids, id_col=id_col, vec_col=vec_col)
    keyed = ivf_assign(emb, centroids, vec_col=vec_col).select(
        F.col(id_col), F.col(vec_col), F.col("cell")
    )
    a, b = keyed.alias("a"), keyed.alias("b")
    pairs = a.join(b, "cell").filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
    av, bv = F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}")
    cos = _dot(av, bv) / (F.sqrt(_dot(av, av)) * F.sqrt(_dot(bv, bv)))
    return (
        pairs.select(
            F.col(f"a.{id_col}").alias("a"),
            F.col(f"b.{id_col}").alias("b"),
            cos.alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
        .select("a", "b", F.round("cos", 4).alias("cos"))
    )
