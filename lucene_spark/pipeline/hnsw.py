"""HNSW-style graph ANN over an embedding column.

Spark-first decomposition that mirrors Lucene's vector-search model
(reference: lucene/core/src/java/org/apache/lucene/util/hnsw/
HnswGraphBuilder.java:38-72, HnswGraphSearcher.java:36-60, and the codec
lucene99/Lucene99HnswVectorsFormat.java:33-86): graphs are **per-leaf**
(Lucene builds one HNSW graph per segment and merges top-k across leaves in
IndexSearcher), so the Spark shape is

    groupBy(leaf) -> applyInPandas(build graph + beam search)  # one task/leaf
    -> global TakeOrdered(k)                                   # tiny merge

Nothing graph-shaped ever crosses the shuffle: each task holds one leaf's
vectors (exactly a segment's worth), builds the graph in numpy, runs the
beam search, and emits only its k candidates. At 10^12 rows the graph is
built once at write time per partition (``hnsw_build_leaf`` is the same
kernel) and persisted next to the vectors; query-time tasks load graph +
vectors for their leaf and run ``_search`` only — the plumbing here runs
build+search in one pass because test leaves are small.

Determinism contract (gate-oracle reproducible): level assignment uses a
splitmix64 hash of the vec_id (not an RNG stream, so it is independent of
insertion order and partitioning); insertion order is ascending vec_id;
neighbor selection is Lucene's diversity heuristic with (dist, id) ties.
With ``ef_search`` generous relative to the leaf size the search returns the
exact top-k (verified by recall tests), so the DuckDB oracle is the exact
cosine top-k query.
"""

from __future__ import annotations

import heapq

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "hnsw_topk",
    "hnsw_recall_at_k",
    "build_leaf_graph",
    "search_leaf_graph",
    "hnsw_write",
    "hnsw_topk_persisted",
    "hnsw_topk_quantized",
    "quantize_leaf",
    "collect_leaf_similar",
    "similarity_threshold_persisted",
    "GRAPH_SCHEMA",
]

# level multiplier 1/ln(M) as in HnswGraphBuilder.java:118 (ml = 1/ln(M))
_SPLITMIX_C1 = 0x9E3779B97F4A7C15
_SPLITMIX_C2 = 0xBF58476D1CE4E5B9
_SPLITMIX_C3 = 0x94D049BB133111EB
_U64 = (1 << 64) - 1


def _splitmix64(x: int) -> int:
    x = (x + _SPLITMIX_C1) & _U64
    x = ((x ^ (x >> 30)) * _SPLITMIX_C2) & _U64
    x = ((x ^ (x >> 27)) * _SPLITMIX_C3) & _U64
    return x ^ (x >> 31)


def _level_of(vec_id: int, ml: float) -> int:
    """Geometric level from a hash of the id (HnswGraphBuilder.java:
    getRandomGraphLevel uses ThreadLocalRandom; we key on the id so the
    graph is invariant to partitioning/insertion schedule)."""
    u = (_splitmix64(int(vec_id)) >> 11) / float(1 << 53)  # (0,1)
    if u <= 0.0:
        u = 2.0 ** -53
    return int(-np.log(u) * ml)


def build_leaf_graph(
    ids: np.ndarray,
    vecs: np.ndarray,
    m: int = 16,
    ef_construction: int = 100,
):
    """Build one leaf's HNSW graph. Returns (entry_idx, levels, layers)
    where layers[l] is a dict idx -> np.ndarray of neighbor idxs.

    Follows HnswGraphBuilder.java:193-260 (insert: greedy descent above the
    node's level, beam of ef_construction at and below it, diversity-pruned
    neighbor selection per NeighborArray semantics) on normalized vectors so
    max-inner-product == max-cosine.
    """
    n = len(ids)
    ml = 1.0 / np.log(max(m, 2))
    norms = np.linalg.norm(vecs, axis=1)
    norms[norms == 0.0] = 1.0
    unit = vecs / norms[:, None]

    levels = np.array([_level_of(i, ml) for i in ids], dtype=np.int64)
    max_level = int(levels.max(initial=0))
    layers: list[dict[int, list[int]]] = [dict() for _ in range(max_level + 1)]
    # max connections: M at upper layers, 2M at layer 0 (HnswGraphBuilder.java:117)
    max_conn = [2 * m] + [m] * max_level

    order = np.argsort(ids, kind="stable")  # insertion order: ascending id
    entry = -1
    entry_level = -1

    def sim(i: int, js: np.ndarray) -> np.ndarray:
        return unit[js] @ unit[i]

    def search_layer(qi: int, eps: list[int], ef: int, level: int) -> list[tuple[float, int]]:
        """Beam search on one layer; returns [(sim, idx)] best-first."""
        visited = {qi}
        cand: list[tuple[float, int]] = []  # max-heap via negated sim
        best: list[tuple[float, int]] = []  # min-heap of (sim, idx), size<=ef
        s0 = sim(qi, np.array(eps, dtype=np.int64))
        for s, e in zip(s0, eps):
            if e in visited and e != qi:
                continue
            visited.add(e)
            heapq.heappush(cand, (-float(s), e))
            heapq.heappush(best, (float(s), e))
            if len(best) > ef:
                heapq.heappop(best)
        while cand:
            cs, c = heapq.heappop(cand)
            if best and -cs < best[0][0] and len(best) >= ef:
                break
            nbrs = [x for x in layers[level].get(c, ()) if x not in visited]
            if not nbrs:
                continue
            arr = np.array(nbrs, dtype=np.int64)
            ss = sim(qi, arr)
            for s, e in zip(ss, arr):
                visited.add(int(e))
                s = float(s)
                if len(best) < ef or s > best[0][0]:
                    heapq.heappush(cand, (-s, int(e)))
                    heapq.heappush(best, (s, int(e)))
                    if len(best) > ef:
                        heapq.heappop(best)
        return sorted(best, key=lambda t: (-t[0], ids[t[1]]))

    def diverse(cands: list[tuple[float, int]], cap: int) -> list[int]:
        """Lucene's diversity heuristic (HnswGraphBuilder.java:283-311 /
        NeighborArray): keep c only if sim(q,c) > sim(c, kept) for all kept."""
        kept: list[int] = []
        for s, c in cands:
            if len(kept) >= cap:
                break
            if all(float(unit[c] @ unit[k]) < s for k in kept):
                kept.append(c)
        return kept

    def add_link(level: int, a: int, b: int) -> None:
        lst = layers[level].setdefault(a, [])
        if b in lst:
            return
        lst.append(b)
        cap = max_conn[level]
        if len(lst) > cap:
            # prune back with the same diversity rule (by sim to a)
            arr = np.array(lst, dtype=np.int64)
            ss = unit[arr] @ unit[a]
            ranked = sorted(zip(ss.tolist(), lst), key=lambda t: (-t[0], ids[t[1]]))
            layers[level][a] = diverse(ranked, cap)

    for oi in order:
        i = int(oi)
        li = int(levels[i])
        if entry < 0:
            entry, entry_level = i, li
            continue
        eps = [entry]
        # greedy descent above the node's level (HnswGraphSearcher.java:
        # findBestEntryPoint)
        for lvl in range(entry_level, li, -1):
            if lvl > max_level:
                continue
            changed = True
            while changed:
                changed = False
                cur = eps[0]
                nbrs = layers[lvl].get(cur, ())
                if nbrs:
                    arr = np.array(list(nbrs), dtype=np.int64)
                    ss = sim(i, arr)
                    j = int(np.argmax(ss))
                    if float(ss[j]) > float(unit[cur] @ unit[i]):
                        eps = [int(arr[j])]
                        changed = True
        # beam + connect at each level <= li
        for lvl in range(min(li, entry_level), -1, -1):
            found = search_layer(i, eps, ef_construction, lvl)
            nbrs = diverse(found, m)
            for b in nbrs:
                add_link(lvl, i, b)
                add_link(lvl, b, i)
            eps = [x for _, x in found] or eps
        if li > entry_level:
            entry, entry_level = i, li
    return entry, levels, layers


def search_leaf_graph(
    entry: int,
    levels: np.ndarray,
    layers: list[dict[int, list[int]]],
    ids: np.ndarray,
    vecs: np.ndarray,
    qvec: np.ndarray,
    k: int,
    ef_search: int,
    accept: np.ndarray | None = None,
    visited_limit: int | None = None,
    seed_idxs: np.ndarray | None = None,
    saturation_threshold: float | None = None,
    patience: int | None = None,
) -> list[tuple[float, int]] | None:
    """Beam search a built leaf graph for the query vector. Returns
    [(cosine, row_idx)] best-first with (cos DESC, id ASC) ties —
    HnswGraphSearcher.java:36-60 (descend greedily to layer 0, then beam of
    ef_search).

    ``seed_idxs`` (SeededKnnVectorQuery / Kulkarni et al. SIGIR'23
    lexically-accelerated dense retrieval): row idxs used as layer-0 entry
    points INSTEAD of the hierarchy descent — the seedWeight's matching
    docs become the beam's initial candidates (seeded EntryPointProvider);
    empty seeds fall back to the normal descent, as the reference does.

    ``saturation_threshold``/``patience`` (PatienceKnnVectorQuery.java:40 +
    HnswQueueSaturationCollector, Teofili & Lin ECIR'25): per candidate
    pop, queue saturation = min(collected, prev_collected)/collected; a
    run of more than ``patience`` consecutive saturated candidates stops
    the traversal with the queue as-is (an early-terminated but usable
    result, never the exact fallback). Defaults off.

    ``accept`` (acceptDocs, HnswGraphSearcher acceptOrds): boolean mask
    over row idxs — traversal crosses every node (graph connectivity) but
    only accepted nodes enter the result set, exactly Lucene's filtered
    graph search. ``visited_limit`` is the KnnCollector visitedLimit:
    returns None once more nodes have been visited than the limit — the
    caller then falls back to exact scoring over the accepted set, which
    by that point is provably cheaper (KnnFloatVectorQuery.java:61
    approximateSearch → exact fallback contract)."""
    if entry < 0 or len(ids) == 0:
        return []
    qn = float(np.linalg.norm(qvec)) or 1.0
    qu = qvec / qn
    norms = np.linalg.norm(vecs, axis=1)
    norms[norms == 0.0] = 1.0
    unit = vecs / norms[:, None]

    def qsim(js: np.ndarray) -> np.ndarray:
        return unit[js] @ qu

    ef = max(ef_search, k)
    if seed_idxs is not None and seed_idxs.size:
        # seeded entry: the beam starts at the seeds, no hierarchy descent
        ss = qsim(seed_idxs)
        visited = {int(i) for i in seed_idxs}
        cand = [(-float(s), int(i)) for s, i in zip(ss, seed_idxs)]
        heapq.heapify(cand)
        best = [
            (float(s), int(i))
            for s, i in zip(ss, seed_idxs)
            if accept is None or bool(accept[int(i)])
        ]
        heapq.heapify(best)
        while len(best) > ef:
            heapq.heappop(best)
    else:
        cur = entry
        for lvl in range(len(layers) - 1, 0, -1):
            changed = True
            while changed:
                changed = False
                nbrs = layers[lvl].get(cur, ())
                if nbrs:
                    arr = np.array(list(nbrs), dtype=np.int64)
                    ss = qsim(arr)
                    j = int(np.argmax(ss))
                    if float(ss[j]) > float(unit[cur] @ qu):
                        cur = int(arr[j])
                        changed = True
        # layer-0 beam
        visited = {cur}
        s0 = float(unit[cur] @ qu)
        cand = [(-s0, cur)]
        best = (
            [(s0, cur)] if accept is None or bool(accept[cur]) else []
        )
        if best:
            heapq.heapify(best)
    # patience state (HnswQueueSaturationCollector): collected counts
    # SUCCESSFUL queue insertions, saturation compares consecutive pops
    n_collected, prev_collected, sat_count = len(best), 0, 0
    while cand:
        if visited_limit is not None and len(visited) > visited_limit:
            return None  # budget blown: exact-over-accepted is cheaper now
        if saturation_threshold is not None and n_collected > 0:
            sat = min(n_collected, prev_collected) / n_collected
            prev_collected = n_collected
            if sat >= saturation_threshold:
                sat_count += 1
            else:
                sat_count = 0
            if sat_count > (patience or 7):
                break  # patience exhausted: return the queue as-is
        cs, c = heapq.heappop(cand)
        if best and -cs < best[0][0] and len(best) >= ef:
            break
        nbrs = [x for x in layers[0].get(c, ()) if x not in visited]
        if not nbrs:
            continue
        arr = np.array(nbrs, dtype=np.int64)
        ss = qsim(arr)
        for s, e in zip(ss, arr):
            visited.add(int(e))
            s = float(s)
            if len(best) < ef or s > best[0][0]:
                heapq.heappush(cand, (-s, int(e)))
                if accept is None or bool(accept[int(e)]):
                    heapq.heappush(best, (s, int(e)))
                    n_collected += 1
                    if len(best) > ef:
                        heapq.heappop(best)
    ranked = sorted(best, key=lambda t: (-t[0], ids[t[1]]))
    return ranked[:k]


def _leaf_hits_frame(
    ids: np.ndarray,
    vecs: np.ndarray,
    q: np.ndarray,
    hits: list[tuple[float, int]] | None,
    acc: np.ndarray | None,
    k: int,
) -> pd.DataFrame:
    """Exact cosine (same operand order as the oracle SQL) for graph hits;
    ``hits is None`` = visited budget blown -> exact scoring over the
    accepted rows (the KnnFloatVectorQuery exact fallback arm)."""
    qq = float(np.dot(q, q))
    if hits is None:
        idxs = np.flatnonzero(acc) if acc is not None else np.arange(ids.size)
        sims = [
            (
                float(np.dot(vecs[i], q))
                / (np.sqrt(float(np.dot(vecs[i], vecs[i]))) * np.sqrt(qq)),
                int(ids[i]),
                int(i),
            )
            for i in idxs
        ]
        sims.sort(key=lambda t: (-t[0], t[1]))
        return pd.DataFrame(
            [(vid, c) for c, vid, _ in sims[:k]], columns=["_id", "cos"]
        )
    rows = []
    for _, idx in hits:
        v = vecs[idx]
        cos = float(np.dot(v, q)) / (np.sqrt(float(np.dot(v, v))) * np.sqrt(qq))
        rows.append((int(ids[idx]), cos))
    return pd.DataFrame(rows, columns=["_id", "cos"])


def _filtered_leaf_search(
    entry,
    levels,
    layers,
    ids: np.ndarray,
    vecs: np.ndarray,
    q: np.ndarray,
    acc: np.ndarray | None,
    k: int,
    ef_search: int,
    seed_idxs: np.ndarray | None = None,
    saturation_threshold: float | None = None,
    patience: int | None = None,
) -> pd.DataFrame:
    """The per-leaf cost switch of KnnFloatVectorQuery.java:61: no filter →
    plain graph search; selective filter (accepted ≤ ef) → exact over the
    survivors (graph search cannot beat it); otherwise graph search with
    acceptOrds + visitedLimit = |accepted| (if the graph visits more nodes
    than an exact scan of the survivors would score, fall back).
    ``seed_idxs`` forwards SeededKnnVectorQuery entry points."""
    if acc is None:
        hits = search_leaf_graph(
            entry, levels, layers, ids, vecs, q, k, ef_search,
            seed_idxs=seed_idxs,
            saturation_threshold=saturation_threshold, patience=patience,
        )
        return _leaf_hits_frame(ids, vecs, q, hits, None, k)
    n_acc = int(acc.sum())
    if n_acc == 0:
        return pd.DataFrame({"_id": [], "cos": []}).astype(
            {"_id": "int64", "cos": "float64"}
        )
    if n_acc <= max(ef_search, k):
        return _leaf_hits_frame(ids, vecs, q, None, acc, k)
    hits = search_leaf_graph(
        entry, levels, layers, ids, vecs, q, k, ef_search,
        accept=acc, visited_limit=n_acc, seed_idxs=seed_idxs,
        saturation_threshold=saturation_threshold, patience=patience,
    )
    return _leaf_hits_frame(ids, vecs, q, hits, acc, k)


def hnsw_topk(
    emb: DataFrame,
    qvec: list[float],
    k: int = 10,
    m: int = 16,
    ef_construction: int = 100,
    ef_search: int = 128,
    n_leaves: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    filter_expr: str | None = None,
) -> DataFrame:
    """Graph-ANN top-k: per-leaf HNSW build+search inside applyInPandas,
    global (cos DESC, id ASC) merge of the per-leaf candidates. Output
    (id, cos) with cos rounded to 4 (cut on the unrounded value).

    ``n_leaves`` plays the role of segment count: leaves are hash-split so
    each task sees one leaf. At write-time scale, persist the graph via
    ``build_leaf_graph`` per partition instead of rebuilding per query.

    ``filter_expr`` (acceptDocs): a Catalyst predicate over ``emb``'s
    columns evaluated JVM-side into a per-row accept flag that rides into
    the leaf task; the graph is built/searched over ALL rows but only
    accepted rows can be returned, with the exact-over-survivors cost
    switch per leaf (KnnFloatVectorQuery semantics)."""
    q = np.asarray([float(v) for v in qvec], dtype=np.float64)
    out_schema = T.StructType(
        [
            T.StructField("_id", T.LongType(), False),
            T.StructField("cos", T.DoubleType(), False),
        ]
    )

    def leaf_search(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf["_id"].to_numpy(dtype=np.int64)
        vecs = np.stack(
            [np.asarray(v, dtype=np.float64) for v in pdf["_vec"]]
        )
        acc = (
            pdf["_ok"].to_numpy(dtype=bool) if "_ok" in pdf.columns else None
        )
        order = np.argsort(ids, kind="stable")
        ids, vecs = ids[order], vecs[order]
        if acc is not None:
            acc = acc[order]
        entry, levels, layers = build_leaf_graph(
            ids, vecs, m=m, ef_construction=ef_construction
        )
        return _filtered_leaf_search(
            entry, levels, layers, ids, vecs, q, acc, k, ef_search
        )

    cols = [
        F.col(id_col).cast("long").alias("_id"),
        F.col(vec_col).alias("_vec"),
        (F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_leaves))).alias("_leaf"),
    ]
    if filter_expr is not None:
        cols.append(F.expr(filter_expr).cast("boolean").alias("_ok"))
    keyed = emb.select(*cols)
    per_leaf = keyed.groupBy("_leaf").applyInPandas(leaf_search, out_schema)
    top = per_leaf.orderBy(F.desc("cos"), F.asc("_id")).limit(k)
    return top.select(
        F.col("_id").alias(id_col), F.round("cos", 4).alias("cos")
    )


def hnsw_recall_at_k(
    emb: DataFrame,
    qvec: list[float],
    k: int = 10,
    **kwargs,
) -> float:
    """|hnsw_topk ∩ exact topk| / k — the ANN quality metric for BENCH."""
    from .simsearch import cosine_topk

    exact = {r[0] for r in cosine_topk(emb, qvec, k=k).collect()}
    approx = {r[0] for r in hnsw_topk(emb, qvec, k=k, **kwargs).collect()}
    return len(exact & approx) / float(k)


# --- persisted graphs (write-time build, the Lucene99HnswVectorsFormat
# analog: graphs are codec files written at flush, not rebuilt per query) --

GRAPH_SCHEMA = "leaf int, node long, lvl int, nbrs array<long>"


def _leaf_col(id_col: str, n_leaves: int) -> F.Column:
    return F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_leaves)).cast("int")


def _graph_rows_fn(m: int, ef_construction: int):
    """applyInPandas body: one leaf's vectors → its persisted graph rows
    (leaf, node, lvl, nbrs) — shared by hnsw_write and hnsw_append."""

    def build_rows(pdf: pd.DataFrame) -> pd.DataFrame:
        leaf = int(pdf["_leaf"].iloc[0])
        ids = pdf["_id"].to_numpy(dtype=np.int64)
        vecs = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["_vec"]])
        order = np.argsort(ids, kind="stable")
        ids, vecs = ids[order], vecs[order]
        _entry, levels, layers = build_leaf_graph(
            ids, vecs, m=m, ef_construction=ef_construction
        )
        out_leaf, out_node, out_lvl, out_nbrs = [], [], [], []
        for lvl in range(len(layers)):
            members = np.flatnonzero(levels >= lvl)
            layer = layers[lvl]
            for idx in members:
                out_leaf.append(leaf)
                out_node.append(int(ids[idx]))
                out_lvl.append(lvl)
                out_nbrs.append([int(ids[j]) for j in layer.get(int(idx), ())])
        return pd.DataFrame(
            {"leaf": out_leaf, "node": out_node, "lvl": out_lvl, "nbrs": out_nbrs}
        )

    return build_rows


def _qvec_rows_fn():
    """applyInPandas body: one leaf's vectors → int8 code rows with the
    [lo, hi] sentinel — shared by hnsw_write and hnsw_append."""
    import struct as _struct

    def quant_rows(pdf: pd.DataFrame) -> pd.DataFrame:
        leaf = int(pdf["_leaf"].iloc[0])
        ids = pdf["_id"].to_numpy(dtype=np.int64)
        vecs = np.stack(
            [np.asarray(v, dtype=np.float64) for v in pdf["_vec"]]
        )
        order = np.argsort(ids, kind="stable")
        ids, vecs = ids[order], vecs[order]
        codes, lo, hi = quantize_leaf(vecs)
        out = [(leaf, _QMETA_NODE, _struct.pack("<2d", lo, hi))]
        out.extend(
            (leaf, int(i), codes[r].tobytes()) for r, i in enumerate(ids)
        )
        return pd.DataFrame(out, columns=["leaf", "node", "qv"])

    return quant_rows


def hnsw_write(
    emb: DataFrame,
    path: str,
    n_leaves: int = 1,
    m: int = 16,
    ef_construction: int = 100,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    quantize: bool = False,
) -> dict:
    """Build per-leaf HNSW graphs ONCE and persist them as parquet rows
    (leaf, node, lvl, nbrs) partitioned by leaf — the write-time codec path
    (Lucene99HnswVectorsFormat writes the graph at segment flush). Every
    (node, lvl ≤ node's level) pair gets a row (possibly empty nbrs), so a
    reader recovers layer membership and the entry point (min node id on
    the top layer — the build rule's deterministic entry). Returns the
    meta dict, also written to ``<path>/meta.json``."""
    import json
    import os

    keyed = emb.select(
        F.col(id_col).cast("long").alias("_id"),
        F.col(vec_col).alias("_vec"),
        _leaf_col(id_col, n_leaves).alias("_leaf"),
    )
    rows = keyed.groupBy("_leaf").applyInPandas(
        _graph_rows_fn(m, ef_construction), GRAPH_SCHEMA
    )
    rows.write.mode("overwrite").partitionBy("leaf").parquet(f"{path}/graph")
    if quantize:
        # int8 codes next to the graph (Lucene99ScalarQuantizedVectorsFormat
        # writes .veq alongside .vex): per-leaf confidence-interval
        # quantization, [lo, hi] stored as a node=-1 sentinel row per leaf
        (
            keyed.groupBy("_leaf")
            .applyInPandas(_qvec_rows_fn(), _QVEC_SCHEMA)
            .write.mode("overwrite")
            .partitionBy("leaf")
            .parquet(f"{path}/qvecs")
        )
    # staleness fingerprint: per-leaf vector counts at build time. A later
    # append/delete on the vector table changes a leaf's count, and the
    # search path refuses to silently skip the un-indexed vectors.
    leaf_counts = {
        str(int(r["_leaf"])): int(r["cnt"])
        for r in keyed.groupBy("_leaf").agg(F.count("*").alias("cnt")).collect()
    }
    meta = {
        "n_leaves": int(n_leaves),
        "m": int(m),
        "ef_construction": int(ef_construction),
        "n_vectors": int(sum(leaf_counts.values())),
        "leaf_counts": leaf_counts,
        "quantized": bool(quantize),
    }
    with open(os.path.join(path, "meta.json"), "w") as fh:
        json.dump(meta, fh)
    return meta


def hnsw_append(
    spark,
    emb_new: DataFrame,
    path: str,
    n_new_leaves: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> dict:
    """Incrementally index appended vectors as NEW leaves — the NRT
    micro-batch analog (Lucene appends segments at flush and never rewrites
    committed ones; IndexWriter.addDocument → new segment,
    index/IndexWriter.java). Each append batch becomes ``n_new_leaves``
    fresh leaves holding exactly that batch's vectors:

    - graph rows land in NEW leaf partitions of ``<path>/graph`` (parquet
      append — committed partitions untouched, readers of a prior snapshot
      stay consistent)
    - quantized codes follow into ``<path>/qvecs`` when the index was
      written with ``quantize=True``
    - the (vec_id → leaf) ownership of appended ids is recorded in
      ``<path>/assign`` (the docBase analog: base ids keep the hash rule,
      appended ids route by ownership); the query-side join is co-keyed on
      the id and broadcast by AQE while the appended set is small
    - ``meta.json`` is atomically replaced with the new per-leaf counts, so
      the searcher's staleness check covers the appended leaves too

    Appending a vec_id that already exists in the base table is NOT
    merged: the id re-routes to its append leaf and the base leaf's count
    check then fails loudly at query time — rebuild (hnsw_write) to dedup,
    exactly like Lucene needs an explicit update-document, not a raw add.

    Returns the updated meta dict."""
    import json
    import os

    with open(os.path.join(path, "meta.json")) as fh:
        meta = json.load(fh)
    m = int(meta["m"])
    efc = int(meta["ef_construction"])
    leaf_counts = {int(k): int(v) for k, v in meta["leaf_counts"].items()}
    next_leaf = max(leaf_counts) + 1

    keyed = emb_new.select(
        F.col(id_col).cast("long").alias("_id"),
        F.col(vec_col).alias("_vec"),
        (
            F.lit(next_leaf)
            + F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_new_leaves)).cast("int")
        ).cast("int").alias("_leaf"),
    )
    rows = keyed.groupBy("_leaf").applyInPandas(
        _graph_rows_fn(m, efc), GRAPH_SCHEMA
    )
    rows.write.mode("append").partitionBy("leaf").parquet(f"{path}/graph")
    if meta.get("quantized"):
        (
            keyed.groupBy("_leaf")
            .applyInPandas(_qvec_rows_fn(), _QVEC_SCHEMA)
            .write.mode("append")
            .partitionBy("leaf")
            .parquet(f"{path}/qvecs")
        )
    keyed.select(
        F.col("_id").alias("vec_id"), F.col("_leaf").cast("int").alias("leaf")
    ).write.mode("append").parquet(f"{path}/assign")

    new_counts = {
        int(r["_leaf"]): int(r["cnt"])
        for r in keyed.groupBy("_leaf").agg(F.count("*").alias("cnt")).collect()
    }
    leaf_counts.update(new_counts)
    meta["leaf_counts"] = {str(k2): v for k2, v in sorted(leaf_counts.items())}
    meta["n_vectors"] = int(sum(leaf_counts.values()))
    # meta["n_leaves"] stays the BASE leaf count — it parameterizes the
    # hash-routing of base ids and must never change on append
    meta["n_total_leaves"] = len(leaf_counts)
    meta["appended"] = True
    tmp = os.path.join(path, "meta.json.tmp")
    with open(tmp, "w") as fh:
        json.dump(meta, fh)
    os.replace(tmp, os.path.join(path, "meta.json"))
    return meta


# --- int8 scalar quantization (Lucene99ScalarQuantizedVectorsFormat.java:40
# confidence-interval scheme: clip components to the [lo, hi] quantile
# interval of the NORMALIZED component distribution, 7-bit quantize; search
# runs on the quantized bytes — 1/4 the scan bandwidth of float32 — and the
# float vectors are touched only to rescore the oversampled top candidates) -


def quantize_leaf(
    vecs: np.ndarray, confidence: float | None = None
) -> tuple[np.ndarray, float, float]:
    """Quantize one leaf's vectors: normalize (cosine similarity becomes a
    dot product, the VectorSimilarityFunction.COSINE pre-step), take the
    [1-ci, ci] component quantiles as the clip interval (the
    Lucene99ScalarQuantizer confidenceInterval default 1 - 1/(dim+1)),
    quantize to 7-bit uint8. Returns (qvecs uint8 [n, dim], lo, hi)."""
    dim = vecs.shape[1]
    if confidence is None:
        confidence = 1.0 - 1.0 / (dim + 1)
    norms = np.linalg.norm(vecs, axis=1)
    norms[norms == 0.0] = 1.0
    unit = vecs / norms[:, None]
    lo = float(np.quantile(unit, 1.0 - confidence))
    hi = float(np.quantile(unit, confidence))
    if hi <= lo:
        hi = lo + 1e-9
    step = (hi - lo) / 127.0
    q = np.clip(np.rint((np.clip(unit, lo, hi) - lo) / step), 0, 127)
    return q.astype(np.uint8), lo, hi


def _dequantize(qbytes: np.ndarray, lo: float, hi: float) -> np.ndarray:
    return lo + qbytes.astype(np.float64) * ((hi - lo) / 127.0)


_QVEC_SCHEMA = "leaf int, node long, qv binary"
_QMETA_NODE = -1  # sentinel row per leaf: qv = struct.pack('<2d', lo, hi)


def hnsw_topk_quantized(
    spark,
    emb: DataFrame,
    path: str,
    qvec: list[float],
    k: int = 10,
    ef_search: int = 128,
    oversample: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    filter_expr: str | None = None,
    seed_ids: list[int] | None = None,
    saturation_threshold: float | None = None,
    patience: int | None = None,
) -> DataFrame:
    """Search the persisted graph on the int8-QUANTIZED vectors (written by
    ``hnsw_write(..., quantize=True)``) — the query-time scan reads the
    graph + 1-byte-per-component codes, never the float table — then
    rescore the ``k*oversample`` merged candidates with exact float cosine
    (a selective semi-join against ``emb`` of O(k) rows). Output matches
    ``hnsw_topk_persisted`` whenever the true top-k survive the
    oversampled candidate set (Lucene99's quantized-search + re-rank
    shape).

    ``filter_expr`` (acceptDocs) composes with quantization the way the
    reference composes them (KnnFloatVectorQuery.java:61 runs over ANY
    VectorScorer, quantized included): the predicate is evaluated
    JVM-side over ``emb``'s columns, joined onto the code table by id,
    and the per-leaf cost switch (_filtered_leaf_search) picks graph+
    accept-mask+visitedLimit or exact-over-survivors on the DEQUANTIZED
    codes; the float rescore re-applies the predicate.

    ``seed_ids`` / ``saturation_threshold`` / ``patience`` compose too
    (SeededKnnVectorQuery / PatienceKnnVectorQuery wrap any delegate
    scorer): seeds enter the layer-0 beam over the code table, patience
    stops a saturated traversal — same semantics as
    ``hnsw_topk_persisted``."""
    import json
    import os
    import struct as _struct

    if saturation_threshold is not None and patience is None:
        patience = max(7, int(k * 0.3))

    with open(os.path.join(path, "meta.json")) as fh:
        meta = json.load(fh)
    if not meta.get("quantized"):
        raise ValueError(
            f"no quantized vectors at {path}: rebuild with "
            "hnsw_write(..., quantize=True)"
        )
    q = np.asarray([float(v) for v in qvec], dtype=np.float64)
    qn = float(np.linalg.norm(q)) or 1.0
    qu = q / qn
    n_cand = max(int(k) * int(oversample), int(k))
    out_schema = T.StructType(
        [
            T.StructField("_id", T.LongType(), False),
            T.StructField("qcos", T.DoubleType(), False),
        ]
    )

    def leaf_search(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"_id": [], "qcos": []}).astype(
            {"_id": "int64", "qcos": "float64"}
        )
        if len(left) == 0 or len(right) == 0:
            return empty
        meta_mask = left["node"].to_numpy() == _QMETA_NODE
        metas = left[meta_mask]
        if len(metas) != 1:
            return empty
        lo, hi = _struct.unpack("<2d", bytes(metas["qv"].iloc[0]))
        data = left[~meta_mask]
        ids = data["node"].to_numpy(dtype=np.int64)
        codes = np.stack(
            [np.frombuffer(bytes(b), dtype=np.uint8) for b in data["qv"]]
        )
        acc = (
            data["_ok"].to_numpy(dtype=bool)
            if "_ok" in data.columns
            else None
        )
        order = np.argsort(ids, kind="stable")
        ids, codes = ids[order], codes[order]
        if acc is not None:
            acc = acc[order]
        vecs = _dequantize(codes, lo, hi)  # ~unit vectors
        idx_of = {int(v): i for i, v in enumerate(ids)}
        max_lvl = int(right["lvl"].max())
        layers: list[dict[int, list[int]]] = [dict() for _ in range(max_lvl + 1)]
        levels = np.zeros(ids.size, dtype=np.int64)
        top_nodes = []
        for node, lvl, nbrs in zip(right["node"], right["lvl"], right["nbrs"]):
            i = idx_of[int(node)]
            lvl = int(lvl)
            levels[i] = max(levels[i], lvl)
            if len(nbrs):
                layers[lvl][i] = [idx_of[int(x)] for x in nbrs]
            if lvl == max_lvl:
                top_nodes.append(i)
        entry = min(top_nodes, key=lambda i: int(ids[i]))
        seed_idxs = None
        if seed_ids:
            idx_map = {int(v): i for i, v in enumerate(ids)}
            seed_idxs = np.asarray(
                sorted(idx_map[s] for s in seed_ids if s in idx_map),
                dtype=np.int64,
            )
        # the shared cost switch: no filter → plain graph search;
        # selective → exact over the accepted codes; else graph+mask with
        # visitedLimit and exact fallback (same arm as the float path)
        frame = _filtered_leaf_search(
            entry, levels, layers, ids, vecs, qu, acc, n_cand,
            max(ef_search, n_cand), seed_idxs=seed_idxs,
            saturation_threshold=saturation_threshold, patience=patience,
        )
        return frame.rename(columns={"cos": "qcos"})

    qvecs = spark.read.parquet(f"{path}/qvecs").select(
        F.col("leaf").cast("int").alias("leaf"), "node", "qv"
    )
    if filter_expr is not None:
        # acceptDocs ride the code table: predicate evaluated JVM-side
        # over emb, joined by id (the meta sentinel row node=-1 never
        # matches and keeps _ok null — it is split off before masking;
        # stale code rows missing from emb default to rejected)
        flags = emb.select(
            F.col(id_col).cast("long").alias("_fid"),
            F.expr(filter_expr).cast("boolean").alias("_ok"),
        )
        qvecs = (
            qvecs.join(flags, qvecs["node"] == flags["_fid"], "left")
            .withColumn(
                "_ok",
                F.when(F.col("node") == _QMETA_NODE, F.lit(True)).otherwise(
                    F.coalesce("_ok", F.lit(False))
                ),
            )
            .drop("_fid")
        )
    graph = spark.read.parquet(f"{path}/graph").select(
        F.col("leaf").cast("int").alias("leaf"), "node", "lvl", "nbrs"
    )
    cands = (
        qvecs.groupBy("leaf")
        .cogroup(graph.groupBy("leaf"))
        .applyInPandas(leaf_search, out_schema)
        .orderBy(F.desc("qcos"), F.asc("_id"))
        .limit(n_cand)
        .select("_id")
    )
    # float rescore: exact cosine for the few surviving candidates only —
    # the one touch of the float table, a broadcast semi-join by id
    from .simsearch import _cosine

    if filter_expr is not None:
        emb = emb.where(F.expr(filter_expr))
    scored = emb.join(
        F.broadcast(cands), emb[id_col] == cands["_id"], "leftsemi"
    ).select(
        F.col(id_col), _cosine(vec_col, [float(v) for v in qvec]).alias("cos")
    )
    top = scored.orderBy(F.desc("cos"), F.asc(id_col)).limit(k)
    return top.select(F.col(id_col), F.round("cos", 4).alias("cos"))


def hnsw_topk_persisted(
    spark,
    emb: DataFrame,
    path: str,
    qvec: list[float],
    k: int = 10,
    ef_search: int = 128,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    filter_expr: str | None = None,
    seed_ids: list[int] | None = None,
    saturation_threshold: float | None = None,
    patience: int | None = None,
) -> DataFrame:
    """Search a persisted graph: vectors and graph rows cogroup per leaf
    (one task per leaf holds its vectors + its graph — no build cost at
    query time), beam-search, global (cos DESC, id ASC) merge. At 10^12
    rows the leaf is the table's partition key, so each query task reads
    one graph partition and one vector partition.

    ``filter_expr`` (acceptDocs): evaluated JVM-side over ``emb``'s
    columns into a per-row flag; the persisted graph is searched with the
    accept mask + visited budget, falling back to exact-over-survivors
    when the filter is selective (KnnFloatVectorQuery.java:61).

    ``seed_ids`` (SeededKnnVectorQuery, search/SeededKnnVectorQuery.java:43
    — Kulkarni et al., "Lexically-Accelerated Dense Retrieval", SIGIR'23):
    ids whose rows seed the layer-0 beam as entry points — typically a
    cheap lexical query's top docs; a leaf holding none of the seeds falls
    back to the normal hierarchy descent, matching the reference's
    seed-exhausted fallback.

    ``saturation_threshold``/``patience`` (PatienceKnnVectorQuery.java:40,
    Teofili & Lin ECIR'25): stop a leaf's traversal after more than
    ``patience`` consecutive candidates fail to grow the result queue by
    at least (1 - threshold) relative — the reference default threshold is
    0.995 and patience max(7, 0.3·k) (PatienceKnnVectorQuery.java:135)."""
    if saturation_threshold is not None and patience is None:
        patience = max(7, int(k * 0.3))
    import json
    import os

    with open(os.path.join(path, "meta.json")) as fh:
        meta = json.load(fh)
    n_leaves = int(meta["n_leaves"])
    q = np.asarray([float(v) for v in qvec], dtype=np.float64)
    out_schema = T.StructType(
        [
            T.StructField("_id", T.LongType(), False),
            T.StructField("cos", T.DoubleType(), False),
        ]
    )

    leaf_counts = {int(k2): int(v) for k2, v in meta.get("leaf_counts", {}).items()}

    def leaf_search(key, left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        leaf = int(key[0])
        expected = leaf_counts.get(leaf)
        if expected is not None and len(left) != expected:
            raise ValueError(
                f"hnsw graph at leaf {leaf} is stale: {len(left)} vectors in "
                f"the table vs {expected} indexed at hnsw_write time — "
                "rebuild required (vectors appended/removed after the graph "
                "was persisted would otherwise be silently unsearchable)"
            )
        if len(left) == 0 or len(right) == 0:
            return pd.DataFrame({"_id": [], "cos": []}).astype(
                {"_id": "int64", "cos": "float64"}
            )
        ids = left["_id"].to_numpy(dtype=np.int64)
        vecs = np.stack([np.asarray(v, dtype=np.float64) for v in left["_vec"]])
        acc = (
            left["_ok"].to_numpy(dtype=bool) if "_ok" in left.columns else None
        )
        order = np.argsort(ids, kind="stable")
        ids, vecs = ids[order], vecs[order]
        if acc is not None:
            acc = acc[order]
        idx_of = {int(v): i for i, v in enumerate(ids)}
        missing = [int(n2) for n2 in right["node"] if int(n2) not in idx_of]
        if missing:
            raise ValueError(
                f"hnsw graph at leaf {leaf} is stale: graph node(s) "
                f"{missing[:5]} not present in the vector table — rebuild "
                "required"
            )
        max_lvl = int(right["lvl"].max())
        layers: list[dict[int, list[int]]] = [dict() for _ in range(max_lvl + 1)]
        levels = np.zeros(ids.size, dtype=np.int64)
        top_nodes = []
        for node, lvl, nbrs in zip(right["node"], right["lvl"], right["nbrs"]):
            i = idx_of[int(node)]
            lvl = int(lvl)
            levels[i] = max(levels[i], lvl)
            if len(nbrs):
                layers[lvl][i] = [idx_of[int(x)] for x in nbrs]
            if lvl == max_lvl:
                top_nodes.append(i)
        entry = min(top_nodes, key=lambda i: int(ids[i]))
        seed_idxs = None
        if seed_ids:
            seed_idxs = np.asarray(
                sorted(idx_of[s] for s in seed_ids if s in idx_of),
                dtype=np.int64,
            )
        return _filtered_leaf_search(
            entry, levels, layers, ids, vecs, q, acc, k, ef_search,
            seed_idxs=seed_idxs,
            saturation_threshold=saturation_threshold, patience=patience,
        )

    graph = spark.read.parquet(f"{path}/graph").select(
        F.col("leaf").cast("int").alias("leaf"), "node", "lvl", "nbrs"
    )
    sel = [
        F.col(id_col).cast("long").alias("_id"),
        F.col(vec_col).alias("_vec"),
        _leaf_col(id_col, n_leaves).alias("_leaf"),
    ]
    if filter_expr is not None:
        sel.append(F.expr(filter_expr).cast("boolean").alias("_ok"))
    keyed = emb.select(*sel)
    if meta.get("appended"):
        # appended ids route by recorded ownership (hnsw_append), base ids
        # by the hash rule — coalesce order makes ownership win
        assign = spark.read.parquet(f"{path}/assign").select(
            F.col("vec_id").cast("long").alias("_aid"),
            F.col("leaf").cast("int").alias("_aleaf"),
        )
        keyed = (
            keyed.join(assign, keyed["_id"] == assign["_aid"], "left")
            .withColumn("_leaf", F.coalesce("_aleaf", "_leaf"))
            .drop("_aid", "_aleaf")
        )
    per_leaf = (
        keyed.groupBy("_leaf")
        .cogroup(graph.groupBy("leaf"))
        .applyInPandas(leaf_search, out_schema)
    )
    top = per_leaf.orderBy(F.desc("cos"), F.asc("_id")).limit(k)
    return top.select(
        F.col("_id").alias(id_col), F.round("cos", 4).alias("cos")
    )


# --- threshold retrieval over the persisted graph ---------------------------
# search/AbstractVectorSimilarityQuery.java:46 (Float/ByteVectorSimilarity-
# Query's approximate arm) + search/VectorSimilarityCollector.java: a
# similarity-bounded graph traversal — explore while candidate similarity
# >= traversalSimilarity, collect every visited node >= resultSimilarity,
# and if the visited budget blows, fall back to the exact scan arm
# (pipeline/simsearch.similarity_threshold) over that leaf.


def collect_leaf_similar(
    entry: int,
    levels: np.ndarray,
    layers: list[dict[int, list[int]]],
    ids: np.ndarray,
    vecs: np.ndarray,
    qvec: np.ndarray,
    result_sim: float,
    traversal_sim: float,
    visited_limit: int | None = None,
) -> list[tuple[float, int]] | None:
    """Similarity-bounded traversal of one leaf graph. Returns
    [(cosine, row_idx)] of nodes >= result_sim, or None when the visited
    budget is exceeded (caller falls back to the exact arm). Exploration
    follows VectorSimilarityCollector: a branch is expanded only while the
    best candidate's similarity >= traversal_sim, so recall below the
    traversal bound is best-effort — exactly the reference contract."""
    if entry < 0 or len(ids) == 0:
        return []
    qn = float(np.linalg.norm(qvec)) or 1.0
    qu = qvec / qn
    norms = np.linalg.norm(vecs, axis=1)
    norms[norms == 0.0] = 1.0
    unit = vecs / norms[:, None]

    cur = entry
    for lvl in range(len(layers) - 1, 0, -1):
        changed = True
        while changed:
            changed = False
            nbrs = layers[lvl].get(cur, ())
            if nbrs:
                arr = np.array(list(nbrs), dtype=np.int64)
                ss = unit[arr] @ qu
                j = int(np.argmax(ss))
                if float(ss[j]) > float(unit[cur] @ qu):
                    cur = int(arr[j])
                    changed = True

    visited = {cur}
    s0 = float(unit[cur] @ qu)
    cand = [(-s0, cur)]
    out: list[tuple[float, int]] = []
    while cand:
        if visited_limit is not None and len(visited) > visited_limit:
            return None
        cs, c = heapq.heappop(cand)
        s = -cs
        if s < traversal_sim and out:
            break  # every remaining candidate is below the traversal bound
        if s >= result_sim:
            out.append((s, c))
        nbrs = [x for x in layers[0].get(c, ()) if x not in visited]
        if not nbrs:
            continue
        arr = np.array(nbrs, dtype=np.int64)
        ss = unit[arr] @ qu
        for sv, e in zip(ss, arr):
            visited.add(int(e))
            sv = float(sv)
            if sv >= traversal_sim:
                heapq.heappush(cand, (-sv, int(e)))
    return sorted(out, key=lambda t: (-t[0], ids[t[1]]))


def similarity_threshold_persisted(
    spark,
    emb: DataFrame,
    path: str,
    qvec: list[float],
    result_sim: float,
    traversal_sim: float | None = None,
    visited_ratio: float = 1.0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """FloatVectorSimilarityQuery's approximate arm over persisted per-leaf
    graphs: each leaf task runs the similarity-bounded traversal; a leaf
    whose visited count exceeds ``visited_ratio * leaf_size`` falls back to
    exact scoring of that leaf (the reference's exact fallback). Output =
    (id, sim) for sim >= result_sim, ordered (sim DESC, id ASC); EXACT cosine
    is recomputed for emitted rows so scores match the brute arm bit-for-bit.
    ``traversal_sim`` defaults to result_sim (the reference default when the
    traversal bound is not given)."""
    import json
    import os

    if traversal_sim is None:
        traversal_sim = result_sim
    with open(os.path.join(path, "meta.json")) as fh:
        meta = json.load(fh)
    n_leaves = int(meta["n_leaves"])
    leaf_counts = {int(k2): int(v) for k2, v in meta.get("leaf_counts", {}).items()}
    q = np.asarray([float(v) for v in qvec], dtype=np.float64)
    out_schema = T.StructType(
        [
            T.StructField("_id", T.LongType(), False),
            T.StructField("cos", T.DoubleType(), False),
        ]
    )

    def leaf_search(key, left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        leaf = int(key[0])
        expected = leaf_counts.get(leaf)
        if expected is not None and len(left) != expected:
            raise ValueError(
                f"hnsw graph at leaf {leaf} is stale: {len(left)} vectors vs "
                f"{expected} indexed at hnsw_write time — rebuild required"
            )
        if len(left) == 0 or len(right) == 0:
            return pd.DataFrame({"_id": [], "cos": []}).astype(
                {"_id": "int64", "cos": "float64"}
            )
        ids = left["_id"].to_numpy(dtype=np.int64)
        vecs = np.stack([np.asarray(v, dtype=np.float64) for v in left["_vec"]])
        order = np.argsort(ids, kind="stable")
        ids, vecs = ids[order], vecs[order]
        idx_of = {int(v): i for i, v in enumerate(ids)}
        max_lvl = int(right["lvl"].max())
        layers: list[dict[int, list[int]]] = [dict() for _ in range(max_lvl + 1)]
        levels = np.zeros(ids.size, dtype=np.int64)
        top_nodes = []
        for node, lvl, nbrs in zip(right["node"], right["lvl"], right["nbrs"]):
            i = idx_of[int(node)]
            lvl = int(lvl)
            levels[i] = max(levels[i], lvl)
            if len(nbrs):
                layers[lvl][i] = [idx_of[int(x)] for x in nbrs]
            if lvl == max_lvl:
                top_nodes.append(i)
        entry = min(top_nodes, key=lambda i: int(ids[i]))
        budget = max(1, int(visited_ratio * ids.size))
        hits = collect_leaf_similar(
            entry, levels, layers, ids, vecs, q,
            float(result_sim), float(traversal_sim), visited_limit=budget,
        )
        qq = float(np.dot(q, q))
        if hits is None:
            # exact fallback over the whole leaf (same operand order as
            # the SQL oracle, so emitted scores are engine-identical)
            rows = []
            for i in range(ids.size):
                v = vecs[i]
                cos = float(np.dot(v, q)) / (
                    np.sqrt(float(np.dot(v, v))) * np.sqrt(qq)
                )
                if cos >= float(result_sim):
                    rows.append((int(ids[i]), cos))
            return pd.DataFrame(rows, columns=["_id", "cos"]).astype(
                {"_id": "int64", "cos": "float64"}
            )
        rows = []
        for _, i in hits:
            v = vecs[i]
            cos = float(np.dot(v, q)) / (np.sqrt(float(np.dot(v, v))) * np.sqrt(qq))
            if cos >= float(result_sim):
                rows.append((int(ids[i]), cos))
        return pd.DataFrame(rows, columns=["_id", "cos"]).astype(
            {"_id": "int64", "cos": "float64"}
        )

    graph = spark.read.parquet(f"{path}/graph").select(
        F.col("leaf").cast("int").alias("leaf"), "node", "lvl", "nbrs"
    )
    keyed = emb.select(
        F.col(id_col).cast("long").alias("_id"),
        F.col(vec_col).alias("_vec"),
        _leaf_col(id_col, n_leaves).alias("_leaf"),
    )
    if meta.get("appended"):
        assign = spark.read.parquet(f"{path}/assign").select(
            F.col("vec_id").cast("long").alias("_aid"),
            F.col("leaf").cast("int").alias("_aleaf"),
        )
        keyed = (
            keyed.join(assign, keyed["_id"] == assign["_aid"], "left")
            .withColumn("_leaf", F.coalesce("_aleaf", "_leaf"))
            .drop("_aid", "_aleaf")
        )
    per_leaf = (
        keyed.groupBy("_leaf")
        .cogroup(graph.groupBy("leaf"))
        .applyInPandas(leaf_search, out_schema)
    )
    return (
        per_leaf.orderBy(F.desc("cos"), F.asc("_id"))
        .select(F.col("_id").alias(id_col), F.round("cos", 4).alias("sim"))
    )
