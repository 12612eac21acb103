"""Streaming near-duplicate detection: incremental MinHash-LSH over
Structured Streaming micro-batches.

The batch pipeline's MinHash-LSH dedup (pipeline/dedup.py: Broder '97
signatures, banded bucketing per the MMDS formulation) re-expressed as a
continuously-maintained store: each micro-batch of new documents is checked
against every document ever accepted before it, without ever rescanning the
corpus — the persisted state is (signatures, band buckets) of CANONICAL
documents only, so the per-batch cost is one bucket equi-join against the
store plus the batch's own internal LSH pass.

Per micro-batch (foreachBatch sink):

1. MinHash signatures for the batch's docs (same ``minhash_signatures``
   kernel as the batch operator — one md5 pass, no Python UDF).
2. Batch→store candidates: band keys equi-join the persisted bucket table
   (at scale the bucket store is partitioned by band, so the join prunes
   to the batch's buckets); candidates verify by the MinHash estimate
   (matching components / num_hashes ≥ ``min_est_jaccard``). A verified
   new doc is a duplicate OF the stored canonical (best estimate wins,
   ties to the smallest canonical id).
3. Batch-internal candidates among the docs that survived (2): connected
   components over verified pairs; each component's min-id doc becomes
   canonical, the rest record ``dup_of`` it.
4. The batch's canonical docs append their signatures + bucket rows to the
   store; duplicate verdicts append to ``dups``. A committed-batch marker
   makes replays of the same batch_id no-ops (the foreachBatch
   exactly-once contract, as in streaming/nrt.py); a crash between the
   two appends is healed because every appended row carries batch_id and
   readers drop rows of uncommitted batches.

Equivalence contract (tested): streaming the corpus in arrival order
produces the same duplicate set as the batch LSH pass over the union,
whenever doc ids are assigned in arrival order (the batch rule "component
root = min doc_id" and the streaming rule "first-seen canonical" then
agree).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..pipeline.dedup import connected_components, minhash_signatures

__all__ = ["StreamingDeduper", "dedup_stream"]


class StreamingDeduper:
    """foreachBatch sink maintaining an incremental near-dup store.

    Store layout under ``store_dir``:
      - ``signatures/``: (doc_id, sig array<string>, batch_id)
      - ``buckets/``:    (band int, band_key, doc_id, batch_id)
      - ``dups/``:       (doc_id, dup_of, est_jaccard, batch_id)
      - ``_committed/batch_<id>``: marker files (replay idempotence)
    """

    def __init__(
        self,
        store_dir: str,
        num_hashes: int = 8,
        bands: int = 4,
        min_est_jaccard: float = 0.5,
        id_col: str = "doc_id",
        text_col: str = "text",
    ):
        if num_hashes % bands:
            raise ValueError("bands must divide num_hashes")
        self.store_dir = store_dir
        self.num_hashes = num_hashes
        self.bands = bands
        self.min_est = float(min_est_jaccard)
        self.id_col = id_col
        self.text_col = text_col

    # -- store access -------------------------------------------------------

    def _committed(self) -> set[int]:
        d = os.path.join(self.store_dir, "_committed")
        if not os.path.isdir(d):
            return set()
        return {
            int(f.split("_", 1)[1])
            for f in os.listdir(d)
            if f.startswith("batch_")
        }

    def _read(self, spark, name: str, schema: str) -> DataFrame:
        path = os.path.join(self.store_dir, name)
        committed = self._committed()
        try:
            df = spark.read.parquet(path)
        except Exception:
            return spark.createDataFrame([], schema)
        if not committed:
            return df.limit(0)
        return df.filter(F.col("batch_id").isin([int(b) for b in committed]))

    def duplicates(self, spark) -> DataFrame:
        """All committed duplicate verdicts so far."""
        return self._read(
            spark, "dups",
            f"{self.id_col} long, dup_of long, est_jaccard double, batch_id long",
        ).select(self.id_col, "dup_of", "est_jaccard")

    # -- the sink ------------------------------------------------------------

    def _bands(self, sig: DataFrame) -> DataFrame:
        rows_per = self.num_hashes // self.bands
        cols = []
        for b in range(self.bands):
            ks = [f"sig_{b * rows_per + r}" for r in range(rows_per)]
            cols.append(
                F.struct(
                    F.lit(b).alias("band"),
                    F.concat_ws("_", *[F.col(c) for c in ks]).alias("band_key"),
                )
            )
        return sig.select(
            self.id_col, F.explode(F.array(*cols)).alias("bk")
        ).select(self.id_col, "bk.band", "bk.band_key")

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        if int(batch_id) in self._committed():
            return  # replayed batch: already fully applied
        idc = self.id_col
        batch = batch_df.select(
            F.col(idc), F.col(self.text_col).alias("text")
        )
        sig = minhash_signatures(batch, num_hashes=self.num_hashes, id_col=idc)
        sig_arr = sig.select(
            idc,
            F.array(
                *[F.col(f"sig_{i}") for i in range(self.num_hashes)]
            ).alias("sig"),
        ).cache()
        bands = self._bands(sig)

        def est(a, b) -> F.Column:
            # Broder's MinHash estimate: fraction of agreeing components
            matches = F.aggregate(
                F.zip_with(a, b, lambda x, y: (x == y).cast("int")),
                F.lit(0),
                lambda acc, v: acc + v,
            )
            return matches / F.lit(float(self.num_hashes))

        # (2) batch -> store: duplicate of a previously-accepted canonical
        store_buckets = self._read(
            spark, "buckets", f"band int, band_key string, {idc} long, batch_id long"
        ).select("band", "band_key", F.col(idc).alias("old_id"))
        store_sigs = self._read(
            spark, "signatures", f"{idc} long, sig array<string>, batch_id long"
        ).select(F.col(idc).alias("old_id"), F.col("sig").alias("old_sig"))
        cand = (
            bands.join(store_buckets, ["band", "band_key"])
            .select(idc, "old_id")
            .distinct()
            .join(sig_arr, idc)
            .join(store_sigs, "old_id")
            .select(idc, "old_id", est("sig", "old_sig").alias("e"))
            .filter(F.col("e") >= self.min_est)
        )
        w_best = F.row_number().over(
            Window.partitionBy(idc).orderBy(F.desc("e"), F.asc("old_id"))
        )
        store_dups = (
            cand.withColumn("rk", w_best)
            .filter(F.col("rk") == 1)
            .select(
                idc, F.col("old_id").alias("dup_of"),
                F.col("e").alias("est_jaccard"),
            )
        )

        # (3) batch-internal components among the survivors
        dup_ids = store_dups.select(idc)
        fresh = sig_arr.join(dup_ids, idc, "left_anti")
        fb = self._bands(
            fresh.select(
                idc,
                *[
                    F.col("sig").getItem(i).alias(f"sig_{i}")
                    for i in range(self.num_hashes)
                ],
            )
        )
        x, y = fb.alias("x"), fb.alias("y")
        internal_cand = (
            x.join(y, ["band", "band_key"])
            .filter(F.col(f"x.{idc}") < F.col(f"y.{idc}"))
            .select(F.col(f"x.{idc}").alias("a"), F.col(f"y.{idc}").alias("b"))
            .distinct()
            .join(fresh.select(F.col(idc).alias("a"), F.col("sig").alias("sa")), "a")
            .join(fresh.select(F.col(idc).alias("b"), F.col("sig").alias("sb")), "b")
            .select("a", "b", est("sa", "sb").alias("e"))
            .filter(F.col("e") >= self.min_est)
        )
        # (node, component): component = min reachable id = the canonical
        comp = connected_components(internal_cand.select("a", "b"))
        direct = internal_cand.select(
            F.col("a").alias("dup_of"), F.col("b").alias(idc), "e"
        ).unionByName(
            internal_cand.select(
                F.col("b").alias("dup_of"), F.col("a").alias(idc), "e"
            )
        )
        internal_dups = (
            comp.filter(F.col("node") != F.col("component"))
            .select(
                F.col("node").alias(idc), F.col("component").alias("dup_of")
            )
            .join(direct, [idc, "dup_of"], "left")
            .groupBy(idc, "dup_of")
            .agg(
                # components joined through a chain may lack a direct edge
                F.coalesce(F.max("e"), F.lit(self.min_est)).alias(
                    "est_jaccard"
                )
            )
        )

        all_dups = store_dups.unionByName(internal_dups).withColumn(
            "batch_id", F.lit(int(batch_id))
        )
        canon = fresh.join(
            internal_dups.select(idc), idc, "left_anti"
        ).withColumn("batch_id", F.lit(int(batch_id)))

        # (4) append, then commit marker
        all_dups.write.mode("append").parquet(
            os.path.join(self.store_dir, "dups")
        )
        canon.select(idc, "sig", "batch_id").write.mode("append").parquet(
            os.path.join(self.store_dir, "signatures")
        )
        self._bands(
            canon.select(
                idc,
                *[
                    F.col("sig").getItem(i).alias(f"sig_{i}")
                    for i in range(self.num_hashes)
                ],
            )
        ).withColumn("batch_id", F.lit(int(batch_id))).write.mode(
            "append"
        ).parquet(os.path.join(self.store_dir, "buckets"))
        sig_arr.unpersist()
        d = os.path.join(self.store_dir, "_committed")
        os.makedirs(d, exist_ok=True)
        open(os.path.join(d, f"batch_{int(batch_id)}"), "w").close()


def dedup_stream(
    stream_df: DataFrame,
    store_dir: str,
    checkpoint_dir: str,
    trigger_available_now: bool = True,
    **kwargs,
):
    """Wire a document stream into a StreamingDeduper sink. Returns the
    started StreamingQuery."""
    deduper = StreamingDeduper(store_dir, **kwargs)
    w = stream_df.writeStream.foreachBatch(deduper).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        w = w.trigger(availableNow=True)
    return w.start()
