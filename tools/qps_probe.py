#!/usr/bin/env python
"""Query-only scaling probe: time the bench's query_set stage against a
prebuilt merged index at several core counts, each level in a fresh
subprocess (own JVM), best-of-N.

Usage: python tools/qps_probe.py [cores ...]   (default: 2 8)
Env:   PROBE_BEST_OF (default 2), PROBE_REPEAT (default 24, = bench),
       PROBE_IDX (default /dev/shm/lucene_spark_bench/idx_32_merged)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

os.environ.setdefault("OMP_NUM_THREADS", "1")
os.environ.setdefault("OPENBLAS_NUM_THREADS", "1")
os.environ.setdefault("MKL_NUM_THREADS", "1")

IDX = os.environ.get("PROBE_IDX", "/dev/shm/lucene_spark_bench/idx_32_merged")
REPEAT = int(os.environ.get("PROBE_REPEAT", "24"))
BEST_OF = int(os.environ.get("PROBE_BEST_OF", "2"))
SLICE_DOCS = int(os.environ.get("BENCH_SLICE_DOCS", "16384"))


def run_level(cores: int) -> dict:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from pyspark.sql import SparkSession

    from lucene_spark.constants import ENGLISH_STOP_WORDS
    from lucene_spark.search import Searcher

    sys.path.pop(0)
    spark = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(f"qps-probe-{cores}")
        .config("spark.sql.shuffle.partitions", str(cores))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", "24g")
        .config("spark.local.dir", "/dev/shm/lucene_spark_bench/spark-local")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import bench

    qset = bench._query_batch(REPEAT)
    searcher = Searcher(
        spark, IDX, stopwords=ENGLISH_STOP_WORDS, slice_docs=SLICE_DOCS
    )
    # warmup (small batch: JIT + python worker spin-up)
    warm = dict(list(qset.items())[:4])
    searcher.search_many(warm, k=10).collect()
    t0 = time.time()
    searcher.search_many(qset, k=10).collect()
    dt = time.time() - t0
    spark.stop()
    return {"cores": cores, "secs": dt, "qps": len(qset) / dt}


def main() -> None:
    if len(sys.argv) >= 2 and sys.argv[1] == "--level":
        cores, out_path = int(sys.argv[2]), sys.argv[3]
        with open(out_path, "w") as f:
            json.dump(run_level(cores), f)
        return
    levels = [int(a) for a in sys.argv[1:]] or [2, 8]
    results = {}
    for cores in levels:
        runs = []
        for _ in range(BEST_OF):
            with tempfile.NamedTemporaryFile(suffix=".json", delete=False) as f:
                out_path = f.name
            subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--level", str(cores), out_path],
                check=True,
                stdout=subprocess.DEVNULL,
                stderr=subprocess.DEVNULL,
            )
            with open(out_path) as f:
                runs.append(json.load(f))
            os.unlink(out_path)
        best = max(runs, key=lambda r: r["qps"])
        best["all_qps"] = [round(r["qps"], 2) for r in runs]
        results[cores] = best
        print(json.dumps(best))
    if len(levels) >= 2:
        lo, hi = results[levels[0]], results[levels[-1]]
        ratio = levels[-1] / levels[0]
        print(
            json.dumps(
                {
                    "qps_efficiency": round((hi["qps"] / lo["qps"]) / ratio, 3),
                    "ratio": ratio,
                }
            )
        )


if __name__ == "__main__":
    main()
