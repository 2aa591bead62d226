#!/usr/bin/env python
"""Benchmark harness — prints ONE JSON line.

Headline metric (BASELINE.json): encode throughput in GB/s of
source-content columns through the full engine (salted repartition ->
mapInArrow codec kernels -> parquet files + manifests), plus the
two-parallelism scaling protocol (local[N] vs local[4N] standing in for
N / 4N executors, per the driver instruction) and per-query seconds for
the analytics operators at $SPARK_GRAFT_SF_DIR.

Env:
  SPARK_GRAFT_SF_DIR   test-table dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS     cores for the main run (default 32)
  SPARK_GRAFT_BENCH_ROWS  synthetic source rows (default 200000)
  SPARK_GRAFT_SCALING  "1" to run the N vs 4N scaling pair (default 1)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
BENCH_ROWS = int(os.environ.get("SPARK_GRAFT_BENCH_ROWS", "200000"))
RUN_SCALING = os.environ.get("SPARK_GRAFT_SCALING", "1") == "1"

BENCH_QUERIES = [
    "q1_pricing_summary", "q3_shipping_topk", "q_window_rank",
    "q_filter_project", "dedup_exact", "dedup_minhash_lsh_pairs",
    "dedup_simhash", "text_quality", "text_fingerprint",
    "sim_cosine_topk", "sim_lsh_buckets", "mm_binary_meta",
]


def make_spark(cpus: int):
    from pyspark.sql import SparkSession

    s = (SparkSession.builder.master(f"local[{cpus}]")
         .appName(f"fps-bench-{cpus}")
         .config("spark.sql.shuffle.partitions", str(cpus))
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
         .config("spark.driver.memory", "24g")
         .config("spark.ui.enabled", "false")
         .getOrCreate())
    s.sparkContext.setLogLevel("ERROR")
    return s


def encode_run(spark, n_rows: int, cpus: int) -> dict:
    """Generate the deterministic synthetic source table, encode it with
    the full engine, return timings + byte counts."""
    from pyspark.sql import functions as F

    from fastparquet_spark.engine import encode_dataset, synthetic_source_table

    src = synthetic_source_table(spark, n_rows, partitions=cpus).cache()
    src.count()  # materialize outside the timed section
    content_bytes = src.agg(F.sum(F.length("content"))).collect()[0][0]
    out = tempfile.mkdtemp(prefix=f"fps_bench_{cpus}_")
    t0 = time.perf_counter()
    manifest = encode_dataset(spark, src, out, compression="ZSTD",
                              num_partitions=cpus, resume=False).collect()
    elapsed = time.perf_counter() - t0
    kernel = sum(r["kernel_secs"] for r in manifest)
    out_bytes = sum(r["output_bytes"] for r in manifest)
    src.unpersist()
    shutil.rmtree(out, ignore_errors=True)
    return {
        "rows": n_rows,
        "content_mb": round(content_bytes / 1e6, 1),
        "secs": round(elapsed, 2),
        "gbps_e2e": round(content_bytes / 1e9 / elapsed, 4),
        # kernel-only rate: bytes / (summed task kernel time / cores)
        "gbps_kernel": round(content_bytes / 1e9 / max(kernel / cpus, 1e-9), 4),
        "compression_ratio": round(out_bytes / max(content_bytes, 1), 4),
    }


def main():
    import __spark_entry__ as em

    result: dict = {"metric": "encode_gbps+query_secs", "unit": "sec",
                    "sf": SF_DIR.rstrip("/").split("sf")[-1]}

    scaling = None
    if RUN_SCALING:
        lo = max(CPUS // 4, 1)
        spark_lo = make_spark(lo)
        run_lo = encode_run(spark_lo, BENCH_ROWS, lo)
        spark_lo.stop()
    spark = make_spark(CPUS)

    # headline encode at full parallelism
    run_hi = encode_run(spark, BENCH_ROWS, CPUS)
    result["value"] = run_hi["secs"]
    result["encode"] = run_hi
    if RUN_SCALING:
        eff = (run_hi["gbps_e2e"] / run_lo["gbps_e2e"]) / (CPUS / lo)
        scaling = {"cores_n": lo, "cores_4n": CPUS,
                   "gbps_n": run_lo["gbps_e2e"], "gbps_4n": run_hi["gbps_e2e"],
                   "secs_n": run_lo["secs"], "secs_4n": run_hi["secs"],
                   "efficiency": round(eff, 3)}
        result["scaling"] = scaling

    # analytics queries at the sf dir
    queries = em.queries()
    qsecs = {}
    for name in BENCH_QUERIES:
        t0 = time.perf_counter()
        queries[name](spark, SF_DIR).collect()
        qsecs[name] = round(time.perf_counter() - t0, 3)
    # engine round-trip at sf dir (documents table through the engine)
    t0 = time.perf_counter()
    em.entry(spark)
    df = queries["engine_roundtrip_hashes"](spark, SF_DIR)
    df.count()
    qsecs["engine_roundtrip_hashes"] = round(time.perf_counter() - t0, 3)
    qsecs["encode_synthetic"] = run_hi["secs"]
    result["queries"] = qsecs
    spark.stop()
    print(json.dumps(result))


if __name__ == "__main__":
    main()
