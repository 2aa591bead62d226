#!/usr/bin/env python
"""spark-submit entry point for the encode engine.

Cluster usage (the north-rule deployment shape):

    cd /root/repo && zip -r /tmp/fps.zip fastparquet_spark
    spark-submit --py-files /tmp/fps.zip scripts/run_encode.py \
        --input /data/source_code_parquet --output /data/encoded \
        --mode files --compression ZSTD

Local smoke:

    python scripts/run_encode.py --input <parquet dir> --output /tmp/out

Modes:
  files    (default) file-split path: footer-only planning, pyarrow scan
           inside workers — the throughput path; skew handled at
           row-group granularity
  shuffle  DataFrame path: explicit repartition by --partition-cols with
           count-derived salting — use when re-clustering is required
  fpsc     own-format containers (FSST-enabled internal path)

All modes are resumable: re-running skips partitions whose lineage
manifest exists (delete a manifest to force re-encode of its partition).
Prints a one-line JSON summary from the collected manifests.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

# running from a checkout without --py-files: make the package importable
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", required=True, help="input parquet directory")
    p.add_argument("--output", required=True, help="output dataset directory")
    p.add_argument("--mode", choices=["files", "shuffle", "fpsc"], default="files")
    p.add_argument("--compression", default="ZSTD")
    p.add_argument("--partition-cols", default="repo,lang")
    p.add_argument("--num-partitions", type=int, default=None)
    p.add_argument("--rows-per-task", type=int, default=2_000_000)
    p.add_argument("--layout", choices=["flat", "hive"], default="flat",
                   help="shuffle mode: hive writes key=value directories")
    p.add_argument("--preserve-layout", action="store_true",
                   help="files mode: mirror input key=value dirs in output")
    p.add_argument("--append", action="store_true",
                   help="shuffle mode: append a new generation to an "
                        "existing dataset and re-merge _metadata")
    p.add_argument("--write-metadata", action="store_true",
                   help="write/refresh the _metadata sidecar afterwards")
    p.add_argument("--no-resume", action="store_true")
    p.add_argument("--verify", action="store_true",
                   help="after encoding, check per-row sha256(content) equality")
    args = p.parse_args(argv)

    from pyspark.sql import SparkSession

    spark = (SparkSession.builder.appName("fastparquet_spark-encode")
             .config("spark.sql.adaptive.enabled", "true")
             .getOrCreate())
    resume = not args.no_resume
    if args.mode == "files":
        from fastparquet_spark.engine import encode_files

        manifest = encode_files(spark, args.input, args.output,
                                compression=args.compression,
                                rows_per_task=args.rows_per_task,
                                resume=resume,
                                preserve_layout=args.preserve_layout)
    elif args.mode == "shuffle":
        from fastparquet_spark.engine import append_dataset, encode_dataset

        df = spark.read.parquet(args.input)
        kw = dict(compression=args.compression,
                  partition_cols=tuple(args.partition_cols.split(",")),
                  num_partitions=args.num_partitions,
                  layout=args.layout, resume=resume)
        if args.append:
            rows_ = append_dataset(spark, df, args.output, **kw)
            manifest = spark.createDataFrame(rows_)
        else:
            manifest = encode_dataset(spark, df, args.output, **kw)
    else:
        from fastparquet_spark.engine.fpsc_job import encode_dataset_fpsc

        df = spark.read.parquet(args.input)
        manifest = encode_dataset_fpsc(spark, df, args.output,
                                       compression=args.compression,
                                       partition_cols=tuple(args.partition_cols.split(",")),
                                       num_partitions=args.num_partitions,
                                       resume=resume)
    rows = manifest.collect()
    summary = {
        "mode": args.mode, "files": len(rows),
        "rows": sum(r["rows"] for r in rows),
        "skipped": sum(1 for r in rows if r["skipped"]),
        "input_bytes": sum(r["input_bytes"] for r in rows),
        "output_bytes": sum(r["output_bytes"] for r in rows),
        "kernel_secs": round(sum(r["kernel_secs"] for r in rows), 2),
    }
    if args.write_metadata and args.mode != "fpsc":
        from fastparquet_spark.format.dataset import write_metadata_sidecar

        summary["metadata_row_groups"] = write_metadata_sidecar(args.output)
    if args.verify and args.mode != "fpsc":
        from fastparquet_spark.engine import verify_roundtrip

        src = spark.read.parquet(args.input)
        summary["verify"] = verify_roundtrip(
            spark, src, args.output,
            key_cols=[c for c in ("repo", "path", "doc_id") if c in src.columns])
    print(json.dumps(summary))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
