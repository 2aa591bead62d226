#!/usr/bin/env python
"""spark-submit packaging smoke — the driver script.

Run by ``scripts/spark_submit_smoke.sh`` via

    spark-submit --py-files fastparquet_spark.zip spark_submit_smoke.py <out>

from a CLEAN working directory (no repo on sys.path), so the only way
``import fastparquet_spark`` can succeed — on the driver AND on every
executor — is through the ``--py-files`` zip Spark ships.  This is the
north-rule deployment shape: the engine must run as a submitted job,
not only from an interactive session rooted in the repo.

The job: encode a synthetic source-code table with the file-split
encode job (``encode_files``), then read it back through the pruning
scan (``paged_read``) and assert counts + a value aggregate.
Exit 0 = pass; any assertion or import failure is a non-zero exit.
"""

import sys

assert len(sys.argv) == 2, "usage: spark_submit_smoke.py <out_dir>"
OUT = sys.argv[1]

# must come from the --py-files zip, NOT a repo checkout
import fastparquet_spark  # noqa: E402

assert "fastparquet_spark.zip" in fastparquet_spark.__file__, (
    "package resolved OUTSIDE the --py-files zip: "
    f"{fastparquet_spark.__file__}")

from pyspark.sql import SparkSession  # noqa: E402

from fastparquet_spark.engine import (  # noqa: E402
    encode_files, paged_read, synthetic_source_table,
)

spark = SparkSession.builder.appName("fps-submit-smoke").getOrCreate()
spark.sparkContext.setLogLevel("ERROR")

N = 200_000
df = synthetic_source_table(spark, N, partitions=8)
# encode_files is the footer-split throughput path: stage the input as
# plain parquet, then re-encode it file-split-parallel with our writer
SRC = OUT + "_src"
df.write.mode("overwrite").parquet(SRC)
manifest = encode_files(spark, SRC, OUT, compression="ZSTD",
                        resume=False).collect()
assert sum(r.rows for r in manifest) == N, manifest
assert all(r.output_bytes > 0 for r in manifest)

# read back through the pruning stack on the executors
got = paged_read(spark, OUT, [("lang", "==", "python")],
                 columns=["lang", "content"])
n_py = got.count()
exp = df.filter("lang = 'python'").count()
assert n_py == exp and n_py > 0, (n_py, exp)

full = paged_read(spark, OUT, []).selectExpr(
    "count(*) n", "sum(length(content)) s").collect()[0]
ref = df.selectExpr("count(*) n", "sum(length(content)) s").collect()[0]
assert (full.n, full.s) == (ref.n, ref.s), (full, ref)

print(f"SMOKE-PASS files={len(manifest)} rows={N} py_rows={n_py}")
spark.stop()
