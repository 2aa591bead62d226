"""Distributed FPSC (own-format, FSST-enabled) encode/decode.

The parquet-compat jobs must stay inside the standard encoding set so
third-party readers accept the files (SURVEY.md §7.4); this job is the
other half of the dual-mode design: same planning/manifest/resume
contract, but the per-task payload is an FPSC container where string
columns may pick FSST (best-of vs plain+block codec).  Decode is ours
alone — ``read_fpsc`` distributes container paths and inflates them
inside Python workers (vectorized FSST expansion, no per-row Python).
"""

from __future__ import annotations

import json
import os
import time
from collections.abc import Iterator

import pyarrow as pa

from fastparquet_spark.engine.encode_job import (
    MANIFEST_DIR,
    _arrow_manifest_batch,
    _manifest_struct,
    _salted,
)


def encode_dataset_fpsc(spark, df, out_dir: str, *, compression: str = "ZSTD",
                        partition_cols=("repo", "lang"),
                        num_partitions: int | None = None,
                        salt_rows: int = 250_000, resume: bool = True):
    """Encode ``df`` into FPSC containers (one per task) + manifests."""
    os.makedirs(out_dir, exist_ok=True)
    os.makedirs(os.path.join(out_dir, MANIFEST_DIR), exist_ok=True)
    if num_partitions is None:
        num_partitions = max(spark.sparkContext.defaultParallelism, 1)
    work = _salted(df, partition_cols, salt_rows, num_partitions)

    out_dir_ = out_dir
    compression_ = compression
    resume_ = resume

    def run(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        import pyarrow as pa_w
        from pyspark import TaskContext

        from fastparquet_spark.format.container import write_container

        pa_w.set_cpu_count(1)
        pid = TaskContext.get().partitionId()
        fname = f"part-{pid:05d}.fpsc"
        fpath = os.path.join(out_dir_, fname)
        mpath = os.path.join(out_dir_, MANIFEST_DIR, f"part-{pid:05d}.json")
        if resume_ and os.path.exists(mpath):
            with open(mpath) as fh:
                prev = json.load(fh)
            prev["skipped"] = True
            yield _arrow_manifest_batch(prev)
            return
        collected = [b for b in batches]
        n_rows = sum(b.num_rows for b in collected)
        if n_rows == 0:
            return
        tbl = pa.Table.from_batches(collected)
        t0 = time.perf_counter()
        tmp = fpath + ".inprogress"
        with open(tmp, "wb") as sink:
            blocks = write_container(sink, tbl, compression=compression_)
        kernel = time.perf_counter() - t0
        os.replace(tmp, fpath)
        row = {"partition": pid, "file": fname, "rows": n_rows,
               "input_bytes": tbl.nbytes,
               "output_bytes": os.path.getsize(fpath),
               "encode_secs": kernel, "kernel_secs": kernel,
               "skipped": False,
               "columns": json.dumps({b.name: b.codec for b in blocks})}
        with open(mpath + ".tmp", "w") as fh:
            json.dump(row, fh)
        os.replace(mpath + ".tmp", mpath)
        yield _arrow_manifest_batch(row)

    return work.mapInArrow(run, _manifest_struct())


def read_fpsc(spark, in_dir: str, schema=None):
    """Distributed decode of an FPSC dataset back to a DataFrame:
    container paths fan out to tasks; each Python worker inflates its
    file with the vectorized decoders (FSST expansion, delta prefix-sum,
    validity reassembly)."""
    from pyspark.sql.types import StringType, StructField, StructType

    files = sorted(os.path.join(in_dir, f) for f in os.listdir(in_dir)
                   if f.endswith(".fpsc"))
    if schema is None:
        from fastparquet_spark.format.container import read_container

        if not files:
            raise ValueError(f"no .fpsc files under {in_dir}")
        probe = read_container(files[0])
        from pyspark.sql.pandas.types import from_arrow_schema
        schema = from_arrow_schema(probe.schema)

    rdd = spark.sparkContext.parallelize([(f,) for f in files], len(files))
    paths_df = spark.createDataFrame(
        rdd, StructType([StructField("path", StringType())]))

    def inflate(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        import pyarrow as pa_w

        from fastparquet_spark.format.container import read_container

        pa_w.set_cpu_count(1)
        for b in batches:
            for path in b.column("path").to_pylist():
                tbl = read_container(path)
                yield from tbl.to_batches()

    return paths_df.mapInArrow(inflate, schema)
