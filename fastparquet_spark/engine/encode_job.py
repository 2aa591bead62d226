"""The distributed encode job: DataFrame -> encoded parquet dataset
with per-partition lineage manifests and checkpoint/resume.

Spark translation of the reference's ``write()`` pipeline
(fastparquet/writer.py:810-1049; SURVEY.md §3.1):

- the driver fixes the schema and plans PARTITIONING, not row-group
  slicing: explicit ``repartition`` on the partition columns plus a
  SALT column so one mega-repo (Zipf head) cannot overload a single
  task — salt counts derive from a cheap broadcast-joined groupBy;
- each executor task runs the codec kernels over Arrow batches inside
  ``mapInArrow`` (no per-row Python) and writes ONE deterministic
  output file ``part-{pid:05d}.parquet`` (the reference writes
  uuid+time names, fastparquet/writer.py:1002 — we must not, or resume
  breaks);
- each task also writes a JSON lineage manifest (input rows, bytes
  in/out, per-column codec chosen, encode seconds) to
  ``_manifests/part-{pid:05d}.json`` — the Iceberg-snapshot stand-in:
  commit is the atomic rename of the manifest, resume is "skip
  partitions whose manifest already exists".
"""

from __future__ import annotations

import json
import os
import time
from collections.abc import Iterator

import pyarrow as pa

MANIFEST_DIR = "_manifests"

MANIFEST_SCHEMA_JSON = {
    "partition": "int", "file": "string", "rows": "long",
    "input_bytes": "long", "output_bytes": "long", "encode_secs": "double",
    "skipped": "boolean", "columns": "string",  # json {name: encoding}
}


def _manifest_struct():
    from pyspark.sql.types import (
        BooleanType, DoubleType, IntegerType, LongType, StringType,
        StructField, StructType,
    )
    return StructType([
        StructField("partition", IntegerType()),
        StructField("file", StringType()),
        StructField("rows", LongType()),
        StructField("input_bytes", LongType()),
        StructField("output_bytes", LongType()),
        StructField("encode_secs", DoubleType()),
        StructField("kernel_secs", DoubleType()),
        StructField("skipped", BooleanType()),
        StructField("columns", StringType()),
    ])


def _arrow_manifest_batch(row: dict) -> pa.RecordBatch:
    return pa.record_batch({
        "partition": pa.array([row["partition"]], pa.int32()),
        "file": pa.array([row["file"]]),
        "rows": pa.array([row["rows"]], pa.int64()),
        "input_bytes": pa.array([row["input_bytes"]], pa.int64()),
        "output_bytes": pa.array([row["output_bytes"]], pa.int64()),
        "encode_secs": pa.array([row["encode_secs"]], pa.float64()),
        "kernel_secs": pa.array([row.get("kernel_secs", 0.0)], pa.float64()),
        "skipped": pa.array([row["skipped"]], pa.bool_()),
        "columns": pa.array([row["columns"]]),
    })


# payload-ish columns are excluded from the salt hash: hashing the full
# content column would touch every byte of a 100 TB table just to pick a
# bucket; identity columns spread rows just as well
_PAYLOAD_NAMES = {"content", "text", "payload", "body", "blob", "props"}


def _salted(df, partition_cols, salt_rows: int, num_partitions: int):
    """Repartition by partition_cols + salt; salt width per key comes from a
    broadcast-joined count so skewed keys split across tasks."""
    from pyspark.sql import functions as F

    cols = list(partition_cols)
    counts = df.groupBy(*cols).agg(F.count("*").alias("__key_rows"))
    df = df.join(F.broadcast(counts), on=cols, how="left")
    buckets = F.greatest(F.lit(1), F.ceil(F.col("__key_rows") / F.lit(salt_rows)))
    salt_cols = [c for c in df.columns
                 if c != "__key_rows" and c.lower() not in _PAYLOAD_NAMES] or cols
    df = df.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in salt_cols]),
                         buckets).cast("int"),
    ).drop("__key_rows")
    return df.repartition(num_partitions, *cols, F.col("__salt")).drop("__salt")


def encode_dataset(spark, df, out_dir: str, *, compression: str = "ZSTD",
                   partition_cols=("repo", "lang"), num_partitions: int | None = None,
                   salt_rows: int = 250_000, sort_within: tuple = ("repo", "path"),
                   row_group_rows: int = 1_000_000, resume: bool = True,
                   encodings: dict | None = None):
    """Encode ``df`` into ``out_dir`` as parquet files + lineage manifests.

    Returns the manifest DataFrame (one row per written partition file).
    Designed for 1000-executor scale: the only shuffles are the tiny
    key-count aggregate (map-side combined, broadcast back) and the one
    repartition that ALSO provides the physical file layout; encode is
    pipelined per task with bounded memory (row-group batching).
    """
    from pyspark.sql import functions as F  # noqa: F401 (doc parity)

    os.makedirs(out_dir, exist_ok=True)
    os.makedirs(os.path.join(out_dir, MANIFEST_DIR), exist_ok=True)

    if num_partitions is None:
        num_partitions = max(spark.sparkContext.defaultParallelism, 1)
    work = _salted(df, partition_cols, salt_rows, num_partitions)
    sort_cols = [c for c in (sort_within or ()) if c in df.columns]
    if sort_cols:
        work = work.sortWithinPartitions(*sort_cols)

    schema = _manifest_struct()
    compression_ = compression
    encodings_ = encodings
    row_group_rows_ = row_group_rows
    out_dir_ = out_dir
    resume_ = resume

    def encode_partition(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        import pyarrow as pa_w
        from pyspark import TaskContext

        from fastparquet_spark.format.writer import write_file

        pa_w.set_cpu_count(1)  # see file_job.run: avoid pool oversubscription

        pid = TaskContext.get().partitionId()
        fname = f"part-{pid:05d}.parquet"
        fpath = os.path.join(out_dir_, fname)
        mpath = os.path.join(out_dir_, MANIFEST_DIR, f"part-{pid:05d}.json")
        if resume_ and os.path.exists(mpath):
            # checkpoint hit: partition already committed -> skip (drain input lazily)
            with open(mpath) as fh:
                prev = json.load(fh)
            prev["skipped"] = True
            yield _arrow_manifest_batch(prev)
            return
        collected: list[pa.RecordBatch] = []
        n_rows = 0
        in_bytes = 0
        t0 = time.perf_counter()
        tmp = fpath + ".inprogress"
        sink = open(tmp, "wb")
        try:
            # task memory is bounded by partition size, which the salting
            # stage caps at ~salt_rows rows per key; row groups within the
            # file are capped separately by row_group_rows
            for b in batches:
                collected.append(b)
                n_rows += b.num_rows
                in_bytes += b.nbytes
            if n_rows == 0:
                sink.close()
                os.remove(tmp)
                return
            tbl = pa.Table.from_batches(collected)
            k0 = time.perf_counter()
            res = write_file(sink, tbl, compression=compression_,
                             encodings=encodings_,
                             row_group_rows=min(row_group_rows_, max(n_rows, 1)))
            kernel_secs = time.perf_counter() - k0
            sink.close()
            os.replace(tmp, fpath)  # atomic publish of data file
            cols = {c.name: c.encoding for c in res.columns}
            row = {"partition": pid, "file": fname, "rows": n_rows,
                   "input_bytes": in_bytes, "output_bytes": res.file_bytes,
                   "encode_secs": time.perf_counter() - t0,
                   "kernel_secs": kernel_secs,
                   "skipped": False, "columns": json.dumps(cols)}
            # manifest written AFTER data: its existence == commit
            with open(mpath + ".tmp", "w") as fh:
                json.dump(row, fh)
            os.replace(mpath + ".tmp", mpath)
            yield _arrow_manifest_batch(row)
        finally:
            if not sink.closed:
                sink.close()
            if os.path.exists(tmp):
                os.remove(tmp)

    return work.mapInArrow(encode_partition, schema)


def verify_roundtrip(spark, src_df, out_dir: str, key_cols=("repo", "path")) -> dict:
    """Per-row sha256(content) equality between source and encoded output —
    the BASELINE.json invariant, computed distributed (anti-join of hashes).
    Returns {'src_rows', 'out_rows', 'mismatches'}."""
    from pyspark.sql import functions as F

    out_df = spark.read.parquet(f"{out_dir}/part-*.parquet")
    key = [F.col(c) for c in key_cols]
    a = src_df.select(*key, F.sha2(F.col("content"), 256).alias("h_src"))
    b = out_df.select(*key, F.sha2(F.col("content"), 256).alias("h_out"))
    joined = a.join(b, on=list(key_cols), how="full_outer")
    mism = joined.filter(
        F.col("h_src").isNull() | F.col("h_out").isNull() |
        (F.col("h_src") != F.col("h_out"))).count()
    return {"src_rows": src_df.count(), "out_rows": out_df.count(),
            "mismatches": mism}
