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
import time
from collections.abc import Iterator

import pyarrow as pa

from fastparquet_spark.engine.encode_job import (
    MANIFEST_DIR,
    _arrow_manifest_batch,
    _manifest_struct,
    _salted,
    _u_join,
)


def encode_dataset_fpsc(spark, df, out_dir: str, *, compression: str = "ZSTD",
                        partition_cols=("repo", "lang"),
                        num_partitions: int | None = None,
                        salt_rows: int = 250_000, resume: bool = True,
                        rows_per_container: int = 1_000_000,
                        pretrain_rows: int = 2_000,
                        bloom_filters: dict | None = None):
    """Encode ``df`` into FPSC containers + manifests.

    Containers are written per ~``rows_per_container`` buffered rows, so
    task memory is bounded by the chunk, not the partition.

    FSST training is the expensive half of the string codec, and paying
    it once PER TASK dominated small-task encodes (~0.7s of a 0.9s
    task).  With ``pretrain_rows`` > 0 the driver trains one symbol
    table per string column on a small sample and ships the tables to
    every task through the closure — tasks skip training entirely (the
    escape byte keeps unseen bytes correct; only the ratio could drift,
    and the per-column best-of vs plain still gates admission).  Set 0
    to restore per-task training.

    All IO goes through the ``io.get_fs`` seam, so ``out_dir`` may be a
    ``file://``/``s3://``-style URI like every other engine path."""
    from fastparquet_spark.io import get_fs

    drv_fs = get_fs(out_dir)
    drv_fs.makedirs(out_dir)
    drv_fs.makedirs(_u_join(out_dir, MANIFEST_DIR))
    if num_partitions is None:
        num_partitions = max(spark.sparkContext.defaultParallelism, 1)
    work = _salted(df, partition_cols, salt_rows, num_partitions)

    pretrained: dict = {}
    decisions: dict = {}
    if pretrain_rows:
        from fastparquet_spark.format.container import decide_string_codecs

        sample = df.limit(pretrain_rows).toArrow()
        # one driver pass trains FSST tables AND fixes fsst-vs-plain per
        # string column, so tasks skip the losing codec's full trial
        # (file_job.encode_files_fpsc has the identical step)
        decisions = decide_string_codecs(sample, pretrained,
                                         compression=compression)

    out_dir_ = out_dir
    compression_ = compression
    resume_ = resume
    rows_per_ = rows_per_container
    pretrained_ = pretrained
    decisions_ = decisions
    bloom_ = bloom_filters

    def run(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        import pyarrow as pa_w
        from pyspark import TaskContext

        from fastparquet_spark.engine.file_job import _stage_name
        from fastparquet_spark.format.container import write_container
        from fastparquet_spark.io import get_fs

        pa_w.set_cpu_count(1)
        fs = get_fs(out_dir_)
        ctx = TaskContext.get()
        pid, attempt = ctx.partitionId(), ctx.taskAttemptId()
        mpath = _u_join(out_dir_, f"{MANIFEST_DIR}/part-{pid:05d}.json")
        if resume_ and fs.exists(mpath):
            with fs.open_read(mpath) as fh:
                prev = json.loads(fh.read())
            for row in prev if isinstance(prev, list) else [prev]:
                row["skipped"] = True
                yield _arrow_manifest_batch(row)
            return

        fsst_cache: dict = dict(pretrained_)  # driver-trained tables
        done_rows: list[dict] = []
        pending: list[tuple[str, str]] = []  # (staged, final)
        buf: list[pa.RecordBatch] = []
        buf_rows = 0
        task_start = time.perf_counter()

        def write_one(tbl: pa.Table):
            # STAGE only — all containers publish together at task
            # commit, so a failed/racing attempt never leaves a partial
            # final-named set that read_fpsc (which lists *.fpsc,
            # manifest-blind) would read
            k = len(done_rows)
            fname = f"part-{pid:05d}-{k:03d}.fpsc"
            fpath = _u_join(out_dir_, fname)
            tmp = _stage_name(fpath, attempt)
            t0 = time.perf_counter()
            with fs.open_write(tmp) as sink:
                blocks = write_container(sink, tbl,
                                         compression=compression_,
                                         fsst_cache=fsst_cache,
                                         bloom_filters=bloom_,
                                         codec_decisions=decisions_)
            kernel = time.perf_counter() - t0
            pending.append((tmp, fpath))
            done_rows.append(
                {"partition": pid, "file": fname, "rows": tbl.num_rows,
                 "input_bytes": tbl.nbytes,
                 "output_bytes": fs.size(tmp),
                 "encode_secs": 0.0, "kernel_secs": kernel,
                 "skipped": False,
                 "columns": json.dumps({b.name: b.codec for b in blocks})})

        def flush_chunk(final: bool = False):
            nonlocal buf, buf_rows
            if not buf_rows:
                return
            tbl = pa.Table.from_batches(buf)
            n = tbl.num_rows
            end = n if final else (n // rows_per_) * rows_per_
            for start in range(0, end, rows_per_):
                write_one(tbl.slice(start, rows_per_))
            if end < n:
                buf, buf_rows = tbl.slice(end).to_batches(), n - end
            else:
                buf, buf_rows = [], 0  # release buffered batches

        try:
            for b in batches:
                buf.append(b)
                buf_rows += b.num_rows
                if buf_rows >= rows_per_:
                    flush_chunk()
            flush_chunk(final=True)
            if not done_rows:
                return
            # task commit: publish the COMPLETE container set first
            # (each rename atomic; a swept stage with the final present
            # means a twin already published a complete file), then
            # sweep a dead twin's extra-index finals, then the manifest
            for tmp, fpath in pending:
                try:
                    fs.replace(tmp, fpath)
                except OSError:
                    if not fs.exists(fpath):
                        raise
            finals = {f for _t, f in pending}
            me = f"part-{pid:05d}-"
            for pth in fs.listdir(out_dir_):
                base = pth.rsplit("/", 1)[1]
                if base.startswith(me) and base.endswith(".fpsc") \
                        and pth not in finals:
                    try:
                        fs.remove(pth)
                    except OSError:
                        pass
            total = time.perf_counter() - task_start
            for row in done_rows:
                row["encode_secs"] = total
            with fs.open_write(f"{mpath}.tmp-{attempt}") as fh:
                fh.write(json.dumps(done_rows).encode())
            fs.replace(f"{mpath}.tmp-{attempt}", mpath)
            for row in done_rows:
                yield _arrow_manifest_batch(row)
        except BaseException:
            for tmp, _f in pending:
                try:
                    if fs.exists(tmp):
                        fs.remove(tmp)
                except OSError:
                    pass
            raise

    return work.mapInArrow(run, _manifest_struct())


def read_fpsc(spark, in_dir: str, schema=None, columns=None):
    """Distributed decode of an FPSC dataset back to a DataFrame:
    container paths fan out to tasks; each Python worker inflates its
    file with the vectorized decoders (FSST expansion, delta prefix-sum,
    validity reassembly).  The driver-side schema probe reads ONLY the
    first container's footer (never the data blocks), and listing goes
    through the fs seam so ``in_dir`` may be a URI.

    ``columns``: projection — workers make RANGED reads of only the
    requested columns' byte spans (footer offsets), the same IO
    contract as a parquet column-chunk scan."""
    from pyspark.sql.types import StringType, StructField, StructType

    from fastparquet_spark.io import get_fs

    fs = get_fs(in_dir)
    files = sorted(p for p in fs.walk_files(in_dir) if p.endswith(".fpsc"))
    if schema is None:
        import pyarrow as pa_s
        from pyspark.sql.pandas.types import from_arrow_schema

        from fastparquet_spark.format.container import (
            _type_from_name, read_container_footer,
        )

        if not files:
            raise ValueError(f"no .fpsc files under {in_dir}")
        meta = read_container_footer(files[0], fs=fs)
        cms = meta["columns"]
        if columns is not None:
            by_name = {cm["name"]: cm for cm in cms}
            cms = [by_name[c] for c in columns]
        schema = from_arrow_schema(pa_s.schema(
            [(cm["name"], _type_from_name(cm["arrow_type"]))
             for cm in cms]))

    # task granularity: several container files per task, not one —
    # 100k single-file tasks would be pure scheduler overhead; 4x the
    # core count keeps every executor busy with work-stealing headroom
    # while the inflate loop streams file-by-file (bounded memory)
    n_parts = max(1, min(len(files),
                         4 * spark.sparkContext.defaultParallelism))
    rdd = spark.sparkContext.parallelize([(f,) for f in files], n_parts)
    paths_df = spark.createDataFrame(
        rdd, StructType([StructField("path", StringType())]))
    columns_ = list(columns) if columns is not None else None

    def inflate(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        import pyarrow as pa_w

        from fastparquet_spark.format.container import read_container

        pa_w.set_cpu_count(1)
        for b in batches:
            for path in b.column("path").to_pylist():
                tbl = read_container(path, columns=columns_)
                yield from tbl.to_batches()

    return paths_df.mapInArrow(inflate, schema)
