"""File-split encode job — the throughput path.

``encode_dataset`` (encode_job.py) clusters arbitrary DataFrames by
shuffling rows; that is correct when re-clustering is required, but at
100 TB you move the PLAN, not the data.  This job distributes
(file, row-group) SPLITS: the driver reads only footers, packs row
groups into tasks, and each executor-side Python worker reads its
split directly with pyarrow's C++ parquet reader and runs the codec
kernels — bytes never cross the JVM/Python boundary, so throughput
scales with cores instead of saturating the Arrow IPC channel
(measured: the mapInArrow stream caps at ~0.45 GB/s on 32 local cores,
while pyarrow scans + kernels run per-core).

Skew handling here is plan-time: a mega-file contributes one split per
row group, so no task exceeds the row-group budget regardless of file
size — the moral equivalent of the shuffle path's salting.

Resume works exactly like encode_job: deterministic split ids, one
part file + one JSON manifest per split, manifest rename = commit.
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
    _u_join,
)


def _prepare_split_job(spark, input_dir: str, out_dir: str,
                       rows_per_task: int, resume: bool):
    """Shared driver scaffold for both split encoders: output dirs,
    stale-sidecar invalidation, split planning, and the PLAN-IDENTITY
    guard — resume keys on split ids, and split ids shift if the input
    file set or rows_per_task changes between runs, so a resume against
    a different plan would skip splits now holding different rows.  Returns
    (splits, sdf) — sdf None when there is nothing to do."""
    import hashlib

    from fastparquet_spark.io import get_fs

    drv_fs = get_fs(out_dir)
    drv_fs.makedirs(out_dir)
    drv_fs.makedirs(_u_join(out_dir, MANIFEST_DIR))
    # a pre-existing sidecar cannot see the files this job adds —
    # sidecar-preferring readers would silently miss them
    for name in ("_metadata", "_common_metadata"):
        sidecar = _u_join(out_dir, name)
        if drv_fs.exists(sidecar):
            drv_fs.remove(sidecar)
    splits = plan_splits(input_dir, rows_per_task)
    if not splits:
        return splits, None
    fingerprint = hashlib.sha256(json.dumps(
        [(s["file"], s["row_groups"]) for s in splits],
        sort_keys=True).encode()).hexdigest()
    plan_marker = _u_join(out_dir, f"{MANIFEST_DIR}/_plan_files.json")
    if resume and drv_fs.exists(plan_marker):
        with drv_fs.open_read(plan_marker) as fh:
            prev = json.loads(fh.read())
        if prev.get("fingerprint") != fingerprint:
            raise ValueError(
                "resume against a DIFFERENT split plan (input files or "
                "rows_per_task changed since the interrupted run) — "
                "split ids no longer map to the same row groups; pass "
                "resume=False to start over")
    else:
        tmp = f"{plan_marker}.tmp"
        with drv_fs.open_write(tmp) as fh:
            fh.write(json.dumps({"fingerprint": fingerprint,
                                 "n_splits": len(splits)}).encode())
        drv_fs.replace(tmp, plan_marker)
    split_rows = [(s["split"], s["file"], json.dumps(s["row_groups"]))
                  for s in splits]
    # exactly one split per partition: hash repartition would collide
    # splits into shared partitions and leave others empty, putting 2-3
    # tasks on the critical path
    rdd = spark.sparkContext.parallelize(split_rows, len(splits))
    sdf = spark.createDataFrame(rdd, "split int, file string, rgs string")
    return splits, sdf


def plan_splits(input_dir: str, rows_per_task: int = 2_000_000,
                fs=None) -> list[dict]:
    """Footer-only planning: pack row groups of all parquet files under
    ``input_dir`` into splits of ~rows_per_task rows.  Only metadata is
    read (the reference's `_metadata` trick, fastparquet/util.py:115-213,
    done with footers instead of a sidecar), and footers are fetched
    CONCURRENTLY (fastparquet/util.py:146-167) — a sequential driver
    loop over 100k object-store files burns minutes of idle cluster
    before the first task launches."""
    from fastparquet_spark.format.reader import read_footer_tail
    from fastparquet_spark.io import fetch_footers, get_fs

    fs = get_fs(input_dir, fs)
    if any(c in input_dir for c in "*?["):
        files = [p for p in fs.glob(input_dir) if p.endswith(".parquet")]
    else:
        # recursive walk: hive key=value inputs live in subdirectories
        prefix = input_dir.rstrip("/") + "/"
        files = [p for p in fs.walk_files(input_dir)
                 if p.endswith(".parquet")
                 and not any(seg.startswith(("_", "."))
                             for seg in p[len(prefix):].split("/"))]
    tails = fetch_footers(files, fs)
    splits: list[dict] = []
    cur_file, cur_rgs, cur_rows = None, [], 0

    def flush():
        nonlocal cur_rgs, cur_rows
        if cur_rgs:
            splits.append({"split": len(splits), "file": cur_file,
                           "row_groups": list(cur_rgs), "rows": cur_rows})
            cur_rgs, cur_rows = [], 0

    for path, tail in zip(files, tails):
        fmd = read_footer_tail(tail)
        if cur_file != path:
            flush()
            cur_file = path
        for rgi, rg in enumerate(fmd["row_groups"]):
            n = rg["num_rows"]
            if cur_rows and cur_rows + n > rows_per_task:
                flush()
            cur_rgs.append(rgi)
            cur_rows += n
    flush()
    return splits


def _stage_name(opath: str, attempt) -> str:
    """Attempt-suffixed, DOT-HIDDEN stage path for ``opath`` — the
    encode_dataset task-commit protocol (encode_job.py): a failed or
    speculative attempt never publishes under a final name, twin
    attempts cannot collide on the stage file, and directory-listing
    readers (Spark/Hive skip '.'/'_' basenames) never see in-flight
    data.  r4's ``opath + '.inprogress'`` violated all three."""
    d, b = opath.rsplit("/", 1)
    return f"{d}/.{b}.stage-{attempt}"


def _sweep_stale_stages(fs, opath: str, keep: str) -> None:
    """Remove dead attempts' stage files for this output (same-name
    twins from failed/zombie attempts), sparing our own ``keep``."""
    d, b = opath.rsplit("/", 1)
    prefix = f".{b}.stage-"
    try:
        entries = fs.listdir(d)
    except OSError:
        return
    for p in entries:
        if p != keep and p.rsplit("/", 1)[1].startswith(prefix):
            try:
                fs.remove(p)
            except OSError:
                pass


def _publish(fs, body_writer, opath: str, attempt) -> None:
    """Stage -> write -> atomic rename -> sweep stale twins.  On any
    failure the stage file is removed; nothing committed-looking is
    ever left behind.

    The sweep runs strictly AFTER our own publish: sweeping first
    allowed two simultaneous twins to delete each other's in-flight
    stage and leave ZERO finals (both renames failing).  With
    publish-first, a sweep victim's failed rename always means a twin
    already published a COMPLETE final — treated as success."""
    tmp = _stage_name(opath, attempt)
    try:
        with fs.open_write(tmp) as sink:
            body_writer(sink)
        try:
            fs.replace(tmp, opath)
        except OSError:
            # two legitimate twin outcomes: (a) our stage was SWEPT by
            # a twin — sweeps run only after that twin published a
            # complete final; (b) the rename failed with our stage
            # intact — then the final must BYTE-MATCH our staged size
            # (the writer is deterministic, so twins' outputs are
            # identical; a stale file from an earlier run is not) —
            # blessing ANY existing file masked real rename failures
            #
            ok = False
            try:
                if fs.exists(opath):
                    if not fs.exists(tmp):
                        ok = True  # swept by a published twin
                    else:
                        ok = fs.size(opath) == fs.size(tmp)
            except OSError:
                pass
            if not ok:
                raise  # no twin final: a real failure
            try:  # our stage, if left, was not consumed
                if fs.exists(tmp):
                    fs.remove(tmp)
            except OSError:
                pass
        _sweep_stale_stages(fs, opath, keep=tmp)
    except BaseException:
        try:
            if fs.exists(tmp):
                fs.remove(tmp)
        except OSError:
            pass
        raise


def encode_files(spark, input_dir: str, out_dir: str, *,
                 compression: str = "ZSTD", columns=None,
                 rows_per_task: int = 2_000_000, resume: bool = True,
                 encodings: dict | None = None, preserve_layout: bool = False,
                 bloom_filters: dict | None = None,
                 page_rows: int | None = None,
                 compat: str = "reference"):
    """Encode every parquet file under ``input_dir`` into ``out_dir``
    (our writer, auto-selected codecs), distributing (file, row-group)
    splits.  Returns the manifest DataFrame.

    ``preserve_layout=True`` mirrors each input file's directory (e.g.
    hive ``key=value`` partitions) under ``out_dir``, so a partitioned
    input re-encodes into an equally partition-prunable output without
    any shuffle — the plan moves, the clustering stays."""
    splits, sdf = _prepare_split_job(spark, input_dir, out_dir,
                                     rows_per_task, resume)
    if sdf is None:
        return spark.createDataFrame([], _manifest_struct())

    out_dir_ = out_dir
    input_dir_ = input_dir
    compression_ = compression
    encodings_ = encodings
    columns_ = list(columns) if columns else None
    preserve_ = preserve_layout
    bloom_ = bloom_filters
    page_rows_ = page_rows
    compat_ = compat

    def run(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        import pyarrow as pa_w
        import pyarrow.parquet as pq
        from pyspark import TaskContext

        from fastparquet_spark.format.writer import write_file
        from fastparquet_spark.io import get_fs

        fs = get_fs(out_dir_)
        attempt = TaskContext.get().taskAttemptId()

        # one Arrow thread per worker: N workers x default pool (ncpus)
        # oversubscribes the box N-fold and collapses kernel throughput
        pa_w.set_cpu_count(1)
        pa_w.set_io_thread_count(2)

        for b in batches:
            for sid, fpath, rgs_json in zip(b.column("split").to_pylist(),
                                            b.column("file").to_pylist(),
                                            b.column("rgs").to_pylist()):
                fname = f"part-{sid:05d}.parquet"
                if preserve_:
                    prefix = input_dir_.rstrip("/") + "/"
                    rel_dir = fpath[len(prefix):].rsplit("/", 1)[0] \
                        if fpath.startswith(prefix) and "/" in fpath[len(prefix):] else ""
                    if rel_dir:
                        fs.makedirs(out_dir_.rstrip("/") + "/" + rel_dir)
                        fname = f"{rel_dir}/part-{sid:05d}.parquet"
                opath = out_dir_.rstrip("/") + "/" + fname
                mpath = out_dir_.rstrip("/") + f"/{MANIFEST_DIR}/part-{sid:05d}.json"
                if resume and fs.exists(mpath):
                    with fs.open_read(mpath) as fh:
                        prev = json.loads(fh.read())
                    prev["skipped"] = True
                    yield _arrow_manifest_batch(prev)
                    continue
                t0 = time.perf_counter()
                tbl = pq.ParquetFile(fpath).read_row_groups(
                    json.loads(rgs_json), columns=columns_, use_threads=False)
                k0 = time.perf_counter()
                res_box = []
                _publish(fs, lambda sink: res_box.append(
                    write_file(sink, tbl, compression=compression_,
                               encodings=encodings_,
                               bloom_filters=bloom_,
                               page_rows=page_rows_,
                               compat=compat_)), opath, attempt)
                res = res_box[0]
                kernel = time.perf_counter() - k0
                cols = {c.name: c.encoding for c in res.columns}
                row = {"partition": sid, "file": fname, "rows": tbl.num_rows,
                       "input_bytes": tbl.nbytes, "output_bytes": res.file_bytes,
                       "encode_secs": time.perf_counter() - t0,
                       "kernel_secs": kernel, "skipped": False,
                       "columns": json.dumps(cols)}
                # manifest written AFTER the data file: existence == commit;
                # its temp is attempt-suffixed for the same twin-safety
                with fs.open_write(f"{mpath}.tmp-{attempt}") as fh:
                    fh.write(json.dumps(row).encode())
                fs.replace(f"{mpath}.tmp-{attempt}", mpath)
                yield _arrow_manifest_batch(row)

    return sdf.mapInArrow(run, _manifest_struct())


def encode_files_fpsc(spark, input_dir: str, out_dir: str, *,
                      compression: str = "ZSTD", columns=None,
                      rows_per_task: int = 2_000_000, resume: bool = True,
                      pretrain_rows: int = 2_000,
                      bloom_filters: dict | None = None):
    """FPSC-container twin of :func:`encode_files` — the container
    format's THROUGHPUT path.  Same split planning (footer-only, plan
    moves not data), same manifest/resume contract, but each worker
    writes an ``.fpsc`` container (FSST-enabled best-of codecs) instead
    of parquet.  FSST symbol tables are trained ONCE on the driver from
    a small pyarrow sample and shipped through the closure, so tasks
    never pay the training cost (fpsc_job.encode_dataset_fpsc has the
    same option for the shuffle path)."""
    splits, sdf = _prepare_split_job(spark, input_dir, out_dir,
                                     rows_per_task, resume)
    if sdf is None:
        return spark.createDataFrame([], _manifest_struct())

    pretrained: dict = {}
    decisions: dict = {}
    if pretrain_rows:
        import pyarrow.parquet as pq_d

        from fastparquet_spark.format.container import decide_string_codecs

        # stream only ~pretrain_rows rows — read_row_group would
        # materialize up to rows_per_task rows on the DRIVER just to
        # slice 2000
        first = pq_d.ParquetFile(splits[0]["file"])
        batch = next(first.iter_batches(batch_size=pretrain_rows,
                                        columns=columns,
                                        use_threads=False))
        head = pa.Table.from_batches([batch])
        # one driver pass trains the FSST tables AND fixes the
        # fsst-vs-plain choice per string column from the same sample,
        # so tasks run only the winning codec (no per-task dual trial)
        decisions = decide_string_codecs(head, pretrained,
                                         compression=compression)

    out_dir_ = out_dir
    compression_ = compression
    columns_ = list(columns) if columns else None
    pretrained_ = pretrained
    decisions_ = decisions
    fbloom_ = bloom_filters

    def run(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        import pyarrow as pa_w
        import pyarrow.parquet as pq
        from pyspark import TaskContext

        from fastparquet_spark.format.container import write_container
        from fastparquet_spark.io import get_fs

        fs = get_fs(out_dir_)
        attempt = TaskContext.get().taskAttemptId()
        pa_w.set_cpu_count(1)
        pa_w.set_io_thread_count(2)
        fsst_cache: dict = dict(pretrained_)

        for b in batches:
            for sid, fpath, rgs_json in zip(b.column("split").to_pylist(),
                                            b.column("file").to_pylist(),
                                            b.column("rgs").to_pylist()):
                fname = f"part-{sid:05d}.fpsc"
                opath = out_dir_.rstrip("/") + "/" + fname
                mpath = out_dir_.rstrip("/") + \
                    f"/{MANIFEST_DIR}/part-{sid:05d}.json"
                if resume and fs.exists(mpath):
                    with fs.open_read(mpath) as fh:
                        prev = json.loads(fh.read())
                    prev["skipped"] = True
                    yield _arrow_manifest_batch(prev)
                    continue
                t0 = time.perf_counter()
                tbl = pq.ParquetFile(fpath).read_row_groups(
                    json.loads(rgs_json), columns=columns_, use_threads=False)
                k0 = time.perf_counter()
                blocks_box = []
                _publish(fs, lambda sink: blocks_box.append(
                    write_container(sink, tbl,
                                    compression=compression_,
                                    fsst_cache=fsst_cache,
                                    bloom_filters=fbloom_,
                                    codec_decisions=decisions_)),
                         opath, attempt)
                blocks = blocks_box[0]
                kernel = time.perf_counter() - k0
                row = {"partition": sid, "file": fname, "rows": tbl.num_rows,
                       "input_bytes": tbl.nbytes,
                       "output_bytes": fs.size(opath),
                       "encode_secs": time.perf_counter() - t0,
                       "kernel_secs": kernel, "skipped": False,
                       "columns": json.dumps({c.name: c.codec
                                              for c in blocks})}
                with fs.open_write(f"{mpath}.tmp-{attempt}") as fh:
                    fh.write(json.dumps(row).encode())
                fs.replace(f"{mpath}.tmp-{attempt}", mpath)
                yield _arrow_manifest_batch(row)

    return sdf.mapInArrow(run, _manifest_struct())
