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

Iceberg mapping (so a real catalog can slot in without changing the
job): one ``append_dataset`` generation == one Iceberg SNAPSHOT (the
``part-g{N}`` prefix is the snapshot id); the ``_manifests/`` directory
== the snapshot's MANIFEST LIST (one manifest per task, data-file path
+ row/byte counts + per-column codec stats — the same fields Iceberg
manifests carry); the re-merged ``_metadata`` sidecar == the table
metadata pointer flip, the single atomic publish step.  Swapping the
JSON writes for Iceberg catalog calls changes only the commit functions
in this module — task logic, naming determinism and idempotent resume
are already Iceberg-shaped.
"""

from __future__ import annotations

import json
import os
import time
from collections.abc import Iterator

import pyarrow as pa

MANIFEST_DIR = "_manifests"
_MAX_BUFFER_BYTES = 512 << 20  # byte cap on buffered rows per output file


def _u_join(base: str, rel: str) -> str:
    """Path join that preserves URI schemes (s3://... stays s3://...)."""
    return base.rstrip("/") + "/" + rel

MANIFEST_SCHEMA_JSON = {
    "partition": "int", "file": "string", "rows": "long",
    "input_bytes": "long", "output_bytes": "long", "encode_secs": "double",
    "skipped": "boolean", "columns": "string",  # json {name: encoding}
    "kernel_secs": "double",
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


def _salt_cols(df) -> list:
    """Columns cheap and legal to hash for the salt: identity-ish
    atomics — payload byte columns (hashing them touches every byte of
    a 100 TB table just to pick a bucket) and complex types (arrays/
    maps/structs) are excluded."""
    out = [f.name for f in df.schema.fields
           if f.name != "__key_rows"
           and f.name.lower() not in _PAYLOAD_NAMES
           and f.dataType.typeName() not in ("array", "map", "struct",
                                             "binary")]
    return out or [df.schema.fields[0].name]


def _salted(df, partition_cols, salt_rows: int, num_partitions: int):
    """Repartition by partition_cols + salt; salt width per key comes from a
    broadcast-joined count so skewed keys split across tasks.

    Only SKEWED keys (count > salt_rows) enter the broadcast: at 10^8
    distinct keys a full count table exceeds any sane broadcast limit,
    while the skewed head is small by definition (non-skewed keys default
    to 1 bucket anyway via the left join's null).

    Columns absent from ``df`` are dropped from the key; with NO key
    columns left (keyless tables, e.g. an embeddings table) rows spread
    uniformly by identity-column hash — no key means no skew."""
    from pyspark.sql import functions as F

    cols = [c for c in partition_cols if c in df.columns]
    if not cols:
        salt = F.pmod(F.xxhash64(*[F.col(c) for c in _salt_cols(df)]),
                      F.lit(num_partitions))
        return df.repartition(num_partitions, salt)
    counts = (df.groupBy(*cols).agg(F.count("*").alias("__key_rows"))
              .filter(F.col("__key_rows") > salt_rows))
    # eqNullSafe, NOT on=cols: a skewed NULL partition key (common in
    # scraped corpora) never matches its count row under plain equality
    # and would land unsalted on one task
    counts = counts.select(
        *[F.col(c).alias(f"__k_{c}") for c in cols], "__key_rows")
    cond = None
    for c in cols:
        e = F.col(c).eqNullSafe(F.col(f"__k_{c}"))
        cond = e if cond is None else (cond & e)
    df = (df.join(F.broadcast(counts), on=cond, how="left")
          .drop(*[f"__k_{c}" for c in cols]))
    buckets = F.when(
        F.col("__key_rows").isNull(), F.lit(1)
    ).otherwise(F.ceil(F.col("__key_rows") / F.lit(salt_rows)))
    salt_cols = _salt_cols(df)
    df = df.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in salt_cols]),
                         buckets).cast("int"),
    ).drop("__key_rows")
    return df.repartition(num_partitions, *cols, F.col("__salt")).drop("__salt")


def _hive_dir(pcols: list[str], key: tuple) -> str:
    """``key=value`` path segment per partition column (the reference's
    partition layout, fastparquet/writer.py:969-1047), values URL-escaped
    the way Spark/Hive escape them; None -> the Hive default marker."""
    from urllib.parse import quote

    parts = []
    for c, v in zip(pcols, key):
        sv = "__HIVE_DEFAULT_PARTITION__" if v is None else quote(str(v), safe="")
        parts.append(f"{c}={sv}")
    return "/".join(parts)


def encode_dataset(spark, df, out_dir: str, *, compression: str = "ZSTD",
                   partition_cols=("repo", "lang"), num_partitions: int | None = None,
                   salt_rows: int = 250_000, sort_within: tuple = ("repo", "path"),
                   row_group_rows: int = 1_000_000, resume: bool = True,
                   encodings: dict | None = None, layout: str = "flat",
                   file_prefix: str = "part",
                   bloom_filters: dict | None = None,
                   page_rows: int | None = None,
                   compat: str = "reference"):
    """Encode ``df`` into ``out_dir`` as parquet files + lineage manifests.

    Returns the manifest DataFrame (one row per written file).  Designed
    for 1000-executor scale: the only shuffles are the skewed-key count
    aggregate (filtered before broadcast) and the one repartition that
    ALSO provides the physical file layout; encode streams row groups,
    so task memory is bounded by ~``row_group_rows`` buffered rows, not
    by partition size.

    ``layout="hive"`` writes ``col=value/`` directories (partition
    columns removed from the file data, like the reference's partitioned
    writer fastparquet/writer.py:969-1047) so Spark/DuckDB/pyarrow can
    partition-prune the output; ``"flat"`` writes ``part-*.parquet``
    directly under ``out_dir``.
    """
    if layout not in ("flat", "hive"):
        raise ValueError("layout must be 'flat' or 'hive'")
    pcols = [c for c in partition_cols if c in df.columns]
    if layout == "hive" and not pcols:
        raise ValueError("hive layout needs at least one partition column")

    from fastparquet_spark.io import get_fs

    drv_fs = get_fs(out_dir)
    drv_fs.makedirs(out_dir)
    drv_fs.makedirs(_u_join(out_dir, MANIFEST_DIR))
    # a pre-existing _metadata sidecar cannot see the files this job is
    # about to add — drop it so footer-only readers fall back to the
    # footer walk instead of silently missing new data; append_dataset
    # re-merges it (incrementally) after the job commits
    for name in ("_metadata", "_common_metadata"):
        sidecar = _u_join(out_dir, name)
        if drv_fs.exists(sidecar):
            drv_fs.remove(sidecar)

    if num_partitions is None:
        num_partitions = max(spark.sparkContext.defaultParallelism, 1)
    # resume identity is the PARTITION ID: a re-run with a different
    # num_partitions (e.g. resuming on a different-sized cluster with
    # the defaultParallelism default) assigns DIFFERENT rows to the
    # pids whose manifests exist — silent data loss.  The first run
    # records its plan; resumes must match it.
    plan_marker = _u_join(out_dir, f"{MANIFEST_DIR}/_plan_{file_prefix}.json")
    if resume and drv_fs.exists(plan_marker):
        with drv_fs.open_read(plan_marker) as fh:
            prev = json.loads(fh.read())
        if prev.get("num_partitions") != num_partitions:
            raise ValueError(
                f"resume with num_partitions={num_partitions} but the "
                f"interrupted run used {prev.get('num_partitions')} — "
                f"pass num_partitions={prev.get('num_partitions')} "
                f"explicitly, or resume=False to start over")
    else:
        tmp = f"{plan_marker}.tmp"
        with drv_fs.open_write(tmp) as fh:
            fh.write(json.dumps(
                {"num_partitions": num_partitions}).encode())
        drv_fs.replace(tmp, plan_marker)
    work = _salted(df, partition_cols, salt_rows, num_partitions)
    sort_cols = [c for c in (sort_within or ()) if c in df.columns]
    if layout == "hive":
        # cluster keys contiguously inside the task: one open writer at a
        # time instead of one per live key
        sort_cols = pcols + [c for c in sort_cols if c not in pcols]
    if sort_cols:
        work = work.sortWithinPartitions(*sort_cols)

    schema = _manifest_struct()
    compression_ = compression
    encodings_ = encodings
    bloom_ = bloom_filters
    page_rows_ = page_rows
    compat_ = compat
    sort_cols_ = tuple(sort_cols)  # stamped as footer SortingColumn metadata
    row_group_rows_ = row_group_rows
    out_dir_ = out_dir
    resume_ = resume
    layout_ = layout
    pcols_ = pcols
    file_prefix_ = file_prefix

    def encode_partition(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        import pyarrow as pa_w
        from pyspark import TaskContext

        from fastparquet_spark.format.writer import ParquetWriter
        from fastparquet_spark.io import get_fs

        pa_w.set_cpu_count(1)  # see file_job.run: avoid pool oversubscription

        fs = get_fs(out_dir_)  # same seam as the driver: URIs work end to end
        ctx = TaskContext.get()
        pid, attempt = ctx.partitionId(), ctx.taskAttemptId()
        fname = f"{file_prefix_}-{pid:05d}.parquet"
        mpath = _u_join(out_dir_, f"{MANIFEST_DIR}/{file_prefix_}-{pid:05d}.json")
        if resume_ and fs.exists(mpath):
            # checkpoint hit: partition already committed -> skip
            with fs.open_read(mpath) as fh:
                prev = json.loads(fh.read())
            for row in prev if isinstance(prev, list) else [prev]:
                row["skipped"] = True
                yield _arrow_manifest_batch(row)
            return

        t0 = time.perf_counter()
        kernel_secs = 0.0

        class _Out:
            """One in-progress output file (lazy-opened on first rows)."""

            def __init__(self, rel: str, schema_: pa.Schema):
                self.rel = rel
                self.final = _u_join(out_dir_, rel)
                if "/" in rel:
                    fs.makedirs(self.final.rsplit("/", 1)[0])
                # attempt-suffixed, DOT-HIDDEN stage name: a failed or
                # speculative attempt never publishes anything under a
                # final name, twin attempts can't collide on the stage
                # file, and Spark/Hive readers (which skip '.'/'_'
                # basenames) can't see in-flight data
                d, b = self.final.rsplit("/", 1)
                self.tmp = f"{d}/.{b}.stage-{attempt}"
                self.sink = fs.open_write(self.tmp)
                self.writer = ParquetWriter(self.sink, schema_,
                                            compression=compression_,
                                            encodings=encodings_,
                                            bloom_filters=bloom_,
                                            page_rows=page_rows_,
                                            compat=compat_,
                                            sorting_columns=list(sort_cols_))
                self.buf: list[pa.Table] = []
                self.buf_rows = 0
                self.buf_bytes = 0
                self.rows = 0
                self.in_bytes = 0

            def add(self, tbl: pa.Table):
                self.buf.append(tbl)
                self.buf_rows += tbl.num_rows
                self.buf_bytes += tbl.nbytes
                self.rows += tbl.num_rows
                self.in_bytes += tbl.nbytes
                if self.buf_rows >= row_group_rows_:
                    self.flush()
                elif self.buf_bytes >= _MAX_BUFFER_BYTES:
                    # fat rows: bytes cap the buffer before the row cap
                    # does — emit a short row group rather than grow
                    self.flush(final=True)

            def flush(self, final: bool = False):
                nonlocal kernel_secs
                if not self.buf_rows:
                    return
                tbl = pa.concat_tables(self.buf)
                n = tbl.num_rows
                # emit only FULL row groups; the remainder stays buffered so
                # steady-state groups are uniformly row_group_rows wide
                end = n if final else (n // row_group_rows_) * row_group_rows_
                k0 = time.perf_counter()
                for start in range(0, end, row_group_rows_):
                    self.writer.write_row_group(tbl.slice(start, row_group_rows_))
                kernel_secs += time.perf_counter() - k0
                if end < n:
                    self.buf, self.buf_rows = [tbl.slice(end)], n - end
                    self.buf_bytes = self.buf[0].nbytes
                else:
                    self.buf, self.buf_rows, self.buf_bytes = [], 0, 0

            def finish(self) -> dict:
                # close the sink but do NOT publish: all of this task's
                # files are renamed together at task commit, just before
                # the manifest write — a task that dies mid-way leaves
                # only .stage-N garbage, never committed-looking data
                self.flush(final=True)
                res = self.writer.close()
                self.sink.close()
                pending.append((self.tmp, self.final))
                cols = {c.name: c.encoding for c in res.columns}
                return {"partition": pid, "file": self.rel, "rows": self.rows,
                        "input_bytes": self.in_bytes,
                        "output_bytes": res.file_bytes,
                        "encode_secs": 0.0, "kernel_secs": 0.0,
                        "skipped": False, "columns": json.dumps(cols)}

            def abort(self):
                try:
                    self.sink.close()
                finally:
                    if fs.exists(self.tmp):
                        fs.remove(self.tmp)

        outs: dict[tuple, _Out] = {}
        done_rows: list[dict] = []
        pending: list[tuple[str, str]] = []  # (staged, final) publish queue
        seqs: dict[tuple, int] = {}  # files already closed per key
        try:
            for b in batches:
                tbl = pa.Table.from_batches([b])
                if layout_ == "flat":
                    out = outs.get(())
                    if out is None:
                        out = outs[()] = _Out(fname, tbl.schema)
                    out.add(tbl)
                    continue
                # hive: split the batch by partition-key combination
                # (vectorized: distinct combos via Arrow group_by, then one
                # boolean-mask take per combo — combos per task are few by
                # construction, the repartition clusters them)
                import pyarrow.compute as pc

                combos = tbl.select(pcols_).group_by(pcols_).aggregate([])
                data_schema = pa.schema(
                    [f for f in tbl.schema if f.name not in pcols_])
                batch_keys = set()
                for combo in combos.to_pylist():
                    mask = None
                    for c in pcols_:
                        col = tbl.column(c)
                        if combo[c] is None:
                            m = pc.is_null(col)
                        elif isinstance(combo[c], float) and \
                                combo[c] != combo[c]:
                            # NaN combo: NaN != NaN, plain equality
                            # silently dropped every NaN row
                            m = pc.is_nan(col)
                        else:
                            m = pc.equal(col, combo[c])
                        mask = m if mask is None else pc.and_kleene(mask, m)
                    part = tbl.filter(mask).drop_columns(pcols_)
                    key = tuple(combo[c] for c in pcols_)
                    batch_keys.add(key)
                    out = outs.get(key)
                    if out is None:
                        # reopened keys (possible only if the sort order
                        # didn't cluster them) get a sequence suffix so
                        # the earlier published file is never clobbered
                        seq = seqs.get(key, 0)
                        base = fname if seq == 0 else \
                            f"{file_prefix_}-{pid:05d}-r{seq}.parquet"
                        rel = f"{_hive_dir(pcols_, key)}/{base}"
                        out = outs[key] = _Out(rel, data_schema)
                    out.add(part)
                # eager close: the sort clusters keys, so a writer whose
                # key is absent from this batch will never see rows again
                # — closing it bounds open files at keys-per-batch, not
                # distinct keys per task
                for key in [k for k in outs if k not in batch_keys]:
                    seqs[key] = seqs.get(key, 0) + 1
                    done_rows.append(outs.pop(key).finish())
            if not outs and not done_rows:
                return  # empty partition: nothing to commit
            for out in outs.values():
                done_rows.append(out.finish())
            total_secs = time.perf_counter() - t0
            for row in done_rows:
                row["encode_secs"] = total_secs
                row["kernel_secs"] = kernel_secs
            # task commit: (1) publish ALL staged files (atomic per
            # file), (2) sweep stale finals/stages this partition id
            # left in any touched hive dir from a dead attempt (batch
            # boundaries after a shuffle are not deterministic, so the
            # old attempt's -rN split may not be reproduced), (3) write
            # the manifest marker.  Publish-FIRST ordering:
            # sweeping before publishing let two simultaneous twins
            # delete each other's in-flight stages and leave ZERO
            # finals, and a zombie's sweep could remove a committed
            # -rN file while that attempt's manifest still claimed it —
            # now any destruction happens only after OUR complete set
            # is on disk, and a swept twin's failed rename (final
            # already present) reads as success, not data loss.
            finals = {f for _t, f in pending}
            staged = {t for t, _f in pending}
            for tmp, final in pending:
                try:
                    fs.replace(tmp, final)  # atomic per file
                except OSError:
                    if not fs.exists(final):
                        raise
            if layout_ == "hive":
                me = f"{file_prefix_}-{pid:05d}"
                for d in sorted({f.rsplit("/", 1)[0] for f in finals}):
                    for p in fs.listdir(d):
                        base = p.rsplit("/", 1)[1]
                        core = base[1:] if base.startswith(".") else base
                        if (p not in finals and p not in staged
                                and (core.startswith(me + ".")
                                     or core.startswith(me + "-r"))):
                            try:
                                fs.remove(p)  # dead attempt's leftover
                            except OSError:
                                pass
            # manifest written AFTER all data files: its existence == commit
            payload = done_rows[0] if (layout_ == "flat" and len(done_rows) == 1) \
                else done_rows
            with fs.open_write(f"{mpath}.tmp-{attempt}") as fh:
                fh.write(json.dumps(payload).encode())
            fs.replace(f"{mpath}.tmp-{attempt}", mpath)
            for row in done_rows:
                yield _arrow_manifest_batch(row)
        except BaseException:
            for out in outs.values():
                out.abort()
            for staged, _final in pending:
                try:
                    if fs.exists(staged):
                        fs.remove(staged)
                except OSError:
                    pass
            raise

    return work.mapInArrow(encode_partition, schema)


def append_dataset(spark, df, out_dir: str, **kwargs):
    """Append ``df`` to an EXISTING dataset (the reference's
    ``write(..., append=True)``, fastparquet/writer.py:773-807):

    - schema compatibility is checked against the existing footers
      (same leaf names/physical types/converted types);
    - new files get a fresh generation prefix ``part-g{N}``, so nothing
      collides and resume stays per-generation idempotent;
    - on success the ``_metadata`` sidecar is re-merged, so footer-only
      readers see old+new in one fetch.

    EAGER (runs the job) — append is a commit, not a plan.  Returns the
    collected manifest rows."""
    import pyarrow as pa_s

    from fastparquet_spark.format.dataset import (
        dataset_metadata, read_sidecar, schema_signature,
        write_metadata_sidecar,
    )
    from fastparquet_spark.format.writer import ParquetWriter

    # hold the current sidecar in memory: encode_dataset invalidates it
    # on disk, and the post-append re-merge then only has to fetch the
    # NEW generation's footers (O(new files), not O(dataset))
    old_sidecar = read_sidecar(out_dir)
    existing = dataset_metadata(out_dir)
    if not existing:
        raise ValueError(f"append target {out_dir} has no existing dataset")
    # the schema our writer WOULD produce for df, minus hive partition cols
    layout = kwargs.get("layout", "flat")
    pcols = [c for c in kwargs.get("partition_cols", ("repo", "lang"))
             if c in df.columns]
    import io as _io

    from pyspark.sql.pandas.types import to_arrow_schema

    arrow_schema = to_arrow_schema(df.schema)
    if layout == "hive" and pcols:
        arrow_schema = pa_s.schema(
            [f for f in arrow_schema if f.name not in pcols])
    probe = ParquetWriter(_io.BytesIO(), arrow_schema)
    # LEAVES only, matching schema_signature(): group elements (LIST/
    # MAP/STRUCT roots) have no physical type and made every nested
    # append a spurious mismatch
    new_sig = [(e["name"], e.get("type"), e.get("converted_type"),
                e.get("type_length"))
               for e in probe.schema_elems[1:]
               if e.get("num_children") is None]
    old_sig = schema_signature(existing[0]["fmd"])
    # order-insensitive: the salting repartition fronts the partition
    # columns, so physical column order is an artifact, not the contract
    if set(new_sig) != set(old_sig):
        raise ValueError(
            f"append schema mismatch: existing {old_sig} vs new {new_sig}")
    # next generation: one past the highest existing g-prefix — UNLESS
    # the highest generation came from an INTERRUPTED append, in which
    # case re-running must RESUME it (same prefix; committed partitions
    # skip via their manifests) rather than re-encode the whole df under
    # a fresh prefix, duplicating the partial generation's rows.
    # The proof of interruption is a POSITIVE signal: every
    # append writes `_g{N}_INPROGRESS` before any task runs and removes
    # it only after the final sidecar re-merge, so marker present =>
    # that generation never finished.  ("sidecar absent" alone is NOT
    # proof — a LATER append that died between its plan-time sidecar
    # invalidation and its first task commit also leaves no sidecar,
    # and decrementing onto the earlier COMPLETED generation would make
    # every partition skip and silently drop the new rows — r5 ADVICE
    # #1.)
    from fastparquet_spark.io import get_fs

    fs = get_fs(out_dir)
    if old_sidecar is not None:
        # a valid sidecar proves the last append COMPLETED: any marker
        # still on disk is stale (removal raced/failed) and must not
        # trigger a resume-decrement in a later crash chain
        for p in fs.glob(_u_join(out_dir, "_g*_INPROGRESS")):
            try:
                fs.remove(p)
            except OSError:
                pass
    gens = [0]
    for m in existing:
        base = os.path.basename(m["file"])
        if base.startswith("part-g"):
            try:
                gens.append(int(base.split("-")[1][1:]) + 1)
            except ValueError:
                pass
        else:
            gens.append(1)
    gen = max(gens)
    resume = kwargs.get("resume", True)
    if (resume and gen > 1 and old_sidecar is None
            and fs.exists(_u_join(out_dir, f"_g{gen - 1:03d}_INPROGRESS"))):
        gen -= 1  # resume the provably interrupted generation
    marker = _u_join(out_dir, f"_g{gen:03d}_INPROGRESS")
    with fs.open_write(marker) as fh:
        fh.write(b"")
    rows = encode_dataset(spark, df, out_dir,
                          file_prefix=f"part-g{gen:03d}", **kwargs).collect()
    # ALL manifest files not already in the base sidecar — not just
    # freshly-written ones: a task re-run after its manifest commit
    # reports skipped=True, but its files may still be missing from
    # the sidecar
    have = {rg["columns"][0].get("file_path")
            for rg in old_sidecar["row_groups"]} if old_sidecar else set()
    new_files = sorted({r["file"] for r in rows if r["file"]} - have)
    if old_sidecar is not None and new_files:
        write_metadata_sidecar(out_dir, base=old_sidecar,
                               add_files=new_files)
    else:
        write_metadata_sidecar(out_dir)
    try:  # completion: the generation is now published in the sidecar
        fs.remove(marker)
    except OSError:
        pass
    return rows


def verify_roundtrip(spark, src_df, out_dir: str, key_cols=("repo", "path")) -> dict:
    """Per-row sha256(content) equality between source and encoded output —
    the BASELINE.json invariant, computed distributed (anti-join of hashes).
    Returns {'src_rows', 'out_rows', 'mismatches'}."""
    from pyspark.sql import functions as F

    # reading the directory covers flat AND hive layouts (underscore
    # manifest/metadata entries are ignored by Spark's listing)
    out_df = spark.read.parquet(out_dir)
    key = [F.col(c) for c in key_cols]
    a = src_df.select(*key, F.sha2(F.col("content"), 256).alias("h_src"))
    b = out_df.select(*key, F.sha2(F.col("content"), 256).alias("h_out"))
    joined = a.join(b, on=list(key_cols), how="full_outer")
    mism = joined.filter(
        F.col("h_src").isNull() | F.col("h_out").isNull() |
        (F.col("h_src") != F.col("h_out"))).count()
    return {"src_rows": src_df.count(), "out_rows": out_df.count(),
            "mismatches": mism}
