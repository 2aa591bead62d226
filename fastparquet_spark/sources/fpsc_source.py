"""FPSC as a Spark Python Data Source (pyspark.sql.datasource, Spark 4).

Makes the engine's own container format (FSST string codec + delta/plain
+ validity hybrid, format/container.py) addressable with the standard
DataFrame reader/writer API instead of engine-specific helpers:

    spark.dataSource.register(FpscDataSource)
    df.write.format("fpsc").mode("append").save("/data/cache")
    spark.read.format("fpsc").load("/data/cache")

File-level filter pushdown (footer min/max stats) requires
``spark.sql.python.filterPushdown.enabled=true``.

Read side: one input partition per ``.fpsc`` file, each worker inflates
its container with the vectorized decoders and yields Arrow record
batches (zero row-at-a-time Python).  Schema comes from the first
container's footer.

Write side: an Arrow writer — each task streams its batches into
containers of ~``rows_per_container`` rows (bounded memory, FSST table
trained once per column per task).  Tasks STAGE files under
attempt-suffixed names; ``commit`` (driver-side, fed only by the one
successful attempt per task) renames them to deterministic final names
and sweeps leftovers from failed/speculative attempts — so a task
retry can never leave duplicate rows in the dataset.  ``mode
("overwrite")`` removes pre-existing containers at commit;  ``abort``
removes this job's staged files.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceReader,
    InputPartition,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType


def _list_fpsc(path: str) -> list[str]:
    from fastparquet_spark.io import get_fs

    fs = get_fs(path)
    return [p for p in fs.walk_files(path) if p.endswith(".fpsc")]


class FpscDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "fpsc"

    def schema(self):
        import pyarrow as pa
        from pyspark.sql.pandas.types import from_arrow_schema

        from fastparquet_spark.format.container import (
            _type_from_name, read_container_footer,
        )

        files = _list_fpsc(self.options["path"])
        if not files:
            raise ValueError(f"no .fpsc files under {self.options['path']}")
        meta = read_container_footer(files[0])  # footer tail only
        return from_arrow_schema(pa.schema(
            [(cm["name"], _type_from_name(cm["arrow_type"]))
             for cm in meta["columns"]]))

    def reader(self, schema: StructType):
        return FpscReader(self.options["path"])

    def writer(self, schema: StructType, overwrite: bool):
        bloom = self.options.get("bloom_columns")  # "col1,col2"
        bloom_d = {c.strip(): 0.01 for c in bloom.split(",") if c.strip()} \
            if bloom else None
        return FpscWriter(self.options["path"],
                          self.options.get("compression", "ZSTD"),
                          int(self.options.get("rows_per_container",
                                               1_000_000)),
                          overwrite, bloom_d)


class FpscReader(DataSourceReader):
    def __init__(self, path: str):
        self.path = path
        self._clauses: list[tuple] = []

    def pushFilters(self, filters):
        """Record comparison filters for FILE-LEVEL pruning against the
        container footers' min/max stats.  Everything is returned as
        unsupported — pruning here is conservative (whole files that
        cannot match), Spark still applies the exact row predicate."""
        from pyspark.sql.datasource import (
            EqualTo, GreaterThan, GreaterThanOrEqual, In, IsNotNull,
            IsNull, LessThan, LessThanOrEqual,
        )

        ops = {EqualTo: "==", GreaterThan: ">", GreaterThanOrEqual: ">=",
               LessThan: "<", LessThanOrEqual: "<=", In: "in",
               IsNull: "is_null", IsNotNull: "is_not_null"}
        for f in filters:
            op = ops.get(type(f))
            if op is not None and len(f.attribute) == 1:
                self._clauses.append(
                    (f.attribute[0], op, getattr(f, "value", None)))
        return filters  # Spark keeps responsibility for exactness

    def partitions(self):
        files = _list_fpsc(self.path)
        if not self._clauses:
            return [InputPartition(p) for p in files]
        from concurrent.futures import ThreadPoolExecutor

        from fastparquet_spark.format.container import read_container_footer
        from fastparquet_spark.format.dataset import _chunk_may_match

        from fastparquet_spark.format.container import (
            container_bloom_rules_out,
        )

        with ThreadPoolExecutor(max_workers=min(16, max(len(files), 1))) as ex:
            metas = list(ex.map(read_container_footer, files))
            stat_kept = []
            for p, meta in zip(files, metas):
                cols = {cm["name"]: (cm.get("min"), cm.get("max"),
                                     cm.get("null_count"), cm.get("n"))
                        for cm in meta["columns"]}
                if _chunk_may_match(cols, self._clauses):
                    stat_kept.append((p, meta))
            # second tier: container bloom probes for ==/in point
            # predicates stats can't discriminate — CONCURRENT ranged
            # reads (a sequential driver loop over 10k object-store
            # files burns minutes of planning before any task launches)
            ruled = list(ex.map(
                lambda pm: container_bloom_rules_out(pm[0], pm[1],
                                                     self._clauses),
                stat_kept))
        kept = [p for (p, _m), out in zip(stat_kept, ruled) if not out]
        return [InputPartition(p) for p in kept]

    def read(self, partition: InputPartition):
        # when pushed filters prune ALL files, partitions() returns [] and
        # Spark's python-data-source planner still issues one read(None):
        # yield nothing instead of crashing on partition.value
        if partition is None or partition.value is None:
            return
        import pyarrow as pa

        from fastparquet_spark.format.container import read_container

        pa.set_cpu_count(1)
        yield from read_container(partition.value).to_batches()


@dataclass
class _Committed(WriterCommitMessage):
    files: tuple = ()  # (staged_rel, final_rel) pairs


class FpscWriter(DataSourceArrowWriter):
    """Staged two-phase commit: tasks write ``<final>.stage-<attempt>``
    files; only ``commit`` (which sees exactly ONE message per task —
    the successful attempt) renames them to their deterministic final
    names ``part-<job>-<pid>-<k>.fpsc``.  A failed or speculative
    attempt's staged files are swept at commit/abort, so retries can
    never duplicate rows.  The job token (minted once on the driver,
    shared by all attempts via pickling) keeps distinct jobs — e.g.
    successive appends — from colliding."""

    def __init__(self, path: str, compression: str, rows_per_container: int,
                 overwrite: bool, bloom_filters: dict | None = None):
        import uuid

        self.path = path
        self.compression = compression
        self.rows_per = rows_per_container
        self.overwrite = overwrite
        self.bloom = bloom_filters
        self.job = uuid.uuid4().hex[:8]

    def _full(self, rel: str) -> str:
        return self.path.rstrip("/") + "/" + rel

    def write(self, iterator: Iterator) -> _Committed:
        import pyarrow as pa
        from pyspark import TaskContext

        from fastparquet_spark.format.container import write_container
        from fastparquet_spark.io import get_fs

        pa.set_cpu_count(1)
        fs = get_fs(self.path)
        fs.makedirs(self.path)
        ctx = TaskContext.get()
        pid, attempt = ctx.partitionId(), ctx.taskAttemptId()
        fsst_cache: dict = {}
        done: list[tuple[str, str]] = []
        buf: list[pa.RecordBatch] = []
        buf_rows = 0

        def flush(final: bool = False):
            nonlocal buf, buf_rows
            if not buf_rows:
                return
            tbl = pa.Table.from_batches(buf)
            n = tbl.num_rows
            end = n if final else (n // self.rows_per) * self.rows_per
            for start in range(0, end, self.rows_per):
                final_rel = f"part-{self.job}-{pid:05d}-{len(done):03d}.fpsc"
                staged_rel = f"{final_rel}.stage-{attempt}"
                with fs.open_write(self._full(staged_rel)) as sink:
                    write_container(sink, tbl.slice(start, self.rows_per),
                                    compression=self.compression,
                                    fsst_cache=fsst_cache,
                                    bloom_filters=self.bloom)
                done.append((staged_rel, final_rel))
            if end < n:
                buf, buf_rows = tbl.slice(end).to_batches(), n - end
            else:
                buf, buf_rows = [], 0

        for b in iterator:
            buf.append(b)
            buf_rows += b.num_rows
            if buf_rows >= self.rows_per:
                flush()
        flush(final=True)
        return _Committed(tuple(done))

    def _sweep_stages(self, fs) -> None:
        """Remove staged leftovers from THIS job's failed/speculative
        attempts only — a concurrent job's in-flight stages (different
        job token in the name) must survive our commit/abort."""
        import os

        for p in fs.walk_files(self.path):
            base = os.path.basename(p)
            if ".fpsc.stage-" in base and base.startswith(f"part-{self.job}-"):
                fs.remove(p)

    def commit(self, messages):
        import os

        from fastparquet_spark.io import get_fs

        fs = get_fs(self.path)
        renames = [(s, f) for m in messages
                   for (s, f) in (getattr(m, "files", ()) or ())]
        # overwrite ordering: snapshot the pre-existing containers FIRST,
        # publish the new ones, and only then remove the old — a crash
        # mid-commit can leave extra old files (re-run heals) but can
        # never lose the old data with the new not yet visible
        old: list[str] = []
        if self.overwrite:
            keep = {f for _s, f in renames}
            old = [p for p in fs.walk_files(self.path)
                   if p.endswith(".fpsc") and os.path.basename(p) not in keep]
        for staged, final in renames:
            fs.replace(self._full(staged), self._full(final))
        for p in old:
            fs.remove(p)
        self._sweep_stages(fs)

    def abort(self, messages):
        from fastparquet_spark.io import get_fs

        fs = get_fs(self.path)
        for m in messages:
            for staged, _final in getattr(m, "files", ()) or ():
                full = self._full(staged)
                if fs.exists(full):
                    fs.remove(full)
        self._sweep_stages(fs)
