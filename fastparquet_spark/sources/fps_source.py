"""The engine's parquet read path as a Spark Python Data Source
(pyspark.sql.datasource, Spark 4) — Catalyst drives the three-tier
pruning stack instead of hand-built DNF filters:

    spark.dataSource.register(FpsDataSource)
    spark.read.format("fps").load("/data/ds").filter("k = 7")

is the idiomatic spelling of ``engine.scan_job.paged_read``:

1. ``pushFilters`` receives Catalyst's translated predicates and keeps
   the comparison/null/in terms as one DNF AND-clause;
2. ``partitions()`` (driver, metadata-only) runs row-group stats +
   bloom pruning (``filter_row_groups`` — sidecar-aware footer fetch,
   concurrent bloom probes; hive partition values prune whole files as
   pseudo-stats) and emits one input partition per group of surviving
   files;
3. ``read()`` (executor) runs ColumnIndex page skipping inside each
   surviving row group (``read_pages`` — ranged reads of surviving
   spans only) and yields the page-granular superset as Arrow batches.

Every filter is returned to Spark as unsupported, so Spark keeps
responsibility for exactness and applies the full predicate over the
superset rows — the source's job is pruning IO, not row-level
semantics.  NOTE: because the reader implements ``pushFilters``,
Spark requires ``spark.sql.python.filterPushdown.enabled=true`` (it
raises DATA_SOURCE_PUSHDOWN_DISABLED otherwise); the conf is
runtime-settable via ``spark.conf.set``.

The Python Data Source API has no column-pruning hook yet; pass
``.option("columns", "a,b")`` to project at the page-reader level
(predicate columns are decoded as needed and dropped, mirroring
``paged_read``'s contract).  Hive ``key=value`` datasets work end to
end, partition columns appended last (Spark's convention).

Write side (``df.write.format("fps").save(dir)``): each task streams
its Arrow batches through ``format.writer.write_file`` into one
staged ``part-<job>-<pid>.parquet`` per task attempt; ``commit``
renames the one successful attempt per task to its deterministic
final name and sweeps stale stages (the engine's twin-safe
publish-first protocol), then re-merges the ``_metadata`` /
``_common_metadata`` sidecars so footer-only readers see the new
files in one fetch.
"""

from __future__ import annotations

import json
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

_MAX_TASKS = 4096  # ceiling on scheduler units for 100k-file datasets


def _result_columns(metas, columns):
    """(file_cols, part_cols, drop_cols, arrow_schema, names_all,
    present, ptypes) — same contract as ``paged_read``: the UNION of
    the per-file leaf schemas in first-seen order (schema-evolution-
    tolerant, type conflicts error), partition columns (typed from
    observed values) appended last."""
    import pyarrow as pa

    from fastparquet_spark.engine.scan_job import (
        _partition_arrow_type, union_leaf_elems,
    )
    from fastparquet_spark.format.reader import _arrow_type

    names_all, elems, present = union_leaf_elems(metas)
    # flat leaves only (page-reader contract, same as paged_read)
    names_all = [n for n in names_all
                 if elems[n].get("num_children") is None]
    pnames = list(metas[0].get("partitions") or {})
    ptypes = {k: _partition_arrow_type(
        [(m.get("partitions") or {}).get(k) for m in metas])
        for k in pnames}
    drop_cols: list[str] = []
    if columns is not None:
        file_cols = [c for c in columns if c in names_all]
        part_cols = [c for c in columns if c in pnames]
        if not file_cols and names_all:
            # partition-only projection still needs row cardinality
            file_cols = [names_all[0]]
            drop_cols = [names_all[0]]
    else:
        file_cols, part_cols = list(names_all), list(pnames)
    arrow_schema = pa.schema(
        [(n, _arrow_type(elems[n])) for n in file_cols
         if n not in drop_cols]
        + [(n, ptypes[n]) for n in part_cols])
    return (file_cols, part_cols, drop_cols, arrow_schema, names_all,
            present, ptypes)


class FpsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "fps"

    def _columns_opt(self):
        cols = self.options.get("columns")
        return [c.strip() for c in cols.split(",") if c.strip()] \
            if cols else None

    def _plan(self):
        """(root, metas), computed once per DataSource instance —
        schema() and reader() both need the footers; without the cache
        every read plans with two full metadata sweeps (2x the
        planning IO on a 100k-file dataset)."""
        if getattr(self, "_plan_cache", None) is None:
            from fastparquet_spark.format.dataset import load_dataset_metas

            self._plan_cache = load_dataset_metas(self.options["path"])
        return self._plan_cache

    def schema(self):
        from pyspark.sql.pandas.types import from_arrow_schema

        _root, metas = self._plan()
        arrow_schema = _result_columns(metas, self._columns_opt())[3]
        return from_arrow_schema(arrow_schema)

    def reader(self, schema: StructType):
        return FpsReader(self.options["path"], self._columns_opt(),
                         plan=self._plan())

    def writer(self, schema: StructType, overwrite: bool):
        return FpsWriter(
            self.options["path"],
            self.options.get("compression", "ZSTD"),
            int(self.options.get("row_group_rows", 1_000_000)),
            overwrite)


class FpsReader(DataSourceReader):
    def __init__(self, path: str, columns, plan=None):
        self.path = path
        self.columns = columns
        self._plan = plan  # (root, metas) from the DataSource, if any
        self._clauses: list[tuple] = []

    def __getstate__(self):
        # the executor pickle must NOT carry the driver's footer cache
        # (100k files of metadata in every task closure); read() gets
        # everything it needs from the InputPartition payload
        state = dict(self.__dict__)
        state["_plan"] = None
        return state

    def pushFilters(self, filters):
        """Catalyst -> DNF translation.  Spark hands the conjunction of
        the query's source-level predicates; the comparison / null / IN
        terms become ONE AND-clause for the pruning stack.  ALL filters
        are returned (unsupported), so Spark re-applies the exact
        predicate over the page-granular superset we yield."""
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
                val = getattr(f, "value", None)  # In.value is a tuple
                self._clauses.append((f.attribute[0], op, val))
        return filters

    def partitions(self):
        """Driver tier: stats + bloom row-group pruning (metadata-only)
        -> grouped (file, row-groups, partition-values) units.

        Each InputPartition is SELF-CONTAINED (units + the projection /
        clauses / result schema header): Spark pickles the reader
        object before this runs, so executor-side ``read`` must not
        depend on driver-side mutations of ``self``."""
        from fastparquet_spark.engine.scan_job import build_scan_units
        from fastparquet_spark.format.dataset import (
            filter_row_groups, load_dataset_metas,
        )

        root, metas = self._plan or load_dataset_metas(self.path)
        (file_cols, part_cols, drop_cols, aschema, names_all, present,
         ptypes) = _result_columns(metas, self.columns)
        filters = [self._clauses] if self._clauses else None
        if filters:
            survivors = filter_row_groups(root, filters, metas=metas)
        else:
            survivors = [(m["file"], ri) for m in metas
                         for ri in range(len(m["fmd"]["row_groups"]))]
        by_file: dict[str, list[int]] = {}
        for f, ri in survivors:
            by_file.setdefault(f, []).append(ri)
        units = [(f"{root}/{f}", ris, pvals, absent, fallback)
                 for f, ris, pvals, absent, fallback in build_scan_units(
                     by_file, metas, file_cols, names_all, present,
                     ptypes)]
        header = {"file_cols": file_cols, "part_cols": part_cols,
                  "drop_cols": drop_cols,
                  "schema": aschema.serialize().to_pybytes(),
                  "clauses": list(self._clauses)}
        per = max(1, -(-len(units) // _MAX_TASKS))  # ceil-div grouping
        return [InputPartition((header, units[i:i + per]))
                for i in range(0, len(units), per)]

    def read(self, partition: InputPartition):
        # all files pruned -> Spark still issues one read(None)
        if partition is None or partition.value is None:
            return
        import pyarrow as pa

        from fastparquet_spark.engine.scan_job import scan_unit_batches

        pa.set_cpu_count(1)
        header, units = partition.value
        aschema = pa.ipc.read_schema(pa.py_buffer(header["schema"]))
        # [[]] is the match-all DNF (an empty list would mean NO branch)
        clauses = [list(header["clauses"])] if header["clauses"] else [[]]
        for path, ris, pvals, absent, fallback in units:
            # streaming: match-all units decode batch-by-batch through
            # pyarrow's C++ reader, overlapping decode with the Arrow
            # IPC write back to the JVM (the r6 full-scan tax); the
            # default 128k rows of a ~100B content column is ~13 MB
            # per batch — peak executor memory is ONE batch, not a file
            yield from scan_unit_batches(
                path, ris, pvals, absent, fallback, clauses,
                header["file_cols"], header["drop_cols"],
                header["part_cols"], aschema, exact=False)


@dataclass
class _Committed(WriterCommitMessage):
    files: tuple = ()  # (staged_rel, final_rel) pairs


class FpsWriter(DataSourceArrowWriter):
    """Twin-safe staged commit, same protocol as the engine's file
    jobs: tasks write ``.<final>.stage-<attempt>`` (dot-hidden, so no
    reader or lister ever sees a partial file), the driver's ``commit``
    renames exactly the winning attempt per task and sweeps the rest."""

    def __init__(self, path: str, compression: str, row_group_rows: int,
                 overwrite: bool):
        import uuid

        self.path = path
        self.compression = compression
        self.row_group_rows = row_group_rows
        self.overwrite = overwrite
        self.job = uuid.uuid4().hex[:8]

    def _full(self, rel: str) -> str:
        return self.path.rstrip("/") + "/" + rel

    def write(self, iterator: Iterator) -> _Committed:
        import pyarrow as pa
        from pyspark import TaskContext

        from fastparquet_spark.format.writer import ParquetWriter
        from fastparquet_spark.io import get_fs

        pa.set_cpu_count(1)
        fs = get_fs(self.path)
        fs.makedirs(self.path)
        ctx = TaskContext.get()
        pid, attempt = ctx.partitionId(), ctx.taskAttemptId()
        final = f"part-{self.job}-{pid:05d}.parquet"
        staged = f".{final}.stage-{attempt}"
        # STREAM batches into row groups — memory is bounded by one row
        # group, never the whole task partition (a multi-GB partition
        # must not be buffered as a single Table before writing)
        writer = None
        out = None
        buf: list = []
        buffered = 0
        try:
            for b in iterator:
                if b.num_rows == 0:
                    continue
                if writer is None:
                    out = fs.open_write(self._full(staged))
                    writer = ParquetWriter(out, b.schema,
                                           compression=self.compression)
                # slice incoming batches so row groups honor
                # row_group_rows even when Spark hands one huge batch
                while buffered + b.num_rows >= self.row_group_rows:
                    take = self.row_group_rows - buffered
                    buf.append(b.slice(0, take))
                    writer.write_row_group(pa.Table.from_batches(buf))
                    buf, buffered = [], 0
                    b = b.slice(take)
                if b.num_rows:
                    buf.append(b)
                    buffered += b.num_rows
            if writer is None:
                return _Committed(())  # empty partition: no file
            if buf:
                writer.write_row_group(pa.Table.from_batches(buf))
            writer.close()
            out.close()
        except BaseException:
            try:
                if out is not None:
                    out.close()
                if fs.exists(self._full(staged)):
                    fs.remove(self._full(staged))
            except OSError:
                pass
            raise
        return _Committed(((staged, final),))

    def commit(self, messages):
        from fastparquet_spark.io import get_fs

        import os as _os

        fs = get_fs(self.path)
        root = self.path.rstrip("/")
        if self.overwrite:
            # walk, not a root-level glob: hive-layout data lives in
            # key=value subdirectories and surviving files would be
            # swept back into the new sidecar
            for p in fs.walk_files(root):
                base = _os.path.basename(p)
                if p.endswith(".parquet") and not base.startswith("."):
                    fs.remove(p)
            for name in ("_metadata", "_common_metadata"):
                if fs.exists(f"{root}/{name}"):
                    fs.remove(f"{root}/{name}")
        for msg in messages:
            for staged, final in msg.files:
                fs.replace(self._full(staged), self._full(final))
        # sweep stale stages from failed/speculative attempts
        for p in fs.glob(f"{root}/.part-{self.job}-*.stage-*"):
            try:
                fs.remove(p)
            except OSError:
                pass
        from fastparquet_spark.format.dataset import write_metadata_sidecar

        write_metadata_sidecar(self.path)

    def abort(self, messages):
        from fastparquet_spark.io import get_fs

        fs = get_fs(self.path)
        for msg in messages:
            if msg is None:
                continue
            for staged, _final in msg.files:
                try:
                    fs.remove(self._full(staged))
                except OSError:
                    pass
