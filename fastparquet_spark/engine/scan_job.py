"""Distributed page/bloom-pruned scan — the read-side twin of the
file-split encode job.

``format.dataset.read_pages`` is a SINGLE-PROCESS page-skipping reader
(the reference's posture: fastparquet/api.py:440-453 filters row groups
and decodes in one process).  Our engine's premise is "move the plan":
here the DRIVER does metadata-only planning — concurrent footer
fetches, min/max/null stats pruning, concurrent split-block-bloom
probes for ==/in terms — and hands each EXECUTOR only its surviving
(file, row-group) units.  Executors then apply the next pruning tier
locally (ColumnIndex page skipping, ranged reads of surviving spans
only) and the residual row predicate, so bytes moved are footer + index
+ dictionary pages + surviving pages, never whole files.

At 100 TB this is the scan shape that matters: pruning decisions are
O(metadata) on the driver (thread-pooled, no data reads), decode
parallelism is O(executors), and each task's IO is proportional to its
surviving pages.
"""

from __future__ import annotations

import json
from collections.abc import Iterator

import pyarrow as pa


def _eval_partition_term(v, op, val) -> bool:
    """Evaluate one predicate term against a file's constant partition
    value (full OPS set; exact, since the value is a scalar).

    When the partition COLUMN resolved to string (mixed spellings like
    k=3 beside k=abc) the stored value is a str while the filter value
    may be numeric — equality-class ops compare stringified (matching
    the column's resolved type); ordering ops against an incomparable
    type raise loudly instead of silently dropping the file."""
    if op == "is_null":
        return v is None
    if op == "is_not_null":
        return v is not None
    if v is None:
        return False
    if isinstance(v, str) and not isinstance(val, str):
        if op in ("==", "=", "!="):
            val = str(val)
        elif op in ("in", "not in"):
            val = [x if isinstance(x, str) else str(x) for x in val]
        elif isinstance(val, (int, float)):
            raise ValueError(
                f"cannot order-compare numeric filter value {val!r} "
                f"against string-typed partition value {v!r} — the "
                f"column resolved to string (mixed value spellings); "
                f"pass a string bound")
    if op in ("==", "="):
        return v == val
    if op == "!=":
        return v != val
    if op == "<":
        return v < val
    if op == "<=":
        return v <= val
    if op == ">":
        return v > val
    if op == ">=":
        return v >= val
    if op == "in":
        return v in val
    if op == "not in":
        return v not in val
    raise ValueError(f"unsupported filter op {op!r}")


def _file_clauses(clauses, pvals: dict):
    """Per-file DNF rewrite: partition terms are decided HERE against
    the file's constant values — a clause whose partition term fails is
    dropped for this file, a passing term is stripped (already true for
    every row).  Returns the residual clauses; an empty residual clause
    means 'every row of this file matches that branch'."""
    out = []
    for clause in clauses:
        keep, resid = True, []
        for col, op, val in clause:
            if col in pvals:
                if not _eval_partition_term(pvals[col], op, val):
                    keep = False
                    break
            else:
                # file column or unknown — the reader keeps rows for
                # columns it cannot find (conservative)
                resid.append((col, op, val))
        if keep:
            out.append(resid)
    return out


def _logical_sig(lt):
    """Deterministic comparable form of a (nested-dict) LogicalType."""
    return json.dumps(lt, sort_keys=True, default=str) if lt else None


def _elem_sig(e):
    """Conflict signature of a schema element: the EFFECTIVE decoded
    type, not the raw footer fields.  Writer generations stamp the
    same column differently — an old file may carry only
    converted_type=UTF8 where a parquet-mr 1.11+/pyarrow file adds
    logicalType={'STRING':{}} — and both decode identically; comparing
    raw fields would reject that canonical evolution mix at plan time.
    Each scan unit decodes with its OWN footer and casts to the union
    schema, so two elements conflict exactly when their Arrow types
    differ (scale/precision/timestamp unit/integer width are all part
    of the Arrow type).  Group nodes have no Arrow type; they compare
    on child count + normalized LIST/MAP annotation."""
    from fastparquet_spark.format.metadata import ConvertedType
    from fastparquet_spark.format.reader import _arrow_type

    nc = e.get("num_children")
    if nc:
        lt = e.get("logicalType") or {}
        conv = e.get("converted_type")
        if "LIST" in lt or conv == ConvertedType.LIST:
            ann = "LIST"
        elif "MAP" in lt or conv in (ConvertedType.MAP,
                                     ConvertedType.MAP_KEY_VALUE):
            ann = "MAP"
        else:
            ann = None
        return ("group", nc, ann)
    try:
        return ("leaf", str(_arrow_type(e)))
    except Exception:  # unknown physical/logical combo: raw fallback
        return ("leaf?", e.get("type"), e.get("converted_type"),
                e.get("type_length"), e.get("scale"), e.get("precision"),
                _logical_sig(e.get("logicalType")))


def union_leaf_elems(metas):
    """Union of the per-file TOP-LEVEL schemas, first-seen order — the
    schema-evolution contract for scans (r5 VERDICT missing #1): a
    column added mid-life appears in the union and is read as typed
    nulls from the files that predate it.  Files must agree on the
    physical/converted type of every element they share; a conflict is
    an error, not a coercion (the reference's merge assumes outright
    equality — fastparquet/util.py:115-213 — so this is strictly more
    tolerant).

    Elements are keyed by their DOTTED PATH, so two LIST columns whose
    subtrees both contain an element named 'element' cannot
    false-conflict; ``names`` lists top-level columns only (flat
    leaves AND nested roots — scanners that are flat-only filter on
    ``elems[n].get('num_children') is None``).  Returns
    (names_in_order, {path_or_name: schema_element},
    {file: set(top_level_names)})."""
    elems: dict[str, dict] = {}
    order: list[str] = []
    present: dict[str, set] = {}
    for m in metas:
        mine = set()
        sch = m["fmd"]["schema"]
        stack: list[list] = [[sch[0].get("num_children") or 0, []]]
        for e in sch[1:]:
            while stack and stack[-1][0] == 0:
                stack.pop()
            if not stack:
                break
            stack[-1][0] -= 1
            path = stack[-1][1] + [e["name"]]
            if e.get("num_children"):
                stack.append([e["num_children"], path])
            key = ".".join(path)
            if len(path) == 1:
                mine.add(e["name"])
            # compare EFFECTIVE types (decimal scale/precision,
            # timestamp unit, integer width all participate via the
            # Arrow type) so a real divergence fails at PLAN time with
            # the evolution message, not mid-scan in an executor Arrow
            # cast — while writer-generation stamping differences
            # (converted_type-only vs +logicalType) stay compatible
            sig = _elem_sig(e)
            if key not in elems:
                elems[key] = e
                if len(path) == 1:
                    order.append(e["name"])
            else:
                psig = _elem_sig(elems[key])
                if psig != sig:
                    raise ValueError(
                        f"schema evolution type conflict on column "
                        f"{key!r}: {m['file']} has {sig}, earlier "
                        f"files have {psig}")
        present[m["file"]] = mine
    return order, elems, present


def _absent_clauses(clauses, absent):
    """Rewrite a DNF for a file LACKING the ``absent`` columns (schema
    evolution: an absent column reads as all-null).  SQL three-valued
    logic on null: ``is_null`` terms are always true (stripped); every
    other term — including ``!=`` and ``not in`` — evaluates unknown
    -> false, dropping that AND-branch for this file."""
    out = []
    for clause in clauses:
        keep, resid = True, []
        for col, op, val in clause:
            if col in absent:
                if op == "is_null":
                    continue
                keep = False
                break
            resid.append((col, op, val))
        if keep:
            out.append(resid)
    return out


def build_scan_units(by_file, metas, file_cols, names_all, present,
                     ptypes):
    """One (file, row_groups, pvals, absent, fallback) tuple per
    surviving file — shared by paged_read and the fps data source.

    Partition values are coerced HERE to the column's RESOLVED type: a
    string-typed column (mixed spellings, k=3 beside k=abc) stringifies
    int-spelled values, so executor-side partition-term decisions and
    the attached constants agree with the result schema.  ``absent``
    lists projected columns this file predates (schema evolution);
    ``fallback`` names a present column to carry row cardinality when
    every projected column is absent."""
    pmap = {}
    for m in metas:
        pv = dict(m.get("partitions") or {})
        for k, v in pv.items():
            t = ptypes.get(k)
            if t is not None and pa.types.is_string(t) \
                    and v is not None and not isinstance(v, str):
                pv[k] = str(v)
        pmap[m["file"]] = pv
    units = []
    for f, ris in sorted(by_file.items()):
        absent = [c for c in file_cols if c not in present[f]]
        fallback = ""
        if file_cols and len(absent) == len(file_cols):
            mine = [c for c in names_all if c in present[f]]
            if mine:
                fallback = mine[0]
        units.append((f, sorted(ris), pmap[f], absent, fallback))
    return units


def _unit_plan(pvals, absent, fallback, clauses, file_cols, drop_cols):
    """Shared head of the unit scanners: per-file DNF rewrite
    (partition substitution + absent-column 3VL) and the projection for
    THIS file.  Returns (fclauses, cols_here, drop_here) or None when
    no DNF branch can match the file."""
    fclauses = _file_clauses(clauses, pvals)
    if absent and fclauses:
        # schema evolution: terms on columns this file predates
        # evaluate as all-null
        fclauses = _absent_clauses(fclauses, set(absent))
    if not fclauses:
        return None
    cols_here = [c for c in file_cols if c not in absent]
    drop_here = [c for c in drop_cols if c not in absent]
    if not cols_here and fallback:
        cols_here, drop_here = [fallback], [fallback]
    return fclauses, cols_here, drop_here


def _finish_unit(tbl, drop_here, file_cols, absent, drop_cols,
                 part_cols, pvals, arrow_schema):
    """Shared tail of the unit scanners: projection drop, typed-null
    fill for evolution columns, partition constants, schema-order cast.
    Works per-Table OR per-batch (wrapped as a Table, zero-copy)."""
    if drop_here:
        tbl = tbl.drop_columns(drop_here)
    for c in file_cols:
        if c in absent and c not in drop_cols:
            tbl = tbl.append_column(
                c, pa.nulls(tbl.num_rows, arrow_schema.field(c).type))
    for name in part_cols:
        ptype = arrow_schema.field(name).type
        pval = pvals.get(name)
        if pa.types.is_string(ptype) and pval is not None:
            pval = str(pval)  # belt: units built by build_scan_units
        # O(1) repeated scalar, not an O(rows) Python list — this runs
        # once per 131k-row batch per partition column on executors
        tbl = tbl.append_column(
            name, pa.repeat(pa.scalar(pval, type=ptype), tbl.num_rows))
    # evolution columns were appended out of order; restore schema order
    return tbl.select(arrow_schema.names).cast(arrow_schema)


def scan_unit(path, ris, pvals, absent, fallback, clauses, file_cols,
              drop_cols, part_cols, arrow_schema, exact):
    """Executor-side scan of ONE (file, row-groups) unit — the shared
    body of paged_read's mapInArrow fn and FpsReader.read, so the
    per-file clause/evolution/partition logic cannot drift between the
    two consumers.  Returns a Table cast to ``arrow_schema``, or None
    when no DNF branch can match this file."""
    from fastparquet_spark.format.dataset import read_pages

    plan = _unit_plan(pvals, absent, fallback, clauses, file_cols,
                      drop_cols)
    if plan is None:
        return None
    fclauses, cols_here, drop_here = plan
    if any(not cl for cl in fclauses):
        # match-all DNF for this file (no filter survived partition
        # substitution): ColumnIndex page skipping has nothing to skip,
        # so the pure-Python page reader only adds decode tax — read
        # the surviving row groups through pyarrow's C++ parquet reader
        # instead (~2.7x on full scans, BENCH.md r6 scan probe).  The
        # selective path below is unchanged and byte-proof-tested.
        import pyarrow.parquet as pq

        from fastparquet_spark.io import _is_uri, get_fs

        # close the remote handle after the read — long scan jobs leak
        # connections/fds otherwise (they only died at GC)
        if _is_uri(path):
            with get_fs(path).open_read(path) as src:
                tbl = pq.ParquetFile(src).read_row_groups(
                    sorted(ris), columns=cols_here, use_threads=False)
        else:
            tbl = pq.ParquetFile(path).read_row_groups(
                sorted(ris), columns=cols_here, use_threads=False)
    else:
        tbl = read_pages(path, fclauses, columns=cols_here, exact=exact,
                         row_groups=set(ris))
    return _finish_unit(tbl, drop_here, file_cols, absent, drop_cols,
                        part_cols, pvals, arrow_schema)


def scan_unit_batches(path, ris, pvals, absent, fallback, clauses,
                      file_cols, drop_cols, part_cols, arrow_schema,
                      exact, batch_rows=131_072):
    """Streaming variant of ``scan_unit`` — yields RecordBatches.

    Match-all units stream through ``pyarrow.parquet.iter_batches`` so
    C++ decode OVERLAPS the Arrow-IPC write back to the JVM (the
    consumer yields each batch before the next is decoded) instead of
    materializing the whole unit table first; peak memory is one batch,
    not one file.  Selective units delegate to ``scan_unit`` (the
    byte-proof page-skipping path needs whole-chunk assembly anyway)."""
    plan = _unit_plan(pvals, absent, fallback, clauses, file_cols,
                      drop_cols)
    if plan is None:
        return
    fclauses, cols_here, drop_here = plan
    if any(not cl for cl in fclauses):
        import pyarrow.parquet as pq

        from fastparquet_spark.io import _is_uri, get_fs

        # local paths go to pyarrow as plain paths (OS-level reads);
        # URIs (s3/gs/hdfs) open through the io layer's pyarrow.fs
        # NativeFile — pq.ParquetFile itself does no URI inference
        src = get_fs(path).open_read(path) if _is_uri(path) else path
        try:
            for b in pq.ParquetFile(src).iter_batches(
                    batch_size=batch_rows, row_groups=sorted(ris),
                    columns=cols_here, use_threads=False):
                yield from _finish_unit(
                    pa.Table.from_batches([b]), drop_here, file_cols,
                    absent, drop_cols, part_cols, pvals,
                    arrow_schema).to_batches(max_chunksize=batch_rows)
        finally:
            # close the remote handle even on partial consumption —
            # long scan jobs leak connections/fds otherwise
            if src is not path:
                src.close()
    else:
        tbl = scan_unit(path, ris, pvals, absent, fallback, clauses,
                        file_cols, drop_cols, part_cols, arrow_schema,
                        exact)
        if tbl is not None:
            yield from tbl.to_batches(max_chunksize=65_536)


def _partition_arrow_type(values):
    """Arrow type for a hive partition column from its observed values
    (the same val_to_num posture as drill typing)."""
    vals = [v for v in values if v is not None]
    if vals and all(isinstance(v, bool) for v in vals):
        return pa.bool_()
    if vals and all(type(v) is int for v in vals):
        return pa.int64()
    if vals and all(isinstance(v, (int, float))
                    and not isinstance(v, bool) for v in vals):
        return pa.float64()
    return pa.string()


def paged_read(spark, in_dir: str, filters, columns=None,
               exact: bool = True, fs=None):
    """Spark DataFrame of the rows surviving ``filters`` (a DNF filter:
    a flat AND-list ``[(col, op, val), ...]`` or OR-of-ANDs
    ``[[...], [...]]`` — the reference's filter contract) under
    ``in_dir``, read through the three-tier pruning stack:

    1. driver: row-group stats + bloom pruning (``filter_row_groups``,
       concurrent footer/bloom fetches; hive partition values prune as
       pseudo-stats) -> surviving (file, row-group) units;
    2. executor: ColumnIndex page skipping inside each surviving group
       (``read_pages`` — ranged reads of surviving spans only);
    3. executor: residual row filter in Arrow compute (``exact=True``,
       the default) so the result is exact, not a page-granular
       superset.

    Hive ``key=value`` datasets work end to end: partition predicates
    prune whole files on the driver, and partition columns are attached
    to the output as constants per file (last, Spark's convention).

    ``columns``: projection (predicate columns are decoded as needed
    and dropped from the result; may include partition columns).
    """
    from pyspark.sql.pandas.types import from_arrow_schema
    from pyspark.sql.types import StringType, StructField, StructType

    from fastparquet_spark.format.dataset import (
        filter_row_groups, load_dataset_metas,
    )
    from fastparquet_spark.format.reader import _arrow_type
    from fastparquet_spark.io import get_fs

    if filters and isinstance(filters[0], tuple):
        filters = [filters]

    fs = get_fs(in_dir, fs)
    in_dir, metas = load_dataset_metas(in_dir, fs=fs)
    # driver-side tier: stats + concurrent bloom pruning (partition
    # values participate as pseudo-stats, so a partition predicate
    # prunes whole files here).  An empty filter list means SCAN ALL
    # (filter_row_groups would read [] as an empty DNF -> no rows).
    if not filters:
        filters = [[]]
        survivors = [(m["file"], ri) for m in metas
                     for ri in range(len(m["fmd"]["row_groups"]))]
    else:
        survivors = filter_row_groups(in_dir, filters, fs=fs, metas=metas)
    by_file: dict[str, list[int]] = {}
    for f, ri in survivors:
        by_file.setdefault(f, []).append(ri)
    parts_by_file = {m["file"]: (m.get("partitions") or {}) for m in metas}

    # result schema = UNION of the per-file leaf schemas (metadata-
    # only; schema-evolution-tolerant — typed-null fill for files
    # predating a column); partition columns appended last, typed from
    # observed values.  FLAT leaves only: the page reader cannot
    # decode nested subtrees (documented contract; use
    # spark.read.parquet for nested datasets)
    names_all, elems, present = union_leaf_elems(metas)
    names_all = [n for n in names_all
                 if elems[n].get("num_children") is None]
    pnames = [k for k in (metas[0].get("partitions") or {})]
    ptypes = {k: _partition_arrow_type(
        [parts_by_file[m["file"]].get(k) for m in metas]) for k in pnames}
    if columns is not None:
        file_cols = [c for c in columns if c in names_all]
        part_cols = [c for c in columns if c in pnames]
        if not file_cols and names_all:
            # a partition-only projection still needs per-row
            # cardinality: decode ONE (narrow) file column to carry the
            # row count, dropped before the constants are attached
            file_cols = [names_all[0]]
            drop_cols = [names_all[0]]
        else:
            drop_cols = []
    else:
        file_cols, part_cols = list(names_all), list(pnames)
        drop_cols = []
    arrow_schema = pa.schema(
        [(n, _arrow_type(elems[n])) for n in file_cols
         if n not in drop_cols]
        + [(n, ptypes[n]) for n in part_cols])
    out_schema = from_arrow_schema(arrow_schema)

    root = in_dir.rstrip("/")
    units = [(f"{root}/{f}", ",".join(map(str, ris)), json.dumps(pvals),
              json.dumps(absent), fallback)
             for f, ris, pvals, absent, fallback in build_scan_units(
                 by_file, metas, file_cols, names_all, present, ptypes)]
    if not units:
        return spark.createDataFrame([], out_schema)

    # several files per task (read_fpsc's granularity rule): single-file
    # tasks at 100k files are pure scheduler overhead
    n_parts = max(1, min(len(units),
                         4 * spark.sparkContext.defaultParallelism))
    rdd = spark.sparkContext.parallelize(units, n_parts)
    paths_df = spark.createDataFrame(
        rdd, StructType([StructField("path", StringType()),
                         StructField("rgs", StringType()),
                         StructField("parts", StringType()),
                         StructField("absent", StringType()),
                         StructField("fallback", StringType())]))

    clauses_ = [list(c) for c in filters]
    file_cols_ = list(file_cols)
    drop_cols_ = list(drop_cols)
    part_cols_ = list(part_cols)
    exact_ = exact
    arrow_schema_ = arrow_schema

    def scan(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        import pyarrow as pa_w

        pa_w.set_cpu_count(1)
        for b in batches:
            for path, rgs, pjson, absjson, fallback in zip(
                    b.column("path").to_pylist(),
                    b.column("rgs").to_pylist(),
                    b.column("parts").to_pylist(),
                    b.column("absent").to_pylist(),
                    b.column("fallback").to_pylist()):
                ris = [int(x) for x in rgs.split(",")] if rgs else []
                yield from scan_unit_batches(
                    path, ris, json.loads(pjson), json.loads(absjson),
                    fallback, clauses_, file_cols_, drop_cols_,
                    part_cols_, arrow_schema_, exact_)

    return paths_df.mapInArrow(scan, out_schema)
