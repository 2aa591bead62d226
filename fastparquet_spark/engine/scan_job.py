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

from collections.abc import Iterator

import pyarrow as pa


def paged_read(spark, in_dir: str, filters, columns=None,
               exact: bool = True, fs=None):
    """Spark DataFrame of the rows surviving ``filters`` (a DNF filter:
    a flat AND-list ``[(col, op, val), ...]`` or OR-of-ANDs
    ``[[...], [...]]`` — the reference's filter contract) under
    ``in_dir``, read through the three-tier pruning stack:

    1. driver: row-group stats + bloom pruning (``filter_row_groups``,
       concurrent footer/bloom fetches) -> surviving (file, row-group)
       units;
    2. executor: ColumnIndex page skipping inside each surviving group
       (``read_pages`` — ranged reads of surviving spans only);
    3. executor: residual row filter in Arrow compute (``exact=True``,
       the default) so the result is exact, not a page-granular
       superset.

    ``columns``: projection (predicate columns are decoded as needed
    and dropped from the result).
    """
    from pyspark.sql.pandas.types import from_arrow_schema
    from pyspark.sql.types import StringType, StructField, StructType

    from fastparquet_spark.format.dataset import (
        dataset_metadata, filter_row_groups,
    )
    from fastparquet_spark.format.reader import _arrow_type
    from fastparquet_spark.io import get_fs

    if filters and isinstance(filters[0], tuple):
        filters = [filters]

    fs = get_fs(in_dir, fs)
    metas = dataset_metadata(in_dir, fs=fs)
    if not metas:
        raise ValueError(f"no parquet files under {in_dir}")
    # driver-side tier: stats + concurrent bloom pruning
    survivors = filter_row_groups(in_dir, filters, fs=fs, metas=metas)
    by_file: dict[str, list[int]] = {}
    for f, ri in survivors:
        by_file.setdefault(f, []).append(ri)

    # result schema from the first footer (metadata-only)
    elems = {e["name"]: e for e in metas[0]["fmd"]["schema"][1:]
             if e.get("num_children") is None}
    names_all = [e["name"] for e in metas[0]["fmd"]["schema"][1:]
                 if e.get("num_children") is None]
    project = list(columns) if columns is not None else names_all
    arrow_schema = pa.schema([(n, _arrow_type(elems[n])) for n in project])
    out_schema = from_arrow_schema(arrow_schema)

    root = in_dir.rstrip("/")
    units = [(f"{root}/{f}", ",".join(map(str, sorted(ris))))
             for f, ris in sorted(by_file.items())]
    if not units:
        return spark.createDataFrame([], out_schema)

    # several files per task (read_fpsc's granularity rule): single-file
    # tasks at 100k files are pure scheduler overhead
    n_parts = max(1, min(len(units),
                         4 * spark.sparkContext.defaultParallelism))
    rdd = spark.sparkContext.parallelize(units, n_parts)
    paths_df = spark.createDataFrame(
        rdd, StructType([StructField("path", StringType()),
                         StructField("rgs", StringType())]))

    clauses_ = [list(c) for c in filters]
    project_ = list(project)
    exact_ = exact

    def scan(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        import pyarrow as pa_w

        from fastparquet_spark.format.dataset import read_pages

        pa_w.set_cpu_count(1)
        for b in batches:
            for path, rgs in zip(b.column("path").to_pylist(),
                                 b.column("rgs").to_pylist()):
                ris = {int(x) for x in rgs.split(",")} if rgs else None
                tbl = read_pages(path, clauses_, columns=project_,
                                 exact=exact_, row_groups=ris)
                yield from tbl.cast(arrow_schema_).to_batches()

    arrow_schema_ = arrow_schema
    return paths_df.mapInArrow(scan, out_schema)
