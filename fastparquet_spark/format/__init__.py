"""Parquet file format layer: thrift-compact metadata + page/file writer/reader.

The writer emits DataPage-v1 files (the reference's default,
fastparquet/writer.py:411,540-563) accepted by pyarrow, DuckDB and
Spark — those three independent readers are our interop oracle (the
reference library itself cannot be imported in this sandbox: its Cython
kernels are unbuilt source).
"""

from fastparquet_spark.format.writer import write_file, ColumnResult, FileResult
from fastparquet_spark.format.reader import (
    head,
    iter_row_groups,
    read_file,
    read_footer,
    read_row_groups,
)

__all__ = ["write_file", "read_file", "read_footer", "iter_row_groups",
           "read_row_groups", "head",
           "ColumnResult", "FileResult"]
