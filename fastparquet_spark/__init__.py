"""fastparquet_spark — a PySpark-native per-column lightweight-compression engine.

Re-implements the encoding core of fastparquet (reference:
/root/reference, v0.7.1) from scratch as numpy-vectorized kernels that
run partition-parallel inside Spark via ``DataFrame.mapInArrow``:

- ``codecs``    — PLAIN, RLE/bit-packed hybrid, PLAIN_DICTIONARY,
                  DELTA_BINARY_PACKED, FSST-style symbol-table strings,
                  block compression, and stats-driven codec auto-selection.
- ``format``    — thrift-compact metadata + Parquet file writer/reader
                  (DataPage v1), readable by pyarrow / DuckDB / Spark.
- ``engine``    — the distributed encode job (repartition by (repo,lang),
                  skew salting, mapInArrow, lineage manifests, resume).
- ``analytics`` — training-data pipeline operators (dedup, similarity,
                  text quality, multimodal plumbing) on top of Spark SQL.

Nothing here is ported from the reference: semantics are reproduced from
its documented behavior (citations as ``path:line`` in docstrings); the
execution model is Spark's, not pandas'.
"""

__version__ = "0.1.0"


def __getattr__(name):
    # lazy: the compat facade (ParquetFile / write, the reference's
    # public entry points) without forcing its imports on engine users
    if name in ("ParquetFile", "ParquetException", "merge", "write"):
        from fastparquet_spark import api

        return getattr(api, name)
    raise AttributeError(name)
