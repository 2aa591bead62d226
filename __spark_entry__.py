"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

Implementation lives in ``fastparquet_spark``:
- codec kernels + parquet format + auto-selection (SURVEY.md §2.1-2.2)
- distributed encode job with salting/manifests/resume (SURVEY.md §3.1)
- analytics operators (relational, dedup, text, similarity, multimodal)
"""

from __future__ import annotations

import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, "/root/repo")  # package resolution when run by the driver


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: encode the sf0.001 documents table with the full engine
    (salted repartition -> mapInArrow codec kernels -> parquet files +
    lineage manifests) and return the per-partition manifest."""
    import tempfile

    from fastparquet_spark.analytics.relational import load
    from fastparquet_spark.engine import encode_dataset

    docs = load(spark, "/root/testdata/sf0.001", "documents")
    out = tempfile.mkdtemp(prefix="fps_entry_")
    return encode_dataset(spark, docs, out, compression="ZSTD",
                          partition_cols=("lang",), num_partitions=4,
                          resume=False).select(
        "partition", "file", "rows", "input_bytes", "output_bytes", "columns")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from fastparquet_spark.analytics.registry import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from fastparquet_spark.analytics.registry import ORACLES

    return {k: v for k, v in ORACLES.items() if v is not None}
