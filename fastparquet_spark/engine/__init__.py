"""Distributed encode engine: Spark job orchestration.

Driver side: explicit repartitioning by (repo, lang) with salting for
skewed mega-repos, AQE on.  Executor side: ``mapInArrow`` batch
functions that run the codec kernels over Arrow RecordBatches — no
per-row Python anywhere (SURVEY.md §3.1 "Spark translation").
"""

from fastparquet_spark.engine.datagen import synthetic_source_table
from fastparquet_spark.engine.encode_job import (
    append_dataset,
    encode_dataset,
    verify_roundtrip,
)
from fastparquet_spark.engine.file_job import encode_files, plan_splits
from fastparquet_spark.engine.scan_job import paged_read

__all__ = ["synthetic_source_table", "encode_dataset", "append_dataset",
           "verify_roundtrip", "encode_files", "plan_splits", "paged_read"]
