"""Distributed encode job tests: end-to-end encode -> verify -> resume."""

from __future__ import annotations

import json
import os

import pyarrow.parquet as pq
import pytest

from fastparquet_spark.engine import (
    encode_dataset,
    synthetic_source_table,
    verify_roundtrip,
)
from fastparquet_spark.engine.datagen import synthetic_arrow_table


def test_datagen_deterministic():
    a = synthetic_arrow_table(500, seed=42)
    b = synthetic_arrow_table(500, seed=42)
    assert a.equals(b)
    c = synthetic_arrow_table(500, seed=7)
    assert not a.equals(c)
    # zipf skew: top repo should dominate
    import collections
    counts = collections.Counter(a.column("repo").to_pylist())
    top = counts.most_common(1)[0][1]
    assert top > 500 / 20  # far above uniform share for 200 repos


def test_encode_dataset_end_to_end(spark, tmp_path):
    out = str(tmp_path / "enc")
    src = synthetic_source_table(spark, 4000, partitions=4).cache()
    manifest = encode_dataset(spark, src, out, compression="SNAPPY",
                              num_partitions=6).collect()
    assert sum(r["rows"] for r in manifest) == 4000
    assert all(not r["skipped"] for r in manifest)
    files = [f for f in os.listdir(out) if f.endswith(".parquet")]
    assert files and all(f.startswith("part-") for f in files)
    # spark can read the dataset back
    back = spark.read.parquet(f"{out}/part-*.parquet")
    assert back.count() == 4000
    assert set(back.columns) == {"repo", "path", "commit", "lang", "content"}
    # per-row sha256 invariant
    res = verify_roundtrip(spark, src, out)
    assert res == {"src_rows": 4000, "out_rows": 4000, "mismatches": 0}
    # manifests carry codec lineage
    m0 = json.loads(manifest[0]["columns"])
    assert set(m0) == {"repo", "path", "commit", "lang", "content"}
    src.unpersist()


def test_encode_dataset_resume(spark, tmp_path):
    out = str(tmp_path / "enc")
    src = synthetic_source_table(spark, 2000, partitions=2).cache()
    m1 = encode_dataset(spark, src, out, num_partitions=4).collect()
    assert all(not r["skipped"] for r in m1)
    # delete one manifest -> only that partition re-encodes
    written = sorted(r["partition"] for r in m1 if r["rows"] > 0)
    victim = written[0]
    os.remove(os.path.join(out, "_manifests", f"part-{victim:05d}.json"))
    m2 = encode_dataset(spark, src, out, num_partitions=4).collect()
    by_pid = {r["partition"]: r for r in m2}
    assert not by_pid[victim]["skipped"]
    for pid in written[1:]:
        assert by_pid[pid]["skipped"]
    res = verify_roundtrip(spark, src, out)
    assert res["mismatches"] == 0
    src.unpersist()


def test_encoded_files_are_smaller_than_spark_writer(spark, tmp_path):
    """Compression-ratio guard: our auto-encoded output should not exceed
    Spark's own snappy parquet output for the same data."""
    out = str(tmp_path / "enc")
    ref = str(tmp_path / "ref")
    src = synthetic_source_table(spark, 5000, partitions=2).cache()
    encode_dataset(spark, src, out, compression="ZSTD", num_partitions=2).collect()
    src.coalesce(2).write.parquet(ref, compression="zstd")
    ours = sum(os.path.getsize(os.path.join(out, f))
               for f in os.listdir(out) if f.endswith(".parquet"))
    theirs = sum(os.path.getsize(os.path.join(ref, f))
                 for f in os.listdir(ref) if f.endswith(".parquet"))
    assert ours <= theirs * 1.1, (ours, theirs)
    src.unpersist()


def test_salting_splits_mega_key(spark, tmp_path):
    """Skew handling: one mega-repo must spread across multiple tasks
    (count-derived salt width), not hot-spot a single partition."""
    from pyspark.sql import functions as F
    out = str(tmp_path / "skew")
    # 5000 rows, ~4800 in ONE repo
    src = (synthetic_source_table(spark, 5000, partitions=4)
           .withColumn("repo", F.when(F.rand(seed=1) < 0.96, "org/mega")
                       .otherwise(F.col("repo")))).cache()
    mega_rows = src.filter(F.col("repo") == "org/mega").count()
    assert mega_rows > 4000
    encode_dataset(spark, src, out, compression="SNAPPY",
                   num_partitions=8, salt_rows=1000, resume=False).collect()
    back = spark.read.parquet(f"{out}/part-*.parquet")
    files_with_mega = (back.filter(F.col("repo") == "org/mega")
                       .select(F.input_file_name().alias("f")).distinct().count())
    assert files_with_mega >= 3  # ceil(4800/1000)=5 buckets, hashed into >=3 files
    res = verify_roundtrip(spark, src, out)
    assert res["mismatches"] == 0
    src.unpersist()
