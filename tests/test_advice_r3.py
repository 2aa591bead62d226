"""Regression tests for the round-3 external review findings (ADVICE.md):

1. The native-kernel cache must be per-user and refuse to compile into /
   load from a directory we don't own or that others can write — loading
   a .so from a shared predictable path is arbitrary code execution.
2. ArrowFS.glob must match per path SEGMENT ('*' must not cross '/'),
   like LocalFS/glob.glob — otherwise lang=*/part-*.pq swallows files in
   deeper subdirectories.
3. encode_dataset tasks must publish data files only at task commit
   (attempt-suffixed stage names), and a retry must sweep stale files its
   partition id left behind — so failed/speculative attempts can never
   leave committed-looking duplicates.
"""

from __future__ import annotations

import os
import shutil

from fastparquet_spark.codecs import native
from fastparquet_spark.io import get_fs


def test_native_cache_is_per_user_and_private():
    cache = native._cache_dir()
    # never the shared world-writable default temp name from r3
    assert cache != "/tmp/fastparquet_spark_native"
    lib = native._load()
    if lib is not None:  # compiled: the dir must exist, be ours, mode 0700
        st = os.stat(cache)
        assert st.st_uid == native._uid()
        assert not (st.st_mode & 0o077)


def test_native_refuses_group_writable_cache(tmp_path, monkeypatch):
    bad = tmp_path / "shared"
    bad.mkdir()
    os.chmod(bad, 0o777)
    monkeypatch.setenv("FPS_NATIVE_CACHE", str(bad))
    monkeypatch.setattr(native, "_lib", None)
    monkeypatch.setattr(native, "_lib_tried", False)
    try:
        assert native._load() is None
        assert list(bad.iterdir()) == []  # nothing compiled into it either
    finally:
        native._lib = None
        native._lib_tried = False  # next caller re-resolves the good cache


def test_owned_and_private_checks():
    assert not native._owned_and_private("/definitely/not/a/path")
    assert not native._owned_and_private("/tmp")  # sticky world-writable


def test_arrowfs_glob_does_not_cross_segments(tmp_path):
    root = tmp_path / "ds"
    (root / "lang=en").mkdir(parents=True)
    (root / "lang=en" / "sub").mkdir()
    (root / "lang=zh").mkdir()
    (root / "lang=en" / "part-1.pq").write_bytes(b"x")
    (root / "lang=en" / "sub" / "part-2.pq").write_bytes(b"x")
    (root / "lang=zh" / "part-3.pq").write_bytes(b"x")
    uri = f"file://{root}"
    fs = get_fs(uri)
    got = fs.glob(f"{uri}/lang=*/part-*.pq")
    names = sorted(p.split(str(root) + "/", 1)[1] for p in got)
    assert names == ["lang=en/part-1.pq", "lang=zh/part-3.pq"]
    # local (non-URI) semantics agree
    lgot = get_fs(str(root)).glob(f"{root}/lang=*/part-*.pq")
    assert sorted(p.split(str(root) + "/", 1)[1] for p in lgot) == names


def test_read_fpsc_batches_small_files(spark, tmp_path):
    """100 tiny containers must NOT become 100 one-file tasks — the task
    count is bounded by 4x parallelism and every row still arrives."""
    import pyarrow as pa

    from fastparquet_spark.engine.fpsc_job import read_fpsc
    from fastparquet_spark.format.container import write_container

    for i in range(100):
        write_container(str(tmp_path / f"c{i:03d}.fpsc"),
                        pa.table({"x": pa.array([i * 10 + k for k in range(5)],
                                                pa.int64())}))
    df = read_fpsc(spark, str(tmp_path))
    cap = 4 * spark.sparkContext.defaultParallelism
    assert df.rdd.getNumPartitions() <= cap
    assert df.count() == 500
    assert df.agg({"x": "sum"}).collect()[0][0] == sum(
        i * 10 + k for i in range(100) for k in range(5))


def test_derive_n_bits_grows_with_corpus():
    from fastparquet_spark.analytics.similarity import derive_n_bits

    assert derive_n_bits(0) == 4 and derive_n_bits(500) == 4
    assert derive_n_bits(2_000) == 5          # sf0.1
    assert derive_n_bits(1_000_000) == 14
    assert derive_n_bits(10**9) == 16          # clamped at hi
    ns = [derive_n_bits(10**k) for k in range(2, 12)]
    assert ns == sorted(ns)                    # monotonic in N


def test_encode_publishes_only_at_commit_and_heals_stale_files(
        spark, tmp_path):
    from pyspark.sql import functions as F

    from fastparquet_spark.engine import encode_dataset

    df = (spark.range(2000)
          .withColumn("lang", (F.col("id") % 3).cast("string"))
          .withColumn("text", F.concat(F.lit("doc-"), F.col("id"))))
    out = str(tmp_path / "ds")
    encode_dataset(spark, df, out, partition_cols=("lang",), layout="hive",
                   num_partitions=4, sort_within=("id",),
                   resume=False).collect()
    # committed state: no stage leftovers anywhere
    all_files = [os.path.join(r, f) for r, _d, fs_ in os.walk(out) for f in fs_]
    assert not any(".stage-" in f for f in all_files)
    assert spark.read.parquet(out).count() == 2000

    # plant duplicates a dead attempt could have left: a -rN split of an
    # existing partition file, plus a stale stage file
    victim = next(f for f in all_files
                  if f.endswith(".parquet") and "/lang=" in f)
    stale_rn = victim.replace(".parquet", "-r7.parquet")
    shutil.copyfile(victim, stale_rn)
    stale_stage = victim + ".stage-12345"
    shutil.copyfile(victim, stale_stage)
    assert spark.read.parquet(out).count() > 2000  # duplicates visible

    # the retry (same deterministic partitioning) heals both
    encode_dataset(spark, df, out, partition_cols=("lang",), layout="hive",
                   num_partitions=4, sort_within=("id",),
                   resume=False).collect()
    assert not os.path.exists(stale_rn)
    assert not os.path.exists(stale_stage)
    assert spark.read.parquet(out).count() == 2000
