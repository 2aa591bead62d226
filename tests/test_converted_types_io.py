"""Converted-type widening (TIME_MILLIS/MICROS, float16, JSON/BSON read)
and glob inputs — reference parity for converted_types.py:149-247 and
the ParquetFile(glob) open path (api.py:95-162)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from fastparquet_spark.format import read_file, write_file
from fastparquet_spark.format.dataset import dataset_metadata
from fastparquet_spark.engine.file_job import plan_splits


def test_time_and_float16_roundtrip(tmp_path):
    t = pa.table({
        "t32": pa.array([1_000, None, 86_399_999], type=pa.time32("ms")),
        "t64": pa.array([1_000_000, 2, None], type=pa.time64("us")),
        "f16": pa.array(np.array([1.5, -0.25, 65504], dtype=np.float16)),
    })
    path = str(tmp_path / "t.parquet")
    write_file(path, t)
    got = pq.read_table(path)
    assert got.column("t32").to_pylist() == t.column("t32").to_pylist()
    assert got.column("t64").to_pylist() == t.column("t64").to_pylist()
    # float16 upcasts to float32 exactly (every f16 is representable)
    assert got.column("f16").to_pylist() == \
        [float(np.float32(v)) for v in [1.5, -0.25, 65504]]
    own = read_file(path)
    assert own.column("t32").cast(pa.time32("ms")).to_pylist() == \
        t.column("t32").to_pylist()
    assert own.column("t64").cast(pa.time64("us")).to_pylist() == \
        t.column("t64").to_pylist()


def test_reads_pyarrow_time_json_columns(tmp_path):
    """Our reader decodes pyarrow-written TIME columns identically."""
    t = pa.table({
        "t32": pa.array([7, None, 9], type=pa.time32("ms")),
        "t64": pa.array([None, 5, 6], type=pa.time64("us")),
    })
    path = str(tmp_path / "pa.parquet")
    pq.write_table(t, path, use_dictionary=False)
    own = read_file(path)
    for c in t.column_names:
        assert own.column(c).cast(t.schema.field(c).type).to_pylist() == \
            t.column(c).to_pylist()


def test_glob_inputs(tmp_path):
    for i in range(3):
        write_file(str(tmp_path / f"x-{i}.parquet"),
                   pa.table({"a": pa.array(range(i * 10, i * 10 + 10))}))
    write_file(str(tmp_path / "other.parquet"),
               pa.table({"a": pa.array([99])}))
    metas = dataset_metadata(str(tmp_path / "x-*.parquet"))
    assert [m["file"] for m in metas] == [f"x-{i}.parquet" for i in range(3)]
    splits = plan_splits(str(tmp_path / "x-*.parquet"))
    assert sum(s["rows"] for s in splits) == 30


def test_arrowfs_multisegment_glob(tmp_path):
    """Wildcards in NON-final segments (s3://b/ds/lang=*/part-*.parquet)
    must match through the ArrowFS seam exactly like LocalFS/glob.glob."""
    from fastparquet_spark.io import get_fs

    for lang in ("py", "rs"):
        d = tmp_path / f"lang={lang}"
        d.mkdir()
        for i in range(2):
            write_file(str(d / f"part-{i}.parquet"),
                       pa.table({"a": pa.array([i])}))
    (tmp_path / "lang=py" / "ignore.txt").write_text("x")
    pattern = f"file://{tmp_path}/lang=*/part-*.parquet"
    fs = get_fs(pattern)
    got = fs.glob(pattern)
    assert len(got) == 4 and all(p.startswith("file://") for p in got)
    assert got == sorted(got)
    # final-segment-only globs still work (flat listing path)
    assert len(fs.glob(f"file://{tmp_path}/lang=py/part-*.parquet")) == 2
    # and dataset_metadata accepts the multi-segment URI glob end to end
    metas = dataset_metadata(pattern)
    assert len(metas) == 4


def test_file_uri_roundtrip_through_arrowfs(spark, tmp_path):
    """file:// URIs route through the pyarrow.fs seam (the same code path
    an s3:// or hdfs:// job would take) — write, resume, and metadata all
    work without a local-path assumption."""
    from fastparquet_spark.engine import encode_dataset
    from fastparquet_spark.io import ArrowFS, get_fs

    uri = f"file://{tmp_path}/ds"
    assert isinstance(get_fs(uri), ArrowFS)
    df = spark.createDataFrame(
        [(f"r{i % 3}", f"p{i}", "c", "python", f"body {i}") for i in range(500)],
        "repo string, path string, commit string, lang string, content string")
    man = encode_dataset(spark, df, uri, num_partitions=2,
                         salt_rows=10**9).collect()
    assert sum(m.rows for m in man) == 500
    man2 = encode_dataset(spark, df, uri, num_partitions=2,
                          salt_rows=10**9).collect()
    assert all(m.skipped for m in man2)
    metas = dataset_metadata(uri)
    assert sum(m["fmd"]["num_rows"] for m in metas) == 500
    assert spark.read.parquet(f"{tmp_path}/ds").count() == 500
