"""Schema-evolution-tolerant scans (r5 VERDICT missing #1): a dataset
whose later files carry a column the earlier files predate must read
as the UNION schema with typed-null fill — through paged_read AND the
'fps' data source — with SQL three-valued semantics for predicates on
the evolved column.  Type conflicts across files are an error, not a
coercion (stricter than silent garbage, looser than the reference's
assumed equality, fastparquet/util.py:115-213)."""

from __future__ import annotations

import pyarrow as pa
import pytest

from fastparquet_spark.format.writer import write_file


def _evolved_dataset(tmp_path):
    d = tmp_path / "evo"
    d.mkdir()
    # generation 0: (k, s)
    write_file(str(d / "part-00.parquet"),
               pa.table({"k": pa.array(range(0, 1000)),
                         "s": pa.array([f"s{i % 7}" for i in range(1000)])}),
               row_group_rows=500)
    # generation 1 adds a nullable double column
    write_file(str(d / "part-01.parquet"),
               pa.table({"k": pa.array(range(1000, 2000)),
                         "s": pa.array([f"s{i % 7}" for i in range(1000)]),
                         "extra": pa.array([float(i) for i in range(1000)])}),
               row_group_rows=500)
    return str(d)


def test_paged_read_union_schema_null_fill(spark, tmp_path):
    from fastparquet_spark.engine import paged_read

    path = _evolved_dataset(tmp_path)
    df = paged_read(spark, path, filters=None)
    assert df.columns == ["k", "s", "extra"]
    assert df.count() == 2000
    # old files' rows carry typed nulls
    assert df.filter("extra IS NULL").count() == 1000
    assert df.filter("extra IS NOT NULL").count() == 1000
    assert dict(df.schema["extra"].jsonValue(),)["type"] == "double"


def test_paged_read_predicates_on_evolved_column(spark, tmp_path):
    from fastparquet_spark.engine import paged_read

    path = _evolved_dataset(tmp_path)
    # comparison on the evolved column: old files contribute nothing
    got = paged_read(spark, path, [("extra", ">=", 990.0)])
    rows = sorted(r["k"] for r in got.collect())
    assert rows == list(range(1990, 2000))
    # is_null selects exactly the pre-evolution rows
    nulls = paged_read(spark, path, [("extra", "is_null", None)])
    assert sorted(r["k"] for r in nulls.collect()) == list(range(1000))
    # DNF branch mixing evolved + original columns
    dnf = [[("extra", "<", 5.0)], [("k", "<", 3)]]
    got2 = sorted(r["k"] for r in paged_read(spark, path, dnf).collect())
    assert got2 == [0, 1, 2, 1000, 1001, 1002, 1003, 1004]


def test_paged_read_projection_of_only_evolved_column(spark, tmp_path):
    from fastparquet_spark.engine import paged_read

    path = _evolved_dataset(tmp_path)
    df = paged_read(spark, path, filters=None, columns=["extra"])
    assert df.columns == ["extra"]
    assert df.count() == 2000  # old files still carry cardinality
    assert df.filter("extra IS NULL").count() == 1000


def test_fps_source_schema_evolution(spark, tmp_path):
    from fastparquet_spark.sources import FpsDataSource

    spark.dataSource.register(FpsDataSource)
    path = _evolved_dataset(tmp_path)
    df = spark.read.format("fps").load(path)
    assert df.columns == ["k", "s", "extra"]
    assert df.count() == 2000
    assert df.filter("extra IS NULL").count() == 1000
    got = df.filter("extra >= 990.0")
    assert sorted(r["k"] for r in got.collect()) == list(range(1990, 2000))


def test_type_conflict_raises(spark, tmp_path):
    from fastparquet_spark.engine import paged_read

    d = tmp_path / "conflict"
    d.mkdir()
    write_file(str(d / "a.parquet"),
               pa.table({"k": pa.array(range(10), pa.int64())}))
    write_file(str(d / "b.parquet"),
               pa.table({"k": pa.array(["x", "y"])}))
    with pytest.raises(ValueError, match="type conflict"):
        paged_read(spark, str(d), filters=None)


def test_facade_schema_evolution(tmp_path):
    """ParquetFile over an evolved dataset: union columns/dtypes,
    typed-null fill in to_pandas, three-valued filter semantics, and
    iter_row_groups projection of the evolved column."""
    import numpy as np

    from fastparquet_spark.api import ParquetFile

    path = _evolved_dataset(tmp_path)
    pf = ParquetFile(path)
    assert pf.columns == ["k", "s", "extra"]
    assert pf.dtypes["extra"] == np.dtype("float64")
    df = pf.to_pandas()
    assert len(df) == 2000
    assert df["extra"].isna().sum() == 1000
    # filter on the evolved column through the facade
    hit = pf.to_pandas(filters=[("extra", ">=", 990.0)], row_filter=True)
    assert sorted(hit["k"]) == list(range(1990, 2000))
    # projection of ONLY the evolved column still carries cardinality
    only = pf.to_pandas(columns=["extra"])
    assert len(only) == 2000 and only["extra"].isna().sum() == 1000
    # iter_row_groups with an explicit evolved projection
    frames = list(pf.iter_row_groups(columns=["k", "extra"]))
    assert sum(len(f) for f in frames) == 2000
    assert all(list(f.columns) == ["k", "extra"] for f in frames)


def test_facade_iter_row_groups_and_head_cardinality(tmp_path):
    """(r6 review) iter_row_groups/head must not lose rows when the
    projection names only columns a file predates: footer counts carry
    the cardinality, values are typed nulls."""
    from fastparquet_spark.api import ParquetFile

    path = _evolved_dataset(tmp_path)
    pf = ParquetFile(path)
    frames = list(pf.iter_row_groups(columns=["extra"]))
    assert sum(len(f) for f in frames) == 2000
    assert frames[0]["extra"].isna().all()  # old file: all nulls
    # head over the evolved projection returns the DATASET's first rows
    h = pf.head(5, columns=["extra"])
    assert len(h) == 5 and h["extra"].isna().all()
    # head with full projection still exact
    h2 = pf.head(3)
    assert list(h2["k"]) == [0, 1, 2]


def test_fps_overwrite_clears_hive_subdirs(spark, tmp_path):
    """(r6 review) mode('overwrite') must remove parquet files in
    key=value SUBDIRECTORIES too, or the sidecar re-merge sweeps the
    old hive rows back into the dataset."""
    from fastparquet_spark.engine import encode_dataset, synthetic_source_table
    from fastparquet_spark.sources import FpsDataSource

    spark.dataSource.register(FpsDataSource)
    out = str(tmp_path / "ow")
    df = synthetic_source_table(spark, 900, partitions=2)
    encode_dataset(spark, df, out, compression="SNAPPY",
                   partition_cols=("lang",), layout="hive",
                   num_partitions=2, resume=False).collect()
    assert spark.read.parquet(out).count() == 900
    small = spark.createDataFrame([(1, "x")], "id long, s string")
    small.write.format("fps").mode("overwrite").save(out)
    back = spark.read.format("fps").load(out)
    assert back.count() == 1  # old hive rows gone
    import glob as _g

    assert not _g.glob(f"{out}/lang=*/part-*.parquet")


def test_fps_writer_streams_row_groups(spark, tmp_path):
    """The fps writer splits a task's stream into row groups of
    row_group_rows (memory bounded by one group, not the partition)."""
    import pyarrow.parquet as pq

    from fastparquet_spark.sources import FpsDataSource

    spark.dataSource.register(FpsDataSource)
    out = str(tmp_path / "rg")
    df = spark.range(10_000).selectExpr("id", "id * 2 AS v").coalesce(1)
    (df.write.format("fps").option("row_group_rows", "2000")
       .mode("append").save(out))
    import glob as _g

    files = _g.glob(f"{out}/part-*.parquet")
    assert len(files) == 1
    md = pq.read_metadata(files[0])
    assert md.num_rows == 10_000 and md.num_row_groups >= 5


def test_union_tolerates_writer_generation_stamping(tmp_path):
    """The conflict signature compares EFFECTIVE types: an old file
    stamping only converted_type=UTF8 and a parquet-mr 1.11+/pyarrow
    file adding logicalType={'STRING':{}} decode identically and must
    NOT be a plan-time 'schema evolution type conflict' (r7 review).
    A REAL divergence (decimal scale) must still raise."""
    from fastparquet_spark.engine.scan_job import union_leaf_elems
    from fastparquet_spark.format.metadata import ConvertedType, Type

    def meta(file, elem):
        root = {"name": "schema", "num_children": 1}
        return {"file": file, "fmd": {"schema": [root, elem]}}

    old = {"name": "s", "type": Type.BYTE_ARRAY,
           "converted_type": ConvertedType.UTF8}
    new = {"name": "s", "type": Type.BYTE_ARRAY,
           "converted_type": ConvertedType.UTF8,
           "logicalType": {"STRING": {}}}
    names, elems, present = union_leaf_elems(
        [meta("a.parquet", old), meta("b.parquet", new)])
    assert names == ["s"]

    # decimal scale divergence IS a conflict — same raw stamping style
    d5 = {"name": "d", "type": Type.INT64,
          "converted_type": ConvertedType.DECIMAL,
          "precision": 12, "scale": 5}
    d2 = dict(d5, scale=2)
    with pytest.raises(ValueError, match="type conflict"):
        union_leaf_elems([meta("a.parquet", d5), meta("b.parquet", d2)])

    # ...and scale stamped via logicalType vs legacy fields must agree
    d5lt = {"name": "d", "type": Type.INT64,
            "logicalType": {"DECIMAL": {"precision": 12, "scale": 5}}}
    names, _, _ = union_leaf_elems(
        [meta("a.parquet", d5), meta("b.parquet", d5lt)])
    assert names == ["d"]
