"""FPSC as a registered Spark data source: df.write.format('fpsc') /
spark.read.format('fpsc') round-trip, schema inference, partition-
parallel reads, and append mode."""

from __future__ import annotations

import glob

import pytest


@pytest.fixture()
def registered(spark):
    from fastparquet_spark.sources import FpscDataSource

    try:
        spark.dataSource.register(FpscDataSource)
    except Exception as e:  # already registered in this session
        if "already" not in str(e).lower():
            raise
    return spark


def _df(spark, n=3000):
    return spark.createDataFrame(
        [(i, f"repo{i % 5}", f"common source body {i % 37}\n" * 3)
         for i in range(n)],
        "id long, repo string, content string")


def test_write_read_roundtrip(registered, tmp_path):
    spark = registered
    out = str(tmp_path / "fpsc_ds")
    df = _df(spark)
    df.repartition(3).write.format("fpsc").mode("append").save(out)
    files = glob.glob(f"{out}/part-*.fpsc")
    assert files and not glob.glob(f"{out}/*.inprogress")
    back = spark.read.format("fpsc").load(out)
    assert back.count() == 3000
    assert {f.name for f in back.schema.fields} == {"id", "repo", "content"}
    a = df.selectExpr("sum(id)", "md5(concat_ws(',', sort_array(collect_list(cast(id as string)))))").collect()
    b = back.selectExpr("sum(id)", "md5(concat_ws(',', sort_array(collect_list(cast(id as string)))))").collect()
    assert a == b


def test_append_accumulates(registered, tmp_path):
    spark = registered
    out = str(tmp_path / "fpsc_app")
    _df(spark, 1000).write.format("fpsc").mode("append").save(out)
    n1 = len(glob.glob(f"{out}/part-*.fpsc"))
    _df(spark, 500).write.format("fpsc").mode("append").save(out)
    assert len(glob.glob(f"{out}/part-*.fpsc")) > n1
    assert spark.read.format("fpsc").load(out).count() == 1500


def test_chunked_containers(registered, tmp_path):
    spark = registered
    out = str(tmp_path / "fpsc_chunks")
    (_df(spark, 4000).repartition(1).write.format("fpsc")
     .option("rows_per_container", 800).mode("append").save(out))
    assert len(glob.glob(f"{out}/part-*.fpsc")) == 5
    assert spark.read.format("fpsc").load(out).count() == 4000
