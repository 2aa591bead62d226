"""Regression tests for the round-5 ADVICE findings (#2-#5; #1 — the
append resume marker — is covered in test_append_sidecar.py):

2. to_pandas(columns=[partition_col]) must return full-cardinality
   partition columns, not 0 rows;
3. merge() builds the sidecar from EXACTLY the given file list (no
   directory sweep) and rejects deep nesting;
4. explicit globs trust the user's pattern (any suffix, e.g. *.parq);
5. paged_read survives heterogeneous hive partition spellings
   (k=3 beside k=abc -> string column, values stringified).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from fastparquet_spark.api import ParquetFile, merge, write


def _df(n=600):
    return pd.DataFrame({
        "k": np.arange(n, dtype=np.int64),
        "lang": [["py", "rs", "go"][i % 3] for i in range(n)],
        "text": [f"doc {i}" for i in range(n)],
    })


def test_to_pandas_partition_only_projection(tmp_path):
    out = str(tmp_path / "ds")
    write(out, _df(600), file_scheme="hive", partition_on=["lang"])
    pf = ParquetFile(out)
    got = pf.to_pandas(columns=["lang"])
    assert list(got.columns) == ["lang"]
    assert len(got) == 600  # full cardinality, not 0 (r5 ADVICE #2)
    assert got["lang"].value_counts().to_dict() == {
        "py": 200, "rs": 200, "go": 200}
    # partition-only projection + partition filter composes
    sub = pf.to_pandas(columns=["lang"],
                       filters=[("lang", "==", "py")], row_filter=True)
    assert len(sub) == 200 and set(sub["lang"]) == {"py"}


def test_merge_uses_exactly_the_given_files(tmp_path):
    d = tmp_path / "m"
    d.mkdir()
    a, b, c = _df(50), _df(50), _df(50)
    b["k"] += 50
    c["k"] += 100
    write(str(d / "a.parquet"), a)
    write(str(d / "b.parquet"), b)
    write(str(d / "c.parquet"), c)  # present under root, NOT in the list
    pf = merge([str(d / "a.parquet"), str(d / "b.parquet")])
    # c.parquet was not swept into _metadata (r5 ADVICE #3)
    assert pf.count() == 100
    md = pq.read_metadata(str(d / "_metadata"))
    assert md.num_rows == 100
    paths = {md.row_group(i).column(0).file_path
             for i in range(md.num_row_groups)}
    assert paths == {"a.parquet", "b.parquet"}
    # files deeper than one directory level are rejected
    (d / "x" / "y").mkdir(parents=True)
    write(str(d / "x" / "y" / "deep.parquet"), a)
    with pytest.raises(ValueError, match="one"):
        merge([str(d / "a.parquet"), str(d / "x" / "y" / "deep.parquet")])


def test_glob_trusts_user_suffix(tmp_path):
    d = tmp_path / "g"
    d.mkdir()
    write(str(d / "a.parq"), _df(40))
    write(str(d / "b.parq"), _df(40))
    # sidecar-ish files must still be excluded from globs
    with open(d / "_notdata.parq", "wb") as fh:
        fh.write(b"junk")
    pf = ParquetFile(str(d / "*.parq"))  # r5 ADVICE #4
    assert pf.count() == 80


def test_paged_read_mixed_partition_spellings(spark, tmp_path):
    from fastparquet_spark.engine.scan_job import paged_read

    root = tmp_path / "hv"
    for key, lo in (("3", 0), ("abc", 30)):
        sub = root / f"k={key}"
        sub.mkdir(parents=True)
        tbl = pa.table({"v": pa.array(range(lo, lo + 30), pa.int64())})
        pq.write_table(tbl, str(sub / "part-0.parquet"))
    got = paged_read(spark, str(root), filters=None).toPandas()
    # mixed spellings resolve to a string column; int-spelled values
    # are stringified instead of raising ArrowTypeError (r5 ADVICE #5)
    assert len(got) == 60
    assert set(got["k"]) == {"3", "abc"}
    assert got[got["k"] == "3"]["v"].min() == 0


def test_mixed_partition_spellings_filter_and_facade(spark, tmp_path):
    """(r6 review) string filters on a mixed-spelling partition column
    must MATCH the int-spelled directories (plan-time values are
    coerced to the resolved column type), numeric ordering filters
    raise loudly, and the api facade concatenates the mixed files
    without ArrowTypeError."""
    from fastparquet_spark.api import ParquetFile
    from fastparquet_spark.engine.scan_job import paged_read

    root = tmp_path / "hv"
    for key, lo in (("3", 0), ("abc", 30)):
        sub = root / f"k={key}"
        sub.mkdir(parents=True)
        tbl = pa.table({"v": pa.array(range(lo, lo + 30), pa.int64())})
        pq.write_table(tbl, str(sub / "part-0.parquet"))
    # string equality selects EXACTLY the int-spelled directory
    got = paged_read(spark, str(root), [("k", "==", "3")]).toPandas()
    assert len(got) == 30
    assert sorted(got["v"]) == list(range(30)) and set(got["k"]) == {"3"}
    # numeric ordering against the string-resolved column raises
    with pytest.raises(Exception, match="order-compare|string"):
        paged_read(spark, str(root), [("k", "<", 5)]).collect()
    # the fps source end to end with the same filter
    from fastparquet_spark.sources import FpsDataSource

    spark.dataSource.register(FpsDataSource)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    ds = spark.read.format("fps").load(str(root)).filter("k = '3'")
    assert sorted(r["v"] for r in ds.collect()) == list(range(30))
    # facade: typed concat, no ArrowTypeError
    pf = ParquetFile(str(root))
    df = pf.to_pandas()
    assert len(df) == 60 and set(df["k"]) == {"3", "abc"}


def test_glob_skips_directories(tmp_path):
    """(r6 review) 'ds/*' on a hive layout matches the key=value
    DIRECTORIES — they must be skipped, not passed to the footer
    fetch (IsADirectoryError)."""
    from fastparquet_spark.api import ParquetFile

    root = tmp_path / "ds"
    for key in ("a", "b"):
        sub = root / f"lang={key}"
        sub.mkdir(parents=True)
        pq.write_table(pa.table({"v": pa.array(range(10))}),
                       str(sub / "part-0.parquet"))
    # matches only directories at this level -> recurse pattern works
    pf = ParquetFile(str(root / "lang=*" / "*.parquet"))
    assert pf.count() == 20
    # top-level glob over a dir containing ONLY subdirs + files
    pq.write_table(pa.table({"v": pa.array(range(5))}),
                   str(root / "loose.parquet"))
    pf2 = ParquetFile(str(root / "*"))
    assert pf2.count() == 5  # dirs skipped, loose file read
