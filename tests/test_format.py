"""End-to-end file round-trips across codecs x row-group splits, verified
by THREE independent readers (pyarrow, DuckDB, Spark) plus our own
decoder — the cross-engine interop pattern of the reference suite
(fastparquet/test/test_aroundtrips.py:74-137, SURVEY.md §5.5)."""

from __future__ import annotations

import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from fastparquet_spark.format import read_file, read_footer, write_file
from fastparquet_spark.format.thrift import read_struct, write_struct
from fastparquet_spark.format.metadata import SPECS


def _assert_tables_equal(expected: pa.Table, got: pa.Table, ctx=""):
    assert expected.num_rows == got.num_rows, ctx
    for name in expected.column_names:
        a = expected.column(name).combine_chunks()
        b = got.column(name).combine_chunks().cast(a.type)
        pd.testing.assert_series_equal(
            a.to_pandas(), b.to_pandas(), check_names=False, obj=f"{ctx}:{name}")


def test_thrift_struct_roundtrip():
    fmd = {"version": 1, "num_rows": 12345,
           "schema": [{"name": "schema", "num_children": 1},
                      {"name": "x", "type": 1, "repetition_type": 1,
                       "converted_type": 17}],
           "row_groups": [],
           "key_value_metadata": [{"key": "a", "value": "b" * 300}],
           "created_by": "test"}
    buf = write_struct("FileMetaData", fmd, SPECS)
    got, pos = read_struct("FileMetaData", buf, 0, SPECS)
    assert pos == len(buf)
    assert got["num_rows"] == 12345
    assert got["schema"][1]["converted_type"] == 17
    assert got["key_value_metadata"][0]["value"] == "b" * 300


@pytest.mark.parametrize("codec", ["UNCOMPRESSED", "SNAPPY", "GZIP", "ZSTD"])
@pytest.mark.parametrize("rg_rows", [None, 1000])
def test_roundtrip_pyarrow_duckdb_own(sample_table, codec, rg_rows, tmp_path):
    path = str(tmp_path / "t.parquet")
    res = write_file(path, sample_table, compression=codec, row_group_rows=rg_rows)
    assert res.rows == sample_table.num_rows
    _assert_tables_equal(sample_table, pq.read_table(path), f"pyarrow:{codec}")
    got = duckdb.sql(f"select * from '{path}'").arrow()
    _assert_tables_equal(sample_table, got, f"duckdb:{codec}")
    _assert_tables_equal(sample_table, read_file(path), f"own:{codec}")


def test_roundtrip_spark(sample_table, spark, tmp_path):
    path = str(tmp_path / "t.parquet")
    write_file(path, sample_table, compression="SNAPPY", row_group_rows=777)
    sdf = spark.read.parquet(path)
    got = pa.Table.from_pandas(sdf.toPandas(),
                               schema=pa.schema([
                                   pa.field(f.name, sample_table.schema.field(f.name).type)
                                   for f in sdf.schema.fields]))
    got = got.sort_by("i64sorted")
    exp = sample_table.sort_by("i64sorted")
    _assert_tables_equal(exp, got, "spark")


def test_encoding_overrides_and_sizes(sample_table, tmp_path):
    """Auto-selection must never lose to all-PLAIN for this mixed table."""
    auto = str(tmp_path / "auto.parquet")
    plain = str(tmp_path / "plain.parquet")
    write_file(auto, sample_table, compression="SNAPPY")
    write_file(plain, sample_table, compression="SNAPPY",
               encodings={n: "plain" for n in sample_table.column_names})
    assert os.path.getsize(auto) <= os.path.getsize(plain)
    _assert_tables_equal(sample_table, pq.read_table(auto), "auto")
    _assert_tables_equal(sample_table, pq.read_table(plain), "plain")


def test_size_beats_pyarrow_writer(sample_table, tmp_path):
    """Not a spec requirement, but our headline: stats-driven encoding
    should beat pyarrow's defaults on this dict/delta-friendly table."""
    ours = str(tmp_path / "ours.parquet")
    theirs = str(tmp_path / "pa.parquet")
    write_file(ours, sample_table, compression="SNAPPY")
    pq.write_table(sample_table, theirs, compression="snappy")
    assert os.path.getsize(ours) < os.path.getsize(theirs) * 1.05


def test_statistics_written(sample_table, tmp_path):
    path = str(tmp_path / "t.parquet")
    write_file(path, sample_table, compression="SNAPPY")
    md = pq.ParquetFile(path).metadata
    rg = md.row_group(0)
    by_name = {rg.column(i).path_in_schema: rg.column(i) for i in range(rg.num_columns)}
    st = by_name["i64sorted"].statistics
    col = sample_table.column("i64sorted")
    assert st.min == pa.compute.min(col).as_py()
    assert st.max == pa.compute.max(col).as_py()
    assert by_name["i32"].statistics.null_count == sample_table.column("i32").null_count


def test_row_group_pruning_works_on_our_stats(tmp_path):
    """Readers must be able to prune row groups on our min/max stats —
    the reference's filter semantics (fastparquet/api.py:948-999) done
    by the scan engine."""
    n = 10_000
    tbl = pa.table({"k": pa.array(np.arange(n)), "v": pa.array(np.ones(n))})
    path = str(tmp_path / "t.parquet")
    write_file(path, tbl, compression="SNAPPY", row_group_rows=1000)
    con = duckdb.connect()
    got = con.sql(f"select count(*) from '{path}' where k between 2500 and 2600").fetchone()
    assert got[0] == 101


def test_footer_parse_own(sample_table, tmp_path):
    path = str(tmp_path / "t.parquet")
    write_file(path, sample_table, compression="GZIP", row_group_rows=1500)
    fmd = read_footer(open(path, "rb").read())
    assert fmd["num_rows"] == sample_table.num_rows
    assert len(fmd["row_groups"]) == 2
    assert fmd["schema"][0]["num_children"] == sample_table.num_columns


def test_empty_table(tmp_path):
    tbl = pa.table({"a": pa.array([], pa.int64()), "s": pa.array([], pa.string())})
    path = str(tmp_path / "empty.parquet")
    write_file(path, tbl)
    got = pq.read_table(path)
    assert got.num_rows == 0
    assert got.column_names == ["a", "s"]


def test_all_null_column(tmp_path):
    tbl = pa.table({"a": pa.array([None] * 50, pa.int32()),
                    "s": pa.array([None] * 50, pa.string())})
    path = str(tmp_path / "nulls.parquet")
    write_file(path, tbl)
    got = pq.read_table(path)
    assert got.column("a").null_count == 50
    assert got.column("s").null_count == 50
    ours = read_file(path)
    assert ours.column("a").null_count == 50


@pytest.mark.parametrize("codec", ["UNCOMPRESSED", "ZSTD"])
def test_data_page_v2_roundtrip(sample_table, codec, tmp_path):
    """DataPage v2 (levels outside the compressed section) — the
    reference's env-gated write path (fastparquet/writer.py:564-591) and
    the only page type its reader accepts DELTA in (core.py:221-227)."""
    path = str(tmp_path / "v2.parquet")
    write_file(path, sample_table, compression=codec, row_group_rows=1000,
               data_page_version=2)
    _assert_tables_equal(sample_table, pq.read_table(path), f"pa-v2:{codec}")
    got = duckdb.sql(f"select * from '{path}'").arrow()
    _assert_tables_equal(sample_table, got, f"duck-v2:{codec}")
    _assert_tables_equal(sample_table, read_file(path), f"own-v2:{codec}")
    # delta-encoded sorted ints really are in the file
    md = pq.ParquetFile(path).metadata
    encs = {md.row_group(0).column(i).path_in_schema:
            md.row_group(0).column(i).encodings for i in range(md.row_group(0).num_columns)}
    assert "DELTA_BINARY_PACKED" in encs["i64sorted"]


def test_iter_row_groups_and_projection(sample_table, tmp_path):
    """Streaming chunk iteration + column projection through our reader
    (fastparquet/api.py:321-337, core.py:570-577 analogs)."""
    from fastparquet_spark.format import iter_row_groups
    path = str(tmp_path / "t.parquet")
    write_file(path, sample_table, compression="ZSTD", row_group_rows=1000)
    chunks = list(iter_row_groups(path))
    assert len(chunks) == 3
    assert [c.num_rows for c in chunks] == [1000, 1000, 1000]
    whole = pa.concat_tables(chunks)
    _assert_tables_equal(sample_table, whole, "iter")
    proj = read_file(path, columns=["lang", "i32"])
    assert proj.column_names == ["i32", "lang"] or set(proj.column_names) == {"lang", "i32"}
    _assert_tables_equal(sample_table.select(proj.column_names), proj, "proj")


from hypothesis import given, settings, strategies as st


@st.composite
def _arrow_tables(draw):
    n = draw(st.integers(0, 200))
    def col(elems, typ):
        vals = draw(st.lists(st.one_of(st.none(), elems), min_size=n, max_size=n))
        return pa.array(vals, typ)
    return pa.table({
        "i": col(st.integers(-2**31, 2**31 - 1), pa.int32()),
        "l": col(st.integers(-2**62, 2**62), pa.int64()),
        "d": col(st.floats(allow_nan=False, width=64), pa.float64()),
        "s": col(st.text(max_size=20), pa.string()),
        "b": col(st.booleans(), pa.bool_()),
        "u4": col(st.integers(0, 2**32 - 1), pa.uint32()),
        "u8": col(st.integers(0, 2**64 - 1), pa.uint64()),
        "t32": col(st.integers(0, 86_399_999), pa.time32("ms")),
        "h": pa.array(
            [None if v is None else np.float16(v)
             for v in draw(st.lists(
                 st.one_of(st.none(),
                           st.floats(allow_nan=False, width=16)),
                 min_size=n, max_size=n))],
            pa.float16()),
    })


@given(_arrow_tables())
@settings(max_examples=25, deadline=None)
def test_writer_fuzz_vs_pyarrow(tbl):
    """Property fuzz: arbitrary nullable tables round-trip through our
    writer into pyarrow's reader (the reference's randomized round-trip
    strategy, test_output.py:104-131, with hypothesis)."""
    import io
    buf = io.BytesIO()
    write_file(buf, tbl, compression="SNAPPY", row_group_rows=64)
    got = pq.read_table(io.BytesIO(buf.getvalue()))
    _assert_tables_equal(tbl, got, "fuzz")
    ours = read_file(buf.getvalue())
    _assert_tables_equal(tbl, ours, "fuzz-own")


@pytest.mark.parametrize("v", [1, 2])
def test_decimal_and_fixed_roundtrip(v, tmp_path, rng):
    """DECIMAL (int64-backed, reference's decimal object-encoding,
    fastparquet/writer.py:114-154) and FIXED_LEN_BYTE_ARRAY."""
    from decimal import Decimal
    n = 800
    tbl = pa.table({
        "dec": pa.array(
            [None if rng.random() < 0.1 else
             Decimal(f"{int(x)}.{int(abs(x)) % 100:02d}")
             for x in rng.integers(-10**6, 10**6, n)], pa.decimal128(12, 2)),
        "fsb": pa.array(
            [None if rng.random() < 0.05 else
             bytes(rng.integers(0, 256, 8, dtype=np.uint8))
             for _ in range(n)], pa.binary(8)),
        "k": pa.array(np.arange(n)),
    })
    path = str(tmp_path / "dec.parquet")
    write_file(path, tbl, compression="ZSTD", row_group_rows=300,
               data_page_version=v)
    _assert_tables_equal(tbl, pq.read_table(path), f"pa-dec-v{v}")
    got = duckdb.sql(f"select * from '{path}'").arrow()
    _assert_tables_equal(tbl, got, f"duck-dec-v{v}")
    _assert_tables_equal(tbl, read_file(path), f"own-dec-v{v}")


def test_read_row_groups_and_head(sample_table, tmp_path):
    path = str(tmp_path / "rg.parquet")
    write_file(path, sample_table, row_group_rows=1000)
    from fastparquet_spark.format import head, read_row_groups

    mid = read_row_groups(path, [1], columns=["i32", "lang"])
    assert mid.num_rows == 1000 and mid.column_names == ["i32", "lang"]
    assert mid.column("i32").cast(sample_table.schema.field("i32").type) \
        .combine_chunks() \
        .equals(sample_table.column("i32").slice(1000, 1000).combine_chunks())
    h = head(path, 7)
    assert h.num_rows == 7
    assert h.column("text").to_pylist() == \
        sample_table.column("text").to_pylist()[:7]


def test_modern_compat_mode_all_readers(tmp_path):
    """compat='modern': BYTE_STREAM_SPLIT floats + DELTA_LENGTH strings
    are auto-admitted on a measured compressed win, the file shrinks vs
    reference-compat, and pyarrow + DuckDB + our reader all round-trip
    it.  The DEFAULT stays reference-readable — modern is opt-in."""
    import duckdb
    import numpy as np

    rng = np.random.default_rng(7)
    t = pa.table({
        "f": pa.array(rng.normal(0, 1, 40_000).astype(np.float32)),
        "d": pa.array(rng.normal(0, 1, 40_000)),
        "p": pa.array([f"src/pkg{i % 977}/module_{i}.py"
                       for i in range(40_000)]),
    })
    mod = str(tmp_path / "modern.parquet")
    ref = str(tmp_path / "ref.parquet")
    rm = write_file(mod, t, compression="ZSTD", compat="modern")
    write_file(ref, t, compression="ZSTD")
    enc = {c.name: c.encoding for c in rm.columns}
    # the 3-way string trial: DELTA_BYTE_ARRAY beats DELTA_LENGTH here
    assert enc == {"f": "bss", "d": "bss", "p": "delta_byte_array"}
    import os
    assert os.path.getsize(mod) < os.path.getsize(ref)
    back = pq.read_table(mod)
    for c in t.column_names:
        assert back.column(c).to_pylist() == t.column(c).to_pylist()
    own = read_file(mod)
    for c in t.column_names:
        assert own.column(c).to_pylist() == t.column(c).to_pylist()
    n = duckdb.sql(f"SELECT count(*) FROM '{mod}' WHERE p LIKE 'src/%'").fetchone()[0]
    assert n == 40_000


def test_modern_trial_rejects_when_no_win(tmp_path):
    """Constant-ish strings dict-encode; tiny columns stay PLAIN — the
    trial only admits a modern encoding on a real compressed win."""
    t = pa.table({"tiny": pa.array([1.5, 2.5], pa.float64())})
    r = write_file(str(tmp_path / "t.parquet"), t, compression="ZSTD",
                   compat="modern")
    assert r.columns[0].encoding == "plain"


def test_reads_pyarrow_modern_encodings(tmp_path):
    """Read-side superset of the reference: pyarrow-written
    BYTE_STREAM_SPLIT, DELTA_LENGTH_BYTE_ARRAY and DELTA_BYTE_ARRAY
    files decode value-equal (the reference reader raises on all
    three, fastparquet/core.py:130-165)."""
    import numpy as np

    rng = np.random.default_rng(11)
    t = pa.table({
        "f": pa.array(rng.normal(0, 1, 5000).astype(np.float32)),
        "p": pa.array(sorted(f"repo/{i % 50}/file_{i:05d}.rs"
                             for i in range(5000))),
    })
    p1 = str(tmp_path / "bss_dba.parquet")
    pq.write_table(t, p1, use_dictionary=False,
                   use_byte_stream_split=["f"],
                   column_encoding={"p": "DELTA_BYTE_ARRAY"})
    own = read_file(p1)
    for c in t.column_names:
        assert own.column(c).to_pylist() == t.column(c).to_pylist()
    p2 = str(tmp_path / "dlba.parquet")
    pq.write_table(t, p2, use_dictionary=False,
                   column_encoding={"p": "DELTA_LENGTH_BYTE_ARRAY"})
    assert read_file(p2).column("p").to_pylist() == t.column("p").to_pylist()


def test_modern_readable_by_spark(spark, tmp_path):
    """Spark reads our modern-encoded files: DELTA_LENGTH_BYTE_ARRAY
    through the default vectorized reader; BYTE_STREAM_SPLIT through the
    row-based reader (this Spark build's vectorized reader rejects BSS
    in ANY file — pyarrow-written ones fail identically — so that is an
    ecosystem limitation, not a property of our files)."""
    import numpy as np

    rng = np.random.default_rng(13)
    t = pa.table({
        "f": pa.array(rng.normal(0, 1, 20_000).astype(np.float32)),
        "p": pa.array([f"a/b{i % 100}/c_{i}.go" for i in range(20_000)]),
        "k": pa.array(range(20_000)),
    })
    path = str(tmp_path / "modern_spark.parquet")
    r = write_file(path, t, compression="ZSTD",
                   encodings={"f": "bss", "p": "delta_length"})
    assert {c.name: c.encoding for c in r.columns}["f"] == "bss"
    from pyspark.sql import functions as F

    # vectorized reader: column pruning means only p/k pages are decoded
    got = (spark.read.parquet(path)
           .agg(F.count("*"), F.sum("k"),
                F.sum(F.length("p"))).collect()[0])
    assert got[0] == 20_000 and got[1] == sum(range(20_000))
    assert got[2] == sum(len(f"a/b{i % 100}/c_{i}.go") for i in range(20_000))
    # BSS column via the row-based reader
    spark.conf.set("spark.sql.parquet.enableVectorizedReader", "false")
    try:
        s = spark.read.parquet(path).agg(
            F.sum(F.col("f").cast("double"))).collect()[0][0]
        assert abs(s - float(np.sum(np.asarray(t.column("f")),
                                    dtype=np.float64))) < 1e-3
    finally:
        spark.conf.set("spark.sql.parquet.enableVectorizedReader", "true")


def test_modern_picks_dba_for_sorted_paths(tmp_path):
    """Sorted path-like strings: DELTA_BYTE_ARRAY wins the 3-way trial
    and the file shrinks severalfold; pyarrow and DuckDB read it."""
    import os

    import duckdb

    paths = sorted(f"src/{i % 37:02d}/pkg/module_{i:07d}.py"
                   for i in range(20_000))
    t = pa.table({"p": pa.array(paths), "k": pa.array(range(20_000))})
    mod = str(tmp_path / "dba.parquet")
    ref = str(tmp_path / "ref.parquet")
    r = write_file(mod, t, compression="ZSTD", compat="modern")
    write_file(ref, t, compression="ZSTD")
    assert {c.name: c.encoding for c in r.columns}["p"] == "delta_byte_array"
    assert os.path.getsize(mod) < 0.5 * os.path.getsize(ref)
    assert pq.read_table(mod).column("p").to_pylist() == paths
    assert read_file(mod).column("p").to_pylist() == paths
    assert duckdb.sql(
        f"SELECT count(*) FROM '{mod}' WHERE p LIKE 'src/%'"
    ).fetchone()[0] == 20_000


def test_compression_level_spec_parity(tmp_path):
    """The reference's dict compression spec ({'type': ..., 'args':
    {'level': N}}, fastparquet/compression.py:73) and the plain
    {'codec','level'} form both steer the block codec level."""
    import os

    t = pa.table({"s": pa.array(sorted(f"src/{i % 37:02d}/pkg/module_{i:07d}.py"
                                        for i in range(20_000)))})
    hi = str(tmp_path / "hi.parquet")
    lo = str(tmp_path / "lo.parquet")
    write_file(hi, t, compression={"type": "zstd", "args": {"level": 12}})
    write_file(lo, t, compression={"codec": "ZSTD", "level": 1})
    assert os.path.getsize(hi) < os.path.getsize(lo)
    assert pq.read_table(hi).column("s").to_pylist() == \
        t.column("s").to_pylist()


def test_custom_metadata_and_sorting_columns(tmp_path):
    """Footer key/value metadata (the reference's custom_metadata,
    fastparquet/writer.py:961-965) and declared SortingColumn order,
    both readable by pyarrow and our own footer parser."""
    from fastparquet_spark.format.reader import read_footer

    t = pa.table({"k": pa.array(range(1000)),
                  "s": pa.array([f"v{i}" for i in range(1000)])})
    path = str(tmp_path / "kv.parquet")
    write_file(path, t, custom_metadata={"pipeline": "fps", "gen": "3"},
               sorting_columns=[("k", False, False)], row_group_rows=500)
    md = pq.read_metadata(path)
    assert md.metadata[b"pipeline"] == b"fps" and md.metadata[b"gen"] == b"3"
    for ri in range(md.num_row_groups):
        sc = md.row_group(ri).sorting_columns
        assert sc and sc[0].column_index == 0 and not sc[0].descending
    fmd = read_footer(open(path, "rb").read())
    assert fmd["row_groups"][0]["sorting_columns"] == [
        {"column_idx": 0, "descending": False, "nulls_first": False}]
    # unknown sort names are ignored, absent metadata stays absent
    p2 = str(tmp_path / "plain.parquet")
    write_file(p2, t, sorting_columns=["nope"])
    assert pq.read_metadata(p2).row_group(0).sorting_columns == ()


def test_engine_stamps_sorting_columns(spark, tmp_path):
    import glob

    from pyspark.sql import functions as F

    from fastparquet_spark.engine import encode_dataset

    df = (spark.range(3000)
          .withColumn("lang", (F.col("id") % 3).cast("string"))
          .withColumn("text", F.concat(F.lit("d-"), F.col("id"))))
    out = str(tmp_path / "ds")
    encode_dataset(spark, df, out, partition_cols=("lang",),
                   num_partitions=2, sort_within=("id",),
                   resume=False).collect()
    f = glob.glob(f"{out}/part-*.parquet")[0]
    sc = pq.read_metadata(f).row_group(0).sorting_columns
    names = pq.read_schema(f).names
    assert sc and names[sc[0].column_index] == "id"


def test_page_crc_checksums_verified_by_pyarrow(tmp_path):
    """Every page header carries the spec CRC32 of its body; pyarrow's
    page_checksum_verification=True read validates them on v1, paged,
    v2 and nested page shapes — and a flipped byte is DETECTED."""
    t = pa.table({
        "k": pa.array(range(5000)),
        "s": pa.array([f"t{i}" for i in range(5000)]),
        "L": pa.array([[i, i + 1] for i in range(5000)],
                      pa.list_(pa.int64())),
    })
    for kwargs in ({}, {"page_rows": 1000}):
        path = str(tmp_path / "crc.parquet")
        write_file(path, t, compression="ZSTD", row_group_rows=2500,
                   **kwargs)
        got = pq.read_table(path, page_checksum_verification=True)
        assert got.column("k").to_pylist() == list(range(5000))
    path2 = str(tmp_path / "crc2.parquet")
    write_file(path2, t.select(["k", "s"]), compression="ZSTD",
               data_page_version=2)
    assert pq.read_table(path2, page_checksum_verification=True) \
             .num_rows == 5000
    # corruption detection: flip one byte inside the first data page
    raw = bytearray(open(path2, "rb").read())
    raw[200] ^= 0xFF
    bad = str(tmp_path / "bad.parquet")
    open(bad, "wb").write(bytes(raw))
    import pytest as _pytest

    with _pytest.raises(Exception, match="(?i)crc|corrupt|checksum"):
        pq.read_table(bad, page_checksum_verification=True)


def test_truncated_stats_for_long_strings(tmp_path):
    """>64-byte strings keep TRUNCATED min/max bounds (prefix min,
    incremented-prefix max, is_*_value_exact=false) instead of losing
    stats entirely — prefix-range pruning on long content columns."""
    from fastparquet_spark.format.dataset import filter_row_groups
    from fastparquet_spark.format.reader import read_footer

    long = sorted(f"{p}{'x' * 100}-{i:04d}"
                  for i, p in enumerate(["alpha", "beta", "gamma"] * 200))
    t = pa.table({"s": pa.array(long), "k": pa.array(range(600))})
    path = str(tmp_path / "a.parquet")
    write_file(path, t, row_group_rows=200)
    st = read_footer(open(path, "rb").read())[
        "row_groups"][0]["columns"][0]["meta_data"]["statistics"]
    assert len(st["min_value"]) == 64 and st["is_min_value_exact"] is False
    assert st["max_value"] > st["min_value"]  # strict upper bound
    assert st["is_max_value_exact"] is False
    assert "min" not in st  # legacy pair omitted: it promises exactness
    keep = filter_row_groups(str(tmp_path), [("s", ">=", "gamma")])
    assert keep and all(ri == 2 for _f, ri in keep)
    keep2 = filter_row_groups(str(tmp_path), [("s", "==", long[300])])
    assert ("a.parquet", 1) in keep2  # truncation never loses rows
