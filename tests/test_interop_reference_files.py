"""Cross-engine interop: our reader must decode third-party-written
parquet files (the reference's own test corpus) identically to pyarrow —
the read-side half of the reference's interop matrix
(fastparquet/test/test_read.py:70-127 Impala files,
test_aroundtrips.py:74-137)."""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from fastparquet_spark.format import read_file

TD = "/root/reference/test-data"

# flat-schema files from the reference corpus: writer in comment
FLAT_FILES = [
    "nation.plain.parquet",          # fastparquet, PLAIN
    "nation.dict.parquet",           # fastparquet, dictionary
    "nation.impala.parquet",         # Impala, dict + truncated bitpack runs
    "snappy-nation.impala.parquet",  # Impala, snappy
    "gzip-nation.impala.parquet",    # Impala, gzip
    "decimals.parquet",              # Parquet.NET, INT96 + FIXED(16) DECIMAL
    "test.parquet",                  # pyarrow
    "test-null.parquet",             # nulls
    "test-null-dictionary.parquet",  # dictionary with nulls
    "test-converted-type-null.parquet",
    "empty.parquet",
    "no_columns.parquet",
]

NESTED_FILES = ["nested1.parquet", "map-test.snappy.parquet",
                "repeated_no_annotation.parquet", "datapage_v2.snappy.parquet"]


@pytest.mark.parametrize("fname", FLAT_FILES)
def test_reads_third_party_file_identically(fname):
    path = os.path.join(TD, fname)
    if not os.path.exists(path):
        pytest.skip(f"{fname} not in snapshot")
    expected = pq.read_table(path)
    got = read_file(path)
    assert got.num_rows == expected.num_rows
    for col in expected.column_names:
        a = expected.column(col).combine_chunks()
        b = got.column(col).combine_chunks()
        if pa.types.is_null(a.type):
            # pyarrow degrades zero-row-group columns to null type; we
            # keep the footer's REAL type (r5) — value-compare is
            # vacuous either way, both must be empty/all-null
            assert len(b) == len(a) and b.null_count == len(b)
            continue
        b = b.cast(a.type)
        pd.testing.assert_series_equal(a.to_pandas(), b.to_pandas(),
                                       check_names=False, obj=f"{fname}:{col}")


def _eq(a, b):
    """Recursive equality with NaN == NaN (nested pylist compare)."""
    import math

    if isinstance(a, float) and isinstance(b, float):
        return (math.isnan(a) and math.isnan(b)) or a == b
    if isinstance(a, dict) and isinstance(b, dict):
        return a.keys() == b.keys() and all(_eq(a[k], b[k]) for k in a)
    if isinstance(a, (list, tuple)) and isinstance(b, (list, tuple)):
        return len(a) == len(b) and all(_eq(x, y) for x, y in zip(a, b))
    return a == b


@pytest.mark.parametrize("fname", NESTED_FILES)
def test_reads_nested_file_identically(fname):
    """Dremel assembly (format/assembly.py) must reconstruct LIST/MAP/
    struct columns value-identical to pyarrow — the read surface the
    reference covers with _assemble_objects (cencoding.pyx:376-439)."""
    path = os.path.join(TD, fname)
    if not os.path.exists(path):
        pytest.skip(f"{fname} not in snapshot")
    expected = pq.read_table(path)
    got = read_file(path)
    assert got.num_rows == expected.num_rows
    for col in expected.column_names:
        a = expected.column(col).combine_chunks()
        b = got.column(col).combine_chunks().cast(a.type)
        assert _eq(a.to_pylist(), b.to_pylist()), f"{fname}:{col}"


def test_reads_spark_written_files(spark, tmp_path):
    """Spark's writer (parquet-mr lineage) differs from pyarrow's —
    RLE_DICTIONARY pages, different page sizing.  Our reader must decode
    its output identically."""
    df = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    out = str(tmp_path / "sparkw")
    df.coalesce(2).write.mode("overwrite").option("compression", "snappy") \
        .parquet(out)
    import glob

    for f in sorted(glob.glob(f"{out}/part-*.parquet")):
        expected = pq.read_table(f)
        got = read_file(f)
        for col in expected.column_names:
            a = expected.column(col).combine_chunks()
            b = got.column(col).combine_chunks().cast(a.type)
            pd.testing.assert_series_equal(a.to_pandas(), b.to_pandas(),
                                           check_names=False, obj=col)


def test_reads_dictionary_fallback_chunk(tmp_path):
    """A chunk that STARTS dictionary-encoded and falls back to PLAIN
    mid-chunk (dictionary page size cap) mixes encodings across pages —
    the per-page dispatch must handle both in one chunk."""
    import numpy as np
    import pyarrow as pa

    rng = np.random.default_rng(0)
    n = 60_000
    vals = [f"value-{int(v):08d}" for v in rng.integers(0, 40_000, n)]
    t = pa.table({"s": pa.array(vals), "i": pa.array(range(n))})
    path = str(tmp_path / "fb.parquet")
    pq.write_table(t, path, use_dictionary=True,
                   dictionary_pagesize_limit=20_000,  # force early fallback
                   data_page_size=30_000, compression="snappy")
    expected = pq.read_table(path)
    got = read_file(path)
    for col in expected.column_names:
        a = expected.column(col).combine_chunks()
        b = got.column(col).combine_chunks().cast(a.type)
        assert a.equals(b), col
