"""Reader fuzz: random tables written by PYARROW with randomized writer
options (dictionary on/off, page version, compression, row-group size)
must decode value-identical through our reader — broad third-party
write coverage beyond the reference's fixed test corpus."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from fastparquet_spark.format import read_file

RNG = np.random.default_rng(77)


def _rand_table(rng, n: int) -> pa.Table:
    def maybe_null(vals, p=0.15):
        return [None if rng.random() < p else v for v in vals]

    cols = {
        "i64": pa.array(maybe_null(rng.integers(-(2**60), 2**60, n).tolist())),
        "i32": pa.array(maybe_null(rng.integers(-(2**31), 2**31, n).tolist()),
                        pa.int32()),
        "f64": pa.array(maybe_null(rng.normal(size=n).tolist())),
        "f32": pa.array(maybe_null(rng.normal(size=n).tolist()), pa.float32()),
        "b": pa.array(maybe_null(rng.integers(0, 2, n).astype(bool).tolist())),
        "s": pa.array(maybe_null(
            ["".join(chr(97 + int(c)) for c in rng.integers(0, 26, int(ln)))
             for ln in rng.integers(0, 40, n)])),
        "cat": pa.array(maybe_null(
            [f"c{int(x)}" for x in rng.integers(0, 5, n)])),
        "ts": pa.array(maybe_null(
            rng.integers(10**15, 2 * 10**15, n).tolist()),
            pa.timestamp("us")),
        "lst": pa.array(maybe_null(
            [rng.integers(0, 100, int(k)).tolist()
             for k in rng.integers(0, 6, n)], p=0.1),
            pa.list_(pa.int64())),
    }
    return pa.table(cols)


@pytest.mark.parametrize("case", range(12))
def test_reader_decodes_random_pyarrow_files(case, tmp_path):
    rng = np.random.default_rng(1000 + case)
    n = int(rng.integers(1, 4000))
    t = _rand_table(rng, n)
    opts = {
        "use_dictionary": bool(rng.integers(0, 2)),
        "compression": ["NONE", "SNAPPY", "ZSTD", "GZIP"][int(rng.integers(0, 4))],
        "data_page_version": ["1.0", "2.0"][int(rng.integers(0, 2))],
        "row_group_size": int(rng.integers(1, n + 1)),
        "write_statistics": bool(rng.integers(0, 2)),
    }
    path = str(tmp_path / f"fuzz{case}.parquet")
    pq.write_table(t, path, **opts)
    own = read_file(path)
    assert own.num_rows == n
    for c in t.column_names:
        got = own.column(c).combine_chunks().cast(t.schema.field(c).type)
        assert got.to_pylist() == t.column(c).to_pylist(), (c, opts)
