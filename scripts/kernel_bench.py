#!/usr/bin/env python
"""Single-core kernel microbench — reproduces BENCH.md's kernel table.

Each kernel runs min-of-N warm passes (this box's first-touch page
faults and co-tenant noise swing cold timings 5-30x; production encode
tasks are warm after their first chunk, so warm is the honest steady
state).  Prints one line per kernel: MB/s over the kernel's natural
input size.

Run: python scripts/kernel_bench.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fastparquet_spark.codecs.bitpack import pack_bits, unpack_bits
from fastparquet_spark.codecs.delta import delta_decode, delta_encode
from fastparquet_spark.codecs.dictionary import dict_build
from fastparquet_spark.codecs.fsst import fsst_decode, fsst_encode, fsst_train
from fastparquet_spark.codecs.plain import pack_byte_array
from fastparquet_spark.codecs.rle import encode_hybrid
from fastparquet_spark.engine.datagen import synthetic_arrow_table

REPS = 5


def bench(name: str, nbytes: int, fn) -> None:
    best = min(_timed(fn) for _ in range(REPS))
    print(f"{name:42s} {nbytes / 1e6 / best:8.0f} MB/s")


def _timed(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def main() -> None:
    rng = np.random.default_rng(42)

    vals10 = rng.integers(0, 1 << 10, 4_000_000).astype(np.uint64)
    bench("pack_bits w=10", vals10.nbytes,
          lambda: pack_bits(vals10, 10))
    packed10 = pack_bits(vals10, 10)
    bench("unpack_bits w=10", vals10.nbytes,
          lambda: unpack_bits(np.frombuffer(packed10, np.uint8), 10,
                              len(vals10)))

    runs = np.repeat(rng.integers(0, 8, 40_000), 100).astype(np.uint64)
    bench("encode_hybrid (run-heavy)", runs.nbytes,
          lambda: encode_hybrid(runs, 3))

    sorted64 = np.cumsum(rng.integers(0, 50, 2_000_000)).astype(np.int64)
    bench("delta_encode (sorted int64)", sorted64.nbytes,
          lambda: delta_encode(sorted64))
    denc = delta_encode(sorted64)
    bench("delta_decode", sorted64.nbytes,
          lambda: delta_decode(denc, count=len(sorted64)))

    rand32 = rng.integers(-(1 << 31), 1 << 31, 4_000_000).astype(np.int64)
    bench("delta_encode (random int32-range)", rand32.nbytes,
          lambda: delta_encode(rand32, bit_width=64))

    tbl = synthetic_arrow_table(30_000)
    content = tbl.column("content").combine_chunks()
    import pyarrow as pa

    lengths = np.diff(np.frombuffer(content.buffers()[1], np.int32,
                                    count=len(content) + 1)).astype(np.int64)
    data = np.frombuffer(content.buffers()[2], np.uint8,
                         count=int(lengths.sum()))
    bench("pack_byte_array (Arrow join)", data.nbytes,
          lambda: pack_byte_array(lengths, data))

    table = fsst_train(data)
    bench("fsst_encode (C kernel, source-content)", data.nbytes,
          lambda: fsst_encode(data, table))
    os.environ["FPS_DISABLE_NATIVE"] = "1"
    import fastparquet_spark.codecs.native as native

    native._lib, native._lib_tried = None, False
    bench("fsst_encode (numpy fallback)", data.nbytes,
          lambda: fsst_encode(data, table))
    del os.environ["FPS_DISABLE_NATIVE"]
    native._lib, native._lib_tried = None, False
    blob = np.frombuffer(fsst_encode(data, table), np.uint8)
    bench("fsst_decode (vectorized expansion)", data.nbytes,
          lambda: fsst_decode(blob, table))

    # PINNED from r4 on: 2M 2-char strings, 4 distinct values.  (r1/r2's
    # dict_build rows used an unrecorded ad-hoc probe; this shape is the
    # stable row-over-row basis going forward.)
    langs = pa.array([["py", "rs", "go", "js"][i % 4]
                      for i in range(2_000_000)])
    bench("dict_build (2M x 2-char, 4 distinct)", 2_000_000 * 2,
          lambda: dict_build(langs))
    # second pinned shape: higher-cardinality identifiers (dict build at
    # its admission boundary), so regressions in the hash path show even
    # when the low-cardinality row is flat
    ids = pa.array([f"repo-{i % 50_000:05d}" for i in range(2_000_000)])
    bench("dict_build (2M x 10-char, 50k distinct)", 2_000_000 * 10,
          lambda: dict_build(ids))


if __name__ == "__main__":
    main()
