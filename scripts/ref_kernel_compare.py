#!/usr/bin/env python
"""Single-core throughput: OUR kernels vs the REFERENCE'S OWN compiled
kernels on identical inputs.

The north rule's bar is "matching-or-beating the reference's
single-node throughput".  The reference's write path is its Cython
kernels (cencoding.pyx encode_rle_bp / read_rle_bit_packed_hybrid,
speedups.pyx pack_byte_array / unpack_byte_array) — everything above
them is Python orchestration.  test_reference_kernel_parity.py already
proves the two stacks are BIT-IDENTICAL; this bench reuses its build
of the reference's generated C and times both sides:

- byte-array framing encode/decode over realistic source-code lines
  (the content column's hot loop on both sides);
- RLE/bit-packed hybrid encode/decode over dictionary codes (zipfian)
  and definition levels (90% ones in runs) — the levels/codes hot
  loop on both sides.

Each side consumes its NATIVE in-memory representation (the reference:
lists of bytes objects + int32 numpy, exactly what its writer.py hands
the kernels; ours: Arrow-style offsets+data buffers + uint64 codes).
Decodes read the SAME byte stream (the reference encoder's output —
parity tests prove either stream decodes on both sides).

Run on a QUIET box: python scripts/ref_kernel_compare.py
Prints one JSON line; human table on stderr.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

REPS = int(os.environ.get("KC_REPS", "7"))


def _timed(fn, *args, reps=REPS):
    best = float("inf")
    out = None
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        best = min(best, time.perf_counter() - t0)
    return best, out


def _content_corpus(n_rows=200_000, seed=11):
    """Deterministic source-code-shaped lines (mean ~90 bytes)."""
    rng = np.random.default_rng(seed)
    kw = [b"def ", b"return ", b"import ", b"class ", b"    if ",
          b"for i in range(", b"# TODO: ", b"self.", b"):", b" = "]
    toks = [bytes(rng.integers(97, 123, rng.integers(3, 12)).astype(
        np.uint8)) for _ in range(400)]
    rows = []
    for _ in range(n_rows):
        k = rng.integers(2, 9)
        parts = [kw[rng.integers(0, len(kw))]]
        parts += [toks[rng.integers(0, len(toks))] for _ in range(k)]
        rows.append(b" ".join(parts))
    return rows


def main():
    from test_reference_kernel_parity import _build_reference_kernels

    cen, sp = _build_reference_kernels()

    from fastparquet_spark.codecs.plain import (
        pack_byte_array,
        unpack_byte_array,
    )
    from fastparquet_spark.codecs.rle import decode_hybrid, encode_hybrid

    res = {}

    # ----------------------------------------------------- byte arrays --
    rows = _content_corpus()
    lens = np.array([len(r) for r in rows], np.int64)
    data = np.frombuffer(b"".join(rows), np.uint8)
    content_mb = (lens.sum() + 4 * len(lens)) / 1e6

    t_ref, packed_ref = _timed(sp.pack_byte_array, rows)
    t_our, packed_our = _timed(pack_byte_array, lens, data)
    assert packed_our == packed_ref, "framing bytes diverge"
    res["pack_byte_array"] = {
        "mb": round(content_mb, 1),
        "ref_mbps": round(content_mb / t_ref, 1),
        "ours_mbps": round(content_mb / t_our, 1),
    }

    t_ref, got_ref = _timed(sp.unpack_byte_array, packed_ref, len(rows))
    t_our, got_our = _timed(unpack_byte_array, packed_ref, len(rows))
    assert list(got_ref[:50]) == rows[:50]
    l2, d2, _ = got_our
    assert l2.tolist() == lens.tolist() and bytes(d2) == bytes(data)
    res["unpack_byte_array"] = {
        "mb": round(content_mb, 1),
        "ref_mbps": round(content_mb / t_ref, 1),
        "ours_mbps": round(content_mb / t_our, 1),
    }

    # ------------------------------------------- hybrid codes + levels --
    rng = np.random.default_rng(7)
    for label, width, vals in (
        ("hybrid_dict_codes", 12,
         np.minimum(rng.zipf(1.3, 2_000_000) - 1, 4000).astype(np.uint64)),
        ("hybrid_def_levels", 1,
         (rng.random(2_000_000) < 0.9).astype(np.uint64)),
    ):
        i32 = vals.astype(np.int32)
        mb = vals.nbytes / 1e6  # uncompressed u64 value bytes

        def ref_enc():
            out = np.zeros(vals.size * 4 + 1024, np.uint8)
            o = cen.NumpyIO(out)
            cen.encode_rle_bp(i32, width, o)
            return out[: o.tell()].tobytes()

        t_ref, stream_ref = _timed(ref_enc)
        t_our, stream_our = _timed(encode_hybrid, vals, width)
        res[label + "_encode"] = {
            "mb": round(mb, 1),
            "ref_mbps": round(mb / t_ref, 1),
            "ours_mbps": round(mb / t_our, 1),
            "ref_bytes": len(stream_ref),
            "ours_bytes": len(stream_our),
        }

        # decode the REFERENCE's stream on both sides
        sbuf = np.frombuffer(stream_ref, np.uint8).copy()

        def ref_dec():
            io = cen.NumpyIO(sbuf.copy())
            out = np.zeros(vals.size + 64, np.int32)
            o = cen.NumpyIO(out.view("uint8"))
            cen.read_rle_bit_packed_hybrid(
                io, width, len(stream_ref), o, itemsize=4)
            return out

        t_ref, dec_ref = _timed(ref_dec)
        t_our, dec_our = _timed(
            lambda: decode_hybrid(stream_ref, width, vals.size,
                                  offset=0, length=len(stream_ref))[0])
        assert np.array_equal(dec_ref[: vals.size], i32)
        assert np.array_equal(dec_our.astype(np.int64), i32.astype(np.int64))
        res[label + "_decode"] = {
            "mb": round(mb, 1),
            "ref_mbps": round(mb / t_ref, 1),
            "ours_mbps": round(mb / t_our, 1),
        }

    for k, v in res.items():
        ratio = v["ours_mbps"] / v["ref_mbps"]
        print(f"{k:28s} ref {v['ref_mbps']:9.1f} MB/s   "
              f"ours {v['ours_mbps']:9.1f} MB/s   {ratio:6.2f}x",
              file=sys.stderr)
    print(json.dumps({"kernel_compare": res}))


if __name__ == "__main__":
    main()
