"""DELTA_BINARY_PACKED (frame-of-reference + zigzag min-delta) codec.

The reference only DECODES this encoding (fastparquet/cencoding.pyx:213-242);
we implement the encoder spec-compliantly from that decoder's framing so
standard readers (pyarrow, DuckDB, Spark) accept our pages:

    <block_size varint> <miniblocks_per_block varint> <total_count varint>
    <first_value zigzag varint>
    per block:
      <min_delta zigzag varint>
      <bit_width byte> * miniblocks_per_block
      <bit-packed deltas, values_per_miniblock each, LSB-first>

Deltas stored are ``delta - min_delta`` (non-negative).  We use the
conventional block_size=128, miniblocks=4 (32 values per miniblock).
Everything is numpy: deltas via ``np.diff``, per-block min/width via a
reshape, packing via ``pack_bits``.
"""

from __future__ import annotations

import numpy as np

from fastparquet_spark.codecs.bitpack import pack_bits, unpack_bits
from fastparquet_spark.codecs.varint import (
    uvarint_decode,
    uvarint_encode,
    zigzag_decode,
    zigzag_encode,
)

BLOCK_SIZE = 128
MINIBLOCKS = 4
VALUES_PER_MINIBLOCK = BLOCK_SIZE // MINIBLOCKS


def _wrap(x: np.ndarray, bit_width: int) -> np.ndarray:
    """Modular wrap into the signed ``bit_width`` range (the spec's
    overflow semantics: deltas are computed modulo the type width, so
    stored deltas never exceed it)."""
    if bit_width >= 64:
        return x
    span = 1 << bit_width
    half = span >> 1
    return ((x + half) % span) - half


def delta_encode(values: np.ndarray, bit_width: int = 64) -> bytes:
    """Encode an int array (int32/int64) as DELTA_BINARY_PACKED.

    ``bit_width``: physical type width (32 for INT32 pages) — deltas use
    modular arithmetic at that width so miniblock widths never exceed it
    (readers reject e.g. 33-bit deltas on an INT32 column).

    Vectorized across blocks: per-block min/width via one reshape, then
    ONE ``pack_bits`` call per distinct miniblock width (values of equal
    width are flattened together and re-split) — no per-block numpy
    round-trips in the hot path.
    """
    v = np.ascontiguousarray(values, dtype=np.int64)
    n = len(v)
    header = (
        uvarint_encode(BLOCK_SIZE)
        + uvarint_encode(MINIBLOCKS)
        + uvarint_encode(n)
        + uvarint_encode(int(zigzag_encode(int(v[0]))) if n else 0)
    )
    if n <= 1:
        return header
    with np.errstate(over="ignore"):
        deltas = _wrap(np.diff(v), bit_width)
    nd = len(deltas)
    nblocks = (nd + BLOCK_SIZE - 1) // BLOCK_SIZE
    padded = np.zeros(nblocks * BLOCK_SIZE, dtype=np.int64)
    padded[:nd] = deltas
    blocks = padded.reshape(nblocks, BLOCK_SIZE)
    # real (non-padding) deltas per block; padding must not affect min
    nreal = np.minimum(nd - BLOCK_SIZE * np.arange(nblocks), BLOCK_SIZE)
    mask = np.arange(BLOCK_SIZE) < nreal[:, None]
    min_delta = np.where(mask, blocks, np.int64(2**62)).min(axis=1)
    with np.errstate(over="ignore"):
        shifted = np.where(mask, blocks - min_delta[:, None], 0)
        if bit_width < 64:
            shifted &= (1 << bit_width) - 1  # stored deltas mod 2^width
        shifted = shifted.astype(np.uint64)
    mbs = shifted.reshape(nblocks, MINIBLOCKS, VALUES_PER_MINIBLOCK)
    used = (nreal + VALUES_PER_MINIBLOCK - 1) // VALUES_PER_MINIBLOCK
    mb_used = np.arange(MINIBLOCKS) < used[:, None]          # (nblocks, MB)
    mb_max = mbs.max(axis=2)
    # bit width per miniblock: ceil(log2(max+1)), 0 for unused/zero blocks
    widths = np.zeros((nblocks, MINIBLOCKS), dtype=np.uint8)
    nz = (mb_max > 0) & mb_used
    # float64 log2 can only OVERestimate the width (x >= 2^(k-1) rounds to
    # a float >= 2^(k-1), so floor(log2) >= k-1), and only by crossing a
    # power of two — clipping to the type width is therefore exact.  A max
    # shifted delta within ~2048 of 2^64 otherwise yields width 65 and a
    # pack_bits ValueError on legal int64 input.
    widths[nz] = np.minimum(
        np.floor(np.log2(mb_max[nz].astype(np.float64))).astype(np.uint64) + 1,
        bit_width,
    ).astype(np.uint8)
    # one pack per distinct width, then split back per miniblock
    payload: dict[tuple[int, int], bytes] = {}
    for w in np.unique(widths[nz]):
        sel = np.argwhere((widths == w) & nz)
        flat = mbs[sel[:, 0], sel[:, 1]].reshape(-1)
        packed = pack_bits(flat, int(w))
        step = VALUES_PER_MINIBLOCK * int(w) // 8
        for i, (bi, mi) in enumerate(sel):
            payload[(int(bi), int(mi))] = packed[i * step:(i + 1) * step]
    parts = [header]
    for b in range(nblocks):
        parts.append(uvarint_encode(int(zigzag_encode(int(min_delta[b])))))
        parts.append(widths[b].tobytes())
        for m in range(int(used[b])):
            if widths[b, m]:
                parts.append(payload[(b, m)])
    return b"".join(parts)


def delta_decode(buf, offset: int = 0, count: int | None = None,
                 bit_width: int = 64) -> tuple[np.ndarray, int]:
    """Decode DELTA_BINARY_PACKED; returns (int64 ndarray, next_pos).
    ``bit_width=32`` applies INT32 modular reconstruction."""
    pos = offset
    block_size, pos = uvarint_decode(buf, pos)
    miniblocks, pos = uvarint_decode(buf, pos)
    total, pos = uvarint_decode(buf, pos)
    if count is not None and count != total:
        raise ValueError(f"count mismatch: header {total} != expected {count}")
    zz_first, pos = uvarint_decode(buf, pos)
    first = int(zigzag_decode(zz_first))
    vpm = block_size // miniblocks
    out = np.empty(total, dtype=np.int64)
    if total:
        out[0] = first
    ndeltas = total - 1 if total else 0
    deltas = np.empty(ndeltas, dtype=np.int64)
    got = 0
    while got < ndeltas:
        zz_md, pos = uvarint_decode(buf, pos)
        min_delta = int(zigzag_decode(zz_md))
        widths = np.frombuffer(buf, np.uint8, count=miniblocks, offset=pos)
        pos += miniblocks
        for m in range(miniblocks):
            if got >= ndeltas:
                break
            w = int(widths[m])
            if w:
                vals = unpack_bits(buf, w, vpm, offset=pos).astype(np.int64)
                pos += (vpm * w + 7) // 8
            else:
                vals = np.zeros(vpm, dtype=np.int64)
            take = min(vpm, ndeltas - got)
            deltas[got : got + take] = vals[:take] + min_delta
            got += take
    if total > 1:
        with np.errstate(over="ignore"):
            out[1:] = first + np.cumsum(deltas)
    if total and bit_width < 64:
        out = _wrap(out, bit_width)
    return out, pos
