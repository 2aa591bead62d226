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

Everything is numpy END TO END — including the per-block byte assembly:
block sizes are computed up front, one output buffer is allocated, and
varint headers / width bytes / packed payloads are SCATTERED into place
(one gather/scatter per distinct miniblock width).  The previous
per-block Python loop was the slowest kernel in BENCH r1 (37 MB/s
encode); this removes every per-block Python operation from the hot
path.  Decode mirrors it: one light header walk, then one unpack per
distinct width across ALL miniblocks.
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


def _uvarint_encode_array(v: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """ULEB128-encode every uint64 in ``v``; returns (flat_bytes, lengths)
    with each value's bytes contiguous in order — fully vectorized."""
    v = np.ascontiguousarray(v, dtype=np.uint64)
    n = len(v)
    nb = np.ones(n, dtype=np.int64)
    x = v >> np.uint64(7)
    while x.any():
        nb += (x > 0)
        x >>= np.uint64(7)
    maxb = int(nb.max()) if n else 1
    j = np.arange(maxb, dtype=np.uint64)
    chunks = ((v[:, None] >> (j * np.uint64(7))) & np.uint64(0x7F)).astype(np.uint8)
    cont = j[None, :] < (nb[:, None] - 1).astype(np.uint64)
    chunks |= cont.astype(np.uint8) << 7
    mask = j[None, :] < nb[:, None].astype(np.uint64)
    return chunks[mask], nb  # row-major selection keeps per-value order


def _excl_cumsum(a: np.ndarray, axis=None) -> np.ndarray:
    c = np.cumsum(a, axis=axis)
    if axis is None or a.ndim == 1:
        out = np.empty_like(c)
        out[0] = 0
        out[1:] = c[:-1]
        return out
    out = np.empty_like(c)
    out[..., 0] = 0
    out[..., 1:] = c[..., :-1]
    return out


def delta_encode(values: np.ndarray, bit_width: int = 64) -> bytes:
    """Encode an int array (int32/int64) as DELTA_BINARY_PACKED.

    ``bit_width``: physical type width (32 for INT32 pages) — deltas use
    modular arithmetic at that width so miniblock widths never exceed it
    (readers reject e.g. 33-bit deltas on an INT32 column).
    """
    v = np.ascontiguousarray(values, dtype=np.int64)
    n = len(v)
    from fastparquet_spark.codecs.native import delta_pack_native

    res = delta_pack_native(v, bit_width)
    if res is not None:
        return res
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
    # bit width per miniblock: EXACT integer bit length of the max
    # shifted delta (0 for unused/zero blocks).  float64 log2 can only
    # OVERestimate (x >= 2^(k-1) rounds to a float >= 2^(k-1)) and only
    # by crossing a power of two, so one decrement-check makes it exact
    # — required for the C encoder to produce bit-identical streams.
    widths = np.zeros((nblocks, MINIBLOCKS), dtype=np.uint8)
    nz = (mb_max > 0) & mb_used
    w = np.minimum(
        np.floor(np.log2(mb_max[nz].astype(np.float64))).astype(np.uint64) + 1,
        bit_width,
    ).astype(np.uint64)
    over = (w > 1) & (mb_max[nz] < (np.uint64(1) << (w - np.uint64(1))))
    w[over] -= 1
    widths[nz] = w.astype(np.uint8)

    # ---- vectorized assembly: sizes -> offsets -> three scatters --------
    vflat, vlen = _uvarint_encode_array(zigzag_encode(min_delta))
    pay_sizes = (widths.astype(np.int64) * VALUES_PER_MINIBLOCK) >> 3
    block_sizes = vlen + MINIBLOCKS + pay_sizes.sum(axis=1)
    hlen = len(header)
    starts = hlen + _excl_cumsum(block_sizes)
    out = np.empty(hlen + int(block_sizes.sum()), dtype=np.uint8)
    out[:hlen] = np.frombuffer(header, np.uint8)
    # 1) min_delta varints
    vpos = np.repeat(starts, vlen) + \
        (np.arange(int(vlen.sum())) - np.repeat(_excl_cumsum(vlen), vlen))
    out[vpos] = vflat
    # 2) width bytes
    wpos = (starts + vlen)[:, None] + np.arange(MINIBLOCKS)
    out[wpos.ravel()] = widths.ravel()
    # 3) packed payloads, one pack + one scatter per distinct width
    pay_start = (starts + vlen + MINIBLOCKS)[:, None] + \
        _excl_cumsum(pay_sizes, axis=1)
    for w in np.unique(widths[nz]):
        sel = (widths == w) & nz
        flat = mbs[sel].reshape(-1)
        packed = np.frombuffer(pack_bits(flat, int(w)), np.uint8)
        step = (VALUES_PER_MINIBLOCK * int(w)) >> 3
        tgt = pay_start[sel][:, None] + np.arange(step)
        out[tgt.ravel()] = packed
    return out.tobytes()


def delta_decode(buf, offset: int = 0, count: int | None = None,
                 bit_width: int = 64) -> tuple[np.ndarray, int]:
    """Decode DELTA_BINARY_PACKED; returns (int64 ndarray, next_pos).
    ``bit_width=32`` applies INT32 modular reconstruction.

    Two passes: a light header walk (varint + widths per block — the only
    sequential part, since varints are variable-length), then ONE
    ``unpack_bits`` per distinct width across all miniblocks, scattered
    into place.  Handles any (block_size, miniblocks) the header declares
    (third-party writers vary).  A C kernel (codecs/native.py) takes the
    whole stream when available; this numpy path is the fallback and the
    differential oracle."""
    pos0 = offset
    hdr_pos = offset
    _bs, hdr_pos = uvarint_decode(buf, hdr_pos)
    _mb, hdr_pos = uvarint_decode(buf, hdr_pos)
    hdr_total, hdr_pos = uvarint_decode(buf, hdr_pos)
    if count is not None and count != hdr_total:
        raise ValueError(f"count mismatch: header {hdr_total} != expected {count}")
    from fastparquet_spark.codecs.native import delta_unpack_native

    res = delta_unpack_native(buf, pos0, hdr_total)
    if res is not None:
        out, pos = res
        if bit_width < 64:
            out = _wrap(out, bit_width)
        return out, pos

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
    if ndeltas == 0:
        return out, pos
    nblocks = (ndeltas + block_size - 1) // block_size
    min_deltas = np.empty(nblocks, dtype=np.int64)
    widths = np.zeros((nblocks, miniblocks), dtype=np.uint8)
    used = np.zeros((nblocks, miniblocks), dtype=bool)
    mini_off = np.zeros((nblocks, miniblocks), dtype=np.int64)
    for b in range(nblocks):
        zz_md, pos = uvarint_decode(buf, pos)
        min_deltas[b] = zigzag_decode(zz_md)
        wb = np.frombuffer(buf, np.uint8, count=miniblocks, offset=pos)
        widths[b] = wb
        pos += miniblocks
        remaining = ndeltas - b * block_size
        used_b = min(miniblocks, -(-remaining // vpm))
        used[b, :used_b] = True
        pay = (wb[:used_b].astype(np.int64) * vpm) >> 3
        mini_off[b, :used_b] = pos + _excl_cumsum(pay)
        pos += int(pay.sum())
    src = np.frombuffer(buf, np.uint8)
    vals = np.zeros((nblocks, miniblocks, vpm), dtype=np.int64)
    nzsel = used & (widths > 0)
    for w in np.unique(widths[nzsel]):
        sel = nzsel & (widths == w)
        step = (vpm * int(w)) >> 3
        gathered = src[mini_off[sel][:, None] + np.arange(step)]
        flat = unpack_bits(gathered.tobytes(), int(w), int(sel.sum()) * vpm)
        vals[sel] = flat.reshape(-1, vpm).astype(np.int64)
    with np.errstate(over="ignore"):
        deltas = (vals.reshape(nblocks, block_size) +
                  min_deltas[:, None]).reshape(-1)[:ndeltas]
        out[1:] = first + np.cumsum(deltas)
    if bit_width < 64:
        out = _wrap(out, bit_width)
    return out, pos
