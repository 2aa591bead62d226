"""ULEB128 varints and zigzag transforms.

Semantics match the reference kernels:
- ``read_unsigned_var_int`` / ``encode_unsigned_varint``
  (reference fastparquet/cencoding.pyx:170-187,245-249)
- ``zigzag_int`` / ``zigzag_long`` (reference fastparquet/cencoding.pyx:456-465):
  encode ``(n << 1) ^ (n >> 63)``, decode ``(n >> 1) ^ -(n & 1)``.

Varints only ever appear a handful of times per page/block (run headers,
delta-block headers, thrift ints), so scalar Python here is NOT a hot
path; the bulk data always moves through the vectorized kernels.
"""

from __future__ import annotations

import numpy as np


def uvarint_encode(x: int) -> bytes:
    """ULEB128-encode a non-negative int."""
    if x < 0:
        raise ValueError("uvarint requires non-negative input")
    out = bytearray()
    while x > 0x7F:
        out.append((x & 0x7F) | 0x80)
        x >>= 7
    out.append(x)
    return bytes(out)


def uvarint_decode(buf, pos: int = 0) -> tuple[int, int]:
    """Decode one ULEB128 varint; returns (value, next_pos)."""
    result = 0
    shift = 0
    while True:
        byte = buf[pos]
        pos += 1
        result |= (byte & 0x7F) << shift
        if not byte & 0x80:
            return result, pos
        shift += 7


def zigzag_encode(v):
    """Zigzag-map signed -> unsigned; scalar int or int64 ndarray."""
    if isinstance(v, np.ndarray):
        u = v.astype(np.int64, copy=False)
        return ((u.view(np.uint64) << np.uint64(1)) ^ (u >> np.int64(63)).view(np.uint64))
    v = int(v)
    return (v << 1) ^ (v >> 63) if v < 0 else v << 1


def zigzag_decode(u):
    """Inverse zigzag; scalar int or uint64 ndarray."""
    if isinstance(u, np.ndarray):
        x = u.astype(np.uint64, copy=False)
        return ((x >> np.uint64(1)).view(np.int64)) ^ -((x & np.uint64(1)).view(np.int64))
    u = int(u)
    return (u >> 1) ^ -(u & 1)


def width_from_max_int(value: int) -> int:
    """Bits needed to represent ``value`` (reference cencoding.pyx:53-59)."""
    return int(value).bit_length()
