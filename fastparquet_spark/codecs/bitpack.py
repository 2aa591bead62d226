"""LSB-first bit-packing at arbitrary width, fully vectorized.

Wire format matches the reference's ``encode_bitpacked`` /
``read_bitpacked`` payload (fastparquet/cencoding.pyx:127-167,252-269):
value ``i`` occupies bits ``[i*width, (i+1)*width)`` of the output,
least-significant bit first within each byte.

Implementation: expand to a (n, width) bit matrix and ``np.packbits``
with ``bitorder='little'`` — one pass, no Python loop.
"""

from __future__ import annotations

import numpy as np


def pack_bits(values: np.ndarray, width: int) -> bytes:
    """Pack non-negative ints into ``width`` bits each, LSB-first."""
    if width == 0 or len(values) == 0:
        return b""
    if width > 64:
        raise ValueError(f"width {width} > 64")
    v = np.ascontiguousarray(values, dtype=np.uint64)
    shifts = np.arange(width, dtype=np.uint64)
    bits = ((v[:, None] >> shifts) & np.uint64(1)).astype(np.uint8)
    return np.packbits(bits.ravel(), bitorder="little").tobytes()


def unpack_bits(buf, width: int, count: int, offset: int = 0) -> np.ndarray:
    """Unpack ``count`` values of ``width`` bits from ``buf[offset:]``.

    Returns uint64 ndarray. Tolerates trailing padding bits, mirroring
    the reference reader's clamp (fastparquet/cencoding.pyx:141-167).
    """
    if width == 0 or count == 0:
        return np.zeros(count, dtype=np.uint64)
    nbytes = (count * width + 7) // 8
    raw = np.frombuffer(buf, dtype=np.uint8, count=nbytes, offset=offset)
    bits = np.unpackbits(raw, bitorder="little")[: count * width]
    weights = (np.uint64(1) << np.arange(width, dtype=np.uint64))
    return bits.reshape(count, width).astype(np.uint64) @ weights
