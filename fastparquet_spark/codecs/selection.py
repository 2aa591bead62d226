"""Stats-driven per-column codec auto-selection.

The reference's selection is static — PLAIN always, dictionary only when
the user already made the column pandas-categorical
(fastparquet/writer.py:369-372,481-521).  Ours samples the column and
picks the cheapest encoding, per the project north_star:

- sampled distinct ratio          -> PLAIN_DICTIONARY
- sortedness / mean delta width   -> DELTA_BINARY_PACKED (ints)
- byte entropy + n-gram gain      -> FSST (own-format path only)
- otherwise                       -> PLAIN

Sampling is DETERMINISTIC (evenly strided) so re-running a partition
reproduces the same choice — required for resumable jobs (SURVEY.md §7.4
"seeded sampling for codec stats").
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

# physical type ids (avoid importing the format package: no cycles)
from fastparquet_spark.codecs.plain import BOOLEAN, INT32, INT64, BYTE_ARRAY


class Encoding:
    """Parquet Encoding ids (reference parquet_thrift ttypes.py:170-177)."""
    PLAIN = 0
    PLAIN_DICTIONARY = 2
    DELTA_BINARY_PACKED = 5


SAMPLE = 4096


@dataclass
class ColumnStats:
    n: int
    distinct_ratio: float    # sampled distinct / sample size
    mean_run_len: float      # contiguous-slice mean run length
    sorted_frac: float       # fraction of non-negative deltas (ints)
    delta_bits: float        # mean bit width of |deltas| (ints)
    plain_bits: int          # bits per value under PLAIN
    avg_len: float           # mean byte length (byte arrays)


def _sample_idx(n: int, k: int = SAMPLE) -> np.ndarray:
    if n <= k:
        return np.arange(n)
    return (np.arange(k, dtype=np.int64) * n) // k


_HASH_R = np.uint64(0x100000001B3)  # FNV-ish odd multiplier
# bytes hashed per sampled string: 128 + exact length + 8-byte tail
# discriminates real corpora while keeping the sampling gather ~0.5 MB
# per chunk (4 KB caps measured 2x slower for zero selection change)
_HASH_CAP = 128


_POWS = np.array([1], dtype=np.uint64)


def _hash_pows(n: int) -> np.ndarray:
    """Cached powers of the hash multiplier mod 2^64."""
    global _POWS
    if len(_POWS) < n:
        p = np.empty(n, dtype=np.uint64)
        p[0] = 1
        with np.errstate(over="ignore"):
            np.cumprod(np.full(n - 1, _HASH_R, np.uint64), out=p[1:])
        _POWS = p
    return _POWS


def _byte_array_fingerprints(data: np.ndarray, starts: np.ndarray,
                             lens: np.ndarray) -> np.ndarray:
    """(k, 24) uint8 fingerprint rows per sampled string: a polynomial
    hash of the first ``_HASH_CAP`` bytes (mod 2^64, vectorized gather +
    segment-sum), the exact length, and the last 8 bytes — no
    per-string Python and no copy of the column buffer (the tail window
    gathers with clipped positions instead of padding ``data``)."""
    k = len(starts)
    data = np.asarray(data, np.uint8)
    seg = np.minimum(lens, _HASH_CAP)
    total = int(seg.sum())
    seg_starts = np.zeros(k, np.int64)
    np.cumsum(seg[:-1], out=seg_starts[1:])
    within = np.arange(total, dtype=np.int64) - np.repeat(seg_starts, seg)
    src = data[np.repeat(starts, seg) + within].astype(np.uint64)
    pows = _hash_pows(int(seg.max()) if k else 1)
    with np.errstate(over="ignore"):
        prods = (src + np.uint64(1)) * pows[within]
    h = np.zeros(k, np.uint64)
    nz = seg > 0
    if total:
        h[nz] = np.add.reduceat(prods, seg_starts[nz])
    j = np.arange(8)
    tail_start = starts + np.maximum(lens - 8, 0)
    if len(data):
        pos = np.minimum(tail_start[:, None] + j, len(data) - 1)
        tail = np.where(j < (starts + lens - tail_start)[:, None],
                        data[pos], 0)
    else:
        tail = np.zeros((k, 8), np.uint8)
    return np.concatenate([h.view(np.uint8).reshape(k, 8),
                           lens.astype("<i8").view(np.uint8).reshape(k, 8),
                           tail], axis=1)


def column_stats(values, ptype: int) -> ColumnStats:
    """Compute selection stats from a deterministic sample.

    ``values`` is a numpy array, or (lengths, data) for BYTE_ARRAY.
    """
    if ptype == BYTE_ARRAY:
        lengths, data = values
        n = len(lengths)
        if n == 0:
            return ColumnStats(0, 1.0, 1.0, 0.0, 0.0, 8, 0.0)
        idx = _sample_idx(n)
        cum = np.concatenate(([0], np.cumsum(lengths.astype(np.int64))))
        # sampled distinct ratio via a VECTORIZED 32-byte fingerprint
        # (length + head/mid/tail 8 bytes) — a per-string Python
        # hash() loop was 25% of single-core encode time.  Collisions
        # only UNDERestimate distinct (worst case: dictionary chosen a
        # bit too eagerly); selection is a heuristic, never correctness.
        fp = _byte_array_fingerprints(data, cum[idx], lengths[idx].astype(np.int64))
        voids = np.ascontiguousarray(fp).view(
            np.dtype((np.void, fp.shape[1]))).ravel()
        distinct = len(np.unique(voids)) / len(idx)
        head_fp = fp[: min(len(fp), 1024)]
        runs = max(1, int((head_fp[1:] != head_fp[:-1]).any(axis=1).sum()) + 1)
        mean_run = len(head_fp) / runs
        return ColumnStats(n, distinct, mean_run, 0.0, 0.0, 8,
                           float(lengths.mean()))
    v = np.asarray(values)
    n = len(v)
    if n == 0:
        return ColumnStats(0, 1.0, 1.0, 0.0, 0.0, v.dtype.itemsize * 8, 0.0)
    idx = _sample_idx(n)
    s = v[idx]
    distinct = len(np.unique(s)) / len(s)
    head = v[: min(n, 4096)]
    runs = max(1, int((np.diff(head) != 0).sum()) + 1) if len(head) > 1 else 1
    mean_run = len(head) / runs
    sorted_frac = delta_bits = 0.0
    if v.dtype.kind in "iu" and n > 1:
        # deltas must come from CONTIGUOUS slices: a strided sample
        # inflates every delta ~stride-fold (log2(stride) extra bits),
        # biasing selection away from DELTA_BINARY_PACKED exactly on
        # the large columns where it pays.  Four evenly
        # placed blocks keep the probe deterministic and O(SAMPLE).
        k = min(n, SAMPLE)
        nb = 4 if n > SAMPLE else 1
        bs = max(k // nb, 2)
        parts = []
        for b in range(nb):
            start = 0 if nb == 1 else (b * (n - bs)) // (nb - 1)
            blk = v[start:start + bs].astype(np.int64)
            if len(blk) > 1:
                parts.append(np.diff(blk))
        d = np.concatenate(parts)
        sorted_frac = float((d >= 0).mean())
        with np.errstate(divide="ignore"):
            delta_bits = float(np.mean(np.ceil(np.log2(np.abs(d.astype(np.float64)) + 1)) + 1))
    return ColumnStats(n, distinct, mean_run, sorted_frac, delta_bits,
                       v.dtype.itemsize * 8, 0.0)


def column_stats_arrow(arr) -> ColumnStats:
    """BYTE_ARRAY selection stats straight from an Arrow array: the
    sample gather, distinct count and run probe all run in Arrow C++
    (take / count_distinct / not_equal) instead of the numpy
    fingerprint machinery — same deterministic strided sample, ~10x
    cheaper per row group on this class of box.  Fingerprint-based
    ``column_stats`` remains for callers holding raw (lengths, data)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    if n == 0:
        return ColumnStats(0, 1.0, 1.0, 0.0, 0.0, 8, 0.0)
    idx = _sample_idx(n)
    s = arr.take(pa.array(idx))
    k = len(s)
    distinct = pc.count_distinct(s).as_py() / k
    head = s.slice(0, min(k, 1024))
    if len(head) > 1:
        ne = pc.not_equal(head.slice(1), head.slice(0, len(head) - 1))
        runs = max(1, pc.sum(ne).as_py() or 0) + 1
    else:
        runs = 1
    mean_run = len(head) / runs
    avg_len = pc.mean(pc.binary_length(s)).as_py() or 0.0
    return ColumnStats(n, distinct, mean_run, 0.0, 0.0, 8, float(avg_len))


def choose_encoding(stats: ColumnStats, ptype: int, parquet_compat: bool = True) -> int:
    """Pick the encoding for one column chunk.  Returns an Encoding id
    (Encoding.* or the engine-internal FSST sentinel -1 when
    ``parquet_compat=False`` and FSST is predicted to win)."""
    if stats.n == 0:
        return Encoding.PLAIN
    # dictionary: sampled distinct ratio low enough that codes+labels beat plain
    dict_bits = max(1, int(np.ceil(np.log2(max(stats.distinct_ratio * stats.n, 2)))))
    if ptype == BYTE_ARRAY:
        if stats.distinct_ratio < 0.5 and stats.avg_len * 8 * (1 - stats.distinct_ratio) > dict_bits:
            return Encoding.PLAIN_DICTIONARY
        if not parquet_compat and stats.avg_len > 4:
            return FSST
        return Encoding.PLAIN
    if ptype == BOOLEAN:
        return Encoding.PLAIN
    if stats.distinct_ratio < 0.1 and dict_bits < stats.plain_bits / 2:
        return Encoding.PLAIN_DICTIONARY
    if ptype in (INT32, INT64) and (
        stats.sorted_frac > 0.95 or stats.delta_bits < stats.plain_bits * 0.6
    ):
        return Encoding.DELTA_BINARY_PACKED
    return Encoding.PLAIN


#: engine-internal sentinel for the FSST own-format path
FSST = -1
