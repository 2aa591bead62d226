"""FSST-style symbol-table string codec (own-format only).

Mandated by the project north_star as an ADDED codec — the reference has
no string codec beyond dictionary (fastparquet/writer.py:481-517).  Not a
Parquet-standard encoding, so it never appears on the parquet-compat
output path (SURVEY.md §7.4); the engine uses it inside its own column
containers where we control both encode and decode.

Design (an FSST variant tuned for vectorized Python, after the FSST
paper's core idea: a ≤255-entry table of ≤8-byte symbols, 1-byte codes,
escape byte for uncovered literals):

- Pick the ``K+1`` RAREST byte values of a training sample as reserved
  values ``R``: one escape byte ``e`` plus ``K`` symbol codes.  All other
  bytes encode as themselves (identity literals, 1 byte).
- Raw occurrences of reserved bytes are escaped as ``(e, b)``.
- Multi-byte symbols (2..8 bytes, drawn from frequent n-grams of the
  sample, never containing reserved bytes) are replaced by their code
  byte via C-speed ``bytes.replace`` in descending-gain order.  Patterns
  contain no reserved bytes, so they can never falsely match across an
  escape pair or an already-substituted code — replacements are exact
  and decode is unambiguous.
- Decode is fully vectorized: escape-run parity analysis + two numpy
  scatters (literals, symbol expansions).  No per-row Python.

Greedy left-to-right longest-match (true FSST) is approximated by
replacement order; this affects only the ratio, never correctness.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

MAX_SYMBOLS = 128
MAX_SYMBOL_LEN = 8
_NGRAM_SIZES = (2, 3, 4, 6, 8)
_MAX_TRAIN = 1 << 20  # 1 MiB sample cap


@dataclass
class FsstTable:
    escape: int                 # reserved escape byte value
    codes: np.ndarray           # uint8[K] code byte values
    symbols: list[bytes]        # K symbols, symbols[i] <-> codes[i]

    def serialize(self) -> bytes:
        out = bytearray([self.escape, len(self.symbols)])
        out += self.codes.tobytes()
        for s in self.symbols:
            out.append(len(s))
            out += s
        return bytes(out)

    @classmethod
    def deserialize(cls, buf, offset: int = 0) -> tuple["FsstTable", int]:
        escape = buf[offset]
        k = buf[offset + 1]
        pos = offset + 2
        codes = np.frombuffer(bytes(buf[pos:pos + k]), dtype=np.uint8).copy()
        pos += k
        symbols = []
        for _ in range(k):
            ln = buf[pos]
            symbols.append(bytes(buf[pos + 1:pos + 1 + ln]))
            pos += 1 + ln
        return cls(escape, codes, symbols), pos


def _byte_counts(sample: np.ndarray) -> np.ndarray:
    return np.bincount(sample, minlength=256)


def fsst_train(data: np.ndarray, max_symbols: int = MAX_SYMBOLS) -> FsstTable:
    """Build a symbol table from (a sample of) a uint8 buffer."""
    sample = np.ascontiguousarray(data[:_MAX_TRAIN], dtype=np.uint8)
    counts = _byte_counts(sample)
    # reserve the rarest byte values: escape + up to max_symbols codes
    order = np.argsort(counts, kind="stable")  # rarest first
    reserved = order[: max_symbols + 1]
    escape = int(reserved[0])
    code_pool = reserved[1:]
    is_reserved = np.zeros(256, dtype=bool)
    is_reserved[reserved] = True

    # candidate n-grams from sliding windows, scored by (len-1)*count
    cands: list[tuple[int, bytes]] = []
    for n in _NGRAM_SIZES:
        if len(sample) <= n:
            continue
        win = np.lib.stride_tricks.sliding_window_view(sample, n)
        # exclude windows touching reserved bytes
        ok = ~is_reserved[win].any(axis=1)
        if not ok.any():
            continue
        voids = np.ascontiguousarray(win[ok]).view(np.dtype((np.void, n))).ravel()
        uniq, cnt = np.unique(voids, return_counts=True)
        top = np.argsort(cnt)[::-1][:256]
        for i in top:
            c = int(cnt[i])
            gain = (n - 1) * c - (n + 2)  # minus table overhead
            if c >= 4 and gain > 0:
                cands.append((gain, uniq[i].tobytes()))
    cands.sort(key=lambda t: (-t[0], t[1]))
    symbols: list[bytes] = []
    seen: set[bytes] = set()
    for _gain, s in cands:
        if len(symbols) >= len(code_pool):
            break
        if s in seen:
            continue
        seen.add(s)
        symbols.append(s)
    codes = code_pool[: len(symbols)].astype(np.uint8)
    return FsstTable(escape, codes, symbols)


def fsst_encode(data: np.ndarray, table: FsstTable) -> bytes:
    """Encode a uint8 buffer with the given table."""
    buf = np.ascontiguousarray(data, dtype=np.uint8)
    # 1) escape reserved bytes: b -> (escape, b), vectorized scatter
    is_reserved = np.zeros(256, dtype=bool)
    is_reserved[table.escape] = True
    is_reserved[table.codes] = True
    esc = is_reserved[buf]
    n_esc = int(esc.sum())
    if n_esc:
        n = len(buf)
        out = np.empty(n + n_esc, dtype=np.uint8)
        shift = np.cumsum(esc) - esc  # escapes inserted before position i
        dst = np.arange(n, dtype=np.int64) + shift + esc
        out[dst] = buf
        out[dst[esc] - 1] = table.escape
        buf = out
    raw = buf.tobytes()
    # 2) multi-byte symbol substitution in descending length then gain
    order = sorted(range(len(table.symbols)),
                   key=lambda i: -len(table.symbols[i]))
    for i in order:
        raw = raw.replace(table.symbols[i], bytes([int(table.codes[i])]))
    return raw


def fsst_decode(blob, table: FsstTable) -> np.ndarray:
    """Decode back to the original uint8 buffer, fully vectorized."""
    buf = np.frombuffer(blob, dtype=np.uint8) if not isinstance(blob, np.ndarray) else blob
    n = len(buf)
    if n == 0:
        return np.empty(0, dtype=np.uint8)
    # identify escape markers via run parity over maximal runs of `escape`
    is_esc = buf == table.escape
    marker = np.zeros(n, dtype=bool)
    if is_esc.any():
        idx = np.nonzero(is_esc)[0]
        run_start = np.concatenate(([True], np.diff(idx) != 1))
        run_id = np.cumsum(run_start) - 1
        starts = idx[run_start]
        offset_in_run = idx - starts[run_id]
        marker[idx[offset_in_run % 2 == 0]] = True
    escaped_literal = np.zeros(n, dtype=bool)
    escaped_literal[1:] = marker[:-1]
    # token classification (markers are consumed, not tokens)
    code_lut = np.full(256, -1, dtype=np.int32)
    for i, c in enumerate(table.codes):
        code_lut[int(c)] = i
    tok_mask = ~marker
    tok_pos = np.nonzero(tok_mask)[0]
    tok_bytes = buf[tok_pos]
    tok_code = code_lut[tok_bytes]
    tok_code[escaped_literal[tok_pos]] = -1  # escaped literals stay literal
    # expansion lengths
    sym_lens = np.array([len(s) for s in table.symbols] or [0], dtype=np.int64)
    lens = np.where(tok_code >= 0, sym_lens[np.maximum(tok_code, 0)], 1)
    cum = np.concatenate(([0], np.cumsum(lens)))
    out = np.empty(int(cum[-1]), dtype=np.uint8)
    lit = tok_code < 0
    out[cum[:-1][lit]] = tok_bytes[lit]
    if (~lit).any():
        symdata = np.frombuffer(b"".join(table.symbols), dtype=np.uint8) \
            if table.symbols else np.empty(0, np.uint8)
        symoff = np.concatenate(([0], np.cumsum(sym_lens)))[:-1] if table.symbols else sym_lens
        cidx = tok_code[~lit]
        clens = sym_lens[cidx]
        total = int(clens.sum())
        within = np.arange(total, dtype=np.int64) - np.repeat(
            np.concatenate(([0], np.cumsum(clens)))[:-1], clens)
        out[np.repeat(cum[:-1][~lit], clens) + within] = symdata[
            np.repeat(symoff[cidx], clens) + within]
    return out
