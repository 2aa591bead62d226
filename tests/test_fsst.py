"""FSST-style codec round-trips (own-format path, SURVEY.md §2.1)."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from fastparquet_spark.codecs import FsstTable, fsst_decode, fsst_encode, fsst_train


def _roundtrip(raw: bytes, table=None):
    data = np.frombuffer(raw, np.uint8)
    t = table or fsst_train(data)
    enc = fsst_encode(data, t)
    dec = fsst_decode(enc, t)
    assert bytes(dec) == raw
    return len(enc), t


def test_fsst_code_like_text_compresses():
    raw = ("import numpy as np\n\ndef encode(values, width):\n"
           "    return np.packbits(values)\n" * 300).encode()
    n_enc, t = _roundtrip(raw)
    assert n_enc < len(raw) / 2
    assert 0 < len(t.symbols) <= 128
    assert all(2 <= len(s) <= 8 for s in t.symbols)


def test_fsst_all_256_bytes():
    raw = bytes(range(256)) * 40 + b"AAAA" * 100
    _roundtrip(raw)


def test_fsst_table_serialization():
    raw = b"hello world, hello parquet, hello spark! " * 100
    data = np.frombuffer(raw, np.uint8)
    t = fsst_train(data)
    ser = t.serialize()
    t2, pos = FsstTable.deserialize(ser)
    assert pos == len(ser)
    assert t2.escape == t.escape and t2.symbols == t.symbols
    enc = fsst_encode(data, t)
    assert bytes(fsst_decode(enc, t2)) == raw


def test_fsst_empty_and_tiny():
    for raw in [b"", b"a", b"ab", bytes([255, 255, 0])]:
        _roundtrip(raw)


def test_fsst_adversarial_escape_heavy():
    # data dominated by whatever bytes the trainer reserves
    raw = (b"common common common " * 50)
    data = np.frombuffer(raw, np.uint8)
    t = fsst_train(data)
    # now encode DIFFERENT data full of reserved bytes
    hostile = bytes([t.escape] * 100) + bytes(int(c) for c in t.codes) * 20 + raw
    enc = fsst_encode(np.frombuffer(hostile, np.uint8), t)
    assert bytes(fsst_decode(enc, t)) == hostile


@given(st.binary(min_size=0, max_size=2000))
@settings(max_examples=100, deadline=None)
def test_fsst_roundtrip_property(raw):
    _roundtrip(raw)


@given(st.binary(min_size=0, max_size=500), st.binary(min_size=0, max_size=2000))
@settings(max_examples=50, deadline=None)
def test_fsst_train_on_one_encode_other(train_on, payload):
    # table trained on one buffer must still round-trip any other buffer
    t = fsst_train(np.frombuffer(train_on, np.uint8))
    enc = fsst_encode(np.frombuffer(payload, np.uint8), t)
    assert bytes(fsst_decode(enc, t)) == payload


@given(st.binary(min_size=0, max_size=500), st.binary(min_size=0, max_size=3000))
@settings(max_examples=50, deadline=None)
def test_fsst_native_matches_numpy_bit_identical(train_on, payload):
    """The compiled C greedy kernel and the pure-numpy vectorized
    matcher implement the same scan and must emit IDENTICAL bytes."""
    import os

    import fastparquet_spark.codecs.native as native

    if native._load() is None:
        import pytest

        pytest.skip("no C compiler in this environment")
    t = fsst_train(np.frombuffer(train_on, np.uint8))
    data = np.frombuffer(payload, np.uint8)
    enc_native = fsst_encode(data, t)
    os.environ["FPS_DISABLE_NATIVE"] = "1"
    native._lib, native._lib_tried = None, False
    try:
        enc_numpy = fsst_encode(data, t)
    finally:
        del os.environ["FPS_DISABLE_NATIVE"]
        native._lib, native._lib_tried = None, False
    assert enc_native == enc_numpy
    assert bytes(fsst_decode(enc_native, t)) == payload


def test_fsst_select_var_exact_greedy():
    """The vectorized variable-length selector is exact leftmost greedy."""
    from fastparquet_spark.codecs.fsst import _select_var

    rng = np.random.default_rng(11)
    for _ in range(300):
        pos = np.unique(rng.integers(0, 120, int(rng.integers(1, 70)))).astype(np.int64)
        lens = rng.integers(2, 9, len(pos)).astype(np.int64)
        sel, nxt = [], -1 << 60
        for i, (p, ln) in enumerate(zip(pos, lens)):
            if p >= nxt:
                sel.append(i)
                nxt = p + ln
        assert np.array_equal(_select_var(pos, lens), np.array(sel, dtype=np.int64))
