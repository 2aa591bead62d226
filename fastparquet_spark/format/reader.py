"""Parquet reader for round-trip verification of our own files.

Mirrors the reference's decode pipeline (fastparquet/core.py:415-555
read_col page loop; :108-166 v1 page dispatch; api.py:164-190 footer
parse) over numpy buffers, returning a pyarrow Table.  Production reads
go through Spark/pyarrow native scans; this exists so tests can check
OUR decode of OUR bytes bit-identically, independent of third parties.

Supports what our writer emits plus the PLAIN/dictionary variants the
reference writer emits: PLAIN, PLAIN_DICTIONARY, RLE_DICTIONARY,
DELTA_BINARY_PACKED, v1 pages, optional dictionary page, flat schemas.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from fastparquet_spark.codecs import compression as comp
from fastparquet_spark.codecs.delta import delta_decode
from fastparquet_spark.codecs.plain import decode_plain
from fastparquet_spark.codecs.rle import decode_hybrid
from fastparquet_spark.format import thrift
from fastparquet_spark.format.metadata import (
    MAGIC,
    SPECS,
    ConvertedType,
    Encoding,
    PageType,
    Type,
)


def read_footer(buf: bytes) -> dict:
    """Parse the FileMetaData footer (fastparquet/api.py:164-190 semantics)."""
    if buf[:4] != MAGIC or buf[-4:] != MAGIC:
        raise ValueError("not a parquet file (missing PAR1 magic)")
    return read_footer_tail(buf)


def read_footer_tail(buf: bytes) -> dict:
    """Parse a footer from a TAIL slice (footer + u4 length + magic) —
    what :func:`fastparquet_spark.io.read_tail_footer` returns, so
    metadata operators never load page data."""
    if buf[-4:] != MAGIC:
        raise ValueError("missing trailing PAR1 magic")
    flen = int.from_bytes(buf[-8:-4], "little")
    fmd, _ = thrift.read_struct("FileMetaData", buf, len(buf) - 8 - flen, SPECS)
    return fmd


def _arrow_type(elem: dict) -> pa.DataType:
    conv = elem.get("converted_type")
    pt = elem["type"]
    if conv == ConvertedType.DECIMAL:
        return pa.decimal128(elem.get("precision", 18), elem.get("scale", 0))
    if pt == Type.FIXED_LEN_BYTE_ARRAY:
        return pa.binary(elem.get("type_length", 1))
    if conv == ConvertedType.UTF8:
        return pa.string()
    if conv == ConvertedType.TIMESTAMP_MICROS:
        return pa.timestamp("us")
    if conv == ConvertedType.TIMESTAMP_MILLIS:
        return pa.timestamp("ms")
    if conv == ConvertedType.DATE:
        return pa.date32()
    if conv in (ConvertedType.INT_8,):
        return pa.int8()
    if conv in (ConvertedType.INT_16,):
        return pa.int16()
    if conv in (ConvertedType.UINT_8,):
        return pa.uint8()
    if conv in (ConvertedType.UINT_16,):
        return pa.uint16()
    if conv in (ConvertedType.UINT_32,):
        return pa.uint32()
    if conv in (ConvertedType.UINT_64,):
        return pa.uint64()
    return {Type.BOOLEAN: pa.bool_(), Type.INT32: pa.int32(),
            Type.INT64: pa.int64(), Type.INT96: pa.timestamp("ns"),
            Type.FLOAT: pa.float32(),
            Type.DOUBLE: pa.float64(), Type.BYTE_ARRAY: pa.binary()}[pt]


def _read_column_chunk(buf: bytes, cmd: dict, type_length: int = 0,
                       required: bool = False) -> tuple[np.ndarray, object]:
    """Returns (validity bool array, non-null decoded values).

    ``required=True`` -> no definition levels precede the values (e.g.
    Impala-written REQUIRED columns, fastparquet/test/test_read.py:70-127
    interop matrix)."""
    ptype = cmd["type"]
    codec = cmd["codec"]
    n_total = cmd["num_values"]
    pos = cmd.get("dictionary_page_offset") or cmd["data_page_offset"]
    # fastparquet sometimes stores data_page_offset < dictionary_page_offset
    pos = min(p for p in (cmd.get("dictionary_page_offset"), cmd["data_page_offset"]) if p is not None)

    dictionary = None
    validity = np.ones(n_total, dtype=bool)
    out_vals = None
    seen = 0
    while seen < n_total:
        ph, pos = thrift.read_struct("PageHeader", buf, pos, SPECS)
        page = buf[pos:pos + ph["compressed_page_size"]]
        pos += ph["compressed_page_size"]
        if ph["type"] == PageType.DICTIONARY_PAGE:
            raw = comp.decompress(page, codec, ph["uncompressed_page_size"])
            nd = ph["dictionary_page_header"]["num_values"]
            dictionary, _ = decode_plain(raw, ptype, nd, type_length=type_length)
            continue
        if ph["type"] == PageType.DATA_PAGE:
            raw = comp.decompress(page, codec, ph["uncompressed_page_size"])
            dph = ph["data_page_header"]
            n = dph["num_values"]
            if required:
                levels, off = np.ones(n, dtype=np.uint64), 0
            else:
                # definition levels (OPTIONAL; max_def==1 -> validity bitmap,
                # the reference's special case fastparquet/core.py:246-261)
                levels, off = decode_hybrid(raw, 1, n, offset=0, length=None)
        elif ph["type"] == PageType.DATA_PAGE_V2:
            # levels sit uncompressed ahead of the (separately compressed)
            # values section (fastparquet/core.py:195-412)
            dph = ph["data_page_header_v2"]
            n = dph["num_values"]
            dlen = dph.get("definition_levels_byte_length", 0)
            if dlen and not required:
                levels, _ = decode_hybrid(page, 1, n, offset=0, length=dlen)
            else:
                levels = np.ones(n, dtype=np.uint64)
            vals_part = page[dlen:]
            if dph.get("is_compressed", True) and codec != 0:
                raw = comp.decompress(vals_part, codec,
                                      ph["uncompressed_page_size"] - dlen)
            else:
                raw = bytes(vals_part)
            off = 0
        else:
            raise NotImplementedError(f"page type {ph['type']}")
        valid = levels.astype(bool)
        n_nonnull = int(valid.sum())
        enc = dph["encoding"]
        if enc == Encoding.PLAIN:
            vals, off = decode_plain(raw, ptype, n_nonnull, offset=off,
                                     type_length=type_length)
        elif enc in (Encoding.PLAIN_DICTIONARY, Encoding.RLE_DICTIONARY):
            width = raw[off]
            codes, _ = decode_hybrid(raw, width, n_nonnull, offset=off + 1,
                                     length=len(raw) - off - 1)
            vals = ("codes", codes.astype(np.int64))
        elif enc == Encoding.DELTA_BINARY_PACKED:
            vals, off = delta_decode(raw, offset=off, count=n_nonnull,
                                     bit_width=32 if ptype == Type.INT32 else 64)
        elif enc == Encoding.RLE and ptype == Type.BOOLEAN:
            # RLE-encoded boolean values (length-prefixed hybrid, width 1)
            bits, off = decode_hybrid(raw, 1, n_nonnull, offset=off, length=None)
            vals = bits.astype(bool)
        else:
            raise NotImplementedError(f"encoding {enc}")
        validity[seen:seen + n] = valid
        piece = _materialize(vals, dictionary, ptype)
        out_vals = piece if out_vals is None else _concat(out_vals, piece, ptype)
        seen += n
    return validity, out_vals


def _materialize(vals, dictionary, ptype):
    if isinstance(vals, tuple) and len(vals) == 2 and isinstance(vals[0], str) and vals[0] == "codes":
        codes = vals[1]
        if ptype == Type.BYTE_ARRAY:
            lengths, data = dictionary
            cum = np.concatenate(([0], np.cumsum(lengths)))
            out_lens = lengths[codes]
            total = int(out_lens.sum())
            within = np.arange(total, dtype=np.int64) - np.repeat(
                np.concatenate(([0], np.cumsum(out_lens)))[:-1], out_lens)
            out = data[np.repeat(cum[codes], out_lens) + within]
            return out_lens, out
        return np.asarray(dictionary)[codes]
    return vals


def _concat(a, b, ptype):
    if ptype == Type.BYTE_ARRAY:
        return np.concatenate([a[0], b[0]]), np.concatenate([a[1], b[1]])
    return np.concatenate([a, b])


def _to_arrow(validity: np.ndarray, vals, elem: dict) -> pa.Array:
    at = _arrow_type(elem)
    n = len(validity)
    nulls = not validity.all()
    vbuf_ = pa.py_buffer(np.packbits(validity, bitorder="little").tobytes()) if nulls else None
    nc_ = int((~validity).sum()) if nulls else 0
    if pa.types.is_decimal(at):
        if vals is not None and getattr(vals, "ndim", 1) == 2:
            # FIXED-backed decimal: big-endian two's complement bytes ->
            # 16-byte little-endian decimal128 storage with sign extension
            w = vals.shape[1]
            sign = np.where(vals[:, 0] >= 128, 255, 0).astype(np.uint8)
            full16 = np.repeat(sign[:, None], 16, axis=1)
            full16[:, :w] = vals[:, ::-1]
            storage = np.zeros((n, 16), dtype=np.uint8)
            storage[validity] = full16
            return pa.Array.from_buffers(
                at, n, [vbuf_, pa.py_buffer(storage.tobytes())], null_count=nc_)
        # int64 unscaled -> decimal128 storage (low word + sign extension)
        low = np.zeros(n, dtype=np.int64)
        if vals is not None:
            low[validity] = np.asarray(vals, dtype=np.int64)
        words = np.empty((n, 2), dtype=np.int64)
        words[:, 0] = low
        words[:, 1] = low >> 63
        return pa.Array.from_buffers(at, n, [vbuf_, pa.py_buffer(words.tobytes())],
                                     null_count=nc_)
    if elem["type"] == Type.FIXED_LEN_BYTE_ARRAY:
        width = at.byte_width
        full = np.zeros((n, width), dtype=np.uint8)
        if vals is not None:
            full[validity] = vals
        return pa.Array.from_buffers(at, n, [vbuf_, pa.py_buffer(full.tobytes())],
                                     null_count=nc_)
    if elem["type"] == Type.INT96:
        # INT96 -> datetime64[ns]: nanos-of-day (low 8B LE) + Julian day
        # (reference fastparquet/converted_types.py:159-162)
        full = np.zeros(n, dtype=np.int64)
        if vals is not None and len(vals):
            raw = np.ascontiguousarray(vals, dtype=np.uint8)
            nanos = raw[:, :8].copy().view("<i8").ravel()
            julian = raw[:, 8:].copy().view("<i4").ravel().astype(np.int64)
            full[validity] = (julian - 2440588) * 86_400_000_000_000 + nanos
        return pa.Array.from_buffers(pa.timestamp("ns"), n,
                                     [vbuf_, pa.py_buffer(full.tobytes())],
                                     null_count=nc_)
    if elem["type"] == Type.BYTE_ARRAY:
        lengths, data = vals if vals is not None else (np.zeros(0, np.int64), np.zeros(0, np.uint8))
        full_lens = np.zeros(n, dtype=np.int64)
        full_lens[validity] = lengths
        offsets = np.concatenate(([0], np.cumsum(full_lens))).astype(np.int32)
        vbuf = pa.py_buffer(np.packbits(validity, bitorder="little").tobytes()) if nulls else None
        arr = pa.Array.from_buffers(
            pa.utf8() if at == pa.string() else pa.binary(), n,
            [vbuf, pa.py_buffer(offsets.tobytes()), pa.py_buffer(data.tobytes())],
            null_count=int((~validity).sum()) if nulls else 0)
        return arr
    np_dtype = {pa.bool_(): np.bool_, pa.int32(): np.int32, pa.int64(): np.int64,
                pa.float32(): np.float32, pa.float64(): np.float64}.get(at)
    if at == pa.timestamp("us") or at == pa.timestamp("ms"):
        np_dtype = np.int64
    elif at == pa.date32():
        np_dtype = np.int32
    elif np_dtype is None:
        np_dtype = np.dtype(at.to_pandas_dtype())
    full = np.zeros(n, dtype=np_dtype)
    if vals is not None:
        full[validity] = np.asarray(vals).astype(np_dtype, copy=False)
    if at == pa.bool_():
        dbuf = pa.py_buffer(np.packbits(full, bitorder="little").tobytes())
    else:
        dbuf = pa.py_buffer(np.ascontiguousarray(full).tobytes())
    vbuf = pa.py_buffer(np.packbits(validity, bitorder="little").tobytes()) if nulls else None
    return pa.Array.from_buffers(at, n, [vbuf, dbuf],
                                 null_count=int((~validity).sum()) if nulls else 0)


def _load(source) -> bytes:
    if isinstance(source, str):
        with open(source, "rb") as fh:
            return fh.read()
    if isinstance(source, (bytes, bytearray, memoryview)):
        return bytes(source)
    return source.read()  # file-like


def _read_row_group(buf, rg, elems, columns=None) -> pa.Table:
    arrays, fields = [], []
    for cc, elem in zip(rg["columns"], elems):
        if columns is not None and elem["name"] not in columns:
            continue
        validity, vals = _read_column_chunk(
            buf, cc["meta_data"], elem.get("type_length", 0),
            required=elem.get("repetition_type", 1) == 0)
        arr = _to_arrow(validity, vals, elem)
        arrays.append(arr)
        fields.append(pa.field(elem["name"], arr.type))
    return pa.Table.from_arrays(arrays, schema=pa.schema(fields))


def _leaf_elems(fmd: dict) -> list[dict]:
    elems = [e for e in fmd["schema"][1:] if e.get("num_children") is None]
    if len(fmd["schema"]) - 1 != len(elems):
        raise NotImplementedError(
            "nested schemas (LIST/MAP groups) are out of scope for this "
            "reader — flat input only (SURVEY.md §1.5); Spark's native "
            "scan reads nested parquet")
    return elems


def iter_row_groups(source, columns=None):
    """Yield one pyarrow Table per row group — the reference's streaming
    chunk iteration (fastparquet/api.py:321-337 iter_row_groups), with
    column projection (only the selected chunks are decoded,
    fastparquet/core.py:570-577)."""
    buf = _load(source)
    fmd = read_footer(buf)
    elems = _leaf_elems(fmd)
    for rg in fmd["row_groups"]:
        yield _read_row_group(buf, rg, elems, columns)


def read_file(source, columns=None) -> pa.Table:
    """Read a parquet file (path or bytes) written by us (or the reference's
    flat-schema output) into a pyarrow Table, optionally projecting."""
    buf = _load(source)
    fmd = read_footer(buf)
    elems = _leaf_elems(fmd)
    if not elems:
        # zero-column file: rows exist only as a count
        empty_rows = pa.array([{}] * fmd["num_rows"], type=pa.struct([]))
        return pa.Table.from_batches(
            [pa.RecordBatch.from_struct_array(empty_rows)])
    parts = [_read_row_group(buf, rg, elems, columns)
             for rg in fmd["row_groups"]]
    if not parts:
        names = [e["name"] for e in elems if columns is None or e["name"] in columns]
        return pa.table({nm: [] for nm in names})
    return pa.concat_tables(parts)
