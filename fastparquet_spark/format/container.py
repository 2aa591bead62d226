"""FPSC — the engine's own column-container format (internal path).

FSST is not a Parquet-standard encoding, so FSST-coded columns cannot
live in the parquet-compat output (SURVEY.md §7.4).  This container is
the dual-mode answer: same codec kernels, own framing, used only where
we control both ends (intermediate shuffle spills, cache tiers).

Layout:
    b"FPSC"
    per column chunk: raw encoded blocks (see below)
    utf8 JSON footer {columns: [...], nrows}
    <u4 footer length> b"FPSC"

Per column:
    strings/binary -> FSST(table + blob) over the concatenated payload
                      (symbol matches may span row boundaries — decode
                      restores the exact byte stream, then re-splits by
                      the stored lengths), lengths DELTA_BINARY_PACKED,
                      optional zstd on top when it still helps;
    ints/timestamps -> PLAIN or DELTA (auto-selected), zstd;
    floats/bools    -> PLAIN, zstd;
    validity        -> RLE/bit-packed hybrid (the parquet def-levels
                      kernel, reused).

Everything is numpy/Arrow-buffer vectorized; runs inside mapInArrow.
"""

from __future__ import annotations

import json
from dataclasses import dataclass

import numpy as np
import pyarrow as pa

from fastparquet_spark.codecs import compression as comp
from fastparquet_spark.codecs.delta import delta_decode, delta_encode
from fastparquet_spark.codecs.fsst import FsstTable, fsst_decode, fsst_encode, fsst_train
from fastparquet_spark.codecs.plain import decode_plain, encode_plain
from fastparquet_spark.codecs.rle import decode_hybrid, encode_hybrid
from fastparquet_spark.codecs.selection import column_stats
from fastparquet_spark.format.metadata import Type
from fastparquet_spark.format.writer import _binary_parts, _map_type

MAGIC = b"FPSC"


@dataclass
class ColumnBlock:
    name: str
    codec: str            # 'fsst' | 'plain' | 'delta'
    arrow_type: str       # serialized arrow type name
    n: int
    null_count: int
    raw_bytes: int
    enc_bytes: int


def _arrow_type_name(t: pa.DataType) -> str:
    if pa.types.is_list(t):
        # canonical child field name: Spark's Arrow batches say
        # "list<element: T>", pyarrow says "list<item: T>"
        return f"list<item: {_arrow_type_name(t.value_type)}>"
    return str(t)


_SIMPLE_TYPES = {
    "string": pa.string(), "large_string": pa.large_string(),
    "binary": pa.binary(), "large_binary": pa.large_binary(),
    "bool": pa.bool_(),
    "int8": pa.int8(), "int16": pa.int16(), "int32": pa.int32(),
    "int64": pa.int64(),
    "uint8": pa.uint8(), "uint16": pa.uint16(), "uint32": pa.uint32(),
    "uint64": pa.uint64(),
    "float": pa.float32(), "double": pa.float64(),
    "timestamp[s]": pa.timestamp("s"), "timestamp[ms]": pa.timestamp("ms"),
    "timestamp[us]": pa.timestamp("us"), "timestamp[ns]": pa.timestamp("ns"),
    "date32[day]": pa.date32(),
}


def _type_from_name(name: str) -> pa.DataType:
    if name in _SIMPLE_TYPES:
        return _SIMPLE_TYPES[name]
    if name.startswith("list<item: ") and name.endswith(">"):
        return pa.list_(_type_from_name(name[len("list<item: "):-1]))
    raise ValueError(f"unsupported container type {name}")


def decide_string_codecs(table: pa.Table, fsst_cache: dict,
                         compression: str = "ZSTD",
                         min_fsst_gain: float = 0.98) -> dict:
    """Sampled fsst-vs-plain decision per string/binary column — run
    ONCE on the driver over a small head sample (the same sample that
    pretrains the FSST tables), shipped to every encode task so workers
    never pay the losing codec's full-column trial.  Mirrors
    write_container's selection rule exactly (same hysteresis, same
    size accounting) on the sample; the escape byte makes a 'fsst'
    decision safe for unseen data, and a sample-vs-full flip costs only
    ratio, never correctness."""
    codec = comp.codec_id(compression)
    out: dict[str, str] = {}
    for field in table.schema:
        if not (pa.types.is_string(field.type)
                or pa.types.is_large_string(field.type)
                or pa.types.is_binary(field.type)
                or pa.types.is_large_binary(field.type)):
            continue
        arr = table.column(field.name).combine_chunks()
        if arr.null_count:
            arr = arr.drop_null()
        if len(arr) == 0:
            continue
        lengths, data = _binary_parts(arr)
        body_plain = comp.compress(encode_plain((lengths, data),
                                                Type.BYTE_ARRAY), codec)
        ftab = fsst_cache.get(field.name)
        if ftab is None:
            ftab = fsst_cache[field.name] = fsst_train(data)
        blob = fsst_encode(data, ftab)
        blob_z = comp.compress(blob, codec)
        stored = min(len(blob_z), len(blob))
        fsst_total = len(ftab.serialize()) + len(delta_encode(lengths)) \
            + stored + 28
        out[field.name] = "fsst" \
            if fsst_total < len(body_plain) * min_fsst_gain else "plain"
    return out


def write_container(sink, table: pa.Table, compression: str = "ZSTD",
                    min_fsst_gain: float = 0.98,
                    fsst_cache: dict | None = None,
                    bloom_filters: dict | None = None,
                    codec_decisions: dict | None = None) -> list[ColumnBlock]:
    """Write an Arrow table as an FPSC container; returns per-column lineage.

    ``fsst_cache`` ({column: FsstTable}) reuses symbol tables across
    containers of the same stream — training is the expensive half of
    FSST, and a table trained on the first chunk stays valid for later
    chunks (the escape byte covers anything unseen; only the ratio can
    drift).  The cache is consulted AND populated.

    ``min_fsst_gain`` is the selection hysteresis: FSST wins only when
    its total beats plain+codec by this factor.  It was 0.9 when
    encode ran at ~20 MB/s (the decode/encode tax needed a real ratio
    win to pay off); with the C greedy kernel at ~600 MB/s a 2%
    size win is already worth taking.

    ``bloom_filters`` ({column: fpp or True}): append a split-block
    bloom filter (codecs/bloom.py, the same parquet-spec structure)
    per listed string/int column and record its span in the footer —
    the container's point-lookup pruning path, consulted by the
    FpscReader's file-level pushdown for ==/in predicates that min/max
    stats cannot discriminate.

    ``codec_decisions`` ({column: 'fsst' | 'plain'}): pre-made string
    codec choices (from :func:`decide_string_codecs` on a driver-side
    sample) — the named column runs ONLY the winning path instead of
    the full dual trial (plain+compress AND fsst-encode+compress of the
    whole column), which was the dominant kernel cost of the container
    throughput path (r4 verdict #9: container kernel_secs 9.72 vs
    parquet 2.59 on identical input).  Undecided columns keep the
    measured dual trial."""
    own = isinstance(sink, str)
    f = open(sink, "wb") if own else sink
    codec = comp.codec_id(compression)
    try:
        f.write(MAGIC)
        pos = 4
        cols_meta = []
        blocks: list[ColumnBlock] = []
        blooms = {k: (0.01 if v is True else float(v))
                  for k, v in (bloom_filters or {}).items()}
        bloom_inputs: dict[str, tuple] = {}  # name -> (values, ptype)
        for field in table.schema:
            arr = table.column(field.name).combine_chunks()
            # fail fast: anything the read path can't restore is rejected at
            # write time instead of producing an unreadable container
            _type_from_name(_arrow_type_name(field.type))
            if pa.types.is_list(field.type) and (
                    pa.types.is_list(field.type.value_type)
                    or pa.types.is_struct(field.type.value_type)
                    or pa.types.is_map(field.type.value_type)):
                raise ValueError(
                    f"unsupported container type {field.type}: lists of "
                    f"primitives only")
            n = len(arr)
            null_count = arr.null_count
            validity_b = b""
            if null_count:
                validity = arr.is_valid().to_numpy(zero_copy_only=False).astype(np.uint8)
                validity_b = encode_hybrid(validity, 1, prepend_length=True)
                arr_nn = arr.drop_null()
            else:
                arr_nn = arr
            if pa.types.is_list(field.type):
                # composite LIST block: row validity + delta-coded list
                # lengths + child validity + plain+codec child values
                col_bytes, meta_extra, raw_bytes = _write_list_block(
                    arr_nn, validity_b, codec)
                f.write(col_bytes)
                cols_meta.append({"name": field.name, "codec": "list",
                                  "arrow_type": _arrow_type_name(field.type),
                                  "ptype": _map_type(field.type.value_type)[0],
                                  "n": n, "null_count": null_count,
                                  "offset": pos, "size": len(col_bytes),
                                  "block_codec": codec, **meta_extra})
                blocks.append(ColumnBlock(field.name, "list",
                                          _arrow_type_name(field.type), n,
                                          null_count, raw_bytes,
                                          len(col_bytes)))
                pos += len(col_bytes)
                continue
            ptype, _, cast_to = _map_type(field.type)
            if (cast_to is not None and arr_nn.type != cast_to
                    and ptype != Type.BYTE_ARRAY
                    and not pa.types.is_timestamp(arr_nn.type)):
                # timestamps keep their native unit (int64 either way);
                # parquet's cast-to-µs would truncate ns and is not needed here
                arr_nn = arr_nn.cast(cast_to)

            parts: list[bytes] = [validity_b]
            if ptype == Type.BYTE_ARRAY:
                lengths, data = _binary_parts(arr_nn)
                if field.name in blooms:
                    bloom_inputs[field.name] = ((lengths, data), ptype)
                raw_bytes = int(lengths.sum()) + 8 * len(lengths)
                # candidates: plain+block codec vs FSST (optionally +block
                # codec on the symbol stream) — pick the smallest, per the
                # auto-selection mandate; a pre-made decision skips the
                # losing path's full-column encode+compress entirely
                decision = (codec_decisions or {}).get(field.name)
                if decision != "fsst":
                    raw_plain = encode_plain((lengths, data), ptype)
                    body_plain = comp.compress(raw_plain, codec)
                if decision != "plain":
                    if fsst_cache is not None and field.name in fsst_cache:
                        ftab = fsst_cache[field.name]
                    else:
                        ftab = fsst_train(data)
                        if fsst_cache is not None:
                            fsst_cache[field.name] = ftab
                    blob = fsst_encode(data, ftab)
                    blob_z = comp.compress(blob, codec)
                    blob_codec, blob_stored = (codec, blob_z) \
                        if len(blob_z) < len(blob) else (0, blob)
                    tab_b = ftab.serialize()
                    lens_b = delta_encode(lengths)
                    fsst_total = len(tab_b) + len(lens_b) \
                        + len(blob_stored) + 28
                if decision == "fsst" or (
                        decision is None
                        and fsst_total < len(body_plain) * min_fsst_gain):
                    codec_name = "fsst"
                    parts += [len(tab_b).to_bytes(4, "little"), tab_b,
                              len(lens_b).to_bytes(4, "little"), lens_b,
                              len(blob).to_bytes(8, "little"),      # fsst stream len
                              len(blob_stored).to_bytes(8, "little"),
                              blob_codec.to_bytes(4, "little"), blob_stored]
                else:
                    codec_name = "plain"
                    parts += [len(raw_plain).to_bytes(8, "little"),
                              len(body_plain).to_bytes(8, "little"), body_plain]
            else:
                if pa.types.is_timestamp(arr_nn.type):
                    arr_nn = arr_nn.cast(pa.int64())
                elif pa.types.is_date32(arr_nn.type):
                    arr_nn = arr_nn.cast(pa.int32())
                vals = arr_nn.to_numpy(zero_copy_only=False)
                if field.name in blooms and ptype in (Type.INT32, Type.INT64):
                    bloom_inputs[field.name] = (vals, ptype)
                if vals.dtype == np.uint32:
                    vals = vals.view(np.int32)  # bit-reinterpret, like parquet
                elif vals.dtype == np.uint64:
                    vals = vals.view(np.int64)
                raw_bytes = vals.nbytes
                # stats only where they are consulted: the sampling
                # pass (unique sort + run probe) was paid for float/
                # bool columns whose result was discarded
                if ptype in (Type.INT32, Type.INT64):
                    st = column_stats(vals, ptype)
                    use_delta = (st.sorted_frac > 0.95
                                 or st.delta_bits < st.plain_bits * 0.6)
                else:
                    use_delta = False
                if use_delta:
                    codec_name = "delta"
                    raw = delta_encode(vals, bit_width=32 if ptype == Type.INT32 else 64)
                else:
                    codec_name = "plain"
                    raw = encode_plain(vals, ptype)
                body = comp.compress(raw, codec)
                parts += [len(raw).to_bytes(8, "little"),
                          len(body).to_bytes(8, "little"), body]

            col_bytes = b"".join(parts)
            f.write(col_bytes)
            cols_meta.append({"name": field.name, "codec": codec_name,
                              "arrow_type": _arrow_type_name(field.type),
                              "ptype": ptype, "n": n, "null_count": null_count,
                              "offset": pos, "size": len(col_bytes),
                              "block_codec": codec,
                              **_column_stats_meta(arr_nn, ptype)})
            blocks.append(ColumnBlock(field.name, codec_name,
                                      _arrow_type_name(field.type), n,
                                      null_count, raw_bytes, len(col_bytes)))
            pos += len(col_bytes)
        if bloom_inputs:
            from fastparquet_spark.codecs.bloom import (
                SplitBlockBloom, hash_values,
            )

            by_name = {m["name"]: m for m in cols_meta}
            for name, (values, bptype) in bloom_inputs.items():
                h = hash_values(values, bptype)
                bf = SplitBlockBloom(SplitBlockBloom.optimal_bytes(
                    len(np.unique(h)), blooms[name]))
                bf.insert(h)
                raw = bf.tobytes()
                f.write(raw)
                by_name[name]["bloom_offset"] = pos
                by_name[name]["bloom_bytes"] = len(raw)
                pos += len(raw)
        footer = json.dumps({"columns": cols_meta, "nrows": table.num_rows}).encode()
        f.write(footer)
        f.write(len(footer).to_bytes(4, "little"))
        f.write(MAGIC)
        return blocks
    finally:
        if own:
            f.close()


def _write_list_block(arr_nn: pa.Array, validity_b: bytes,
                      codec: int) -> tuple[bytes, dict, int]:
    """Serialize the sections of a LIST column (non-null rows already
    selected): <row validity> <u4 + delta lengths> <u1 child-nulls
    flag [+ child validity]> <u8 raw + u8 comp + plain child values>."""
    import pyarrow.compute as pc

    from fastparquet_spark.codecs.delta import delta_encode
    from fastparquet_spark.codecs.plain import encode_plain
    from fastparquet_spark.format.writer import _extract

    offs = np.frombuffer(arr_nn.buffers()[1], dtype=np.int32,
                         count=len(arr_nn) + 1,
                         offset=arr_nn.offset * 4).astype(np.int64)
    lengths = np.diff(offs)
    lens_b = delta_encode(lengths)
    flat = pc.list_flatten(arr_nn)
    child_nulls = flat.null_count
    parts = [validity_b, len(lens_b).to_bytes(4, "little"), lens_b,
             bytes([1 if child_nulls else 0])]
    if child_nulls:
        cval = flat.is_valid().to_numpy(zero_copy_only=False).astype(np.uint8)
        parts.append(encode_hybrid(cval, 1, prepend_length=True))
        flat_nn = flat.drop_null()
    else:
        flat_nn = flat
    eptype, _, ecast = _map_type(flat_nn.type)
    if ecast is not None and flat_nn.type != ecast \
            and not pa.types.is_timestamp(flat_nn.type):
        # same exemption as the top-level path: timestamps keep their
        # NATIVE unit (int64 either way) — the parquet-style cast to µs
        # re-labeled list<timestamp[ms|ns]> values 1000x off on read
        #
        flat_nn = flat_nn.cast(ecast)
    raw = encode_plain(_extract(flat_nn, eptype), eptype)
    body = comp.compress(raw, codec)
    parts += [len(raw).to_bytes(8, "little"),
              len(body).to_bytes(8, "little"), body]
    return b"".join(parts), {"child_n": len(flat),
                             "child_null_count": child_nulls}, \
        int(lengths.sum()) * 8 + len(lengths) * 8


def _column_stats_meta(arr_nn: pa.Array, ptype: int) -> dict:
    """JSON-safe min/max for the footer (file-level pruning).  Omitted
    for NaN-containing floats (NaN ordering poisons pruning) and for
    strings longer than 64 chars (never truncated-and-kept)."""
    try:
        if len(arr_nn) == 0 or pa.types.is_boolean(arr_nn.type):
            return {}
        import pyarrow.compute as pc

        if pa.types.is_floating(arr_nn.type):
            if pc.any(pc.is_nan(arr_nn)).as_py():
                return {}
        mm = pc.min_max(arr_nn)
        lo, hi = mm["min"].as_py(), mm["max"].as_py()
        if isinstance(lo, str):
            if len(lo) > 64 or len(hi) > 64:
                return {}
        elif isinstance(lo, bytes):
            return {}
        elif not isinstance(lo, (int, float)):
            # timestamps/dates: store epoch ints for JSON
            mm = pc.min_max(arr_nn.cast(
                pa.int64() if arr_nn.type.bit_width == 64 else pa.int32()))
            lo, hi = mm["min"].as_py(), mm["max"].as_py()
        return {"min": lo, "max": hi}
    except (pa.ArrowInvalid, pa.ArrowNotImplementedError, TypeError):
        return {}


def read_container_footer(source, fs=None) -> dict:
    """Footer-only read of an FPSC container (tail fetch, no data)."""
    if isinstance(source, (bytes, bytearray)):
        buf = bytes(source)
        if len(buf) < 8 or buf[-4:] != MAGIC:
            raise ValueError("not an FPSC container (missing magic)")
        flen = int.from_bytes(buf[-8:-4], "little")
        if flen > len(buf) - 8:
            raise ValueError("not an FPSC container (bad footer length)")
        return json.loads(buf[len(buf) - 8 - flen:len(buf) - 8])
    from fastparquet_spark.io import get_fs

    fs = get_fs(source, fs)
    size = fs.size(source)
    with fs.open_read(source) as f:
        f.seek(size - 8)
        tail = f.read(8)
        if tail[4:] != MAGIC:
            raise ValueError(f"{source}: not an FPSC container")
        flen = int.from_bytes(tail[:4], "little")
        f.seek(size - 8 - flen)
        return json.loads(f.read(flen))


def read_container(source, fs=None, columns=None) -> pa.Table:
    """Decode an FPSC container (path/URI/bytes) into an Arrow table.

    ``columns``: optional projection — the footer's per-column
    (offset, size) makes this a RANGED read: only the requested
    columns' byte spans are fetched and inflated (plus the footer
    tail), never the whole container.  At scale this is the same
    contract as parquet column chunks."""
    if columns is not None and isinstance(source, str):
        from fastparquet_spark.io import get_fs

        fs_ = get_fs(source, fs)
        meta = read_container_footer(source, fs=fs_)
        wanted = [cm for cm in meta["columns"] if cm["name"] in set(columns)]
        missing = set(columns) - {cm["name"] for cm in wanted}
        if missing:
            raise KeyError(f"columns not in container: {sorted(missing)}")
        arrays = {}
        with fs_.open_read(source) as f:
            for cm in wanted:
                f.seek(cm["offset"])
                colbuf = f.read(cm["size"])
                arrays[cm["name"]] = _decode_column(colbuf, cm, 0)
        # keep the caller's projection order
        return pa.table({c: arrays[c] for c in columns})
    if isinstance(source, str):
        from fastparquet_spark.io import get_fs

        with get_fs(source, fs).open_read(source) as f:
            buf = f.read()
    else:
        buf = bytes(source)
    if buf[:4] != MAGIC or buf[-4:] != MAGIC:
        raise ValueError("not an FPSC container")
    flen = int.from_bytes(buf[-8:-4], "little")
    meta = json.loads(buf[len(buf) - 8 - flen:len(buf) - 8])
    cols = meta["columns"]
    if columns is not None:
        by_name = {cm["name"]: cm for cm in cols}
        missing = set(columns) - set(by_name)
        if missing:
            raise KeyError(f"columns not in container: {sorted(missing)}")
        cols = [by_name[c] for c in columns]
    arrays = {}
    for cm in cols:
        arrays[cm["name"]] = _decode_column(buf, cm, cm["offset"])
    return pa.table(arrays)


def _decode_column(buf, cm: dict, pos: int) -> pa.Array:
    """Inflate one column from ``buf`` starting at ``pos`` (0 when
    ``buf`` is the column's ranged slice, the footer offset when it is
    the whole container)."""
    n = cm["n"]
    ptype = cm["ptype"]
    null_count = cm["null_count"]
    bcodec = cm["block_codec"]
    validity = np.ones(n, dtype=bool)
    if null_count:
        levels, pos = decode_hybrid(buf, 1, n, offset=pos)
        validity = levels.astype(bool)
    n_nn = int(validity.sum())
    if cm["codec"] == "list":
        return _decode_list_column(buf, cm, pos, validity, n_nn)
    if cm["codec"] == "fsst":
        tlen = int.from_bytes(buf[pos:pos + 4], "little"); pos += 4
        ftab, _ = FsstTable.deserialize(buf, pos); pos += tlen
        llen = int.from_bytes(buf[pos:pos + 4], "little"); pos += 4
        lengths, _ = delta_decode(buf[pos:pos + llen], count=n_nn); pos += llen
        blen = int.from_bytes(buf[pos:pos + 8], "little"); pos += 8
        slen = int.from_bytes(buf[pos:pos + 8], "little"); pos += 8
        bcodec2 = int.from_bytes(buf[pos:pos + 4], "little"); pos += 4
        stream = comp.decompress(buf[pos:pos + slen], bcodec2, blen) \
            if bcodec2 else buf[pos:pos + slen]
        data = fsst_decode(np.frombuffer(stream, np.uint8, count=blen), ftab)
        vals = (lengths, data)
    else:
        rawlen = int.from_bytes(buf[pos:pos + 8], "little"); pos += 8
        blen = int.from_bytes(buf[pos:pos + 8], "little"); pos += 8
        body = comp.decompress(buf[pos:pos + blen], bcodec, rawlen)
        if cm["codec"] == "delta":
            vals, _ = delta_decode(body, count=n_nn,
                                   bit_width=32 if ptype == Type.INT32 else 64)
        else:
            vals, _ = decode_plain(body, ptype, n_nn)
    return _assemble(validity, vals, cm)


def _decode_list_column(buf, cm: dict, pos: int, validity: np.ndarray,
                        n_nn: int) -> pa.Array:
    """Inflate a composite LIST block back to an arrow ListArray."""
    list_type = _type_from_name(cm["arrow_type"])
    n = cm["n"]
    lenlens = int.from_bytes(buf[pos:pos + 4], "little"); pos += 4
    lengths, _ = delta_decode(buf[pos:pos + lenlens], count=n_nn); pos += lenlens
    has_child_nulls = buf[pos]; pos += 1
    child_n = cm["child_n"]
    cvalidity = np.ones(child_n, dtype=bool)
    if has_child_nulls:
        levels, pos = decode_hybrid(buf, 1, child_n, offset=pos)
        cvalidity = levels.astype(bool)
    rawlen = int.from_bytes(buf[pos:pos + 8], "little"); pos += 8
    blen = int.from_bytes(buf[pos:pos + 8], "little"); pos += 8
    body = comp.decompress(buf[pos:pos + blen], cm["block_codec"], rawlen)
    vals, _ = decode_plain(body, cm["ptype"], int(cvalidity.sum()))
    child = _assemble(cvalidity, vals, {
        "ptype": cm["ptype"],
        "arrow_type": _arrow_type_name(list_type.value_type)})
    full_lens = np.zeros(n, dtype=np.int64)
    full_lens[validity] = lengths
    offsets = np.concatenate(([0], np.cumsum(full_lens))).astype(np.int32)
    nulls = not validity.all()
    vbuf = pa.py_buffer(np.packbits(validity, bitorder="little").tobytes()) \
        if nulls else None
    return pa.Array.from_buffers(
        list_type, n, [vbuf, pa.py_buffer(offsets.tobytes())],
        null_count=int((~validity).sum()) if nulls else 0,
        children=[child])


def _assemble(validity: np.ndarray, vals, cm: dict) -> pa.Array:
    at = _type_from_name(cm["arrow_type"])
    n = len(validity)
    nulls = not validity.all()
    vbuf = pa.py_buffer(np.packbits(validity, bitorder="little").tobytes()) if nulls else None
    nc = int((~validity).sum()) if nulls else 0
    if cm["ptype"] == Type.BYTE_ARRAY:
        lengths, data = vals
        full = np.zeros(n, dtype=np.int64)
        full[validity] = lengths
        offs64 = np.concatenate(([0], np.cumsum(full)))
        text = at in (pa.string(), pa.large_string())
        if int(offs64[-1]) >= 2**31:  # int32 offsets would wrap
            storage = pa.large_utf8() if text else pa.large_binary()
            offsets = offs64
        else:
            storage = pa.utf8() if text else pa.binary()
            offsets = offs64.astype(np.int32)
        return pa.Array.from_buffers(storage, n,
                                     [vbuf, pa.py_buffer(offsets.tobytes()),
                                      pa.py_buffer(np.ascontiguousarray(data).tobytes())],
                                     null_count=nc).cast(at)
    if at == pa.bool_():
        full = np.zeros(n, dtype=np.bool_)
        full[validity] = np.asarray(vals, dtype=np.bool_)
        dbuf = pa.py_buffer(np.packbits(full, bitorder="little").tobytes())
        return pa.Array.from_buffers(at, n, [vbuf, dbuf], null_count=nc)
    np_dt = {pa.int8(): np.int8, pa.int16(): np.int16, pa.int32(): np.int32,
             pa.int64(): np.int64, pa.float32(): np.float32,
             pa.float64(): np.float64,
             pa.uint8(): np.uint8, pa.uint16(): np.uint16,
             pa.uint32(): np.uint32, pa.uint64(): np.uint64}.get(at, np.int64)
    if pa.types.is_timestamp(at):
        np_dt = np.int64
    elif at == pa.date32():
        np_dt = np.int32
    full = np.zeros(n, dtype=np_dt)
    if vals is not None:
        full[validity] = np.asarray(vals).astype(np_dt, copy=False)
    return pa.Array.from_buffers(at, n, [vbuf, pa.py_buffer(full.tobytes())],
                                 null_count=nc)


def container_bloom_rules_out(path: str, meta: dict, clauses,
                              fs=None) -> bool:
    """True iff a container bloom filter PROVES some ==/in clause term
    cannot match any row of ``path`` (definite negative only).  The
    bloom span is fetched with one ranged read; columns without a bloom
    or non-point operators never rule anything out."""
    from fastparquet_spark.codecs.bloom import SplitBlockBloom, xxh64
    from fastparquet_spark.io import get_fs

    by_name = {cm["name"]: cm for cm in meta["columns"]}
    wanted: dict[str, list] = {}
    for col, op, val in clauses:
        cm = by_name.get(col)
        if cm is None or "bloom_offset" not in cm:
            continue
        if op in ("==", "="):
            wanted.setdefault(col, []).append(val)
        elif op == "in":
            vs = wanted.setdefault(col, [])
            vs.extend(val)
    if not wanted:
        return False
    fs = get_fs(path, fs)
    with fs.open_read(path) as f:
        for col, vals in wanted.items():
            cm = by_name[col]
            f.seek(cm["bloom_offset"])
            bf = SplitBlockBloom.frombytes(f.read(cm["bloom_bytes"]))
            # probe encoding shared with the parquet path: UINT columns
            # hash the unsigned byte layout (the writer bit-reinterprets
            # before hashing), and an out-of-range value means "cannot
            # rule out", never an OverflowError crash
            from fastparquet_spark.format.dataset import _bloom_value_bytes
            from fastparquet_spark.format.metadata import ConvertedType

            unsigned = str(cm.get("arrow_type", "")).startswith("uint")
            elem = {"type": cm["ptype"],
                    "converted_type": (ConvertedType.UINT_32
                                       if cm["ptype"] == Type.INT32
                                       else ConvertedType.UINT_64)
                    if unsigned else None}
            hashes = []
            for v in vals:
                b = _bloom_value_bytes(v, elem)
                if b is None:
                    hashes = None
                    break
                hashes.append(xxh64(b, 0))
            if hashes is None:
                continue
            got = bf.might_contain(np.array(hashes, dtype=np.uint64))
            if not got.any():
                return True  # 'in' semantics: no sought value present
    return False
