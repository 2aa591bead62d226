"""Thrift compact-protocol writer/reader for Parquet metadata.

Hand-rolled like the reference's ``write_thrift``/``read_thrift``
(fastparquet/cencoding.pyx:468-591), but driven by declarative struct
specs (field-id/name/type tables) instead of per-struct code.

Compact protocol essentials: field header ``(delta<<4)|ctype`` (or long
form ``ctype + zigzag(fid)`` when delta > 15); ints are zigzag varints;
binary is ``varint len + bytes``; list header ``(size<<4)|etype`` (or
``0xF0|etype + varint size``); struct ends with 0x00.
"""

from __future__ import annotations

from fastparquet_spark.codecs.varint import (
    uvarint_decode,
    uvarint_encode,
    zigzag_decode,
    zigzag_encode,
)

# compact type ids
CT_STOP, CT_TRUE, CT_FALSE, CT_BYTE, CT_I16, CT_I32, CT_I64 = 0, 1, 2, 3, 4, 5, 6
CT_DOUBLE, CT_BINARY, CT_LIST, CT_SET, CT_MAP, CT_STRUCT = 7, 8, 9, 10, 11, 12

_SCALAR_CT = {"i16": CT_I16, "i32": CT_I32, "i64": CT_I64, "bin": CT_BINARY,
              "str": CT_BINARY, "bool": CT_TRUE}


def _type_ct(ftype) -> int:
    if isinstance(ftype, tuple):
        return CT_LIST if ftype[0] == "list" else CT_STRUCT
    return _SCALAR_CT[ftype]


def _encode_value(ftype, value, specs) -> bytes:
    if isinstance(ftype, tuple):
        kind, inner = ftype
        if kind == "struct":
            return write_struct(inner, value, specs)
        # list
        etype = _type_ct(inner)
        n = len(value)
        head = bytes([(n << 4) | etype]) if n < 15 else bytes([0xF0 | etype]) + uvarint_encode(n)
        return head + b"".join(_encode_value(inner, v, specs) for v in value)
    if ftype in ("i16", "i32", "i64"):
        return uvarint_encode(int(zigzag_encode(int(value))))
    if ftype in ("bin", "str"):
        if isinstance(value, str):
            value = value.encode("utf8")
        return uvarint_encode(len(value)) + value
    if ftype == "bool":
        # bool as a LIST ELEMENT: one byte, 1=true / 2=false (compact
        # spec; as a struct field it lives in the field header instead)
        return bytes([CT_TRUE if value else CT_FALSE])
    raise ValueError(f"unsupported thrift type {ftype}")


def write_struct(name: str, obj: dict, specs: dict) -> bytes:
    """Serialize ``obj`` per ``specs[name]`` = list of (fid, fname, ftype)."""
    out = bytearray()
    last_fid = 0
    for fid, fname, ftype in specs[name]:
        value = obj.get(fname)
        if value is None:
            continue
        if ftype == "bool":
            ct = CT_TRUE if value else CT_FALSE
        else:
            ct = _type_ct(ftype)
        delta = fid - last_fid
        if 0 < delta <= 15:
            out.append((delta << 4) | ct)
        else:
            out.append(ct)
            out += uvarint_encode(int(zigzag_encode(fid)))
        if ftype != "bool":
            out += _encode_value(ftype, value, specs)
        last_fid = fid
    out.append(CT_STOP)
    return bytes(out)


def _skip(buf, pos, ct):
    if ct in (CT_TRUE, CT_FALSE):
        return pos
    if ct == CT_BYTE:
        return pos + 1
    if ct in (CT_I16, CT_I32, CT_I64):
        return uvarint_decode(buf, pos)[1]
    if ct == CT_DOUBLE:
        return pos + 8
    if ct == CT_BINARY:
        n, pos = uvarint_decode(buf, pos)
        return pos + n
    if ct == CT_LIST or ct == CT_SET:
        head = buf[pos]; pos += 1
        n, etype = head >> 4, head & 0x0F
        if n == 15:
            n, pos = uvarint_decode(buf, pos)
        if etype in (CT_TRUE, CT_FALSE):
            return pos + n  # bool list elements are one byte each
        for _ in range(n):
            pos = _skip(buf, pos, etype)
        return pos
    if ct == CT_STRUCT:
        while True:
            byte = buf[pos]; pos += 1
            if byte == CT_STOP:
                return pos
            fct = byte & 0x0F
            if (byte >> 4) == 0:
                _, pos = uvarint_decode(buf, pos)  # long-form fid
            pos = _skip(buf, pos, fct)
    raise ValueError(f"cannot skip compact type {ct}")


def _decode_value(ftype, buf, pos, specs):
    if isinstance(ftype, tuple):
        kind, inner = ftype
        if kind == "struct":
            return read_struct(inner, buf, pos, specs)
        head = buf[pos]; pos += 1
        n = head >> 4
        if n == 15:
            n, pos = uvarint_decode(buf, pos)
        out = []
        for _ in range(n):
            v, pos = _decode_value(inner, buf, pos, specs)
            out.append(v)
        return out, pos
    if ftype in ("i16", "i32", "i64"):
        u, pos = uvarint_decode(buf, pos)
        return int(zigzag_decode(u)), pos
    if ftype in ("bin", "str"):
        n, pos = uvarint_decode(buf, pos)
        raw = bytes(buf[pos:pos + n])
        return (raw.decode("utf8") if ftype == "str" else raw), pos + n
    if ftype == "bool":  # list element: 1 byte
        return buf[pos] == CT_TRUE, pos + 1
    raise ValueError(f"unsupported thrift type {ftype}")


def read_struct(name: str, buf, pos: int, specs: dict) -> tuple[dict, int]:
    """Parse one struct; unknown fields are skipped."""
    spec_by_fid = {fid: (fname, ftype) for fid, fname, ftype in specs[name]}
    obj: dict = {}
    last_fid = 0
    while True:
        byte = buf[pos]; pos += 1
        if byte == CT_STOP:
            return obj, pos
        ct = byte & 0x0F
        delta = byte >> 4
        if delta:
            fid = last_fid + delta
        else:
            zz, pos = uvarint_decode(buf, pos)
            fid = int(zigzag_decode(zz))
        last_fid = fid
        if fid in spec_by_fid:
            fname, ftype = spec_by_fid[fid]
            if ftype == "bool":
                obj[fname] = ct == CT_TRUE
            else:
                obj[fname], pos = _decode_value(ftype, buf, pos, specs)
        else:
            pos = _skip(buf, pos, ct)
