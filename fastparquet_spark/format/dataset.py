"""Dataset-level metadata operators over our encoded outputs.

Re-expresses the reference's metadata "query" surface
(fastparquet/api.py) against a directory of our part files:

- ``dataset_metadata``    — merged footer view, the `_metadata` /
                            ``merge`` analog (fastparquet/writer.py:1156-1193,
                            util.py:115-213): footers only, no data reads;
- ``dataset_statistics``  — per-column min/max/null_count across all row
                            groups (fastparquet/api.py:822-902);
- ``sorted_columns``      — columns whose row-group min/max chains are
                            globally non-overlapping in file order
                            (fastparquet/api.py:905-945);
- ``filter_row_groups``   — DNF stats pruning ``[[(col,op,val),...],...]``
                            (fastparquet/api.py:948-999, filter_out_stats
                            :761-819, ops util.py:411-419);
- ``filtered_read``       — Spark scan of only the surviving files, with
                            the residual predicate applied (so results
                            are exact, pruning is just I/O savings — the
                            same contract as the reference's
                            ``to_pandas(filters=...)``).

At cluster scale this driver-side footer pass is exactly what an
Iceberg manifest scan does; part files are listed once and only tails
are read.
"""

from __future__ import annotations

import os
import struct
from typing import Any

from fastparquet_spark.format.metadata import ConvertedType, Type
from fastparquet_spark.format.reader import read_footer, read_footer_tail
from fastparquet_spark.io import fetch_footers, get_fs

OPS = ("==", "=", "!=", "<", "<=", ">", ">=", "in", "not in",
       "is_null", "is_not_null")


def _decode_stat(raw: bytes | None, ptype: int, conv: int | None,
                 scale: int = 0):
    if raw is None:
        return None
    if ptype == Type.INT32:
        # UINT_32 stats are stored as reinterpreted bits in UNSIGNED order
        fmt = "<I" if conv == ConvertedType.UINT_32 else "<i"
        v = struct.unpack(fmt, raw)[0]
        if conv == ConvertedType.DECIMAL:
            # LOGICAL value space, exactly (unscaled/10^scale as
            # Decimal): filter values are logical, and comparing them
            # against raw unscaled ints mis-prunes
            import decimal
            return decimal.Decimal(v).scaleb(-scale)
        return v
    if ptype == Type.INT64:
        fmt = "<Q" if conv == ConvertedType.UINT_64 else "<q"
        v = struct.unpack(fmt, raw)[0]
        if conv == ConvertedType.DECIMAL:
            import decimal
            return decimal.Decimal(v).scaleb(-scale)
        if conv == ConvertedType.TIMESTAMP_MICROS:
            return v  # compare in raw micros
        return v
    if ptype == Type.FLOAT:
        return struct.unpack("<f", raw)[0]
    if ptype == Type.DOUBLE:
        return struct.unpack("<d", raw)[0]
    if ptype == Type.BOOLEAN:
        return raw != b"\x00"
    if ptype == Type.BYTE_ARRAY:
        try:
            return raw.decode("utf8")
        except UnicodeDecodeError:
            return raw
    return None


def _coerce_partition_value(raw: str) -> Any:
    """int -> float -> bool -> str, the reference's ``val_to_num``
    semantics (fastparquet/util.py:59-95; timestamps out of scope)."""
    for conv in (int, float):
        try:
            return conv(raw)
        except ValueError:
            pass
    if raw == "True":
        return True
    if raw == "False":
        return False
    return raw


def detect_scheme(rel_paths: list[str]) -> str:
    """Partition scheme of a dataset's relative file paths — the
    reference's ``get_file_scheme``/``paths_to_cats`` detection
    (fastparquet/util.py:356-388, api.py:700-758):

    - ``flat``: every file directly in the root;
    - ``hive``: equal-depth dirs, every segment ``key=value``;
    - ``drill``: equal-depth dirs whose names are bare labels — they
      become columns ``dir0..dirN``;
    - ``other``: unequal depths; no partition columns are inferred."""
    dirs = [p.rsplit("/", 1)[0] if "/" in p else "" for p in rel_paths]
    if all(d == "" for d in dirs):
        return "flat"
    parts = [d.split("/") for d in dirs if d]
    if any(d == "" for d in dirs) or len({len(p) for p in parts}) > 1:
        return "other"
    if all("=" in seg for p in parts for seg in p):
        return "hive"
    return "drill"


def _partition_values(rel_path: str, scheme: str = "hive") -> dict[str, Any]:
    """Parse one file's partition path segments into {col: value}
    (the reference's partition parsing, fastparquet/api.py:700-758).
    Hive values are URL-unescaped; both schemes coerce via
    :func:`_coerce_partition_value`."""
    from urllib.parse import unquote

    out: dict[str, Any] = {}
    segs = rel_path.split("/")[:-1]
    if scheme == "drill":
        for i, seg in enumerate(segs):
            out[f"dir{i}"] = _coerce_partition_value(seg)
        return out
    for seg in segs:
        if "=" not in seg:
            continue
        k, _, raw = seg.partition("=")
        if raw == "__HIVE_DEFAULT_PARTITION__":
            out[k] = None
            continue
        out[k] = _coerce_partition_value(unquote(raw))
    return out



def _leaf_elems(schema: list) -> dict:
    """Leaf schema elements keyed by FULL dotted path — bare-name keying
    mis-decodes stats when leaf names collide across nesting levels
    (two lists' 'element' leaves, a struct field shadowing a top-level
    column): the wrong type crashes struct.unpack or silently decodes
    garbage bounds that mis-prune."""
    out: dict[str, dict] = {}
    pos = 1

    def walk(prefix: str, count: int) -> None:
        nonlocal pos
        for _ in range(count):
            e = schema[pos]
            pos += 1
            name = f"{prefix}.{e['name']}" if prefix else e["name"]
            nc = e.get("num_children")
            if nc:
                walk(name, nc)
            else:
                out[name] = e
    walk("", schema[0].get("num_children") or 0)
    return out


def dataset_metadata(out_dir: str, fs=None, use_sidecar: bool = True) -> list[dict]:
    """Footer of every part file: [{file, fmd, partitions}] in
    deterministic order.  Footers are TAIL reads fetched concurrently
    (io.read_tail_footer / io.fetch_footers) — page data is never
    touched, so this stays a metadata pass at any dataset size.  Files
    under hive ``key=value`` directories carry their partition values.

    When a ``_metadata`` sidecar exists (written by
    :func:`write_metadata_sidecar` / ``append_dataset``), the whole
    dataset's metadata comes from that ONE fetch — no listing, no
    per-file footer reads (the reference's merged-footer trick,
    fastparquet/writer.py:1156-1193 / util.py:115-213).  Writers that
    add files must refresh the sidecar (append_dataset does)."""
    fs = get_fs(out_dir, fs)
    if any(c in out_dir for c in "*?["):
        # glob input (the reference's ParquetFile(glob), api.py:95-162);
        # the dataset root is ambiguous here, so only hive key=value
        # segments (position-independent) are parsed — drill columns
        # need relative depths, i.e. a directory root
        files = sorted(p for p in fs.glob(out_dir)
                       if p.endswith(".parquet")
                       and not os.path.basename(p).startswith(("_", "."))
                       and not fs.isdir(p))
        tails = fetch_footers(files, fs)
        # partition segments are parsed RELATIVE to the glob's static
        # prefix — a key=value directory ABOVE the dataset root (e.g.
        # /data/run=3/out/*.parquet) must not become a phantom
        # partition column whose pseudo-stats mis-prune
        for w in "*?[":
            out_dir = out_dir.split(w)[0]
        static = out_dir.rsplit("/", 1)[0] if "/" in out_dir else ""
        return [{"file": os.path.basename(p), "fmd": read_footer_tail(t),
                 "partitions": _partition_values(
                     p[len(static) + 1:] if static and p.startswith(static)
                     else os.path.basename(p))}
                for p, t in zip(files, tails)]
    sidecar = _join(out_dir, "_metadata")
    if use_sidecar and fs.exists(sidecar):
        with fs.open_read(sidecar) as f:
            fmd = read_footer(f.read())
        by_file: dict[str, list] = {}
        for rg in fmd["row_groups"]:
            fp = rg["columns"][0].get("file_path") or ""
            by_file.setdefault(fp, []).append(rg)
        scheme = detect_scheme(sorted(by_file))
        out = []
        for rel in sorted(by_file):
            rgs = []
            for rg in by_file[rel]:
                rg2 = dict(rg)
                rg2["columns"] = [
                    {k: v for k, v in cc.items() if k != "file_path"}
                    for cc in rg["columns"]]
                rgs.append(rg2)
            sub = {"version": fmd.get("version", 1), "schema": fmd["schema"],
                   "num_rows": sum(r["num_rows"] for r in rgs),
                   "row_groups": rgs}
            out.append({"file": rel, "fmd": sub,
                        "partitions": _partition_values(rel, scheme)})
        return out
    prefix = out_dir.rstrip("/") + "/"

    def rel_of(p: str) -> str:
        return p[len(prefix):] if p.startswith(prefix) else os.path.basename(p)

    def is_data(rel: str) -> bool:
        segs = rel.split("/")
        return segs[-1].endswith(".parquet") and \
            not any(s.startswith(("_", ".")) for s in segs)

    files = [p for p in fs.walk_files(out_dir) if is_data(rel_of(p))]
    rels = [rel_of(p) for p in files]
    scheme = detect_scheme(rels)
    tails = fetch_footers(files, fs)
    return [{"file": rel, "fmd": read_footer_tail(t),
             "partitions": _partition_values(rel, scheme)}
            for rel, t in zip(rels, tails)]


def load_dataset_metas(path: str, fs=None) -> tuple[str, list[dict]]:
    """(root, metas) for a dataset directory OR an explicit glob — the
    ONE shared entry for scan planners (api.ParquetFile, paged_read,
    the fps data source), so glob semantics cannot drift between them.

    Glob mode trusts the user's pattern for file suffixes (the
    reference opens whatever the glob matches, e.g. ``*.parq``) but
    skips sidecar/hidden basenames and DIRECTORIES (a hive ``ds/*``
    glob matches ``lang=py/`` — passing it to a footer fetch would
    raise IsADirectoryError).  Glob metas are keyed RELATIVE to the
    matched files' common root, so hive ``key=value`` segments inside
    the glob still carry partition values; directory mode is exactly
    :func:`dataset_metadata` (sidecar-aware)."""
    from fastparquet_spark.io import common_root, relative_to

    fs = get_fs(path, fs)
    if any(c in path for c in "*?["):
        files = sorted(
            p for p in fs.glob(path)
            if not os.path.basename(p).startswith(("_", "."))
            and not fs.isdir(p))
        if not files:
            raise ValueError(f"no parquet files match {path!r}")
        base = common_root(files)
        tails = fetch_footers(files, fs)
        metas = [{"file": relative_to(p, base),
                  "fmd": read_footer_tail(t),
                  "partitions": _partition_values(relative_to(p, base))}
                 for p, t in zip(files, tails)]
        return base or ".", metas
    metas = dataset_metadata(path, fs=fs)
    if not metas:
        raise ValueError(f"no parquet files under {path!r}")
    return path.rstrip("/"), metas


def _join(out_dir: str, name: str) -> str:
    return out_dir.rstrip("/") + "/" + name


def schema_signature(fmd: dict) -> list[tuple]:
    """Comparable shape of a footer's leaf schema: (name, type, converted,
    type_length) per column — what append compatibility is judged on."""
    return [(e["name"], e.get("type"), e.get("converted_type"),
             e.get("type_length"))
            for e in fmd["schema"][1:] if e.get("num_children") is None]


def read_sidecar(out_dir: str, fs=None) -> dict | None:
    """The ``_metadata`` sidecar's FileMetaData, or None if absent."""
    fs = get_fs(out_dir, fs)
    sidecar = _join(out_dir, "_metadata")
    if not fs.exists(sidecar):
        return None
    with fs.open_read(sidecar) as f:
        return read_footer(f.read())


def write_metadata_sidecar(out_dir: str, fs=None, base: dict | None = None,
                           add_files: list[str] | None = None,
                           files: list[str] | None = None) -> int:
    """Merge part footers into a ``_metadata`` sidecar (the reference's
    ``merge``, fastparquet/writer.py:1156-1193): one FileMetaData whose
    row groups carry ``file_path`` relative to the dataset root.
    Atomic publish via temp + rename.  Returns the row groups merged.

    INCREMENTAL mode (``base`` = a previously-read sidecar FileMetaData
    + ``add_files`` = relative paths of the NEW part files): only the
    new files' footers are fetched and appended to ``base`` — an
    append touches O(new files), not O(dataset), unlike the
    reference's full re-merge.

    EXPLICIT mode (``files`` = relative paths): merge exactly those
    files, in that order — the reference's ``merge(file_list)``
    contract (writer.py:1156-1193), which must NOT sweep in other
    parquet files that happen to live under ``out_dir``."""
    from fastparquet_spark.format import thrift
    from fastparquet_spark.format.metadata import MAGIC, SPECS
    from fastparquet_spark.format.writer import CREATED_BY

    fs = get_fs(out_dir, fs)
    if base is not None and add_files is not None:
        schema = base["schema"]
        sig0 = schema_signature(base)
        rgs = list(base["row_groups"])
        num_rows = base["num_rows"]
        tails = fetch_footers([_join(out_dir, f) for f in add_files], fs)
        for rel, tail in zip(add_files, tails):
            sub = read_footer_tail(tail)
            if schema_signature(sub) != sig0:
                raise ValueError(
                    f"schema mismatch appending {rel} to existing sidecar")
            for rg in sub["row_groups"]:
                rg2 = dict(rg)
                rg2["columns"] = [dict(cc, file_path=rel)
                                  for cc in rg["columns"]]
                rgs.append(rg2)
                num_rows += rg["num_rows"]
    else:
        if files is not None:
            tails = fetch_footers([_join(out_dir, f) for f in files], fs)
            scheme = detect_scheme(list(files))
            metas = [{"file": rel, "fmd": read_footer_tail(t),
                      "partitions": _partition_values(rel, scheme)}
                     for rel, t in zip(files, tails)]
        else:
            metas = dataset_metadata(out_dir, fs=fs, use_sidecar=False)
        if not metas:
            raise ValueError(f"no part files under {out_dir}")
        schema = metas[0]["fmd"]["schema"]
        sig0 = schema_signature(metas[0]["fmd"])
        rgs, num_rows = [], 0
        for m in metas:
            if schema_signature(m["fmd"]) != sig0:
                raise ValueError(
                    f"schema mismatch across parts: {m['file']} != {metas[0]['file']}")
            for rg in m["fmd"]["row_groups"]:
                rg2 = dict(rg)
                rg2["columns"] = [dict(cc, file_path=m["file"])
                                  for cc in rg["columns"]]
                rgs.append(rg2)
                num_rows += rg["num_rows"]
    fmd = {"version": 1, "schema": schema, "num_rows": num_rows,
           "row_groups": rgs, "created_by": CREATED_BY}

    def _emit(payload: dict, name: str):
        body = thrift.write_struct("FileMetaData", payload, SPECS)
        tmp = _join(out_dir, f"{name}.inprogress")
        with fs.open_write(tmp) as f:
            f.write(MAGIC)
            f.write(body)
            f.write(len(body).to_bytes(4, "little"))
            f.write(MAGIC)
        fs.replace(tmp, _join(out_dir, name))

    _emit(fmd, "_metadata")
    # _common_metadata: schema-only twin (no row groups) — the cheap
    # open ecosystem tools (dask/pyarrow discovery) look for; the
    # reference writes both (fastparquet/writer.py:1045-1046,1108).
    # Appends keep it in sync for free: the schema cannot drift
    # (signature-checked above) and the file carries no row groups.
    _emit({"version": 1, "schema": schema, "num_rows": 0,
           "row_groups": [], "created_by": CREATED_BY},
          "_common_metadata")
    return len(rgs)


def _file_generation(rel_path: str) -> int:
    """Generation of a part file: ``part-gNNN-*`` -> N, first-write
    files (no g prefix) -> 0.  One append_dataset call == one
    generation == one Iceberg-snapshot analog (engine/encode_job.py
    module docstring maps the full correspondence)."""
    base = os.path.basename(rel_path)
    stem = base.split("-", 2)
    if len(stem) >= 2 and stem[1].startswith("g"):
        try:
            return int(stem[1][1:]) + 0
        except ValueError:
            return 0
    return 0


def dataset_snapshots(out_dir: str, fs=None) -> list[dict]:
    """Snapshot listing, one row per generation (Iceberg's snapshot
    log analog over the `part-g{N}` naming + `_manifests/` lineage):
    {generation, files, rows, bytes, cumulative_rows}.  Metadata-only
    — footers (or the single `_metadata` sidecar) are the source."""
    gens: dict[int, dict] = {}
    for m in dataset_metadata(out_dir, fs=fs):
        g = _file_generation(m["file"])
        slot = gens.setdefault(g, {"generation": g, "files": 0,
                                   "rows": 0, "bytes": 0})
        slot["files"] += 1
        slot["rows"] += m["fmd"]["num_rows"]
        slot["bytes"] += sum(rg["total_byte_size"]
                             for rg in m["fmd"]["row_groups"])
    out = [gens[g] for g in sorted(gens)]
    cum = 0
    for s in out:
        cum += s["rows"]
        s["cumulative_rows"] = cum
    return out


def read_snapshot(spark, out_dir: str, generation: int, fs=None):
    """Time travel: DataFrame over the dataset AS OF ``generation`` —
    every part file with generation <= the requested one (appends are
    the only mutation, so a snapshot is a prefix of the file set).
    Raises on an unknown generation so a typo can't silently read the
    full dataset."""
    metas = dataset_metadata(out_dir, fs=fs)
    gens = {_file_generation(m["file"]) for m in metas}
    if generation not in gens:
        raise ValueError(
            f"unknown generation {generation}; dataset has {sorted(gens)}")
    keep = [m["file"] for m in metas
            if _file_generation(m["file"]) <= generation]
    return (spark.read.option("basePath", out_dir)
            .parquet(*[out_dir.rstrip("/") + "/" + f for f in keep]))


def drop_generations(out_dir: str, keep_from: int, fs=None) -> dict:
    """Data RETENTION over append generations (a TTL drop, NOT Iceberg's
    expire_snapshots — in this append-only model every generation's
    files are referenced by all later snapshots, so removing them
    removes those ROWS from the table): delete every data file of
    generations BEFORE ``keep_from`` with their lineage manifests, then
    rewrite the ``_metadata`` sidecar over the survivors.  Time travel
    to a dropped generation raises; the dataset afterwards contains
    exactly generations >= keep_from.

    Refuses to drop the newest generation (that would empty the
    dataset).  Returns {"removed_files", "removed_rows",
    "kept_generations"}."""
    fs = get_fs(out_dir, fs)
    metas = dataset_metadata(out_dir, fs=fs, use_sidecar=False)
    if not metas:
        raise ValueError(f"no dataset under {out_dir}")
    gens = sorted({_file_generation(m["file"]) for m in metas})
    if keep_from > gens[-1]:
        raise ValueError(
            f"keep_from={keep_from} would delete every generation "
            f"(dataset has {gens})")
    doomed = [m for m in metas if _file_generation(m["file"]) < keep_from]
    removed_rows = sum(m["fmd"]["num_rows"] for m in doomed)
    for m in doomed:
        fs.remove(_join(out_dir, m["file"]))
    # manifests of removed generations (their part prefix matches the
    # data file's first two dash segments)
    man_dir = _join(out_dir, "_manifests")
    if fs.isdir(man_dir):
        dead_prefixes = {os.path.basename(m["file"]).rsplit(".", 1)[0]
                         for m in doomed}
        for p in fs.listdir(man_dir):
            base = os.path.basename(p)
            if base.endswith(".json") and base[:-5] in dead_prefixes:
                fs.remove(p)
    for name in ("_metadata", "_common_metadata"):
        sidecar = _join(out_dir, name)
        if fs.exists(sidecar):
            fs.remove(sidecar)
    if len(doomed) < len(metas):
        write_metadata_sidecar(out_dir, fs=fs)
    return {"removed_files": len(doomed), "removed_rows": removed_rows,
            "kept_generations": [g for g in gens if g >= keep_from]}


def _iter_chunks(metas):
    """Yield (file, rg_index, {col: (min,max,nulls,nvals)}) per row group.

    Hive partition values appear as pseudo-stats columns with
    min == max == value (and null_count == nvals for the default
    partition), so stats pruning covers them with no extra code path."""
    for m in metas:
        elems = _leaf_elems(m["fmd"]["schema"])
        for ri, rg in enumerate(m["fmd"]["row_groups"]):
            cols: dict[str, tuple] = {}
            for cc in rg["columns"]:
                cmd = cc["meta_data"]
                path = cmd["path_in_schema"]
                name = ".".join(path)
                elem = elems.get(name)
                if elem is None:
                    continue  # leaf the schema walk couldn't place
                st = cmd.get("statistics") or {}
                lo = _decode_stat(st.get("min_value") or st.get("min"),
                                  elem["type"], elem.get("converted_type"),
                                  elem.get("scale") or 0)
                hi = _decode_stat(st.get("max_value") or st.get("max"),
                                  elem["type"], elem.get("converted_type"),
                                  elem.get("scale") or 0)
                cols[name] = (lo, hi, st.get("null_count"), cmd["num_values"])
            for name, v in (m.get("partitions") or {}).items():
                nvals = rg["num_rows"]
                cols.setdefault(
                    name,
                    (v, v, nvals if v is None else 0, nvals))
            yield m["file"], ri, cols, rg["num_rows"]


def dataset_statistics(out_dir: str, fs=None) -> dict[str, dict[str, Any]]:
    """Global per-column stats across every row group of the dataset."""
    agg: dict[str, dict[str, Any]] = {}
    for _f, _ri, cols, _n in _iter_chunks(dataset_metadata(out_dir, fs=fs)):
        for name, (lo, hi, nulls, nvals) in cols.items():
            a = agg.setdefault(name, {"min": None, "max": None,
                                      "null_count": 0, "num_values": 0})
            # incomparable cross-chunk stat types (bytes vs str from a
            # mixed-validity BYTE_ARRAY decode, heterogeneous hive
            # spellings) must not crash the aggregate; keep the first
            try:
                if lo is not None and (a["min"] is None or lo < a["min"]):
                    a["min"] = lo
                if hi is not None and (a["max"] is None or hi > a["max"]):
                    a["max"] = hi
            except TypeError:
                pass
            if nulls is not None:
                a["null_count"] += nulls
            a["num_values"] += nvals
    return agg


def sorted_columns(out_dir: str, fs=None) -> list[str]:
    """Columns globally sorted across row groups in file order: every
    chunk's min >= previous chunk's max, no nulls, stats present."""
    last: dict[str, Any] = {}
    ok: dict[str, bool] = {}
    for _f, _ri, cols, _n in _iter_chunks(dataset_metadata(out_dir, fs=fs)):
        for name, (lo, hi, nulls, _nv) in cols.items():
            if name not in ok:
                ok[name] = True
            try:
                if lo is None or hi is None or (nulls or 0) > 0 \
                        or lo > hi:
                    ok[name] = False
                    continue
                if name in last and lo < last[name]:
                    ok[name] = False
            except TypeError:
                # incomparable stat types -> cannot prove sortedness
                ok[name] = False
                continue
            last[name] = hi
    return sorted(n for n, good in ok.items() if good)


def _chunk_may_match(cols, clause) -> bool:
    """Can any row in this chunk satisfy the AND-clause? (conservative)"""
    for col, op, val in clause:
        if col not in cols:
            continue
        lo, hi, nulls, nvals = cols[col]
        # null-count ops evaluate without min/max
        if op == "is_null" and nulls == 0:
            return False
        if op == "is_not_null" and nulls is not None and nulls == nvals:
            return False
        if op in ("is_null", "is_not_null"):
            continue
        if lo is None or hi is None:
            continue  # no stats -> cannot prune
        try:
            if op in ("==", "=") and not (lo <= val <= hi):
                return False
            if op == ">" and not (hi > val):
                return False
            if op == ">=" and not (hi >= val):
                return False
            if op == "<" and not (lo < val):
                return False
            if op == "<=" and not (lo <= val):
                return False
            if op == "in" and not any(lo <= v <= hi for v in val):
                return False
            if op == "!=" and lo == hi == val:
                return False
            if op == "not in" and lo == hi and lo in val:
                return False
        except TypeError:
            continue  # incomparable stat/filter types -> cannot prune
    return True


def read_page_index(path: str, fs=None,
                    fmd: dict | None = None) -> list[list[dict | None]]:
    """Parse the PageIndex of every column chunk of ``path`` (our own
    files and parquet-cpp/-java ones alike): per row group, per column,
    ``{"locations": [...], "null_pages": [...], "min_values": [...],
    "max_values": [...], "null_counts": [...]}`` or None when the chunk
    carries no index.  Pass ``fmd`` (an already-parsed footer) to skip
    the footer fetch — read_pages does, so a page-skipping read costs
    ONE footer round trip per file, not two."""
    from fastparquet_spark.format import thrift
    from fastparquet_spark.format.metadata import SPECS
    from fastparquet_spark.io import fetch_footers

    fs = get_fs(path, fs)
    if fmd is None:
        fmd = read_footer_tail(fetch_footers([path], fs)[0])
    # one ranged read covering all index spans (they sit together just
    # ahead of the footer in ours and parquet-cpp/-java files alike)
    spans = [(cc.get("column_index_offset"), cc.get("column_index_length"))
             for rg in fmd["row_groups"] for cc in rg["columns"]] + \
            [(cc.get("offset_index_offset"), cc.get("offset_index_length"))
             for rg in fmd["row_groups"] for cc in rg["columns"]]
    spans = [(o, ln) for o, ln in spans if o is not None]
    if not spans:
        return [[None for _ in rg["columns"]] for rg in fmd["row_groups"]]
    base = min(o for o, _ln in spans)
    end = max(o + (ln or 0) for o, ln in spans)
    with fs.open_read(path) as f:
        f.seek(base)
        blob = f.read(end - base)
    out = []
    for rg in fmd["row_groups"]:
        row = []
        for cc in rg["columns"]:
            cio, oio = cc.get("column_index_offset"), cc.get("offset_index_offset")
            if cio is None or oio is None:
                row.append(None)
                continue
            ci, _ = thrift.read_struct("ColumnIndex", blob, cio - base, SPECS)
            oi, _ = thrift.read_struct("OffsetIndex", blob, oio - base, SPECS)
            row.append({"locations": oi["page_locations"],
                        "null_pages": ci.get("null_pages"),
                        "min_values": ci.get("min_values"),
                        "max_values": ci.get("max_values"),
                        "null_counts": ci.get("null_counts")})
        out.append(row)
    return out


def filter_pages(path: str, filters, fs=None) -> list[tuple[int, int, int]]:
    """PAGE-level pruning from the ColumnIndex (the tier below
    filter_row_groups): returns surviving ``(row_group, first_row,
    n_rows)`` row ranges for a DNF filter — a flat AND-list
    ``[(col,op,val),...]`` or OR-of-ANDs ``[[...],[...]]`` (the
    reference's filter contract, fastparquet/api.py:948).  Metadata-only
    — footer + index spans, no data pages touched.  Chunks without an
    index keep all their pages (conservative)."""
    if filters and isinstance(filters[0], tuple):
        filters = [filters]
    if not filters:
        filters = [[]]  # match-all (None/[] must not crash or drop rows)
    fs = get_fs(path, fs)
    from fastparquet_spark.io import fetch_footers

    fmd = read_footer_tail(fetch_footers([path], fs)[0])
    idx = read_page_index(path, fs=fs, fmd=fmd)
    out = []
    for ri, rg in enumerate(fmd["row_groups"]):
        grid, keep_mask = _page_keep_mask_dnf(fmd, idx, ri, filters)
        if keep_mask is None:
            out.append((ri, 0, rg["num_rows"]))
            continue
        firsts = grid + [rg["num_rows"]]
        for pi, keep in enumerate(keep_mask):
            if keep:
                out.append((ri, firsts[pi], firsts[pi + 1] - firsts[pi]))
    return out


def _page_keep_mask_dnf(fmd: dict, idx, ri: int, clauses):
    """OR of per-clause page keep masks (DNF: a page survives if ANY
    AND-clause might match it); (None, None) — keep everything — when
    any clause is unprunable or the clauses' page grids disagree."""
    grid, combined = None, None
    for clause in clauses:
        g, m = _page_keep_mask(fmd, idx, ri, clause)
        if m is None:
            return None, None
        if grid is None:
            grid = g
        elif g != grid:
            return None, None
        combined = m if combined is None else \
            [a or b for a, b in zip(combined, m)]
    return grid, combined


def _page_keep_mask(fmd: dict, idx, ri: int, clause):
    """(page grid, keep mask) for one row group under an AND-clause, or
    (None, None) when no aligned ColumnIndex can discriminate.  Page
    boundaries per column differ only if page_rows differed; ours are
    uniform — the first indexed filter column fixes the grid."""
    elems = _leaf_elems(fmd["schema"])
    rg = fmd["row_groups"][ri]
    names = [".".join(cc["meta_data"]["path_in_schema"])
             for cc in rg["columns"]]
    keep_mask = None
    grid = None
    for col, op, val in clause:
        if col not in names:
            continue
        ci = idx[ri][names.index(col)]
        if ci is None or ci.get("min_values") is None:
            continue
        locs = ci["locations"]
        firsts = [loc["first_row_index"] for loc in locs]
        if grid is None:
            grid = firsts
        elif firsts != grid:
            continue  # unaligned page grids: skip this column
        elem = elems.get(col)
        mask = []
        for pi in range(len(locs)):
            if ci["null_pages"][pi]:
                mask.append(op == "is_null")
                continue
            if not ci["min_values"][pi] or not ci["max_values"][pi]:
                # a foreign writer may emit b"" bounds for a non-null
                # page (spec-invalid but seen in the wild); treat as
                # no-stats and keep the page rather than decode-crash or
                # silently prune a "" lower bound (ADVICE r4)
                mask.append(True)
                continue
            lo = _decode_stat(ci["min_values"][pi], elem["type"],
                              elem.get("converted_type"),
                              elem.get("scale") or 0)
            hi = _decode_stat(ci["max_values"][pi], elem["type"],
                              elem.get("converted_type"),
                              elem.get("scale") or 0)
            nulls = (ci.get("null_counts") or [None] * len(locs))[pi]
            cols = {col: (lo, hi, nulls, None)}
            mask.append(_chunk_may_match(cols, [(col, op, val)]))
        keep_mask = mask if keep_mask is None else \
            [a and b for a, b in zip(keep_mask, mask)]
    if keep_mask is None:
        return None, None
    return grid, keep_mask


def read_pages(path: str, filters, columns=None, fs=None,
               exact: bool = False, row_groups=None):
    """PAGE-SKIPPING read: decode only the pages a ColumnIndex cannot
    rule out for a DNF filter (AND-list or OR-of-ANDs, the reference's
    filter contract) — the reader-side completion of
    :func:`filter_pages` (which is metadata-only).  Returns a pyarrow
    Table of the SURVIVING PAGES' rows (a page-granular superset of the
    exact matches — the same contract as row-group pruning: pruning is
    IO savings, exactness is the caller's residual filter).  With
    ``exact=True`` the residual predicate is applied in Arrow compute
    before returning — the reference's ``to_pandas(filters=...,
    row_filter=True)`` contract (fastparquet/api.py:276-331) on the
    page-pruned superset.

    Bytes moved = footer + index spans + dictionary pages + kept pages
    ONLY (one ranged read per span through the fs seam) — proven by
    byte counts in tests.  Flat columns only (our paged writer is
    flat-only); unindexed or grid-unaligned row groups fall back to
    decoding all their pages.

    ``row_groups``: optional subset of row-group indices to scan —
    the contract that lets a DRIVER-side planner (stats + bloom
    pruning, :func:`filter_row_groups`) hand each executor only its
    surviving groups (engine.paged_read)."""
    import numpy as np
    import pyarrow as pa

    from fastparquet_spark.format.reader import (
        _ByteSource, _chunk_bounds, _fetch_chunk, _read_column_chunk,
        _to_arrow,
    )

    if filters and isinstance(filters[0], tuple):
        filters = [filters]
    if not filters:
        filters = [[]]  # match-all (None/[] must not crash or drop rows)
    clauses = filters
    fs = get_fs(path, fs)
    src = _ByteSource(path, fs=fs)
    try:
        fmd = src.footer()
        idx = read_page_index(path, fs=fs, fmd=fmd)
        bounds = _chunk_bounds(fmd, src.data_end)
        # TOP-LEVEL FLAT leaves only (dotted-path walk): this reader is
        # flat-only by contract, and bare-name keying both crashed on
        # nested files (by_path keys are dotted) and let a struct field
        # shadow a same-named top-level column
        elems = {name: e for name, e in _leaf_elems(fmd["schema"]).items()
                 if "." not in name}
        names_all = list(elems)
        want = list(columns) if columns is not None else names_all
        project = list(want)
        if exact:  # predicate columns must be decoded to filter rows
            for cl in clauses:
                for col, _op, _v in cl:
                    if col in names_all and col not in want:
                        want.append(col)
        pieces = []
        for ri, rg in enumerate(fmd["row_groups"]):
            if row_groups is not None and ri not in row_groups:
                continue
            grid, mask = _page_keep_mask_dnf(fmd, idx, ri, clauses)
            by_path = {".".join(cc["meta_data"]["path_in_schema"]):
                       (cc["meta_data"], cii)
                       for cii, cc in enumerate(rg["columns"])}
            if mask is not None and not any(mask):
                continue
            if mask is not None:
                # page skipping is all-or-nothing per row group: every
                # DECODED column must share the kept-page row set, so a
                # single wanted column without a grid-aligned index
                # (e.g. its chunk omitted the ColumnIndex for a NaN
                # page) forces the whole-chunk path for the group —
                # otherwise column lengths diverge and assembly fails
                for name in want:
                    ci_w = idx[ri][by_path[name][1]]
                    if ci_w is None or [loc["first_row_index"]
                                        for loc in ci_w["locations"]] != grid:
                        mask = None
                        break
            arrays, fields = [], []
            for name in want:
                cmd, cii = by_path[name]
                elem = elems[name]
                ci = idx[ri][cii]
                required = elem.get("repetition_type", 1) == 0
                if mask is None or ci is None or \
                        [loc["first_row_index"]
                         for loc in ci["locations"]] != grid:
                    # no usable index alignment: whole chunk, sized by
                    # the NEXT chunk's start — total_compressed_size is
                    # under-reported by some writers (incl. the
                    # reference) and must not truncate the page loop
                    blob, cmd2 = _fetch_chunk(src, cmd, bounds)
                    n_keep = rg["num_rows"]
                else:
                    locs = ci["locations"]
                    firsts = grid + [rg["num_rows"]]
                    parts = []
                    if cmd.get("dictionary_page_offset") is not None:
                        dlen = locs[0]["offset"] - cmd["dictionary_page_offset"]
                        parts.append(src.range(
                            cmd["dictionary_page_offset"], dlen))
                    dict_len = sum(len(p) for p in parts)
                    n_keep = 0
                    for pi, keep in enumerate(mask):
                        if keep:
                            parts.append(src.range(
                                locs[pi]["offset"],
                                locs[pi]["compressed_page_size"]))
                            n_keep += firsts[pi + 1] - firsts[pi]
                    blob = b"".join(parts)
                    cmd2 = dict(cmd, num_values=n_keep,
                                data_page_offset=dict_len)
                    if dict_len:
                        cmd2["dictionary_page_offset"] = 0
                    else:
                        cmd2.pop("dictionary_page_offset", None)
                defs, _reps, vals = _read_column_chunk(
                    blob, cmd2, elem.get("type_length", 0),
                    required=required)
                validity = defs.astype(bool) if not required else \
                    np.ones(n_keep, dtype=bool)
                arr = _to_arrow(validity, vals, elem)
                arrays.append(arr)
                fields.append(pa.field(name, arr.type))
            pieces.append(pa.Table.from_arrays(arrays,
                                               schema=pa.schema(fields)))
        if not pieces:
            from fastparquet_spark.format.reader import _arrow_type

            return pa.Table.from_arrays(
                [pa.array([], type=_arrow_type(elems[n])) for n in project],
                names=project)
        out = pa.concat_tables(pieces)
        if exact:
            out = _apply_row_filter_dnf(out, clauses).select(project)
        return out
    finally:
        src.close()


def _apply_row_filter_dnf(table, clauses):
    """DNF residual: OR of the per-clause AND masks."""
    import pyarrow as pa

    if len(clauses) == 1:
        return _apply_row_filter(table, clauses[0])
    import numpy as np

    keep = None
    for clause in clauses:
        m = np.zeros(table.num_rows, dtype=bool)
        idx = _apply_row_filter(
            table.append_column("__row__", pa.array(range(table.num_rows))),
            clause).column("__row__").to_numpy(zero_copy_only=False)
        m[idx] = True
        keep = m if keep is None else (keep | m)
    return table.filter(pa.array(keep))


def _apply_row_filter(table, clause):
    """AND-clause as an Arrow compute mask (the residual row predicate
    behind read_pages(exact=True))."""
    import pyarrow as pa
    import pyarrow.compute as pc

    mask = None
    for col, op, val in clause:
        if col not in table.column_names:
            continue
        c = table.column(col)
        if op in ("==", "="):
            m = pc.equal(c, val)
        elif op == "!=":
            m = pc.not_equal(c, val)
        elif op == "<":
            m = pc.less(c, val)
        elif op == "<=":
            m = pc.less_equal(c, val)
        elif op == ">":
            m = pc.greater(c, val)
        elif op == ">=":
            m = pc.greater_equal(c, val)
        elif op == "in":
            m = pc.is_in(c, value_set=pa.array(list(val)))
        elif op == "not in":
            m = pc.invert(pc.is_in(c, value_set=pa.array(list(val))))
        elif op == "is_null":
            m = pc.is_null(c)
        elif op == "is_not_null":
            m = pc.is_valid(c)
        else:
            continue
        m = pc.fill_null(m, False)
        mask = m if mask is None else pc.and_(mask, m)
    return table.filter(mask) if mask is not None else table


def _parse_bloom_blob(blob: bytes, path: str, offset: int, fs):
    """BloomFilterHeader + bitset from a fetched blob; re-reads the tail
    when the speculative fetch (length absent from the footer — it is
    optional in the spec; older parquet-mr omits it) undershot numBytes.
    Truncating instead would reshape-crash or, worse, build a
    wrong-sized filter whose fastrange block mapping returns FALSE
    NEGATIVES, i.e. incorrect pruning (ADVICE r4)."""
    from fastparquet_spark.codecs.bloom import SplitBlockBloom
    from fastparquet_spark.format import thrift
    from fastparquet_spark.format.metadata import SPECS

    header, pos = thrift.read_struct("BloomFilterHeader", blob, 0, SPECS)
    nb = header["numBytes"]
    if "UNCOMPRESSED" not in (header.get("compression") or {"UNCOMPRESSED": {}}):
        raise NotImplementedError("compressed bloom filters")
    if pos + nb > len(blob):
        with fs.open_read(path) as f:
            f.seek(offset + len(blob))
            blob = blob + f.read(pos + nb - len(blob))
    return SplitBlockBloom.frombytes(blob[pos:pos + nb])


def read_bloom_filter(path: str, offset: int, length: int | None = None,
                      fs=None):
    """Load a split-block bloom filter at ``offset`` in ``path`` —
    header is thrift-compact BloomFilterHeader, body the raw bitset.
    Reads parquet-java-written filters as well as our own."""
    fs = get_fs(path, fs)
    with fs.open_read(path) as f:
        f.seek(offset)
        blob = f.read(length if length else (1 << 20))
    return _parse_bloom_blob(blob, path, offset, fs)


def _bloom_value_bytes(value, elem: dict) -> bytes | None:
    """PLAIN-encode a point-predicate value for bloom hashing (the
    parquet-java input contract); None when the probe can't be encoded
    in the COLUMN's layout — a bloom no-answer must be conservative
    ("can't rule out"), never a mis-typed hash that false-negatives a
    chunk that actually matches (e.g. a float probe of an int column)."""
    ptype = elem["type"]
    if isinstance(value, str):
        return value.encode("utf8") if ptype == Type.BYTE_ARRAY else None
    if isinstance(value, bytes):
        return value if ptype == Type.BYTE_ARRAY else None
    if isinstance(value, bool) or value is None:
        return None
    if elem.get("converted_type") == ConvertedType.DECIMAL \
            and ptype in (Type.INT32, Type.INT64):
        # the writer hashed UNSCALED ints; scale the LOGICAL probe into
        # that space exactly
        import decimal
        try:
            d = value if isinstance(value, decimal.Decimal) \
                else decimal.Decimal(str(value))
            scaled = d.scaleb(elem.get("scale") or 0)
            if scaled != scaled.to_integral_value():
                return None  # no stored value can match; keep chunk
            width = 4 if ptype == Type.INT32 else 8
            return int(scaled).to_bytes(width, "little", signed=True)
        except (decimal.InvalidOperation, ValueError, OverflowError):
            return None
    if isinstance(value, float):
        if ptype in (Type.FLOAT, Type.DOUBLE):
            return struct.pack("<f" if ptype == Type.FLOAT else "<d", value)
        if ptype in (Type.INT32, Type.INT64) and value.is_integer():
            value = int(value)  # 3.0 == 3 on an int column: exact
        else:
            return None
    if isinstance(value, int):
        if ptype not in (Type.INT32, Type.INT64):
            if ptype in (Type.FLOAT, Type.DOUBLE):
                # int probe of a float column: hash the float layout
                # the writer hashed (exact when representable)
                f = float(value)
                if int(f) == value:
                    return struct.pack(
                        "<f" if ptype == Type.FLOAT else "<d", f)
            return None
        width = 4 if ptype == Type.INT32 else 8
        # UINT columns hash the unsigned byte layout (same bits the
        # writer hashed); a probe value outside the signed range must
        # not crash the scan planner — fall back to "can't rule out"
        unsigned = elem.get("converted_type") in (ConvertedType.UINT_8,
                                                  ConvertedType.UINT_16,
                                                  ConvertedType.UINT_32,
                                                  ConvertedType.UINT_64)
        try:
            return int(value).to_bytes(width, "little", signed=not unsigned)
        except OverflowError:
            return None
    return None


def _bloom_terms(rg: dict, elems: dict, clause):
    """The (column-chunk meta, encoded probe values) pairs of the
    AND-clause terms a bloom filter on this row group can answer."""
    by_name = {".".join(cc["meta_data"]["path_in_schema"]): cc["meta_data"]
               for cc in rg["columns"]}
    out = []
    for col, op, val in clause:
        cmd = by_name.get(col)
        if cmd is None or "bloom_filter_offset" not in cmd:
            continue
        if op in ("==", "="):
            vals = [val]
        elif op == "in":
            vals = list(val)
        else:
            continue
        elem = elems.get(col)
        if elem is None:
            continue
        encoded = [_bloom_value_bytes(v, elem) for v in vals]
        if any(e is None for e in encoded):
            continue
        out.append((cmd, encoded))
    return out


def _bloom_rules_out(path: str, rg: dict, elems: dict, clause,
                     fs=None, cache: dict | None = None) -> bool:
    """True iff a bloom filter PROVES some ==/in term of the AND-clause
    cannot match this row group (definite negative; bloom positives
    prove nothing).  ``cache`` maps (path, offset) -> SplitBlockBloom
    prefetched concurrently by :func:`_prefetch_blooms`."""
    import numpy as np

    from fastparquet_spark.codecs.bloom import xxh64

    for cmd, encoded in _bloom_terms(rg, elems, clause):
        key = (path, cmd["bloom_filter_offset"])
        bf = (cache or {}).get(key)
        if bf is None:
            bf = read_bloom_filter(path, cmd["bloom_filter_offset"],
                                   cmd.get("bloom_filter_length"), fs=fs)
            if cache is not None:
                cache[key] = bf
        hashes = np.array([xxh64(e, 0) for e in encoded], dtype=np.uint64)
        if not bf.might_contain(hashes).any():
            return True  # no sought value can be present
    return False


def _prefetch_blooms(spans: dict, fs, max_workers: int = 16) -> dict:
    """Concurrent ranged fetch of bloom spans — ``spans`` maps
    (path, offset) -> length-or-None; returns (path, offset) ->
    SplitBlockBloom.  The driver-serial probe loop was r4's named
    scale-killer: at 100k files one sequential small read per chunk
    burns minutes of driver wall before the scan starts — the same
    failure mode :func:`io.fetch_footers` fixed for footers."""
    from concurrent.futures import ThreadPoolExecutor

    def fetch(item):
        (path, offset), length = item
        f = get_fs(path, fs)
        with f.open_read(path) as fh:
            fh.seek(offset)
            blob = fh.read(length if length else (1 << 20))
        return (path, offset), _parse_bloom_blob(blob, path, offset, f)

    if not spans:
        return {}
    if len(spans) == 1:
        return dict([fetch(next(iter(spans.items())))])
    with ThreadPoolExecutor(max_workers=min(max_workers, len(spans))) as ex:
        return dict(ex.map(fetch, spans.items()))


def filter_row_groups(out_dir: str, filters, fs=None, metas=None,
                      use_bloom: bool = True) -> list[tuple[str, int]]:
    """Surviving (file, row_group) pairs for a DNF filter — a flat
    AND-list ``[(col,op,val),...]`` or OR-of-ANDs ``[[...],[...]]``.

    Two pruning passes: min/max/null stats (metadata already in hand),
    then — for ==/in clauses on columns carrying a bloom filter —
    a split-block bloom membership check (one small ranged read per
    surviving chunk; the high-cardinality point-lookup path where
    stats cannot discriminate)."""
    if filters and isinstance(filters[0], tuple):
        filters = [filters]
    for clause in filters:
        for col, op, _v in clause:
            if op not in OPS:
                raise ValueError(f"unsupported filter op {op!r}")
    if metas is None:
        metas = dataset_metadata(out_dir, fs=fs)
    by_file = {m["file"]: m for m in metas}
    root = out_dir.rstrip("/")
    # glob inputs record basenames, so the bloom's file path can't be
    # reconstructed — stats-only pruning there
    use_bloom = use_bloom and not any(c in out_dir for c in "*?[")
    # pass 1: min/max/null stats (metadata already in hand)
    survivors = []
    for f, ri, cols, _n in _iter_chunks(metas):
        clauses = [c for c in filters if _chunk_may_match(cols, c)]
        if clauses:
            survivors.append((f, ri, clauses))
    if not use_bloom:
        return [(f, ri) for f, ri, _c in survivors]
    # pass 2: bloom membership for ==/in terms — spans are known from
    # the footers, so fetch them concurrently instead of one serial
    # ranged read per chunk (r4 What's-wrong #2).  Evaluation runs in
    # BATCHES of chunks so driver memory is bounded by one batch's
    # filters, not the whole dataset's (100k chunks x ~100 KB blooms
    # would otherwise pin ~10 GB on the driver).
    ctx = []
    elems_cache: dict[str, dict] = {}  # one schema walk per FILE
    for f, ri, clauses in survivors:
        m = by_file[f]
        elems = elems_cache.get(f)
        if elems is None:
            elems = elems_cache[f] = _leaf_elems(m["fmd"]["schema"])
        rg = m["fmd"]["row_groups"][ri]
        ctx.append((f"{root}/{f}", rg, elems))
    keep = []
    BATCH = 512
    for lo in range(0, len(survivors), BATCH):
        spans: dict = {}
        for (f, ri, clauses), (path, rg, elems) in zip(
                survivors[lo:lo + BATCH], ctx[lo:lo + BATCH]):
            for c in clauses:
                for cmd, _enc in _bloom_terms(rg, elems, c):
                    spans.setdefault((path, cmd["bloom_filter_offset"]),
                                     cmd.get("bloom_filter_length"))
        cache = _prefetch_blooms(spans, fs)
        for (f, ri, clauses), (path, rg, elems) in zip(
                survivors[lo:lo + BATCH], ctx[lo:lo + BATCH]):
            if any(not _bloom_rules_out(path, rg, elems, c, fs=fs,
                                        cache=cache)
                   for c in clauses):
                keep.append((f, ri))
    return keep


def _attach_drill_columns(df, metas):
    """Add ``dir0..dirN`` columns to a Spark scan of a drill-layout
    dataset (Spark discovers hive ``k=v`` natively but ignores bare
    label dirs).  The value comes from ``input_file_name()`` segment
    arithmetic — a JVM expression, no Python in the row path — and is
    cast to long/double/boolean when every observed directory value
    coerces (the reference's val_to_num typing)."""
    from pyspark.sql import functions as F

    parts = [m["partitions"] for m in metas]
    if not parts or not parts[0] or "dir0" not in parts[0]:
        return df
    depth = len(parts[0])
    segs = F.split(F.input_file_name(), "/")
    for i in range(depth):
        name = f"dir{i}"
        vals = {p[name] for p in parts}
        c = F.element_at(segs, -(depth - i + 1))
        if all(type(v) is int for v in vals):
            c = c.cast("long")
        elif all(isinstance(v, (int, float)) and not isinstance(v, bool)
                 for v in vals):
            c = c.cast("double")
        elif all(isinstance(v, bool) for v in vals):
            c = c == "True"
        df = df.withColumn(name, c)
    return df


def drill_read(spark, out_dir: str):
    """Spark DataFrame over a drill-layout dataset (bare value directory
    names, the reference's 'drill' file scheme, fastparquet/util.py:
    356-388) with ``dir0..dirN`` partition columns attached."""
    metas = dataset_metadata(out_dir)
    # bare label dirs aren't partition dirs to Spark, so its default
    # listing skips them; recursive lookup scans the leaves directly
    df = (spark.read.option("recursiveFileLookup", "true")
          .parquet(out_dir))
    return _attach_drill_columns(df, metas)


def filtered_read(spark, out_dir: str, filters):
    """Spark DataFrame over only the stats-surviving part files, with the
    exact residual predicate applied on top.  Hive partition columns come
    from Spark's own discovery (basePath); drill ``dirN`` columns are
    attached from the file path."""
    from pyspark.sql import functions as F

    metas = dataset_metadata(out_dir)
    drill = bool(metas and "dir0" in (metas[0].get("partitions") or {}))
    if not filters:
        # no filters = FULL scan; an empty list must not read as an
        # empty DNF (zero branches -> zero rows)
        filters = [[]]
    keep_files = sorted({f for f, _ri in
                         filter_row_groups(out_dir, filters, metas=metas)})
    if not keep_files:
        # empty scan with the right schema (partition cols included)
        if drill:
            return drill_read(spark, out_dir).limit(0)
        return spark.read.option("basePath", out_dir).parquet(out_dir).limit(0)
    # basePath keeps hive key=value partition columns in the schema when
    # individual files are listed explicitly
    df = (spark.read.option("basePath", out_dir)
          .parquet(*[os.path.join(out_dir, f) for f in keep_files]))
    if drill:
        df = _attach_drill_columns(df, metas)
    if filters and isinstance(filters[0], tuple):
        filters = [filters]
    if any(not clause for clause in filters):
        return df  # a match-all DNF branch makes the whole OR true
    ors = None
    for clause in filters:
        ands = None
        for col, op, val in clause:
            c = F.col(col)
            e = {"==": c == val, "=": c == val, "!=": c != val,
                 "<": c < val, "<=": c <= val, ">": c > val, ">=": c >= val,
                 "in": c.isin(*val) if isinstance(val, (list, tuple, set)) else c.isin(val),
                 "not in": ~c.isin(*val) if isinstance(val, (list, tuple, set)) else ~c.isin(val),
                 "is_null": c.isNull(), "is_not_null": c.isNotNull(),
                 }[op]
            ands = e if ands is None else (ands & e)
        ors = ands if ors is None else (ors | ands)
    return df.filter(ors) if ors is not None else df
