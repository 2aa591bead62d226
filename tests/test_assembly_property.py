"""Property tests for the Dremel assembly layer: pyarrow writes random
nested tables (nulls at every level, empty lists, empty maps, nested
list-in-struct-in-list), our reader must reproduce them value-exactly.
This covers shapes far beyond the 4 reference corpus files."""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from hypothesis import given, settings, strategies as st

from fastparquet_spark.format import read_file


def _eq(a, b):
    if isinstance(a, float) and isinstance(b, float):
        return (math.isnan(a) and math.isnan(b)) or a == b
    if isinstance(a, dict) and isinstance(b, dict):
        return a.keys() == b.keys() and all(_eq(a[k], b[k]) for k in a)
    if isinstance(a, (list, tuple)) and isinstance(b, (list, tuple)):
        return len(a) == len(b) and all(_eq(x, y) for x, y in zip(a, b))
    return a == b


def _roundtrip(table: pa.Table, tmp_path, **write_kw):
    path = str(tmp_path / "nested.parquet")
    pq.write_table(table, path, **write_kw)
    got = read_file(path)
    assert got.num_rows == table.num_rows
    for col in table.column_names:
        a = table.column(col).combine_chunks()
        b = got.column(col).combine_chunks().cast(a.type)
        assert _eq(a.to_pylist(), b.to_pylist()), col


ints = st.one_of(st.none(), st.integers(-2**31, 2**31 - 1))
int_lists = st.one_of(st.none(), st.lists(ints, max_size=5))


@settings(max_examples=25, deadline=None)
@given(st.lists(int_lists, min_size=1, max_size=40))
def test_list_of_nullable_ints(tmp_path_factory, rows):
    t = pa.table({"v": pa.array(rows, type=pa.list_(pa.int32()))})
    _roundtrip(t, tmp_path_factory.mktemp("p"))


@settings(max_examples=25, deadline=None)
@given(st.lists(
    st.one_of(st.none(),
              st.dictionaries(st.text(max_size=4),
                              st.one_of(st.none(), st.floats(allow_nan=False)),
                              max_size=4)),
    min_size=1, max_size=30))
def test_map_string_double(tmp_path_factory, rows):
    t = pa.table({"m": pa.array(
        [None if r is None else list(r.items()) for r in rows],
        type=pa.map_(pa.string(), pa.float64()))})
    _roundtrip(t, tmp_path_factory.mktemp("p"))


@settings(max_examples=25, deadline=None)
@given(st.lists(
    st.one_of(st.none(), st.fixed_dictionaries({
        "a": ints,
        "b": st.one_of(st.none(), st.text(max_size=6)),
        "c": int_lists,
    })),
    min_size=1, max_size=30))
def test_struct_with_nested_list(tmp_path_factory, rows):
    typ = pa.struct([("a", pa.int32()), ("b", pa.string()),
                     ("c", pa.list_(pa.int32()))])
    t = pa.table({"s": pa.array(rows, type=typ)})
    _roundtrip(t, tmp_path_factory.mktemp("p"))


@settings(max_examples=15, deadline=None)
@given(st.lists(
    st.one_of(st.none(), st.lists(
        st.one_of(st.none(), st.fixed_dictionaries(
            {"x": ints, "y": st.one_of(st.none(), st.text(max_size=4))})),
        max_size=4)),
    min_size=1, max_size=25))
def test_list_of_struct(tmp_path_factory, rows):
    typ = pa.list_(pa.struct([("x", pa.int32()), ("y", pa.string())]))
    t = pa.table({"ls": pa.array(rows, type=typ)})
    _roundtrip(t, tmp_path_factory.mktemp("p"))


@pytest.mark.parametrize("version", ["1.0", "2.6"])
@pytest.mark.parametrize("dictionary", [True, False])
def test_nested_page_variants(tmp_path, version, dictionary):
    rows = [None, [], [None], [1, None, 3], [4], [5, 6, 7, 8], [], None,
            list(range(20))]
    t = pa.table({
        "v": pa.array(rows, type=pa.list_(pa.int64())),
        "m": pa.array([None, [], [("k", 1.5)], [("a", None), ("b", 2.0)],
                       None, [("z", 0.0)], [], [("q", 9.9)], []],
                      type=pa.map_(pa.string(), pa.float64())),
    })
    _roundtrip(t, tmp_path, version=version, use_dictionary=dictionary,
               data_page_version="2.0" if version == "2.6" else "1.0")


def test_deep_nesting_list_of_list(tmp_path):
    rows = [None, [], [None], [[1, 2], None, []], [[3]], [[], [4, None, 5]]]
    t = pa.table({"ll": pa.array(rows, type=pa.list_(pa.list_(pa.int32())))})
    _roundtrip(t, tmp_path)


def test_nested_projection_iteration_and_edges(tmp_path):
    """Projection of nested columns, multi-row-group iteration, head(),
    all-empty-lists and all-null-maps files."""
    from fastparquet_spark.format import head, iter_row_groups

    t = pa.table({
        "id": pa.array(range(10)),
        "tags": pa.array([[f"t{i}", f"u{i}"] if i % 3 else []
                          for i in range(10)], type=pa.list_(pa.string())),
        "m": pa.array([[("k", float(i))] if i % 2 else None
                       for i in range(10)],
                      type=pa.map_(pa.string(), pa.float64())),
    })
    p = str(tmp_path / "n.parquet")
    pq.write_table(t, p, row_group_size=4)
    got = read_file(p, columns=["tags"])
    assert got.column_names == ["tags"]
    assert got.column("tags").to_pylist() == t.column("tags").to_pylist()
    assert [c.num_rows for c in iter_row_groups(p)] == [4, 4, 2]
    assert head(p, 3).column("tags").to_pylist() == \
        t.column("tags").to_pylist()[:3]

    p2 = str(tmp_path / "el.parquet")
    pq.write_table(pa.table(
        {"v": pa.array([[], [], []], type=pa.list_(pa.int32()))}), p2)
    assert read_file(p2).column("v").to_pylist() == [[], [], []]
    p3 = str(tmp_path / "nm.parquet")
    pq.write_table(pa.table(
        {"m": pa.array([None, None], type=pa.map_(pa.string(), pa.int32()))}),
        p3)
    assert read_file(p3).column("m").to_pylist() == [None, None]
