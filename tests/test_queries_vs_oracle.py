"""Driver-gate simulation: every queries() entry vs its DuckDB oracle at
sf0.001 — row count, column names, and order-insensitive values must
match EXACTLY (the real driver compares value hashes at sf0.01)."""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def _norm(rows):
    out = []
    for r in rows:
        nr = []
        for v in r:
            if isinstance(v, float):
                if math.isnan(v):
                    nr.append("NaN")
                else:
                    nr.append(round(v, 9))
            else:
                nr.append(v)
        out.append(tuple(nr))
    return sorted(out, key=repr)


QUERY_NAMES = sorted(entry_mod.queries())


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(name, spark, duck):
    q = entry_mod.queries()[name]
    sdf = q(spark, SF_DIR)
    oracles = entry_mod.oracle_sql()
    if name not in oracles:
        # rows-only check (driver's weaker path)
        assert sdf.count() >= 0
        return
    cols = sorted(sdf.columns)
    spark_rows = [tuple(row[c] for c in cols) for row in sdf.collect()]
    ores = duck.sql(oracles[name])
    ocols_all = ores.columns
    assert sorted(ocols_all) == cols, f"{name}: column names differ"
    idx = [ocols_all.index(c) for c in cols]
    duck_rows = [tuple(r[i] for i in idx) for r in ores.fetchall()]
    assert len(spark_rows) == len(duck_rows), f"{name}: row count"
    a, b = _norm(spark_rows), _norm(duck_rows)
    mismatches = [(x, y) for x, y in zip(a, b) if x != y][:5]
    assert a == b, f"{name}: first mismatches {mismatches}"


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 1
    assert sum(r["rows"] for r in rows) == 500  # sf0.001 documents
