#!/usr/bin/env python
"""Synthesize a 3x-sf0.1 ("sf0.3") dataset in /tmp for the in-session
registry sweep (r4 verdict #10): each table is three key-shifted copies
of sf0.1, shifting EVERY key/foreign-key column by the same per-copy
offset so referential integrity holds within each copy.  Text and
embedding payloads repeat across copies — cross-copy duplicates make
the dedup/similarity operators work HARDER, which is the point of the
scale step.  Deterministic (pure arithmetic on the source tables)."""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf0.3"
COPIES = int(os.environ.get("BIG_SF_COPIES", "3"))
OFF = 100_000_000  # far above any sf0.1 key

KEYS = {
    "region": ["r_regionkey"],
    "nation": ["n_nationkey", "n_regionkey"],
    "customer": ["c_custkey", "c_nationkey"],
    "supplier": ["s_suppkey", "s_nationkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def main():
    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()
    for table, keys in KEYS.items():
        cols = [c[0] for c in con.sql(
            f"describe select * from '{SRC}/{table}.parquet'").fetchall()]
        selects = []
        for i in range(COPIES):
            exprs = ", ".join(
                f"{c} + {i * OFF} AS {c}" if c in keys else c for c in cols)
            selects.append(
                f"SELECT {exprs} FROM '{SRC}/{table}.parquet'")
        con.sql(f"COPY ({' UNION ALL '.join(selects)}) TO "
                f"'{OUT}/{table}.parquet' (FORMAT PARQUET)")
        n = con.sql(f"SELECT count(*) FROM '{OUT}/{table}.parquet'").fetchone()[0]
        print(table, n)


if __name__ == "__main__":
    main()
