#!/usr/bin/env python
"""Derive a 10x benchmark corpus ("sf1") from the driver's sf0.1 testdata.

Replication strategy (key-shifted copies, referential integrity preserved):
every fact/dim key shifts by replica*10_000_000, so joins stay 1:1 with the
original semantics and selectivities while row counts scale 10x. Document
text is word-prefixed per replica (r1..r9) so shingle spaces are disjoint
across replicas — the near-dup structure scales linearly instead of
creating artificial 10-copy duplicate clusters. region/nation stay fixed
(TPC-H keeps them constant across scale factors).

This corpus exists ONLY to measure plans above Spark's local scheduling
floor (BASELINE.md round-2 table); correctness gates keep running on the
driver's own sf0.01 data.
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/benchdata/sf1"
REPL = int(os.environ.get("BENCH_REPLICAS", "10"))
K = 10_000_000

SHIFTS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def main() -> None:
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    for t in ["region", "nation"]:
        con.sql(
            f"COPY (SELECT * FROM '{SRC}/{t}.parquet') TO '{DST}/{t}.parquet' (FORMAT parquet)"
        )
        print(t, "copied")
    for t, keys in SHIFTS.items():
        repl = [f"{k} + i.range * {K} AS {k}" for k in keys]
        if t == "documents":
            repl.append(
                "CASE WHEN i.range = 0 THEN text ELSE array_to_string("
                "list_transform(string_split(text, ' '), w -> 'r' || i.range || w), ' ') "
                "END AS text"
            )
        con.sql(
            f"COPY (SELECT * EXCLUDE (range) REPLACE ({', '.join(repl)}) "
            f"FROM '{SRC}/{t}.parquet', range({REPL}) i) "
            f"TO '{DST}/{t}.parquet' (FORMAT parquet)"
        )
        n = con.sql(f"SELECT count(*) FROM '{DST}/{t}.parquet'").fetchone()[0]
        print(t, n)


if __name__ == "__main__":
    main()
