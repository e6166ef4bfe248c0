#!/usr/bin/env python
"""Derive an Nx benchmark corpus from the driver's sf0.1 testdata.

  python scripts/make_benchdata.py [SRC] [DST]        # BENCH_REPLICAS=10
  BENCH_REPLICAS=100 python scripts/make_benchdata.py \
      /root/testdata/sf0.1 benchdata/sf10             # the r5 scale corpus

Replication strategy (key-shifted copies, referential integrity preserved):
every fact/dim key shifts by replica*10_000_000, so joins stay 1:1 with the
original semantics and selectivities while row counts scale Nx. Document
text is word-prefixed per replica (r1..r99) so shingle spaces are disjoint
across replicas — the near-dup structure scales linearly instead of
creating artificial N-copy duplicate clusters. Embedding vectors get a
deterministic per-replica SIGN-FLIP pattern (dim d flips iff
hash(replica, d) is odd) for the same reason: a shared pattern preserves
every intra-replica dot product exactly (s_d^2 = 1), while cross-replica
cosines decorrelate to ~0 — without it every vector would have N-1 exact
duplicates and the cosine-threshold dedup family would grow
quadratically in replicas, a data-shape artifact rather than a
measurement. region/nation stay fixed (TPC-H keeps them constant across
scale factors).

This corpus exists ONLY to measure plans above Spark's local scheduling
floor (BASELINE.md scale tables); correctness gates keep running on the
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


#: optional comma-separated table subset (BENCH_TABLES=lineitem,orders,...)
#: — the sf100 spot-book only needs the 4 slow-growing families' inputs,
#: not a full 17 GB corpus
ONLY = {t for t in os.environ.get("BENCH_TABLES", "").split(",") if t}


def main() -> None:
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    # stream the COPY: with insertion order preserved DuckDB buffers the
    # ENTIRE replicated result before writing (56 GB RSS observed on the
    # sf100 lineitem — 600M rows); row order inside a bench parquet is
    # meaningless to every consumer here
    con.sql("SET preserve_insertion_order = false")
    for t in ["region", "nation"]:
        con.sql(
            f"COPY (SELECT * FROM '{SRC}/{t}.parquet') TO '{DST}/{t}.parquet' (FORMAT parquet)"
        )
        print(t, "copied")
    for t, keys in SHIFTS.items():
        if ONLY and t not in ONLY:
            continue
        repl = [f"{k} + i.range * {K} AS {k}" for k in keys]
        if t == "documents":
            repl.append(
                "CASE WHEN i.range = 0 THEN text ELSE array_to_string("
                "list_transform(string_split(text, ' '), w -> 'r' || i.range || w), ' ') "
                "END AS text"
            )
        if t == "embeddings":
            repl.append(
                "CASE WHEN i.range = 0 THEN embedding ELSE "
                "list_transform(embedding, (x, d) -> "
                "CASE WHEN hash(i.range, d) % 2 = 0 THEN x ELSE -x END) "
                "END AS embedding"
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
