#!/usr/bin/env python
"""Time the registered DuckDB oracle SQL for the bench queries against a
given SF directory (the single-node baseline the engine is graded
against). Prints one JSON line: {"queries": {name: best_sec}, "total": s}.
"""

from __future__ import annotations

import json
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import BENCH_QUERIES  # noqa: E402
from brooklin_spark import registry  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
RUNS = int(os.environ.get("DUCK_BENCH_RUNS", "3"))
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def main() -> None:
    registry.load_all()
    con = duckdb.connect()
    con.sql(f"SET threads TO {os.cpu_count()}")
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    timings = {}
    for name in BENCH_QUERIES:
        sql = registry.ORACLES.get(name)
        if sql is None:
            continue
        best = float("inf")
        for _ in range(RUNS):
            t0 = time.perf_counter()
            con.sql(sql).fetchall()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)
        print(f"  {name}: {best:.3f}s", file=sys.stderr)
    print(json.dumps({"queries": timings, "total": round(sum(timings.values()), 3), "sf_dir": SF_DIR}))


if __name__ == "__main__":
    main()
