#!/usr/bin/env python
"""sf0.1 PageRank A/B: plain path (current default below _PR_FUSED_LI_ROWS)
vs fused grouped-adjacency + r10 bipartite rounds. The r9 crossover that
set _PR_FUSED_LI_ROWS=2M compared the two BUILDS with the SAME edge-table
rounds; the bipartite rounds change the round cost too, so the threshold
deserves a re-measurement at the bench scale.

Alternating reps, min-of-N + win-rate (the r9/r10 measurement discipline);
value-identity asserted once up front.

  python scripts/r10_pr_sf01_ab.py [sf_dir] [reps]
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from brooklin_spark.queries import dedup
from brooklin_spark.session import get_spark

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
reps = int(sys.argv[2]) if len(sys.argv) > 2 else 6
spark = get_spark(app_name="r10-pr-sf01-ab")

REAL_THRESHOLD = dedup._PR_FUSED_LI_ROWS


def run(label: str) -> float:
    dedup._PR_FUSED_LI_ROWS = 0 if label == "fused" else 10**18
    spark.sparkContext.setJobDescription(f"pr sf0.1 ab {label}")
    t0 = time.perf_counter()
    dedup.graph_pagerank_influence(spark, sf).write.format("noop").mode(
        "overwrite"
    ).save()
    return time.perf_counter() - t0


# value identity first (sorted full-result compare)
dedup._PR_FUSED_LI_ROWS = 10**18
plain_rows = sorted(map(tuple, dedup.graph_pagerank_influence(spark, sf).collect()))
dedup._PR_FUSED_LI_ROWS = 0
fused_rows = sorted(map(tuple, dedup.graph_pagerank_influence(spark, sf).collect()))
assert plain_rows == fused_rows, "VALUE MISMATCH"
print(f"value identity OK ({len(plain_rows)} rows)", flush=True)

times = {"plain": [], "fused": []}
order = ["plain", "fused"]
for i in range(reps):
    for label in order if i % 2 == 0 else order[::-1]:
        dt = run(label)
        times[label].append(dt)
        print(f"rep {i} {label}: {dt:.2f}s", flush=True)

wins = sum(
    1 for a, b in zip(times["plain"], times["fused"]) if b < a
)
print(
    f"plain min {min(times['plain']):.2f}  fused min {min(times['fused']):.2f}  "
    f"fused wins {wins}/{reps}", flush=True
)
print("plain:", [round(t, 2) for t in times["plain"]])
print("fused:", [round(t, 2) for t in times["fused"]])
