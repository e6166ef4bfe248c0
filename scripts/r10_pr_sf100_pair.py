#!/usr/bin/env python
"""sf100 PageRank rounds-shape pair: r9 fused+spill edge-table rounds
(forced via _PR_MSG_BCAST_MAX_SUPPLIERS=0, i.e. the beyond-broadcast
fallback — same grouped build, same deg(s) reuse) vs the r10 bipartite
rounds. Single run each in ONE host window, edge-table first — the same
methodology as scripts/r9_pr_sf100_pair.py (whose booked fused+spill
number is 604.2 s).

  python scripts/r10_pr_sf100_pair.py <sf_dir> [labels]
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from brooklin_spark.queries import dedup
from brooklin_spark.session import get_spark

sf = sys.argv[1]
which = sys.argv[2].split(",") if len(sys.argv) > 2 else ["edeg", "bipartite"]
spark = get_spark(app_name="r10-pr-sf100-pair")
rows = dedup._lineitem_rows(spark, sf)
print("li_rows:", rows, flush=True)

for label in which:
    dedup._PR_MSG_BCAST_MAX_SUPPLIERS = 0 if label == "edeg" else 64_000_000
    spark.sparkContext.setJobDescription(f"pagerank sf100 {label}")
    t0 = time.perf_counter()
    dedup.graph_pagerank_influence(spark, sf).write.format("noop").mode(
        "overwrite"
    ).save()
    print(label, "ELAPSED", round(time.perf_counter() - t0, 1), flush=True)
