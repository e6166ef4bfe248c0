#!/usr/bin/env python
"""sf100 PageRank composition pair: plain+spill (the r6 booked path) vs
fused+spill (this round's _PR_FUSED_LI_ROWS switch), single run each in ONE
host window, plain first. Forces the path by patching the module threshold —
same function, same data, same session config.

  python scripts/r9_pr_sf100_pair.py <sf_dir>
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from brooklin_spark.queries import dedup
from brooklin_spark.session import get_spark

sf = sys.argv[1]
spark = get_spark(app_name="r9-pr-sf100-pair")
rows = dedup._lineitem_rows(spark, sf)
print("li_rows:", rows, flush=True)

for label, fused_threshold in (("plain+spill", 10**18), ("fused+spill", 2_000_000)):
    dedup._PR_FUSED_LI_ROWS = fused_threshold
    spark.sparkContext.setJobDescription(f"pagerank sf100 {label}")
    t0 = time.perf_counter()
    dedup.graph_pagerank_influence(spark, sf).write.format("noop").mode(
        "overwrite"
    ).save()
    print(label, "ELAPSED", round(time.perf_counter() - t0, 1), flush=True)
