#!/usr/bin/env python
"""kcore rounds-shape A/B: r9 pair-table peel (_kcore_pairs) vs r10
grouped-adjacency peel (_kcore_grouped), alternating reps in one session,
min-of-N + win-rate — the only valid methodology on this throttling host.

  python scripts/r10_kcore_ab.py <sf_dir> [reps]
"""
import gc
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from brooklin_spark.queries import dedup
from brooklin_spark.session import get_spark

sf = sys.argv[1]
reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
spark = get_spark(app_name="r10-kcore-ab")

VARIANTS = {"pairs(r9)": dedup._kcore_pairs, "grouped(r10)": dedup._kcore_grouped}
# warmup both at smallest SF (codegen compile)
for fn in VARIANTS.values():
    fn(spark, "/root/testdata/sf0.001").write.format("noop").mode("overwrite").save()

times = {k: [] for k in VARIANTS}
for i in range(reps):
    for label, fn in VARIANTS.items():
        gc.collect()
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        spark.sparkContext.setJobDescription(f"kcore {label} rep{i}")
        t0 = time.perf_counter()
        fn(spark, sf).write.format("noop").mode("overwrite").save()
        times[label].append(round(time.perf_counter() - t0, 3))

wins = sum(
    1
    for a, b in zip(times["grouped(r10)"], times["pairs(r9)"])
    if a < b
)
for label, ts in times.items():
    print(f"{label}: min={min(ts):.3f} all={ts}")
print(f"grouped wins {wins}/{reps} pairings")
