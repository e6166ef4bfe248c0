#!/usr/bin/env python
"""Isolated per-query timing: min/median over N noop-sink reps with the
bench's per-rep hygiene (gc + clearCache + JVM System.gc outside the
timed region). The honest single-query measurement on this throttling
host.

  python scripts/r9_isotime.py <sf_dir> name1,name2[,...] [reps]
"""
import gc
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from brooklin_spark import registry
from brooklin_spark.session import get_spark

sf_dir = sys.argv[1]
names = sys.argv[2].split(",")
reps = int(sys.argv[3]) if len(sys.argv) > 3 else 5

registry.load_all()
spark = get_spark(app_name="r9-isotime")

for name in names:
    fn = registry.QUERIES[name]
    # warmup at smallest SF for codegen compile
    fn(spark, "/root/testdata/sf0.001").write.format("noop").mode(
        "overwrite"
    ).save()
    ts = []
    for _ in range(reps):
        gc.collect()
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        ts.append(time.perf_counter() - t0)
    print(
        f"{name}: min={min(ts):.2f} med={statistics.median(ts):.2f} "
        f"all={[round(t, 2) for t in ts]}",
        flush=True,
    )
