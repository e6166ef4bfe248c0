#!/usr/bin/env python
"""kcore sf10 adjudication pair: DuckDB oracle vs Spark registered query,
ALTERNATING reps in one host window (throttle on this host swings 2-3x in
minutes, so sequential engine runs are not comparable). Min-of-N each +
per-pairing ratios.

  python scripts/r10_kcore_duck_pair.py <sf_dir> [reps] [out.json]
"""
import gc
import json
import os
import sys
import time
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from brooklin_spark import registry
from brooklin_spark.session import get_spark

sf = sys.argv[1]
reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
out_path = sys.argv[3] if len(sys.argv) > 3 else None
NAME = "graph_kcore_bounded"

registry.load_all()
spark = get_spark(app_name="r10-kcore-duck-pair")
con = duckdb.connect()
con.sql(f"SET threads TO {os.cpu_count()}")
for t in ["orders", "lineitem"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{os.path.join(sf, t + '.parquet')}'")

registry.QUERIES[NAME](spark, "/root/testdata/sf0.001").write.format("noop").mode(
    "overwrite"
).save()

duck_ts, spark_ts = [], []
for i in range(reps):
    t0 = time.perf_counter()
    con.sql(registry.ORACLES[NAME]).fetchall()
    duck_ts.append(round(time.perf_counter() - t0, 2))
    gc.collect()
    spark.catalog.clearCache()
    spark.sparkContext._jvm.System.gc()
    spark.sparkContext.setJobDescription(f"kcore pair rep{i}")
    t0 = time.perf_counter()
    registry.QUERIES[NAME](spark, sf).write.format("noop").mode("overwrite").save()
    spark_ts.append(round(time.perf_counter() - t0, 2))
    print(f"rep{i}: duck={duck_ts[-1]} spark={spark_ts[-1]}", flush=True)

doc = {
    "metric": "graph_kcore_bounded same-window alternating pair",
    "sf_dir": sf,
    "duck": duck_ts,
    "spark": spark_ts,
    "duck_min": min(duck_ts),
    "spark_min": min(spark_ts),
    "ratio_min": round(min(spark_ts) / min(duck_ts), 3),
    "pair_ratios": [round(s / d, 3) for d, s in zip(duck_ts, spark_ts)],
}
print(json.dumps(doc))
if out_path:
    with open(out_path, "w") as f:
        f.write(json.dumps(doc) + "\n")
