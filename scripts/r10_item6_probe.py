#!/usr/bin/env python
"""Stage isolation for the two remaining sf0.1 flag rows (VERDICT item 6):
dedup_threshold_survivor_curve and graph_assortativity. Times each
sub-pipeline to a noop sink so the residual (shingle kernel, pair
self-join, rank window, basket pair build) is attributed before any
rewrite is attempted.

  python scripts/r10_item6_probe.py [sf_dir] [reps]
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from brooklin_spark import registry
from brooklin_spark.io import table
from brooklin_spark.operators import dedup as D
from brooklin_spark.session import get_spark

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
reps = int(sys.argv[2]) if len(sys.argv) > 2 else 4
registry.load_all()
spark = get_spark(app_name="r10-item6-probe")


def shingles(_):
    docs = table(spark, sf, "documents")
    return D.shingle_rows_pandas(docs, n=3).select(
        "id", "n", F.xxhash64("shingle").alias("shingle")
    )


def jac(_):
    return D.jaccard_pairs_selfjoin(shingles(None), threshold=0.3)


def survivor(_):
    return registry.QUERIES["dedup_threshold_survivor_curve"](spark, sf)


def baskets(_):
    li = table(spark, sf, "lineitem").select("l_orderkey", "l_partkey")
    return li.groupBy("l_orderkey").agg(
        F.array_sort(F.array_distinct(F.collect_list("l_partkey"))).alias("parts")
    )


def basket_pairs(_):
    b = baskets(None)
    return (
        b.select(F.posexplode("parts").alias("i", "pa"), F.col("parts"))
        .select(
            "pa",
            F.explode(F.expr("slice(parts, i + 2, size(parts))")).alias("pb"),
        )
        .groupBy("pa", "pb")
        .agg(F.count("*").alias("n_ord"))
        .filter(F.col("n_ord") >= 2)
        .select("pa", "pb")
    )


def assort(_):
    return registry.QUERIES["graph_assortativity"](spark, sf)


STAGES = {
    "shingle_kernel": shingles,
    "jaccard_pairs": jac,
    "survivor_full": survivor,
    "baskets": baskets,
    "basket_pairs": basket_pairs,
    "assort_full": assort,
}

times = {k: [] for k in STAGES}
for i in range(reps):
    for label, fn in STAGES.items():
        spark.sparkContext.setJobDescription(f"probe {label} rep{i}")
        t0 = time.perf_counter()
        fn(None).write.format("noop").mode("overwrite").save()
        times[label].append(round(time.perf_counter() - t0, 3))

for label, ts in times.items():
    print(f"{label}: min={min(ts):.3f} all={ts}", flush=True)
