#!/usr/bin/env python
"""graph_assortativity candidate (VERDICT item 6): replace the doubled
edge-table + two lazy checkpoints + edge-scale deg/s_v exchanges with ONE
grouped adjacency (v, nbrs) kept hash-partitioned on v
(checkpoint_partitioned), so

  deg(v)   = size(nbrs)            — no exchange
  m2/sx/sxx = aggregates over adj  — no exchange
  sxy      = explode(nbrs) -> broadcast deg join -> groupBy(v) riding
             adj's HashPartitioning(v) — no pair-scale exchange

Alternating min-of-N A/B vs the registered shape; value identity asserted
first (exact integer aggregates, same final IEEE ops).

  python scripts/r10_assort_grouped_ab.py [sf_dir] [reps]
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from brooklin_spark import registry
from brooklin_spark.checkpoint import checkpoint_partitioned
from brooklin_spark.io import table
from brooklin_spark.session import get_spark

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
reps = int(sys.argv[2]) if len(sys.argv) > 2 else 6
registry.load_all()
spark = get_spark(app_name="r10-assort-ab")


def grouped(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    baskets = li.groupBy("l_orderkey").agg(
        F.array_sort(F.array_distinct(F.collect_list("l_partkey"))).alias("parts")
    )
    pairs = (
        baskets.select(F.posexplode("parts").alias("i", "pa"), F.col("parts"))
        .select(
            "pa",
            F.explode(F.expr("slice(parts, i + 2, size(parts))")).alias("pb"),
        )
        .groupBy("pa", "pb")
        .agg(F.count("*").alias("n_ord"))
        .filter(F.col("n_ord") >= 2)
        .select("pa", "pb")
    )
    par = spark.sparkContext.defaultParallelism
    adj = checkpoint_partitioned(
        pairs.select(F.col("pa").alias("v"), F.col("pb").alias("u"))
        .unionAll(pairs.select(F.col("pb").alias("v"), F.col("pa").alias("u")))
        .repartition(par, F.col("v"))
        .groupBy("v")
        .agg(F.collect_list("u").alias("nbrs"))
    )
    d = F.size("nbrs").cast("long")
    ddec = d.cast("decimal(38,0)")
    moments = adj.agg(
        F.sum(d).alias("m2"),
        F.sum(d * d).alias("sx"),
        F.sum(ddec * ddec * ddec).alias("sxx"),
        F.count("*").alias("n_nodes"),
    )
    nb = adj.select(F.col("v").alias("u"), d.alias("d_dst"))
    s_v = (
        adj.select("v", d.alias("d"), F.explode("nbrs").alias("u"))
        .join(F.broadcast(nb), "u")
        .groupBy("v", "d")
        .agg(F.sum("d_dst").alias("sdeg"))
    )
    sxy = s_v.agg(
        F.sum(F.col("d").cast("decimal(38,0)") * F.col("sdeg")).alias("sxy")
    )
    mean = F.col("sx").cast("double") / F.col("m2")
    return sxy.crossJoin(F.broadcast(moments)).select(
        "n_nodes",
        (F.col("m2") / 2).cast("bigint").alias("n_edges"),
        F.round(
            (F.col("sxy").cast("double") / F.col("m2") - mean * mean)
            / (F.col("sxx").cast("double") / F.col("m2") - mean * mean),
            6,
        ).alias("assortativity"),
    )


current = registry.QUERIES["graph_assortativity"]

a = sorted(map(tuple, current(spark, sf).collect()))
b = sorted(map(tuple, grouped(spark, sf).collect()))
assert a == b, f"VALUE MISMATCH: {a} vs {b}"
print(f"value identity OK: {a}", flush=True)

VARIANTS = {"current": current, "grouped": grouped}
times = {k: [] for k in VARIANTS}
for i in range(reps):
    order = list(VARIANTS) if i % 2 == 0 else list(VARIANTS)[::-1]
    for label in order:
        spark.sparkContext.setJobDescription(f"assort {label} rep{i}")
        t0 = time.perf_counter()
        VARIANTS[label](spark, sf).write.format("noop").mode("overwrite").save()
        times[label].append(round(time.perf_counter() - t0, 3))

wins = sum(1 for a_, b_ in zip(times["current"], times["grouped"]) if b_ < a_)
for label, ts in times.items():
    print(f"{label}: min={min(ts):.3f} all={ts}")
print(f"grouped wins {wins}/{reps} pairings")
