#!/usr/bin/env python
"""Alternating A/B for graph_assortativity: registered shape (two lazy
localCheckpoints on edges/deg) vs a checkpoint-free variant that leans on
ReuseExchange to dedupe the shared subtrees inside ONE plan. Hypothesis:
at sf0.1 the checkpoint materialization jobs are pure overhead because
the pairs-groupBy exchange and the deg-aggregate exchange canonicalize
equal across all consumers; at scale the checkpoint also buys nothing a
reused exchange does not (same single query, no iteration).

  python scripts/r9_assort_ab.py <sf_dir> [reps]
"""
import gc
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from brooklin_spark.io import table
from brooklin_spark.queries.dedup import graph_assortativity
from brooklin_spark.session import get_spark


def variant_nockpt(spark, sf_dir):
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
    edges = pairs.select(
        F.col("pa").alias("src"), F.col("pb").alias("dst")
    ).unionAll(
        pairs.select(F.col("pb").alias("src"), F.col("pa").alias("dst"))
    )
    deg = edges.groupBy(F.col("src").alias("v")).agg(F.count("*").alias("d"))
    dd = F.col("d").cast("decimal(38,0)")
    moments = deg.agg(
        F.sum("d").alias("m2"),
        F.sum(F.col("d") * F.col("d")).alias("sx"),
        F.sum(dd * dd * dd).alias("sxx"),
        F.count("*").alias("n_nodes"),
    )
    nb = deg.select(F.col("v").alias("u"), F.col("d").alias("d_dst"))
    s_v = (
        edges.join(nb, edges.dst == nb.u)
        .groupBy("src")
        .agg(F.sum("d_dst").alias("sdeg"))
    )
    sxy = s_v.join(deg, s_v.src == deg.v).agg(
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


def hygiene(spark):
    gc.collect()
    spark.catalog.clearCache()
    spark.sparkContext._jvm.System.gc()


def main():
    sf_dir = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = get_spark()

    a = graph_assortativity(spark, sf_dir).toPandas()
    b = variant_nockpt(spark, sf_dir).toPandas()
    assert a.equals(b), f"VALUE MISMATCH\n{a}\n{b}"
    print(f"values equal: {a.to_dict('records')}", flush=True)

    times = {"ckpt": [], "nockpt": []}
    for r in range(reps):
        for name, fn in [("ckpt", graph_assortativity), ("nockpt", variant_nockpt)]:
            hygiene(spark)
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            times[name].append(dt)
            print(f"rep {r} {name}: {dt:.2f}s", flush=True)
    print(
        "RESULT",
        {k: round(min(v), 2) for k, v in times.items()},
        {k: [round(x, 2) for x in v] for k, v in times.items()},
        flush=True,
    )


if __name__ == "__main__":
    main()
