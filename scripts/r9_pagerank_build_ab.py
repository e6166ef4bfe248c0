#!/usr/bin/env python
"""A/B the PageRank graph-BUILD phase (OPTIMIZATION_r09.md "not yet
optimized" #1): current shape (packed-long distinct pairs -> checkpoint ->
two degree groupBys) vs a FUSED build (one custkey-partitioned exchange of
packed longs -> per-customer sorted-distinct supplier arrays, giving pairs
AND deg(c) from one exchange; deg(s) is the only remaining pair-scale
aggregate). Rounds are byte-identical between variants.

  python scripts/r9_pagerank_build_ab.py /root/testdata/sf0.1 [reps]
"""
import gc
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from brooklin_spark.checkpoint import checkpoint_partitioned
from brooklin_spark.io import table
from brooklin_spark.queries.dedup import (
    _PR_D,
    _PR_ITERS,
    _graph_edges,
    _graph_node_str,
    _key_upper_bound,
    graph_pagerank_influence,
)
from brooklin_spark.session import get_spark


def fused_pagerank(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    joined = o.join(li, li.l_orderkey == o.o_orderkey)
    max_c = _key_upper_bound(sf_dir, "orders", "o_custkey")
    max_s = _key_upper_bound(sf_dir, "lineitem", "l_suppkey")
    assert max_c is not None and max_s is not None
    mult = 1 << max(max_s, 1).bit_length()
    assert (max_c + 1) * mult < (1 << 63)
    packed = joined.select(
        (F.col("o_custkey") * F.lit(mult) + F.col("l_suppkey")).alias("p")
    )
    # ONE fact-scale exchange, keyed by the customer half of the packed
    # long; the per-customer distinct + sort happens inside the aggregate
    # (groupBy on the partitioning expr adds no exchange)
    ck = F.expr(f"p DIV {mult}")
    grouped = (
        packed.repartition(spark.sparkContext.defaultParallelism, ck)
        .groupBy(ck.alias("ck"))
        .agg(
            F.array_sort(F.array_distinct(F.collect_list(F.col("p") % mult))).alias(
                "ss"
            )
        )
        .localCheckpoint()
    )
    deg_c = grouped.select(
        (F.col("ck") * 2).alias("node"), F.size("ss").cast("long").alias("deg")
    )
    pairs = grouped.select(
        (F.col("ck") * 2).alias("c_node"), F.explode("ss").alias("s")
    ).select("c_node", (F.col("s") * 2 + 1).alias("s_node"))
    deg_s = pairs.groupBy(F.col("s_node").alias("node")).agg(
        F.count("*").alias("deg")
    )
    degree = deg_c.unionAll(deg_s)
    # c-direction edge rows carry deg(c) = size(ss) straight from the
    # grouped row — no join; only the s-direction needs the deg_s join
    edeg_c = grouped.select(
        (F.col("ck") * 2).alias("src"),
        F.explode("ss").alias("s"),
        F.size("ss").cast("long").alias("deg"),
    ).select("src", (F.col("s") * 2 + 1).alias("dst"), "deg")
    edeg_s = pairs.join(deg_s, deg_s.node == pairs.s_node).select(
        F.col("s_node").alias("src"), F.col("c_node").alias("dst"), "deg"
    )
    edeg_df = edeg_c.unionAll(edeg_s)
    edeg = checkpoint_partitioned(
        edeg_df.repartition(spark.sparkContext.defaultParallelism, F.col("src"))
    )
    nodes = degree.select("node")
    n = degree.count()
    ranks = nodes.select("node", F.round(F.lit(1.0) / n, 8).alias("rank"))
    base = (1.0 - _PR_D) / n
    for _ in range(_PR_ITERS):
        contribs = edeg.join(ranks, ranks.node == edeg.src).select(
            F.col("dst"), (F.col("rank") / F.col("deg")).alias("contrib")
        )
        summed = contribs.groupBy(F.col("dst").alias("node")).agg(
            F.sum("contrib").alias("inflow")
        )
        ranks = summed.select(
            "node",
            F.round(F.lit(base) + _PR_D * F.col("inflow"), 8).alias("rank"),
        )
    return ranks.select(_graph_node_str("node").alias("node"), "rank")


def hygiene(spark):
    gc.collect()
    spark.catalog.clearCache()
    spark.sparkContext._jvm.System.gc()


def timed(spark, df):
    hygiene(spark)
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return time.time() - t0


def main():
    sf_dir = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    spark = get_spark()
    spark.sparkContext.setJobDescription("r9_pagerank_build_ab")

    a = graph_pagerank_influence(spark, sf_dir).toPandas()
    b = fused_pagerank(spark, sf_dir).toPandas()
    a = a.sort_values("node", ignore_index=True)
    b = b.sort_values("node", ignore_index=True)
    if not a.equals(b):
        bad = (a != b).any(axis=1)
        print(a[bad].head(), "\n", b[bad].head())
        raise SystemExit("VALUE MISMATCH")
    print(f"values equal: {len(a)} rows (exact, incl. float bits)", flush=True)

    times = {"A": [], "B": []}
    for r in range(reps):
        for name, fn in [("A", graph_pagerank_influence), ("B", fused_pagerank)]:
            dt = timed(spark, fn(spark, sf_dir))
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
