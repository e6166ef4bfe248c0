"""Round-9 probe: k-core peel variants at sf0.1 — goal <= 2 s.

Variant A (current shipped): meta .first() for k, per-round degree groupBy
+ two left_semi joins, lazy checkpoints.
Variant B: no driver action for k — kv 1-row aggregate crossJoined
(broadcast) into the filter; stat rows pick k from the kv join.
Variant C: B + fused survival: explode edges to (c, s, node) long rows,
one join against alive degrees, groupBy (c,s) HAVING count=2 — replaces
the two semi-join exchanges with join+groupBy.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F

from brooklin_spark.queries.dedup import _graph_pairs
from brooklin_spark.session import get_spark

ROUNDS = 3


def degree(edges: DataFrame) -> DataFrame:
    return (
        edges.select(F.col("c").alias("node"))
        .unionAll(edges.select(F.col("s").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("d"))
    )


def variant_b(spark, sf_dir):
    e = _graph_pairs(spark, sf_dir).select(
        F.col("c_node").alias("c"), F.col("s_node").alias("s")
    ).localCheckpoint(eager=False)
    deg = degree(e).localCheckpoint(eager=False)
    kv = deg.agg(
        ((F.sum("d") / (2 * F.count("*"))).cast("bigint") + 1).alias("k"),
        F.count("*").alias("n_nodes0"),
        (F.sum("d") / 2).cast("bigint").alias("n_edges0"),
    ).localCheckpoint(eager=False)

    def stat_row(r: int, d: DataFrame) -> DataFrame:
        return d.agg(
            F.lit(r).cast("bigint").alias("round"),
            F.count("*").cast("bigint").alias("n_nodes"),
            (F.coalesce(F.sum("d"), F.lit(0)) / 2).cast("bigint").alias("n_edges"),
        )

    stats = [stat_row(0, deg)]
    for r in range(1, ROUNDS + 1):
        alive = (
            deg.join(F.broadcast(kv.select("k")), F.col("d") >= F.col("k"))
            .select("node")
        )
        e = (
            e.join(alive, e.c == alive.node, "left_semi")
            .join(alive, F.col("s") == alive.node, "left_semi")
            .localCheckpoint(eager=False)
        )
        deg = degree(e).localCheckpoint(eager=False)
        stats.append(stat_row(r, deg))
    out = stats[0]
    for s in stats[1:]:
        out = out.unionAll(s)
    return (
        out.join(F.broadcast(kv.select("k")))
        .select("round", "k", "n_nodes", "n_edges")
        .orderBy("round")
    )


def variant_c(spark, sf_dir):
    e = _graph_pairs(spark, sf_dir).select(
        F.col("c_node").alias("c"), F.col("s_node").alias("s")
    ).localCheckpoint(eager=False)
    deg = degree(e).localCheckpoint(eager=False)
    kv = deg.agg(
        ((F.sum("d") / (2 * F.count("*"))).cast("bigint") + 1).alias("k"),
    ).localCheckpoint(eager=False)

    def stat_row(r: int, d: DataFrame) -> DataFrame:
        return d.agg(
            F.lit(r).cast("bigint").alias("round"),
            F.count("*").cast("bigint").alias("n_nodes"),
            (F.coalesce(F.sum("d"), F.lit(0)) / 2).cast("bigint").alias("n_edges"),
        )

    stats = [stat_row(0, deg)]
    for r in range(1, ROUNDS + 1):
        alive = deg.join(F.broadcast(kv), F.col("d") >= F.col("k")).select("node")
        long = e.select(
            "c", "s", F.explode(F.array("c", "s")).alias("node")
        )
        e = (
            long.join(alive, "node")
            .groupBy("c", "s")
            .agg(F.count("*").alias("hits"))
            .filter(F.col("hits") == 2)
            .select("c", "s")
            .localCheckpoint(eager=False)
        )
        deg = degree(e).localCheckpoint(eager=False)
        stats.append(stat_row(r, deg))
    out = stats[0]
    for s in stats[1:]:
        out = out.unionAll(s)
    return (
        out.join(F.broadcast(kv))
        .select("round", "k", "n_nodes", "n_edges")
        .orderBy("round")
    )


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="r9-kcore-probe")
    from brooklin_spark import registry

    registry.load_all()
    variants = {
        "A_current": registry.QUERIES["graph_kcore_bounded"],
        "B_kv_nofirst": variant_b,
        "C_fused": variant_c,
    }
    rows = {}
    for name, fn in variants.items():
        fn(spark, "/root/testdata/sf0.001").write.format("noop").mode(
            "overwrite"
        ).save()
        best = 9e9
        for _ in range(4):
            t0 = time.perf_counter()
            fn(spark, sf).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
            spark.catalog.clearCache()
        rows[name] = sorted(
            tuple(r) for r in fn(spark, sf).collect()
        )
        print(f"{name}: {best:.3f}s  rows={rows[name]}")
    assert rows["A_current"] == rows["B_kv_nofirst"] == rows["C_fused"], "MISMATCH"
    print("values identical across variants")


if __name__ == "__main__":
    main()
