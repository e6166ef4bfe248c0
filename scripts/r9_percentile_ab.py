#!/usr/bin/env python
"""A/B percentile_battery: per-group full-buffer exact percentile() vs a
distributed exact percentile (tagged value-count aggregate -> distrank
global_running_sum -> 30-row broadcast rank lookup + Spark-formula
interpolation).

  python scripts/r9_percentile_ab.py /root/testdata/sf0.1 [reps]
"""
import gc
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from brooklin_spark.session import get_spark
from brooklin_spark.io import table
from brooklin_spark.operators.distrank import global_running_sum
from brooklin_spark.queries.tpch_more import percentile_battery


def distperc(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    vals = li.select(
        "l_returnflag",
        F.explode(
            F.array(
                F.struct(
                    F.lit(0).alias("tag"),
                    F.col("l_extendedprice").cast("double").alias("v"),
                ),
                F.struct(
                    F.lit(1).alias("tag"),
                    F.col("l_quantity").cast("double").alias("v"),
                ),
            )
        ).alias("x"),
    ).select("l_returnflag", "x.tag", "x.v")
    cnt = vals.groupBy("l_returnflag", "tag", "v").agg(F.count("*").alias("c"))
    ranked = global_running_sum(
        cnt, [F.col("l_returnflag"), F.col("tag"), F.col("v")], "c", out="cum"
    )
    gt = (
        ranked.groupBy("l_returnflag", "tag")
        .agg(F.max("cum").alias("hi_cum"), F.sum("c").alias("n"))
        .withColumn("base", F.col("hi_cum") - F.col("n"))
    )
    spec = spark.createDataFrame(
        [(0, 0, 0.25), (0, 1, 0.5), (0, 2, 0.75), (0, 3, 0.99), (1, 0, 0.5)],
        "tag int, qi int, q double",
    )
    pos = F.col("q") * (F.col("n") - 1).cast("double")
    tgt = gt.join(F.broadcast(spec), "tag").select(
        F.col("l_returnflag").alias("t_flag"),
        F.col("tag").alias("t_tag"),
        "qi",
        pos.alias("pos"),
        F.floor(pos).alias("k_lo"),
        F.ceil(pos).alias("k_hi"),
        "base",
    )
    look = tgt.select(
        "t_flag",
        "t_tag",
        "qi",
        "pos",
        "k_lo",
        "k_hi",
        "base",
        F.explode(F.array_distinct(F.array("k_lo", "k_hi"))).alias("k"),
    ).withColumn("gk", F.col("k") + F.col("base"))
    hit = ranked.join(
        F.broadcast(look),
        (ranked.l_returnflag == look.t_flag)
        & (ranked.tag == look.t_tag)
        & (F.col("gk") >= F.col("cum") - F.col("c"))
        & (F.col("gk") < F.col("cum")),
    )
    per = hit.groupBy("t_flag", "t_tag", "qi", "pos", "k_lo", "k_hi", "base").agg(
        F.max(F.when(F.col("gk") == F.col("k_lo") + F.col("base"), F.col("v"))).alias(
            "v_lo"
        ),
        F.max(F.when(F.col("gk") == F.col("k_hi") + F.col("base"), F.col("v"))).alias(
            "v_hi"
        ),
    )
    res = F.when(F.col("k_lo") == F.col("k_hi"), F.col("v_lo")).otherwise(
        (F.col("k_hi").cast("double") - F.col("pos")) * F.col("v_lo")
        + (F.col("pos") - F.col("k_lo").cast("double")) * F.col("v_hi")
    )
    per = per.select("t_flag", "t_tag", "qi", res.alias("r"))

    def cell(tag, qi):
        return F.round(
            F.max(F.when((F.col("t_tag") == tag) & (F.col("qi") == qi), F.col("r"))),
            8,
        )

    wide = per.groupBy(F.col("t_flag").alias("l_returnflag")).agg(
        cell(0, 0).alias("price_p25"),
        cell(0, 1).alias("price_p50"),
        cell(0, 2).alias("price_p75"),
        cell(0, 3).alias("price_p99"),
        cell(1, 0).alias("qty_median"),
    )
    nrow = gt.filter(F.col("tag") == 0).select(
        "l_returnflag", F.col("n").cast("bigint").alias("n")
    )
    return wide.join(nrow, "l_returnflag")


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
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = get_spark()
    spark.sparkContext.setJobDescription("r9_percentile_ab")

    a = percentile_battery(spark, sf_dir).toPandas()
    b = distperc(spark, sf_dir).toPandas()
    cols = sorted(a.columns)
    a = a[cols].sort_values(cols).reset_index(drop=True)
    b = b[cols].sort_values(cols).reset_index(drop=True)
    if not a.equals(b):
        print("A:\n", a, "\nB:\n", b)
        raise SystemExit("VALUE MISMATCH")
    print(f"values equal: {len(a)} rows (exact, incl. float bits)", flush=True)

    times = {"A": [], "B": []}
    for r in range(reps):
        for name, fn in [("A", percentile_battery), ("B", distperc)]:
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
