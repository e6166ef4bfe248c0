#!/usr/bin/env python
"""A/B events_concurrency_profile: current 3-consumer shape (checkpointed
net -> daily offsets + broadcast-join windowed run + starts) vs the fused
single-consumer shape (one day-repartitioned window pass computing the
within-day running sum, then ONE groupBy(day) yielding max_within/day_d/
starts, carry added on the day-scale table).

  python scripts/r9_concprofile_ab.py /root/testdata/sf0.1 [reps]
"""
import gc
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from brooklin_spark.session import get_spark
from brooklin_spark.io import table
from brooklin_spark.queries.analytics import events_concurrency_profile


def fused(spark, sf_dir):
    e = table(spark, sf_dir, "events")
    uw = W.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(uw)
    gap_s = F.unix_timestamp("ts") - F.unix_timestamp(prev_ts)
    is_new = F.when(prev_ts.isNull() | (gap_s > 1800), 1).otherwise(0)
    numbered = e.select("user_id", "ts", "event_id").withColumn(
        "session_seq",
        F.sum(is_new).over(uw.rowsBetween(W.unboundedPreceding, W.currentRow)),
    )
    sess = numbered.groupBy("user_id", "session_seq").agg(
        F.min("ts").alias("st"), F.max("ts").alias("en")
    )
    bound = sess.select(
        F.explode(
            F.array(
                F.struct(F.col("st").alias("ts"), F.lit(1).alias("d")),
                F.struct(
                    (F.col("en") + F.expr("INTERVAL 1 SECOND")).alias("ts"),
                    F.lit(-1).alias("d"),
                ),
            )
        ).alias("b")
    ).select("b.ts", "b.d")
    net = bound.groupBy("ts").agg(
        F.sum("d").alias("d"),
        F.sum(F.when(F.col("d") == 1, 1).otherwise(0)).alias("n_starts"),
    )
    perday = (
        net.withColumn("day", F.col("ts").cast("date"))
        .withColumn("run", F.sum("d").over(W.partitionBy("day").orderBy("ts")))
        .groupBy("day")
        .agg(
            F.max("run").alias("max_within"),
            F.sum("d").alias("day_d"),
            F.sum("n_starts").alias("sessions_started"),
        )
    )
    dw = W.orderBy("day")
    return perday.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        (
            F.sum("day_d").over(dw) - F.col("day_d") + F.col("max_within")
        ).cast("bigint").alias("peak_concurrency"),
        F.col("sessions_started").cast("bigint").alias("sessions_started"),
    )


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
    spark.sparkContext.setJobDescription("r9_concprofile_ab")

    a = events_concurrency_profile(spark, sf_dir).toPandas()
    b = fused(spark, sf_dir).toPandas()
    cols = sorted(a.columns)
    a = a[cols].sort_values(cols).reset_index(drop=True)
    b = b[cols].sort_values(cols).reset_index(drop=True)
    assert a.equals(b), f"VALUE MISMATCH\n{a}\n{b}"
    print(f"values equal: {len(a)} rows", flush=True)

    times = {"A": [], "B": []}
    for r in range(reps):
        for name, fn in [
            ("A", events_concurrency_profile),
            ("B", fused),
        ]:
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
