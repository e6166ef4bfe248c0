#!/usr/bin/env python
"""events_markov_stationary candidate: the 6 power-iteration rounds run as
array HOFs over the |types|^2 matrix collected into ONE row (one groupBy
to a single row; everything after is expression work), instead of 6
broadcast-join + groupBy rounds (12 tiny exchanges + 6 broadcast builds —
pure round latency at any scale, since the matrix is domain-bounded).
Round arithmetic is the same F.round(SUM(pr*p), 12) per entry; types with
no incoming transitions drop from the vector exactly like the join rounds
(final filter on incoming-edge existence). Value identity asserted.

  python scripts/r10_markov_ab.py [sf_dir] [reps]
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from brooklin_spark import registry
from brooklin_spark.io import table
from brooklin_spark.session import get_spark

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
reps = int(sys.argv[2]) if len(sys.argv) > 2 else 6
registry.load_all()
spark = get_spark(app_name="r10-markov-ab")

_MARKOV_ITERS = 6


def arrayform(spark, sf_dir):
    e = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select("event_type", F.lag("event_type").over(w).alias("prev_type"))
    trans = (
        seq.filter(F.col("prev_type").isNotNull())
        .groupBy(
            F.col("prev_type").alias("from_type"),
            F.col("event_type").alias("to_type"),
        )
        .agg(F.count("*").alias("n"))
    )
    totals = trans.groupBy(F.col("from_type").alias("tf")).agg(
        F.sum("n").alias("total")
    )
    probs = trans.join(F.broadcast(totals), F.col("tf") == trans.from_type).select(
        "from_type",
        "to_type",
        F.round(F.col("n").cast("double") / F.col("total"), 6).alias("p"),
    )
    # ONE row holding the whole domain-bounded matrix; every iteration is
    # expression work on it — no further exchange, no broadcast builds
    mat = probs.groupBy().agg(
        F.collect_list(F.struct("from_type", "to_type", "p")).alias("m")
    )
    ts_col = F.array_sort(
        F.array_distinct(
            F.concat(
                F.transform("m", lambda x: x["from_type"]),
                F.transform("m", lambda x: x["to_type"]),
            )
        )
    )
    mat = mat.select("m", ts_col.alias("ts"))
    # ALL rounds in one aggregate whose ACCUMULATOR carries the vector:
    # the lambda variable p_acc is a bound VALUE per outer step, so the
    # expression tree is constant-size and evaluation is linear
    # (iters x |m|) — naive nesting re-derives the previous vector per
    # element and blows up ~|m|x per round (measured: interpreter hang)
    p0 = F.transform("ts", lambda t: F.lit(1.0) / F.size("ts"))
    p_final = F.aggregate(
        F.sequence(F.lit(1), F.lit(_MARKOV_ITERS)),
        p0,
        lambda p_acc, _: F.transform(
            "ts",
            lambda t: F.round(
                F.aggregate(
                    F.filter("m", lambda e: e["to_type"] == t),
                    F.lit(0.0),
                    lambda acc, e: acc
                    + F.element_at(
                        p_acc, F.array_position("ts", e["from_type"]).cast("int")
                    )
                    * e["p"],
                ),
                12,
            ),
        ),
    )
    mat = mat.withColumn("p", p_final)
    out = mat.select(
        F.explode(F.arrays_zip(F.col("ts").alias("t"), F.col("p").alias("pr"))).alias("z"),
        "m",
    ).select(
        F.col("z.t").alias("event_type"),
        F.round("z.pr", 6).alias("stationary_prob"),
        "m",
    )
    # the join rounds drop types with no incoming transitions at round 1;
    # replicate with an existence filter on the matrix
    return out.filter(
        F.exists("m", lambda e: e["to_type"] == F.col("event_type"))
    ).select("event_type", "stationary_prob")


current = registry.QUERIES["events_markov_stationary"]

a = sorted(map(tuple, current(spark, sf).collect()))
b = sorted(map(tuple, arrayform(spark, sf).collect()))
assert a == b, f"VALUE MISMATCH\n{a}\n{b}"
print(f"value identity OK ({len(a)} rows): {a}", flush=True)

VARIANTS = {"current": current, "arrayform": arrayform}
times = {k: [] for k in VARIANTS}
for i in range(reps):
    order = list(VARIANTS) if i % 2 == 0 else list(VARIANTS)[::-1]
    for label in order:
        spark.sparkContext.setJobDescription(f"markov {label} rep{i}")
        t0 = time.perf_counter()
        VARIANTS[label](spark, sf).write.format("noop").mode("overwrite").save()
        times[label].append(round(time.perf_counter() - t0, 3))

wins = sum(1 for x, y in zip(times["current"], times["arrayform"]) if y < x)
for label, ts in times.items():
    print(f"{label}: min={min(ts):.3f} all={ts}")
print(f"arrayform wins {wins}/{reps} pairings")
