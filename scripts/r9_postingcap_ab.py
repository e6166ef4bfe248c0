#!/usr/bin/env python
"""A/B the shingle self-join posting-cap strategy at a given SF dir
(OPTIMIZATION_r09 'not yet optimized' #2).

  A (current): count WINDOW over the shingle exchange -> filter c<=cap ->
     self-join (both sides canonicalize to the windowed subtree;
     ReuseExchange shuffles once, SMJ reuses the window sort).
  B: lazy localCheckpoint the shingle rows -> groupBy(shingle) hot-set ->
     broadcast anti-join -> self-join (the simhash/pair_common_counts
     shape; checkpoint makes the pandas shingler single-pass).

Alternating reps, noop sink on the thresholded pair output, value check =
pair count + checksum.  python scripts/r9_postingcap_ab.py benchdata/sf1 [reps]
"""
import gc
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from brooklin_spark.session import get_spark
from brooklin_spark.io import table
import brooklin_spark.operators.dedup as D

THRESHOLD = 0.7
CAP = D.MAX_POSTING


def shingles(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    return D.shingle_rows_pandas(docs, n=3).select(
        "id", "n", F.xxhash64("shingle").alias("shingle")
    )


def variant_a(spark, sf_dir):
    return D.jaccard_pairs_selfjoin(shingles(spark, sf_dir), threshold=THRESHOLD)


def variant_b(spark, sf_dir):
    sh = shingles(spark, sf_dir).localCheckpoint(eager=False)
    hot = (
        sh.groupBy("shingle")
        .agg(F.count("*").alias("c"))
        .filter(F.col("c") > CAP)
        .select("shingle")
    )
    capped = sh.join(F.broadcast(hot), "shingle", "left_anti")
    a = capped.alias("a")
    b = capped.alias("b")
    common = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .groupBy(
            F.col("a.id").alias("doc_a"),
            F.col("b.id").alias("doc_b"),
            F.col("a.n").alias("na"),
            F.col("b.n").alias("nb"),
        )
        .agg(F.count("*").alias("common"))
    )
    jac = F.col("common") / (F.col("na") + F.col("nb") - F.col("common"))
    return common.select("doc_a", "doc_b", jac.alias("jaccard")).filter(
        F.col("jaccard") >= THRESHOLD
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
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    spark = get_spark()
    spark.sparkContext.setJobDescription("r9_postingcap_ab")

    # value check first (also warms up)
    chk = {}
    for name, fn in [("A", variant_a), ("B", variant_b)]:
        row = (
            fn(spark, sf_dir)
            .agg(
                F.count("*").alias("n"),
                F.sum(F.xxhash64("doc_a", "doc_b")).alias("h"),
                F.sum(F.round("jaccard", 8)).alias("j"),
            )
            .collect()[0]
        )
        chk[name] = (row.n, row.h, float(row.j))
        print(f"check {name}: n={row.n} h={row.h} j={row.j}", flush=True)
    assert chk["A"] == chk["B"], f"VALUE MISMATCH: {chk}"

    times = {"A": [], "B": []}
    for r in range(reps):
        for name, fn in [("A", variant_a), ("B", variant_b)]:
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
