#!/usr/bin/env python
"""A/B: embedding_quality_probe_eval — OLD GD (exploded (vec_id,i,x) table;
per round broadcast-weight join + vec-keyed aggregate + residual join +
dim-keyed aggregate + eager 65-row checkpoint; scoring via join+groupBy)
vs NEW (array-form base; per round ONE aggregate job with 65 avg buffers
and in-aggregate round-8; scoring map-only). Alternating reps in ONE
session, min-of-N, outputs compared exactly.

Usage: python scripts/r9_probe_ab.py [sf_dir] [reps]
"""

from __future__ import annotations

import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from brooklin_spark import registry  # noqa: E402
from brooklin_spark.io import table  # noqa: E402
from brooklin_spark.operators.distrank import global_row_number  # noqa: E402
from brooklin_spark.queries import quality_model as QM  # noqa: E402
from brooklin_spark.session import get_spark  # noqa: E402

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 6


def old_eval(spark, sf_dir):
    """The pre-r9s5 implementation, carried verbatim."""
    emb = table(spark, sf_dir, "embeddings")
    flat = (
        emb.select("vec_id", F.posexplode("embedding").alias("i0", "xf"))
        .select(
            "vec_id",
            (F.col("i0") + 1).alias("i"),
            F.col("xf").cast("double").alias("x"),
        )
        .unionByName(
            emb.select("vec_id", F.lit(0).alias("i"), F.lit(1.0).alias("x"))
        )
        .localCheckpoint()
    )
    lab = emb.select(
        "vec_id",
        F.when(F.col("label") == QM._PROBE_POS_LABEL, F.lit(1.0))
        .otherwise(F.lit(0.0))
        .alias("y"),
    ).localCheckpoint()
    w = spark.range(0, QM._PROBE_D + 1).select(
        F.col("id").cast("int").alias("i"), F.lit(0.0).alias("val")
    )
    for _ in range(QM._PROBE_ROUNDS):
        z = (
            flat.join(F.broadcast(w), "i")
            .groupBy("vec_id")
            .agg(F.sum(F.col("x") * F.col("val")).alias("z"))
        )
        resid = z.join(lab, "vec_id").select(
            "vec_id",
            (F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("z"))) - F.col("y")).alias("r"),
        )
        grad = (
            flat.join(resid, "vec_id")
            .groupBy("i")
            .agg(F.avg(F.col("r") * F.col("x")).alias("g"))
        )
        w = (
            w.join(grad, "i")
            .select(
                "i",
                F.round(F.col("val") - F.lit(QM._PROBE_LR) * F.col("g"), 8).alias("val"),
            )
            .localCheckpoint()
        )
    scored = (
        flat.join(F.broadcast(w), "i")
        .groupBy("vec_id")
        .agg(F.round(F.sum(F.col("x") * F.col("val")), 8).alias("score"))
        .join(lab, "vec_id")
        .localCheckpoint()
    )
    ranked = global_row_number(
        scored, [F.col("score").asc(), F.col("vec_id").asc()], out="rk"
    )
    agg = ranked.agg(
        F.count("*").alias("n"),
        F.sum("y").alias("n_pos"),
        F.sum(F.col("rk") * F.col("y")).alias("pos_rank_sum"),
    )
    topk = (
        scored.orderBy(F.desc("score"), F.asc("vec_id"))
        .limit(QM._PROBE_TOPK)
        .agg(F.sum("y").alias("hits"))
    )
    return agg.crossJoin(F.broadcast(topk)).select(
        F.col("n").cast("bigint").alias("n"),
        F.col("n_pos").cast("bigint").alias("n_pos"),
        F.round(
            (F.col("pos_rank_sum") - F.col("n_pos") * (F.col("n_pos") + 1) / 2.0)
            / (F.col("n_pos") * (F.col("n") - F.col("n_pos"))),
            6,
        ).alias("auc"),
        F.round(F.col("hits") / float(QM._PROBE_TOPK), 6).alias(
            f"precision_at_{QM._PROBE_TOPK}"
        ),
    )


def main() -> None:
    registry.load_all()
    spark = get_spark(app_name="probe-ab")
    new_fn = registry.QUERIES["embedding_quality_probe_eval"]

    old_eval(spark, "/root/testdata/sf0.001").write.format("noop").mode(
        "overwrite"
    ).save()
    new_fn(spark, "/root/testdata/sf0.001").write.format("noop").mode(
        "overwrite"
    ).save()

    def hygiene():
        gc.collect()
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()

    olds, news = [], []
    res_old = res_new = None
    for i in range(REPS):
        for side in ("old", "new") if i % 2 == 0 else ("new", "old"):
            hygiene()
            t0 = time.perf_counter()
            df = old_eval(spark, SF) if side == "old" else new_fn(spark, SF)
            df.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            if side == "old":
                olds.append(dt)
                res_old = [tuple(r) for r in df.collect()]
            else:
                news.append(dt)
                res_new = [tuple(r) for r in df.collect()]
        print(f"rep {i}: old {olds[-1]:.3f}s  new {news[-1]:.3f}s", flush=True)

    assert res_old == res_new, ("VALUE MISMATCH", res_old, res_new)
    wins = sum(1 for o, n in zip(olds, news) if n < o)
    print(
        f"old min {min(olds):.3f}s  new min {min(news):.3f}s  "
        f"new wins {wins}/{len(olds)} pairings  values EQUAL {res_new}"
    )


if __name__ == "__main__":
    main()
