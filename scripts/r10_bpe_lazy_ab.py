#!/usr/bin/env python
"""BPE cascade A/B: the r9 eager per-round loop (2 driver-synced jobs per
round: best.first() + eager localCheckpoint, copied inline below) vs the
r10 lazy cascade (1-row broadcast best tables, one action for everything).
Times text_bpe_train and text_bpe_encode_stats; value identity asserted.

  python scripts/r10_bpe_lazy_ab.py [sf_dir] [reps]
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from brooklin_spark import registry
from brooklin_spark.functions import text as X
from brooklin_spark.io import table
from brooklin_spark.queries.text import _BPE_ROUNDS, bpe_apply_merge
from brooklin_spark.session import get_spark

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
registry.load_all()
spark = get_spark(app_name="r10-bpe-ab")


def _bpe_fit_eager(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(X.tokens()).alias("w"))
    words = (
        toks.groupBy("w")
        .agg(F.count("*").alias("cnt"))
        .select(
            F.col("w").alias("wid"), "cnt", F.split("w", "(?!$)").alias("syms")
        )
        .localCheckpoint()
    )
    merges = []
    for k in range(_BPE_ROUNDS):
        flat = words.select("wid", "cnt", F.posexplode("syms").alias("i", "s"))
        wwin = W.partitionBy("wid").orderBy("i")
        nxt = flat.withColumn("s1", F.lead("s").over(wwin))
        pairs = (
            nxt.filter(F.col("s1").isNotNull())
            .groupBy("s", "s1")
            .agg(F.sum("cnt").alias("cnt"))
        )
        best = pairs.orderBy(F.desc("cnt"), F.asc("s"), F.asc("s1")).first()
        if best is None:
            break
        left, right, cnt = best["s"], best["s1"], int(best["cnt"])
        merges.append((k + 1, left, right, left + right, cnt))
        words = bpe_apply_merge(words, left, right).localCheckpoint()
    return words, merges


def train_eager(spark, sf_dir):
    _, merges = _bpe_fit_eager(spark, sf_dir)
    return spark.createDataFrame(
        merges,
        "round bigint, left_sym string, right_sym string, merged string, pair_count bigint",
    )


def encode_eager(spark, sf_dir):
    words, _ = _bpe_fit_eager(spark, sf_dir)
    sub = words.select("wid", F.size("syms").alias("n_sub"))
    docs = table(spark, sf_dir, "documents")
    dtoks = docs.select("doc_id", "source", F.explode(X.tokens()).alias("w"))
    enc = dtoks.join(sub, dtoks.w == sub.wid).select(
        "doc_id", "source", F.length("w").alias("n_chr"), "n_sub"
    )
    return enc.groupBy("source").agg(
        F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
        F.count("*").cast("bigint").alias("total_tokens"),
        F.sum("n_sub").cast("bigint").alias("total_subwords"),
        F.round(F.sum("n_sub").cast("double") / F.count("*"), 6).alias("fertility"),
        F.round(F.sum("n_chr").cast("double") / F.sum("n_sub"), 6).alias(
            "chars_per_subword"
        ),
    )


train_lazy = registry.QUERIES["text_bpe_train"]
encode_lazy = registry.QUERIES["text_bpe_encode_stats"]

a = sorted(map(tuple, train_eager(spark, sf).collect()))
b = sorted(map(tuple, train_lazy(spark, sf).collect()))
assert a == b, f"train MISMATCH\n{a}\n{b}"
c = sorted(map(tuple, encode_eager(spark, sf).collect()))
d = sorted(map(tuple, encode_lazy(spark, sf).collect()))
assert c == d, f"encode MISMATCH\n{c}\n{d}"
print(f"value identity OK (train {len(a)} rows, encode {len(c)} rows)", flush=True)

VARIANTS = {
    "train_eager": train_eager,
    "train_lazy": train_lazy,
    "encode_eager": encode_eager,
    "encode_lazy": encode_lazy,
}
times = {k: [] for k in VARIANTS}
for i in range(reps):
    order = list(VARIANTS) if i % 2 == 0 else list(VARIANTS)[::-1]
    for label in order:
        spark.sparkContext.setJobDescription(f"bpe {label} rep{i}")
        t0 = time.perf_counter()
        VARIANTS[label](spark, sf).write.format("noop").mode("overwrite").save()
        times[label].append(round(time.perf_counter() - t0, 3))

for label, ts in times.items():
    print(f"{label}: min={min(ts):.3f} all={ts}")
for q in ("train", "encode"):
    wins = sum(
        1
        for a_, b_ in zip(times[f"{q}_eager"], times[f"{q}_lazy"])
        if b_ < a_
    )
    print(f"{q}: lazy wins {wins}/{reps}")
