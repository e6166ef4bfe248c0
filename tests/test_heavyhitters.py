"""operators/heavyhitters.py — Misra-Gries candidates + exact recount.

The contract is unconditional exactness: whether the guard proves the
sketch or forces the fallback, the result must equal the plain
GROUP BY / ORDER BY cnt DESC, key / LIMIT k — so every case here compares
against that reference on the same session.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from brooklin_spark.operators.heavyhitters import _mg_partition, top_k_exact


def _exact(df, k):
    return (
        df.groupBy(F.col("key"))
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("key"))
        .limit(k)
        .collect()
    )


@pytest.fixture(scope="module")
def skewed(spark):
    # zipf-ish: key 0 owns ~1/3 of rows, long uniform tail — the shape the
    # sketch is FOR (guard concludes even at tiny capacity)
    rng = random.Random(7)
    rows = []
    for i in range(6000):
        r = rng.random()
        if r < 0.34:
            rows.append((0,))
        elif r < 0.55:
            rows.append((1 + rng.randint(0, 2),))
        else:
            rows.append((10 + rng.randint(0, 999),))
    return (
        spark.createDataFrame(rows, "key bigint").repartition(7).localCheckpoint()
    )


def test_sketch_path_exact_on_skew(skewed):
    got = top_k_exact(skewed.withColumnRenamed("key", "uid"), "uid", k=4, capacity=64)
    assert [tuple(r) for r in got.collect()] == [
        tuple(r) for r in _exact(skewed, 4)
    ]


def test_guard_provably_concludes_on_skew(skewed):
    # capacity 64 on this skew: top hitter owns ~2000 of 6000 rows >>
    # N/(m+1) ~ 92 — the guard must take the sketch branch. Detect the
    # branch by plan shape: the sketch result is the k pre-computed rows
    # (no Aggregate in its plan), the fallback an aggregation plan.
    got = top_k_exact(skewed, "key", k=4, capacity=64)
    assert "Aggregate" not in got._jdf.queryExecution().logical().toString()


def test_fallback_on_uniform_is_still_exact(spark):
    rows = [(i % 97,) for i in range(3000)]
    df = spark.createDataFrame(rows, "key bigint").repartition(5).localCheckpoint()
    got = top_k_exact(df, "key", k=10, capacity=8)
    assert "Aggregate" in got._jdf.queryExecution().logical().toString()
    assert [tuple(r) for r in got.collect()] == [tuple(r) for r in _exact(df, 10)]


def test_string_keys_and_nulls(spark):
    rows = [("a",)] * 50 + [("b",)] * 30 + [(None,)] * 20 + [
        (f"t{i}",) for i in range(40)
    ]
    df = spark.createDataFrame(rows, "key string").repartition(3).localCheckpoint()
    got = [tuple(r) for r in top_k_exact(df, "key", k=2, capacity=16).collect()]
    # NULL keys are not hitters (dropped by both paths, as in the GROUP BY
    # reference where NULL would otherwise rank): pandas value_counts drops
    # NaN, and the recount joins on non-null candidates only
    assert got == [("a", 50), ("b", 30)]


def test_mg_bound_property():
    # the batched decrement must preserve the MG undercount bound:
    # any key absent from the summary has true count <= N/(m+1)
    import pandas as pd

    rng = random.Random(13)
    for trial in range(20):
        n, m = 2000, rng.choice([4, 8, 16])
        vals = [rng.randint(0, rng.choice([10, 50, 500])) for _ in range(n)]
        batches = [
            pd.DataFrame({"k": vals[i : i + 257]}) for i in range(0, n, 257)
        ]
        (out,) = list(_mg_partition(iter(batches), m))
        survivors = set(out["key"].dropna().tolist())
        true = pd.Series(vals).value_counts()
        for key, cnt in true.items():
            if key not in survivors:
                assert cnt <= n / (m + 1), (trial, key, cnt, n / (m + 1))
