"""operators/distrank.py — exact distributed ROW_NUMBER/NTILE.

The decomposition must match Spark's own single-partition window
bit-for-bit on any total order, including re-evaluation stability (the
range boundaries are sampled, so the checkpoint discipline inside the
operator is what keeps the counts and ranks consistent — a regression
here shows up as off-by-partition rank drift, not a crash).
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from brooklin_spark.operators.distrank import global_ntile, global_row_number


@pytest.fixture(scope="module")
def skewed(spark):
    # heavy ties (v in [0,40]) force the custkey-style tie-break and put
    # equal keys on both sides of sampled range boundaries
    rng = random.Random(11)
    rows = [(i, rng.randint(0, 40), rng.random()) for i in range(5003)]
    return (
        spark.createDataFrame(rows, "id bigint, v bigint, x double")
        .repartition(13)
        .localCheckpoint()
    )


def test_row_number_matches_window_oracle(spark, skewed):
    order = [F.desc("v"), F.asc("id")]
    got = global_row_number(skewed, order, out="rk", buckets=8)
    exp = skewed.select(
        "id", F.row_number().over(W.orderBy(F.desc("v"), F.asc("id"))).alias("e")
    )
    j = got.join(exp, "id")
    assert j.count() == 5003
    assert j.filter(F.col("rk") != F.col("e")).count() == 0


@pytest.mark.parametrize("k", [3, 5, 7])
def test_ntile_matches_window_oracle(spark, skewed, k):
    order = [F.asc("v"), F.asc("id")]
    got = global_ntile(skewed, k, order, out="t", buckets=8)
    exp = skewed.select(
        "id", F.ntile(k).over(W.orderBy(F.asc("v"), F.asc("id"))).alias("e")
    )
    j = got.join(exp, "id")
    assert j.filter(F.col("t") != F.col("e")).count() == 0


def test_total_out_and_small_n_edge(spark):
    small = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 30)], "id bigint, v bigint"
    )
    ranked = global_row_number(
        small, [F.asc("v"), F.asc("id")], out="rk", total_out="n", buckets=4
    )
    rows = {r.id: (r.rk, r.n) for r in ranked.collect()}
    assert rows == {1: (1, 3), 2: (2, 3), 3: (3, 3)}
    # N < k: ntile degenerates to rank
    tiles = global_ntile(small, 5, [F.asc("v"), F.asc("id")], out="t", buckets=4)
    assert {r.id: r.t for r in tiles.collect()} == {1: 1, 2: 2, 3: 3}


def test_rank_is_stable_across_actions(spark, skewed):
    """Two actions on the same returned DataFrame must agree — the
    in-operator checkpoint pins one boundary placement."""
    order = [F.desc("v"), F.asc("id")]
    got = global_row_number(skewed, order, out="rk", buckets=8)
    a = sorted((r.id, r.rk) for r in got.select("id", "rk").collect())
    b = sorted((r.id, r.rk) for r in got.select("id", "rk").collect())
    assert a == b


def test_no_fact_scale_single_partition_window(spark, skewed):
    """The plan's only unpartitioned window runs over the <=buckets-row
    per-partition counts (ordered by __dr_pid) — never the data."""
    got = global_row_number(skewed, [F.asc("v"), F.asc("id")], out="rk", buckets=8)
    got.collect()
    plan = got._jdf.queryExecution().executedPlan().toString()
    bad = [
        ln
        for ln in plan.splitlines()
        if "windowspecdefinition" in ln and "__dr_pid" not in ln
    ]
    assert not bad, bad


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=8, deadline=None)
@given(
    vals=st.lists(st.integers(min_value=0, max_value=6), min_size=1, max_size=120),
    k=st.integers(min_value=1, max_value=9),
    buckets=st.integers(min_value=1, max_value=11),
)
def test_property_ntile_any_shape(spark, vals, k, buckets):
    """For ANY multiset of heavily-tied values, any k and any bucket
    count (including buckets=1 and N<k), the decomposition equals the
    single-partition window bit-for-bit."""
    rows = [(i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "id bigint, v bigint").repartition(5)
    order = [F.asc("v"), F.asc("id")]
    got = {
        (r.id): (r.rk, r.t)
        for r in global_ntile(
            global_row_number(df, order, out="rk", buckets=buckets),
            k,
            order,
            out="t",
            buckets=buckets,
        ).collect()
    }
    exp = {
        (r.id): (r.rk, r.t)
        for r in df.select(
            "id",
            F.row_number().over(W.orderBy(F.asc("v"), F.asc("id"))).alias("rk"),
            F.ntile(k).over(W.orderBy(F.asc("v"), F.asc("id"))).alias("t"),
        ).collect()
    }
    assert got == exp


def test_global_running_sum_matches_pandas(spark):
    """Exact prefix sum over a total order equals the single-node cumsum
    for arbitrary data and any bucket count (boundary placement must not
    matter)."""
    import pandas as pd

    from brooklin_spark.operators.distrank import global_running_sum
    from pyspark.sql import functions as F

    pdf = pd.DataFrame(
        {
            "k": [(i * 37) % 101 for i in range(500)],
            "v": [((i * 13) % 7) - 3 for i in range(500)],
        }
    )
    df = spark.createDataFrame(pdf)
    for buckets in (1, 3, 16):
        got = (
            global_running_sum(
                df,
                [F.col("k").asc(), F.col("v").asc()],
                "v",
                out="cum",
                total_out="tot",
                buckets=buckets,
            )
            .orderBy("k", "v")
            .toPandas()
        )
        ref = pdf.sort_values(["k", "v"], ignore_index=True)
        assert list(got["cum"]) == list(ref["v"].cumsum()), buckets
        assert set(got["tot"]) == {pdf["v"].sum()}, buckets
