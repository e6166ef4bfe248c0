"""The integer-cents money path (functions/exact.py) must be EXACT.

cents() claims floor(x*100 + 0.5) recovers the 1e2-scaled integer for any
double carrying <=2 decimals — the data contract of every monetary column
here. Hypothesis drives the claim over the full money range (0..1e8,
2-decimal grid) INCLUDING the worst representation-error cases (values
whose double form sits just below the true decimal), and the end-to-end
sum identity pins cents+long-sum+decimal-final == the decimal dsum policy
on a generated column (bit-identical doubles, not approx).
"""

from __future__ import annotations

from decimal import Decimal

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from brooklin_spark.functions.exact import c4sum, cents, dec, dsum, one_minus


@given(st.integers(min_value=0, max_value=10**10))
@settings(max_examples=2000, deadline=None)
def test_cents_floor_identity_on_python_semantics(c):
    # pure-python mirror of the Spark expression: double(c/100)*100 + 0.5
    # truncated must give back c for every 2-decimal money value
    x = c / 100.0  # the double the parquet file would carry
    assert int(x * 100 + 0.5) == c


def test_cents_spark_expression_matches_decimal_cast(spark):
    # the Spark-side expression on a dense grid + adversarial magnitudes:
    # compare against the decimal-policy cast used by the oracles
    df = spark.range(0, 500_000).select(
        (F.col("id").cast("double") / 100).alias("x")
    ).union(
        spark.range(0, 1000).select(
            ((F.col("id") * 9_999_937 + 3).cast("double") / 100).alias("x")
        )
    )
    bad = df.select(
        cents("x").alias("got"),
        (F.col("x").cast("decimal(12,2)") * 100).cast("long").alias("want"),
    ).filter(F.col("got") != F.col("want"))
    assert bad.count() == 0


def test_cents_sum_identity_vs_decimal_policy(spark):
    # end-to-end: grouped revenue via cents/long/c4sum must be the SAME
    # double as the decimal dsum policy (the adoption gate every converted
    # query passed at sf10; pinned here on a deterministic corpus)
    df = spark.range(0, 200_000).select(
        (F.col("id") % 7).alias("g"),
        ((F.col("id") * 37 % 10_000_000).cast("double") / 100).alias("ep"),
        ((F.col("id") * 13 % 100).cast("double") / 100).alias("disc"),
    )
    a = (
        df.groupBy("g")
        .agg(dsum(dec("ep") * one_minus("disc"), "revenue"))
        .orderBy("g")
        .collect()
    )
    part = df.groupBy("g", F.spark_partition_id().alias("_p")).agg(
        F.sum(cents("ep") * (100 - cents("disc"))).alias("s_c4")
    )
    b = part.groupBy("g").agg(c4sum(F.col("s_c4"), "revenue")).orderBy("g").collect()
    assert [r.revenue for r in a] == [r.revenue for r in b]
    # and both equal the Decimal ground truth
    import itertools

    rows = df.collect()
    truth = {}
    for r in sorted(rows, key=lambda r: r.g):
        truth.setdefault(r.g, Decimal(0))
        truth[r.g] += (Decimal(f"{r.ep:.2f}") * (1 - Decimal(f"{r.disc:.2f}")))
    want = [float(truth[g]) for g in sorted(truth)]
    assert [r.revenue for r in a] == want
