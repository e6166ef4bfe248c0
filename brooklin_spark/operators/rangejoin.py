"""Bucketed range join: the scale path for interval/theta joins.

A naive point-in-interval join is non-equi, so Spark plans a (broadcast)
nested loop — O(facts × intervals). Bucketing both sides on
floor(value / width) turns it into an equi-join: each interval explodes
into the buckets it spans (bounded intervals ⇒ bounded expansion), each
fact lands in one bucket, and the exact containment predicate filters
residue after the hash join. At 100 TB the shuffle is keyed on bucket —
no cross product ever materializes, and skew maps to hot buckets, which
shrinking ``width`` splits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bucketed_range_join(
    facts: DataFrame,
    intervals: DataFrame,
    value_col: str,
    lo_col: str,
    hi_col: str,
    width: int,
    how: str = "inner",
) -> DataFrame:
    """Join facts to every interval containing them ([lo, hi] inclusive).

    ``width`` trades interval-row expansion (≈ span/width buckets per
    interval) against bucket selectivity; set it near the median interval
    span so most intervals cover 1-2 buckets.
    """
    fb = facts.select("*", F.floor(F.col(value_col) / width).alias("_bucket"))
    ib = intervals.select(
        "*",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / width), F.floor(F.col(hi_col) / width)
            )
        ).alias("_bucket"),
    )
    joined = fb.join(ib, "_bucket", how).filter(
        (F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) <= F.col(hi_col))
    )
    return joined.drop("_bucket")
