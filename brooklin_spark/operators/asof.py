"""Generic as-of join: for each left row, the most recent right row at or
before its timestamp (per key), optionally within a tolerance.

Spark has no native as-of join; the naive formulation (inequality
self-join + argmax) explodes quadratically. This operator is the
single-window-pass composition:

  union(tag right=0, left=1) → window(partition key, order ts,tag) →
  last(right payload, ignorenulls) over rows-unbounded-preceding →
  keep left rows

One shuffle on the key, state bounded per key — survives any fact-side
scale. (pd.merge_asof via applyInPandas is the fallback for semantics this
can't express, e.g. nearest-direction joins.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: list[str] | None = None,
    tolerance_seconds: int | None = None,
    strict: bool = False,
) -> DataFrame:
    """Backward as-of join, pandas.merge_asof semantics.

    strict=False: right.ts == left.ts matches (<=); strict=True: (<).
    Result: every left row + matched_ts + value_cols (null if no match).
    """
    value_cols = value_cols or [
        c for c in right.columns if c not in (on, right_ts)
    ]
    # tag: right rows sort before left at equal ts for inclusive (<=),
    # after left for strict (<)
    right_tag, left_tag = (0, 1) if not strict else (2, 1)
    l_tagged = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(left_tag).alias("_tag"),
        F.struct(*left.columns).alias("_left"),
        F.lit(None).cast(
            right.select(F.struct(*value_cols, F.col(right_ts)).alias("s")).schema["s"].dataType
        ).alias("_rv"),
    )
    r_tagged = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(right_tag).alias("_tag"),
        F.lit(None).cast(
            left.select(F.struct(*left.columns).alias("s")).schema["s"].dataType
        ).alias("_left"),
        F.struct(*value_cols, F.col(right_ts)).alias("_rv"),
    )
    unioned = l_tagged.unionByName(r_tagged)
    w = (
        W.partitionBy("_k")
        .orderBy("_ts", "_tag")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    matched = (
        unioned.withColumn("_match", F.last("_rv", ignorenulls=True).over(w))
        .filter(F.col("_left").isNotNull())
    )
    out_cols: list[Column] = [F.col(f"_left.{c}").alias(c) for c in left.columns]
    out_cols.append(F.col(f"_match.{right_ts}").alias("matched_ts"))
    out_cols.extend(F.col(f"_match.{c}").alias(c) for c in value_cols)
    out = matched.select(*out_cols)
    if tolerance_seconds is not None:
        within = (
            F.unix_timestamp(F.col(left_ts)) - F.unix_timestamp("matched_ts")
        ) <= tolerance_seconds
        keep = F.when(within, True).otherwise(False)
        for c in ["matched_ts", *value_cols]:
            out = out.withColumn(c, F.when(keep, F.col(c)))
    return out
