"""Storage layout operators: partitioned + bucket/sorted parquet writes.

At 100 TB the read-side plan is only half the story — the write-side
LAYOUT decides how much of the lake a query touches:

- hive-style partition columns (e.g. event date) let Catalyst prune whole
  directories at planning time (`PartitionFilters` in the scan, asserted in
  tests/test_plan_quality.py) — a date-ranged query reads days, not years;
- sorting within files tightens parquet min/max row-group statistics, so
  pushed filters skip row groups inside the surviving partitions;
- see operators/bucketing.py for the join-key layout (shuffle-free joins).

The reference's directory sink writes flat files; this is the analytic
upgrade of that surface for the envelope/event tables the engine lands.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_date_partitioned(
    df: DataFrame,
    path: str,
    ts_col: str = "ts",
    sort_cols: list[str] | None = None,
) -> None:
    """Write df as parquet partitioned by the date of ``ts_col`` (hive
    layout, `dt=YYYY-MM-DD/` directories), optionally sorted within
    partitions for tight row-group statistics."""
    out = df.withColumn("dt", F.date_format(F.col(ts_col), "yyyy-MM-dd"))
    if sort_cols:
        out = out.repartition("dt").sortWithinPartitions(*sort_cols)
    out.write.mode("overwrite").partitionBy("dt").parquet(path)


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)
