"""Bucketed (pre-partitioned) tables for shuffle-free co-located joins.

At 100 TB the dominant cost of a repeated fact-fact join is re-shuffling
both sides on every query. Bucketing pays that shuffle ONCE at write time:
both tables hash-partition their files by the join key into the same
bucket count, so Catalyst plans the join with zero Exchange — each task
zips bucket i with bucket i. This is the Spark-native analog of the
reference's "destination partitions follow source partitions" co-location
(DatastreamTask partition assignment), applied to analytic storage.

Usage: write_bucketed() both sides with the same (key, n_buckets), then
join the saved tables — tests/test_plan_quality.py asserts the plan has no
shuffle. Sorting within buckets additionally removes the join's sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame, table_name: str, key: str, n_buckets: int, sort: bool = True
) -> None:
    """Persist df as a bucketed (and bucket-sorted) managed parquet table."""
    writer = df.write.format("parquet").mode("overwrite").bucketBy(n_buckets, key)
    if sort:
        writer = writer.sortBy(key)
    writer.saveAsTable(table_name)


def register_bucketed(
    spark: SparkSession, table_name: str, key: str, n_buckets: int, location: str
) -> None:
    """(Re-)register an existing bucketed-table directory in the catalog.

    The default in-memory catalog is session-scoped while the written
    files persist, so a later session must re-attach them as an EXTERNAL
    table carrying the same bucket spec — schema comes from the parquet
    footers (CLUSTERED BY requires an explicit column list); the bucket
    spec must match what write_bucketed used or the zero-Exchange plan
    silently turns wrong."""
    cols = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in spark.read.parquet(location).schema.fields
    )
    spark.sql(
        f"CREATE TABLE {table_name} ({cols}) USING parquet "
        f"CLUSTERED BY ({key}) SORTED BY ({key}) INTO {n_buckets} BUCKETS "
        f"LOCATION '{location}'"
    )


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key_left: str, key_right: str
) -> DataFrame:
    """Join two same-bucket-count tables on their bucket keys — planned
    without any Exchange (asserted in tests)."""
    lt = spark.table(left_table)
    rt = spark.table(right_table)
    return lt.join(rt, lt[key_left] == rt[key_right])
