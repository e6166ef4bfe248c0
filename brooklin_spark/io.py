"""Table loading helpers for the analytics layer.

All testdata access funnels through here so scans stay column-prunable and
filter-pushable: callers get the raw ``spark.read.parquet`` DataFrame (no
caching, no collect) and Catalyst prunes columns/filters into the parquet
scan per query. At 100 TB these would be partitioned/bucketed tables behind
a catalog; the API shape is the same.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}")
    # engine invariants, set at runtime so externally-created sessions (the
    # correctness driver's) behave like session.py sessions: UTC event-time
    # semantics (matches the timezone-naive DuckDB oracle) and nanos-as-long
    # for the events table (Spark 4 refuses TIMESTAMP(NANOS) otherwise)
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # "bucketed:<db>:<fallback_dir>" — the 100 TB layout: facts live as
    # bucketed catalog tables (shuffle paid once at write time, joins on
    # the bucket key plan with zero Exchange); tables not in the db fall
    # back to the plain parquet dir. Same queries, different layout —
    # scripts/spine_bucketed.py A/Bs the two.
    if sf_dir.startswith("bucketed:"):
        _, db, fallback = sf_dir.split(":", 2)
        if spark.catalog.tableExists(f"{db}.{name}"):
            return spark.table(f"{db}.{name}")
        return table(spark, fallback, name)
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # ts is parquet TIMESTAMP(NANOS) read as long (see session.py conf);
        # truncate to micros — same conversion DuckDB applies natively.
        # Derived corpora (scripts/make_benchdata.py) store micros already
        # and skip this.
        from pyspark.sql import functions as F

        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def register_views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    """Register temp views so queries can be written in Spark SQL."""
    for n in names or TABLES:
        table(spark, sf_dir, n).createOrReplaceTempView(n)
