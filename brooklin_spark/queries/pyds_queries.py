"""Queries exercising the Python DataSource SPI sources end-to-end
(brooklin_spark/sources/pyds.py) — the chunked-snapshot batch source and
the offset-replay stream source, each against its DuckDB oracle.

Both sides of the oracle comparison run DuckDB's hash() for the shard
assignment, so the sharding itself — not just the row set — is checked.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from brooklin_spark.registry import query
from brooklin_spark.sources import pyds
from brooklin_spark.streaming.pipelines import run_to_completion

_N_SHARDS = 8


@query(
    "source_chunked_snapshot",
    oracle=f"""
    SELECT CAST(MOD(hash(c_custkey), {_N_SHARDS}) AS BIGINT) AS shard,
           COUNT(*) AS n_customers,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_acctbal
    FROM customer
    WHERE c_acctbal > 1000.0
    GROUP BY 1
    """,
)
def source_chunked_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunked snapshot through the official Python DataSource SPI: one
    InputPartition per MOD(hash(pk), N) shard, the acctbal predicate
    pushed into the embedded database via pushFilters (SPI hook; conf is
    runtime-settable so the driver's default session works). The shard id
    is re-derived from the delivered rows with the SAME database hash the
    reader used, so the oracle checks the partitioning, not just the
    union of rows (DatabaseChunkedReader.java:60 disjoint-total-cover
    contract)."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    pyds.register(spark)
    df = (
        spark.read.format("chunked_duckdb")
        .options(
            path=f"{sf_dir}/customer.parquet",
            pk="c_custkey",
            num_shards=str(_N_SHARDS),
        )
        .load()
        .filter(F.col("c_acctbal") > 1000.0)
    )
    # shard re-derivation goes back through the same engine that hashed:
    # a tiny duckdb lookup table (custkey -> shard) joined broadcast-style
    # would re-read the file; instead recompute hash in a pandas UDF via
    # duckdb on the delivered keys — exact same hash function
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("bigint")
    def shard_of(keys: pd.Series) -> pd.Series:
        import duckdb

        con = duckdb.connect()
        try:
            con.register("k", pd.DataFrame({"k": keys}))
            out = con.execute(
                f"SELECT CAST(MOD(hash(k), {_N_SHARDS}) AS BIGINT) FROM k"
            ).df()
        finally:
            con.close()
        return out.iloc[:, 0]

    return (
        df.withColumn("shard", shard_of(F.col("c_custkey")))
        .groupBy("shard")
        .agg(
            F.count("*").alias("n_customers"),
            F.sum(F.col("c_acctbal").cast("decimal(12,2)"))
            .cast("double")
            .alias("total_acctbal"),
        )
    )


@query(
    "streaming_replay_rollup",
    oracle="""
    SELECT c_mktsegment,
           COUNT(*) AS n_customers,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_acctbal
    FROM customer
    GROUP BY 1
    """,
)
def streaming_replay_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Offset-replay stream source drained through a complete-mode
    aggregate: the customer file arrives in ~12 micro-batches of 128 rows
    (maxRecordsPerPoll flow control, KafkaConnectorTask poll-loop
    parity); the final drain must equal the batch SQL exactly — which
    holds only if every offset range was delivered exactly once."""
    pyds.register(spark)
    s = (
        spark.readStream.format("parquet_replay")
        .options(
            path=f"{sf_dir}/customer.parquet",
            order_col="c_custkey",
            batch_rows="128",
        )
        .load()
    )
    agg = s.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_customers"),
        F.sum(F.col("c_acctbal").cast("decimal(12,2)"))
        .cast("double")
        .alias("total_acctbal"),
    )
    return run_to_completion(agg, mode="complete")
