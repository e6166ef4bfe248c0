"""Synthetic load source: the TestEventProducingConnector analog
(reference: datastream-testcommon/.../TestEventProducingConnector.java:48-75 —
fixed-size messages at a configured rate).

Spark's built-in rate source provides (timestamp, value); we shape it into
the envelope with a configurable message size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from brooklin_spark.model import PipelineSpec
from brooklin_spark.sources.registry import source


@source("rate")
def rate_source(spark: SparkSession, spec: PipelineSpec) -> DataFrame:
    """rate://<rows_per_second> → streaming synthetic envelope records.

    metadata: message.size (payload bytes, default 128),
    partitions (rate source parallelism).
    """
    rows_per_sec = int(spec.source_uri.removeprefix("rate://") or "10")
    msg_size = int(spec.metadata.get("message.size", "128"))
    topic = spec.metadata.get("topic", spec.name)
    raw = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_sec)
        .option("numPartitions", spec.source_partitions or 1)
        .load()
    )
    payload = F.rpad(F.concat(F.lit("msg-"), F.col("value").cast("string")), msg_size, "x")
    return raw.select(
        F.lit(topic).alias("topic"),
        F.pmod(F.col("value"), F.lit(spec.source_partitions or 1)).cast("int").alias("partition"),
        F.col("value").alias("offset"),
        F.col("value").cast("string").cast("binary").alias("key"),
        payload.cast("binary").alias("value"),
        F.lit(None).cast("binary").alias("previous_value"),
        F.lit("INSERT").alias("op_code"),
        F.col("value").alias("scn"),
        F.col("timestamp").alias("event_ts"),
        F.col("timestamp").alias("source_ts"),
        F.lit(None).cast("map<string,binary>").alias("headers"),
        F.create_map(F.lit("connector"), F.lit("rate")).alias("metadata"),
    )
