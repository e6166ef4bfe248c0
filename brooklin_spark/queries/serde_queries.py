"""SerDe queries: the framed-Avro envelope path driven over the events
table, oracle-checked.

The Spark side does real work — build DatastreamEvent records from event
rows, Avro-binary-encode them (functions/avro_codec.py), wrap in the
registry frame (MAGIC + hex-decoded schema id, AvroMessageEncoderUtil
.java:33-60), then unframe and decode back and aggregate the DECODED
fields. The DuckDB oracle computes the same aggregates from the raw rows,
so any loss or corruption anywhere in encode→frame→unframe→decode shows
up as a value mismatch.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from brooklin_spark.functions import serde
from brooklin_spark.io import table
from brooklin_spark.registry import query

_SCHEMA_ID = hashlib.md5(serde.DATASTREAM_EVENT_AVRO.encode()).hexdigest()


@query(
    "serde_avro_roundtrip",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(event_id) AS BIGINT) AS sum_scn,
           CAST(SUM(length(props)) AS BIGINT) AS sum_payload_bytes,
           CAST(32 AS INT) AS frame_overhead_ok
    FROM events WHERE event_id < 2000 GROUP BY event_type
    """,
)
def serde_avro_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    env = e.select(
        F.lit("events").alias("topic"),
        F.lit(0).alias("partition"),
        F.col("event_id").alias("offset"),
        F.col("event_id").cast("string").cast("binary").alias("key"),
        F.col("props").cast("binary").alias("value"),
        F.lit(None).cast("binary").alias("previous_value"),
        F.lit("INSERT").alias("op_code"),
        F.col("event_id").alias("scn"),
        F.create_map(F.lit("EventType"), F.col("event_type")).alias("metadata"),
    )
    framed = env.select(
        F.col("op_code"),
        serde.frame(
            serde.avro_serialize(
                serde.envelope_event_struct(env), serde.DATASTREAM_EVENT_AVRO
            ),
            _SCHEMA_ID,
        ).alias("framed"),
    )
    dec = framed.select(
        (F.length("framed") - F.lit(serde.FRAME_PREFIX_LEN)).alias("body_len"),
        serde.frame_is_valid(F.col("framed"), _SCHEMA_ID).alias("frame_ok"),
        serde.avro_deserialize(
            serde.unframe(F.col("framed")),
            serde.DATASTREAM_EVENT_AVRO,
            serde.DATASTREAM_EVENT_DDL,
        ).alias("ev"),
    )
    return dec.select(
        F.col("ev.metadata")["EventType"].alias("event_type"),
        F.col("ev.metadata")["Scn"].cast("bigint").alias("scn"),
        F.length(F.col("ev.payload")).alias("payload_len"),
        F.col("frame_ok"),
    ).groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("scn").cast("bigint").alias("sum_scn"),
        F.sum("payload_len").cast("bigint").alias("sum_payload_bytes"),
        # every frame valid AND the prefix is exactly 17 bytes + 15-byte
        # min body → constant 32 when the framing math holds
        F.when(F.min(F.col("frame_ok").cast("int")) == 1, F.lit(32))
        .otherwise(F.lit(0))
        .cast("int")
        .alias("frame_overhead_ok"),
    )
