"""Kafka sources: single-topic consume and whole-cluster regex mirroring.

Reference semantics (SURVEY.md §2.1):
- KafkaConnectorTask.java:38,87-92,125-155 — subscribe one topic, translate
  ConsumerRecord → envelope with origin metadata.
- KafkaMirrorMakerConnectorTask.java:243-277 — subscribePattern regex,
  destination topic rewrite with prefix.
- KafkaConnector.java:118-131 — per-partition start offsets json
  ("system.start.position" → startingOffsets).

The spark-sql-kafka package is not bundled in this environment; the builder
constructs the full reader config and raises a clear error only when the
format is genuinely unavailable, so specs validate and unit tests cover the
option mapping without brokers.

URI forms:
  kafka://host:9092/topicA           subscribe
  kafka://host:9092/^prefix.*$       subscribePattern (mirror)
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from brooklin_spark.model import PipelineSpec
from brooklin_spark.sources.registry import source

_REGEX_MARKERS = ("^", "$", "*", "(", "[", "\\")


def parse_kafka_uri(uri: str) -> tuple[str, str, bool]:
    """→ (bootstrap_servers, topic_or_pattern, is_pattern)."""
    rest = uri.removeprefix("kafka://")
    servers, _, topic = rest.partition("/")
    if not servers or not topic:
        raise ValueError(f"kafka uri must be kafka://host:port/topic: {uri!r}")
    return servers, topic, any(m in topic for m in _REGEX_MARKERS)


def kafka_reader_options(spec: PipelineSpec) -> dict[str, str]:
    """The option map the reference's consumer config collapses to."""
    servers, topic, is_pattern = parse_kafka_uri(spec.source_uri)
    opts = {
        "kafka.bootstrap.servers": servers,
        ("subscribePattern" if is_pattern else "subscribe"): topic,
        # auto.offset.reset analog (KafkaConnector system.auto.offset.reset)
        "startingOffsets": spec.metadata.get("system.auto.offset.reset", "earliest"),
        "failOnDataLoss": spec.metadata.get("fail.on.data.loss", "false"),
    }
    start_pos = spec.metadata.get("system.start.position")
    if start_pos:
        # {partition: offset} json → Kafka source startingOffsets json shape.
        # Spark's Kafka source asserts that EVERY TopicPartition is listed
        # when specific offsets are given, while the reference allows a
        # PARTIAL map with auto.offset.reset fallback for the rest
        # (KafkaConnector.java:118-131). Bridge: fill unlisted partitions
        # with the -2/-1 sentinels (earliest/latest per the configured
        # reset policy) using the spec's declared partition count. Without
        # source_partitions a partial map would fail on a real broker, so
        # reject it eagerly with an actionable message.
        offsets = {str(p): int(o) for p, o in json.loads(start_pos).items()}
        n_parts = spec.source_partitions or 0
        if n_parts:
            sentinel = -1 if opts["startingOffsets"] == "latest" else -2
            for p in range(n_parts):
                offsets.setdefault(str(p), sentinel)
        elif len(offsets) > 0:
            listed = sorted(int(p) for p in offsets)
            if listed != list(range(len(listed))):
                raise ValueError(
                    "system.start.position lists a partial partition map "
                    f"({listed}) but spec.source_partitions is unset; Spark's "
                    "Kafka source requires offsets for ALL partitions — set "
                    "source_partitions so the rest can be filled with "
                    "earliest/latest sentinels"
                )
        opts["startingOffsets"] = json.dumps({topic: offsets})
    # flow control (maxInFlightMessagesThreshold analog): bound per-trigger intake
    if "max.offsets.per.trigger" in spec.metadata:
        opts["maxOffsetsPerTrigger"] = spec.metadata["max.offsets.per.trigger"]
    if "min.partitions" in spec.metadata:
        opts["minPartitions"] = spec.metadata["min.partitions"]
    return opts


def kafka_to_envelope(raw: DataFrame, dest_topic_prefix: str = "") -> DataFrame:
    """Translate the Kafka source frame into the engine envelope
    (KafkaConnectorTask.translate parity: origin topic/partition/offset
    metadata, event/source timestamps, optional mirror topic rewrite)."""
    topic = (
        F.concat(F.lit(dest_topic_prefix), F.col("topic"))
        if dest_topic_prefix
        else F.col("topic")
    )
    return raw.select(
        topic.alias("topic"),
        F.col("partition").alias("partition"),
        F.col("offset").alias("offset"),
        F.col("key").alias("key"),
        F.col("value").alias("value"),
        F.lit(None).cast("binary").alias("previous_value"),
        F.lit("INSERT").alias("op_code"),
        F.col("offset").alias("scn"),
        F.col("timestamp").alias("event_ts"),
        F.col("timestamp").alias("source_ts"),
        F.lit(None).cast("map<string,binary>").alias("headers"),
        F.create_map(
            F.lit("kafka-origin-topic"), F.col("topic").cast("string"),
            F.lit("kafka-origin-partition"), F.col("partition").cast("string"),
            F.lit("kafka-origin-offset"), F.col("offset").cast("string"),
        ).alias("metadata"),
    )


def _build(spark: SparkSession, spec: PipelineSpec, mirror: bool) -> DataFrame:
    opts = kafka_reader_options(spec)
    reader = spark.readStream.format("kafka")
    for k, v in opts.items():
        reader = reader.option(k, v)
    try:
        raw = reader.load()
    except Exception as e:  # spark-sql-kafka jar absent in this environment
        raise RuntimeError(
            "kafka source requires the spark-sql-kafka package on the "
            "classpath (add org.apache.spark:spark-sql-kafka-0-10_2.13 via "
            "spark.jars.packages)"
        ) from e
    prefix = spec.metadata.get("system.destination.topic.prefix", "") if mirror else ""
    return kafka_to_envelope(raw, dest_topic_prefix=prefix)


@source("kafka")
def kafka_source(spark: SparkSession, spec: PipelineSpec) -> DataFrame:
    return _build(spark, spec, mirror=False)


@source("kafkaMirror")
def kafka_mirror_source(spark: SparkSession, spec: PipelineSpec) -> DataFrame:
    return _build(spark, spec, mirror=True)
