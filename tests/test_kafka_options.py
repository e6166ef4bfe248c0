"""Unit tests for the Kafka source option mapping (golden-config style, like
the reference's TestKafkaConnectorTask config assertions — no brokers)."""

from __future__ import annotations

import json

import pytest

from brooklin_spark.model import PipelineSpec
from brooklin_spark.sources.kafka_source import kafka_reader_options, parse_kafka_uri


def _spec(uri: str, **meta) -> PipelineSpec:
    return PipelineSpec(
        name="k1", connector="kafka", transport="memory", source_uri=uri,
        metadata=dict(meta),
    )


def test_parse_single_topic():
    assert parse_kafka_uri("kafka://h1:9092/topicA") == ("h1:9092", "topicA", False)


def test_parse_regex_topic():
    servers, topic, is_pattern = parse_kafka_uri("kafka://h1:9092,h2:9092/^prefix.*$")
    assert servers == "h1:9092,h2:9092" and is_pattern


def test_parse_rejects_missing_topic():
    with pytest.raises(ValueError):
        parse_kafka_uri("kafka://h1:9092")


def test_subscribe_options():
    opts = kafka_reader_options(_spec("kafka://h:9092/t"))
    assert opts["subscribe"] == "t"
    assert opts["kafka.bootstrap.servers"] == "h:9092"
    assert opts["startingOffsets"] == "earliest"
    assert "subscribePattern" not in opts


def test_mirror_pattern_options():
    opts = kafka_reader_options(_spec("kafka://h:9092/^a.*$"))
    assert opts["subscribePattern"] == "^a.*$"
    assert "subscribe" not in opts


def test_start_position_json_shape():
    """{partition: offset} metadata → Kafka startingOffsets json
    (KafkaConnector.java:118-131 parity). A contiguous full map passes
    through unchanged."""
    opts = kafka_reader_options(
        _spec("kafka://h:9092/t", **{"system.start.position": '{"0": 23, "1": 7}'})
    )
    assert json.loads(opts["startingOffsets"]) == {"t": {"0": 23, "1": 7}}


def test_start_position_partial_map_filled_with_sentinels():
    """The reference allows PARTIAL start-position maps with
    auto.offset.reset fallback; Spark requires every partition listed —
    unlisted partitions are filled with -2 (earliest) / -1 (latest)
    sentinels from the spec's declared partition count (ADVICE r1 #4)."""
    spec = _spec("kafka://h:9092/t", **{"system.start.position": '{"2": 7}'})
    spec.source_partitions = 4
    opts = kafka_reader_options(spec)
    assert json.loads(opts["startingOffsets"]) == {
        "t": {"0": -2, "1": -2, "2": 7, "3": -2}
    }
    spec.metadata["system.auto.offset.reset"] = "latest"
    opts = kafka_reader_options(spec)
    assert json.loads(opts["startingOffsets"]) == {
        "t": {"0": -1, "1": -1, "2": 7, "3": -1}
    }


def test_start_position_partial_map_without_partition_count_rejected():
    with pytest.raises(ValueError, match="partial partition map"):
        kafka_reader_options(
            _spec("kafka://h:9092/t", **{"system.start.position": '{"0": 23, "2": 7}'})
        )


def test_flow_control_options():
    opts = kafka_reader_options(
        _spec("kafka://h:9092/t", **{"max.offsets.per.trigger": "50000",
                                     "min.partitions": "64"})
    )
    assert opts["maxOffsetsPerTrigger"] == "50000"
    assert opts["minPartitions"] == "64"


def test_offset_reset_override():
    opts = kafka_reader_options(
        _spec("kafka://h:9092/t", **{"system.auto.offset.reset": "latest"})
    )
    assert opts["startingOffsets"] == "latest"


def test_kafka_out_projection_headers(spark):
    """Envelope headers (map<string,binary>) must reach the Kafka writer
    as array<struct<key:string,value:binary>> records; null maps stay
    null (BrooklinEnvelope._headers forwarding parity)."""
    from brooklin_spark.sinks.registry import kafka_out_projection

    df = spark.createDataFrame(
        [
            (b"k1", b"v1", "t1", {"h1": b"\x01", "h2": b"\x02"}),
            (b"k2", b"v2", "t2", None),
        ],
        "key binary, value binary, topic string, headers map<string,binary>",
    )
    out = kafka_out_projection(df, None)
    assert [f.name for f in out.schema.fields] == ["key", "value", "topic", "headers"]
    htype = out.schema["headers"].dataType.simpleString()
    assert htype == "array<struct<key:string,value:binary>>", htype
    rows = {bytes(r.key): r for r in out.collect()}
    got = {h.key: bytes(h.value) for h in rows[b"k1"].headers}
    assert got == {"h1": b"\x01", "h2": b"\x02"}
    assert rows[b"k2"].headers is None
    # explicit destination topic overrides the per-record column
    assert {r.topic for r in kafka_out_projection(df, "fixed").collect()} == {"fixed"}
