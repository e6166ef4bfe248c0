"""SerDe layer: schema-registry framing + payload (de)serialization.

Reference parity:
- Wire framing (AvroMessageEncoderUtil.java:33-47,70+): MAGIC byte 0x00 +
  16-byte MD5 digest of the schema id + payload bytes. Implemented as pure
  binary column expressions (concat/substring) — zero-copy slicing, no UDF.
- SerDe SPI (serde/SerDe.java:11, SerDeSet.java:16-40): a per-destination
  {key, value, envelope} serde set; here a small registry of column-level
  encode/decode builders.

Avro body (de)serialization uses spark-avro's from_avro/to_avro when the
'avro' data source is registered; otherwise the engine's pure-Python binary
codec (functions/avro_codec.py, cross-checked byte-for-byte against the JVM
org.apache.avro implementation) runs in Arrow-batched pandas UDFs — Avro is
fully functional either way. The JSON serde shares the same framing.
"""

from __future__ import annotations

import hashlib
import json as _json

import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F

MAGIC_BYTE = b"\x00"
#: framing prefix length: 1 magic + 16 md5 bytes (AvroMessageEncoderUtil)
FRAME_PREFIX_LEN = 17


_HEX_DIGITS = set("0123456789abcdefABCDEF")


def schema_digest(schema_id: str) -> bytes:
    """16 digest bytes embedded in every framed message.

    Registry ids ARE hex(md5(schema)) — the reference
    (AvroMessageEncoderUtil.encode -> hexToMd5, AvroMessageEncoderUtil.java:42-60)
    embeds the hex-DECODED id bytes, so a 32-char hex id is decoded, not
    re-hashed; frames produced here are byte-compatible with
    reference-encoded messages and frame_schema_md5() round-trips to the
    registry id. Free-form (non-hex) ids fall back to md5 of the string so
    framing still works for ad-hoc schemas."""
    s = schema_id.strip()
    if len(s) == 32 and set(s) <= _HEX_DIGITS:
        return bytes.fromhex(s)
    return hashlib.md5(schema_id.encode("utf-8")).digest()


def frame(payload: Column, schema_id: str) -> Column:
    """payload -> MAGIC + md5(schema_id) + payload (binary)."""
    prefix = F.lit(MAGIC_BYTE + schema_digest(schema_id))
    return F.concat(prefix, payload)


def unframe(framed: Column) -> Column:
    """Strip the 17-byte prefix -> raw payload bytes."""
    return F.expr(f"substring({_sql(framed)}, {FRAME_PREFIX_LEN + 1})")


def frame_schema_md5(framed: Column) -> Column:
    """Hex schema digest carried in the frame (for registry lookup)."""
    return F.lower(F.hex(F.expr(f"substring({_sql(framed)}, 2, 16)")))


def frame_is_valid(framed: Column, schema_id: str | None = None) -> Column:
    """Magic-byte (and optionally schema-digest) check — the skip-on-error
    predicate for the dead-letter path (EventProducer.java:320-336
    skip-on-serialization-error analog)."""
    ok = (F.length(framed) >= FRAME_PREFIX_LEN) & (
        F.expr(f"substring({_sql(framed)}, 1, 1)") == F.lit(MAGIC_BYTE)
    )
    if schema_id is not None:
        ok = ok & (frame_schema_md5(framed) == F.lit(schema_digest(schema_id).hex()))
    return ok


def _sql(col: Column) -> str:
    # Column -> SQL fragment for expr() composition (works for simple refs)
    return col._jc.toString()  # noqa: SLF001


# --------------------------------------------------------------------- body


def json_serialize(struct: Column) -> Column:
    """Struct -> JSON bytes (the always-available payload serde)."""
    return F.to_json(struct).cast("binary")


def json_deserialize(payload: Column, schema: str) -> Column:
    """JSON bytes -> struct with the given DDL schema."""
    return F.from_json(payload.cast("string"), schema)


def avro_available() -> bool:
    """True iff spark-avro's JVM side is actually usable. The Python
    module pyspark.sql.avro.functions always imports — from_avro fails at
    ANALYSIS time without the jar — so probe the classpath for the jar's
    classes instead."""
    try:
        from pyspark.sql import SparkSession

        spark = SparkSession.getActiveSession()
        if spark is None:
            return False
        # the exact lookup from_avro/to_avro analysis performs: resolves
        # the registered 'avro' data source or throws FAILED_TO_FIND_...
        spark._jvm.org.apache.spark.sql.execution.datasources.DataSource.lookupDataSource(  # noqa: SLF001
            "avro", spark._jsparkSession.sessionState().conf()  # noqa: SLF001
        )
        return True
    except Exception:
        return False


def avro_deserialize(payload: Column, avro_schema_json: str, ddl: str | None = None) -> Column:
    """Avro bytes -> struct (registry framing already stripped by
    unframe()). Uses spark-avro's from_avro when the jar is on the
    classpath; otherwise decodes with the engine's pure-Python binary
    codec (functions/avro_codec.py) in an Arrow-batched pandas UDF —
    ``ddl`` (the struct DDL matching the record schema) is required for
    that path so the output type is known without the jar."""
    if avro_available():
        from pyspark.sql.avro.functions import from_avro

        return from_avro(payload, avro_schema_json)
    if ddl is None:
        raise ValueError(
            "spark-avro jar absent: avro_deserialize needs the struct `ddl` "
            "for the pure-Python decode path"
        )
    from pyspark.sql.functions import pandas_udf

    from brooklin_spark.functions import avro_codec

    schema = _json.loads(avro_schema_json)
    field_names = [f["name"] for f in schema["fields"]]

    @pandas_udf(ddl)
    def _dec(payloads: pd.Series) -> pd.DataFrame:
        rows = []
        for p in payloads:
            if p is None:
                rows.append({n: None for n in field_names})
            else:
                rows.append(avro_codec.decode(schema, bytes(p)))
        return pd.DataFrame(rows, columns=field_names)

    return _dec(payload)


def avro_serialize(struct: Column, avro_schema_json: str | None = None) -> Column:
    """struct -> Avro bytes. spark-avro's to_avro when present, else the
    pure-Python codec (needs ``avro_schema_json`` for the record layout)."""
    if avro_available():
        from pyspark.sql.avro.functions import to_avro

        return to_avro(struct)
    if avro_schema_json is None:
        raise ValueError(
            "spark-avro jar absent: avro_serialize needs `avro_schema_json` "
            "for the pure-Python encode path"
        )
    from pyspark.sql.functions import pandas_udf

    from brooklin_spark.functions import avro_codec

    schema = _json.loads(avro_schema_json)

    @pandas_udf("binary")
    def _enc(structs: pd.DataFrame) -> pd.Series:
        # a struct column crosses Arrow as a pd.DataFrame of its fields
        return pd.Series(
            [avro_codec.encode(schema, rec) for rec in structs.to_dict("records")]
        )

    return _enc(struct)


# ---------------------------------------------------------- schema registry


class SchemaRegistry:
    """In-memory schema registry keyed by the FRAME digest (the reference's
    registry client analog: AvroMessageEncoderUtil embeds hex-decoded
    registry ids, so looking a frame up means hex(digest) -> schema).

    register() returns the id to frame outgoing messages with;
    decode_framed() resolves an incoming frame's writer schema and decodes
    its body — optionally onto a newer reader schema (Avro schema
    resolution: dropped fields vanish, added fields take defaults)."""

    def __init__(self) -> None:
        self._by_id: dict[str, str] = {}

    def register(self, schema_json: str) -> str:
        schema_id = hashlib.md5(schema_json.encode("utf-8")).hexdigest()
        self._by_id[schema_id] = schema_json
        return schema_id

    def get(self, schema_id: str) -> str:
        return self._by_id[schema_id]

    def decode_framed(self, framed: bytes, reader_schema_json: str | None = None):
        from brooklin_spark.functions import avro_codec

        framed = bytes(framed)
        if framed[:1] != MAGIC_BYTE:
            raise ValueError("not a registry-framed message (bad magic byte)")
        schema_id = framed[1:FRAME_PREFIX_LEN].hex()
        if schema_id not in self._by_id:
            raise KeyError(f"unknown schema id {schema_id!r}")
        writer = self._by_id[schema_id]
        body = framed[FRAME_PREFIX_LEN:]
        if reader_schema_json is None:
            return avro_codec.decode(writer, body)
        return avro_codec.resolve(writer, reader_schema_json, body)


# ----------------------------------------------------------- envelope serde

#: the reference's wire record, field-for-field (DatastreamEvent.avsc:1-38):
#: free-form string metadata + byte-opaque key/payload/previous_payload —
#: all REQUIRED (the avsc declares plain map/bytes, not unions), so absent
#: values travel as empty bytes like the reference's serialized events
DATASTREAM_EVENT_AVRO = _json.dumps(
    {
        "name": "DatastreamEvent",
        "namespace": "com.linkedin.datastream.common",
        "type": "record",
        "fields": [
            {"name": "metadata", "type": {"type": "map", "values": "string"}},
            {"name": "key", "type": "bytes"},
            {"name": "payload", "type": "bytes"},
            {"name": "previous_payload", "type": "bytes"},
        ],
    }
)
DATASTREAM_EVENT_DDL = (
    "metadata map<string,string>, key binary, payload binary, "
    "previous_payload binary"
)


def envelope_event_struct(df) -> Column:
    """Envelope frame -> DatastreamEvent struct: CDC columns fold back into
    the metadata map (BrooklinEnvelopeMetadataConstants.java:19-45 keys),
    byte columns map 1:1 (DatastreamProducerRecord.serializeEvents
    prepares exactly this record before the SerDe runs)."""
    meta = F.map_concat(
        F.coalesce(F.col("metadata"), F.create_map().cast("map<string,string>")),
        F.map_from_arrays(
            F.array(F.lit("OpCode"), F.lit("Scn"), F.lit("SourcePartition")),
            F.array(
                F.coalesce(F.col("op_code"), F.lit("")),
                F.coalesce(F.col("scn").cast("string"), F.lit("")),
                F.col("partition").cast("string"),
            ),
        ),
    )
    empty = F.lit(b"")
    return F.struct(
        meta.alias("metadata"),
        F.coalesce(F.col("key"), empty).alias("key"),
        F.coalesce(F.col("value"), empty).alias("payload"),
        F.coalesce(F.col("previous_value"), empty).alias("previous_payload"),
    )


def apply_serdes(df, spec):
    """The full SerDeSet application (SerDeSet.java:16-40 +
    DatastreamProducerRecord.serializeEvents ordering: key serde, then
    payload serde, then envelope serde). Key/payload serdes frame the raw
    byte columns individually; the envelope serde (if set) then serializes
    the WHOLE envelope into `value` — matching the reference, where an
    envelope serde subsumes the payload's wire format."""
    key_serde = getattr(spec, "key_serde", None)
    payload_serde = getattr(spec, "payload_serde", None)
    schema_id = spec.metadata.get("serde.schema.id", "") if spec.metadata else ""
    if key_serde:
        if key_serde != "framedBytes":
            raise ValueError(f"unknown key serde {key_serde!r}")
        sid = schema_id or "key-bytes-v1"
        df = df.withColumn(
            "key",
            F.when(
                F.col("key").isNotNull(), frame(F.col("key"), sid)
            ),
        )
    if payload_serde:
        if payload_serde != "framedBytes":
            raise ValueError(f"unknown payload serde {payload_serde!r}")
        sid = schema_id or "payload-bytes-v1"
        df = df.withColumn(
            "value",
            F.when(
                F.col("value").isNotNull(), frame(F.col("value"), sid)
            ),
        )
    return apply_envelope_serde(df, spec)


def apply_envelope_serde(df, spec):
    """Apply the spec's envelope serde before the transport (the
    DatastreamProducerRecord.serializeEvents step,
    DatastreamProducerRecord.java:73-88): the envelope serializes into the
    ``value`` byte column as a registry-framed message; routing columns
    (topic/partition/key/offset) stay native for the sink."""
    name = getattr(spec, "envelope_serde", None)
    if not name:
        return df
    schema_id = spec.metadata.get("serde.schema.id", "") if spec.metadata else ""
    ev = envelope_event_struct(df)
    if name == "json":
        body = json_serialize(ev)
        sid = schema_id or "datastream-event-json-v1"
    elif name == "avro":
        avro_schema = (
            spec.metadata.get("serde.avro.schema") if spec.metadata else None
        ) or DATASTREAM_EVENT_AVRO
        body = avro_serialize(ev, avro_schema)
        sid = schema_id or hashlib.md5(avro_schema.encode()).hexdigest()
    else:
        raise ValueError(f"unknown envelope serde {name!r}")
    return df.withColumn("value", frame(body, sid))
