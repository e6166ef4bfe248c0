"""SerDe layer: schema-registry framing + payload (de)serialization.

Reference parity:
- Wire framing (AvroMessageEncoderUtil.java:33-47,70+): MAGIC byte 0x00 +
  16-byte MD5 digest of the schema id + payload bytes. Implemented as pure
  binary column expressions (concat/substring) — zero-copy slicing, no UDF.
- SerDe SPI (serde/SerDe.java:11, SerDeSet.java:16-40): a per-destination
  {key, value, envelope} serde set; here a small registry of column-level
  encode/decode builders.

Avro body decode uses spark-avro's from_avro/to_avro when the jar is on the
classpath (gated — not bundled in this container); the JSON serde is the
always-available path and shares the same framing.
"""

from __future__ import annotations

import hashlib

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
    try:
        from pyspark.sql.avro.functions import from_avro  # noqa: F401

        return True
    except ImportError:
        return False


def avro_deserialize(payload: Column, avro_schema_json: str) -> Column:
    """Avro bytes -> struct via spark-avro (registry framing already
    stripped by unframe()). Requires org.apache.spark:spark-avro on the
    classpath; raises a clear error otherwise."""
    try:
        from pyspark.sql.avro.functions import from_avro
    except ImportError as e:  # pragma: no cover - environment-dependent
        raise RuntimeError(
            "avro serde requires the spark-avro package "
            "(org.apache.spark:spark-avro_2.13 via spark.jars.packages)"
        ) from e
    return from_avro(payload, avro_schema_json)


def avro_serialize(struct: Column) -> Column:
    try:
        from pyspark.sql.avro.functions import to_avro
    except ImportError as e:  # pragma: no cover - environment-dependent
        raise RuntimeError(
            "avro serde requires the spark-avro package "
            "(org.apache.spark:spark-avro_2.13 via spark.jars.packages)"
        ) from e
    return to_avro(struct)
