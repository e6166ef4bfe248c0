"""Pure-Python Avro BINARY codec (no external jar needed).

Implements the Avro 1.x binary encoding from the public specification
(https://avro.apache.org/docs/current/specification/): zigzag-varint
int/long, little-endian float/double, length-prefixed bytes/string,
block-encoded array/map with 0 terminator, union as branch-index + value,
record as field concatenation, enum as symbol index, fixed as raw bytes.

Role: the reference serializes envelopes as Avro framed with the registry
prefix (AvroMessageEncoderUtil.java:33-60 — MAGIC + md5 schema id +
binary-encoded record; DatastreamEvent.avsc is the wire record). The
container has no spark-avro jar, so this codec IS the engine's Avro body
path — exposed Spark-side as Arrow-batched pandas UDFs in functions/serde.py
(spark-avro's from_avro/to_avro transparently take over when the jar is
present). tests/test_avro_codec.py cross-checks the byte output against the
JVM org.apache.avro reference implementation on Spark's classpath.

Scale note: decode is a map-side Arrow-batched UDF — partition-preserving,
no shuffle; the per-record Python cost is the price of jar-less operation
and is isolated behind the same serde SPI the jar path uses.
"""

from __future__ import annotations

import json
import struct
from typing import Any

# --------------------------------------------------------------------- write


def _zigzag_encode(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _zigzag_decode(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def _write_varint(out: bytearray, n: int) -> None:
    n = _zigzag_encode(n)
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    shift = 0
    acc = 0
    while True:
        b = buf[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not (b & 0x80):
            return _zigzag_decode(acc), pos
        shift += 7


def _schema_type(schema: Any) -> str:
    if isinstance(schema, str):
        return schema
    if isinstance(schema, list):
        return "union"
    return schema["type"]


_PY_BRANCH = {
    bool: ("boolean",),
    int: ("long", "int"),
    float: ("double", "float"),
    str: ("string", "enum"),
    bytes: ("bytes", "fixed"),
    bytearray: ("bytes", "fixed"),
    dict: ("record", "map"),
    list: ("array",),
    tuple: ("array",),
}


def _union_branch(schema: list, value: Any) -> int:
    """Pick the union branch by the Python value's type (null + the
    standard scalar/collection mappings; first compatible branch wins)."""
    if value is None:
        for idx, branch in enumerate(schema):
            if _schema_type(branch) == "null":
                return idx
        raise ValueError(f"None but no null branch in {schema}")
    wanted = _PY_BRANCH.get(type(value), ())
    for pref in wanted:
        for idx, branch in enumerate(schema):
            if _schema_type(branch) == pref:
                return idx
    for idx, branch in enumerate(schema):  # fallback: first non-null
        if _schema_type(branch) != "null":
            return idx
    raise ValueError(f"no union branch for {type(value)} in {schema}")


def encode_value(schema: Any, value: Any, out: bytearray) -> None:
    t = _schema_type(schema)
    if t == "null":
        return
    if t == "boolean":
        out.append(1 if value else 0)
    elif t in ("int", "long"):
        _write_varint(out, int(value))
    elif t == "float":
        out.extend(struct.pack("<f", float(value)))
    elif t == "double":
        out.extend(struct.pack("<d", float(value)))
    elif t in ("bytes", "string"):
        raw = value.encode("utf-8") if t == "string" else bytes(value)
        _write_varint(out, len(raw))
        out.extend(raw)
    elif t == "fixed":
        raw = bytes(value)
        if len(raw) != schema["size"]:
            raise ValueError(f"fixed size mismatch: {len(raw)} != {schema['size']}")
        out.extend(raw)
    elif t == "enum":
        _write_varint(out, schema["symbols"].index(value))
    elif t == "union":
        idx = _union_branch(schema, value)
        _write_varint(out, idx)
        encode_value(schema[idx], value, out)
    elif t == "record":
        for field in schema["fields"]:
            encode_value(field["type"], value[field["name"]], out)
    elif t == "array":
        items = list(value)
        if items:
            _write_varint(out, len(items))
            for it in items:
                encode_value(schema["items"], it, out)
        _write_varint(out, 0)
    elif t == "map":
        entries = list(value.items())
        if entries:
            _write_varint(out, len(entries))
            for k, v in entries:
                encode_value("string", k, out)
                encode_value(schema["values"], v, out)
        _write_varint(out, 0)
    else:
        raise ValueError(f"unsupported avro type {t!r}")


def decode_value(schema: Any, buf: bytes, pos: int) -> tuple[Any, int]:
    t = _schema_type(schema)
    if t == "null":
        return None, pos
    if t == "boolean":
        return buf[pos] != 0, pos + 1
    if t in ("int", "long"):
        return _read_varint(buf, pos)
    if t == "float":
        return struct.unpack_from("<f", buf, pos)[0], pos + 4
    if t == "double":
        return struct.unpack_from("<d", buf, pos)[0], pos + 8
    if t in ("bytes", "string"):
        n, pos = _read_varint(buf, pos)
        raw = bytes(buf[pos : pos + n])
        return (raw.decode("utf-8") if t == "string" else raw), pos + n
    if t == "fixed":
        n = schema["size"]
        return bytes(buf[pos : pos + n]), pos + n
    if t == "enum":
        idx, pos = _read_varint(buf, pos)
        return schema["symbols"][idx], pos
    if t == "union":
        idx, pos = _read_varint(buf, pos)
        return decode_value(schema[idx], buf, pos)
    if t == "record":
        rec = {}
        for field in schema["fields"]:
            rec[field["name"]], pos = decode_value(field["type"], buf, pos)
        return rec, pos
    if t == "array":
        items = []
        while True:
            n, pos = _read_varint(buf, pos)
            if n == 0:
                return items, pos
            if n < 0:  # block with byte-size prefix (spec-permitted form)
                _, pos = _read_varint(buf, pos)
                n = -n
            for _ in range(n):
                it, pos = decode_value(schema["items"], buf, pos)
                items.append(it)
    if t == "map":
        entries = {}
        while True:
            n, pos = _read_varint(buf, pos)
            if n == 0:
                return entries, pos
            if n < 0:
                _, pos = _read_varint(buf, pos)
                n = -n
            for _ in range(n):
                k, pos = decode_value("string", buf, pos)
                entries[k], pos = decode_value(schema["values"], buf, pos)
    raise ValueError(f"unsupported avro type {t!r}")


def encode(schema: Any, value: Any) -> bytes:
    """Avro-binary-encode ``value`` against ``schema`` (json str or dict)."""
    if isinstance(schema, str):
        schema = json.loads(schema)
    out = bytearray()
    encode_value(schema, value, out)
    return bytes(out)


def decode(schema: Any, payload: bytes) -> Any:
    """Decode Avro binary ``payload`` against ``schema`` (json str or dict)."""
    if isinstance(schema, str):
        schema = json.loads(schema)
    value, pos = decode_value(schema, bytes(payload), 0)
    if pos != len(payload):
        raise ValueError(f"trailing bytes: consumed {pos} of {len(payload)}")
    return value


def resolve(writer_schema: Any, reader_schema: Any, payload: bytes) -> Any:
    """Schema-resolution decode (the Avro spec's 'Schema Resolution'
    section, as the reference's registry consumers rely on it): decode
    with the WRITER schema (which the registry frame identifies), then
    project onto the READER record — writer-only fields drop, reader-only
    fields take their declared defaults (error if a missing field has no
    default). Supports the record-level evolution the envelope needs;
    nested promotion rules beyond that are out of scope."""
    if isinstance(writer_schema, str):
        writer_schema = json.loads(writer_schema)
    if isinstance(reader_schema, str):
        reader_schema = json.loads(reader_schema)
    value = decode(writer_schema, payload)
    if _schema_type(reader_schema) != "record":
        return value
    out = {}
    for field in reader_schema["fields"]:
        name = field["name"]
        if name in value:
            out[name] = value[name]
        elif "default" in field:
            out[name] = field["default"]
        else:
            raise ValueError(
                f"reader field {name!r} absent from writer data and has no default"
            )
    return out
