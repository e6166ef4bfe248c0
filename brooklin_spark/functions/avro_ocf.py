"""Avro Object Container File (OCF) reader/writer on top of the pure-
Python binary codec (functions/avro_codec.py) — no spark-avro jar needed.

Implements the public OCF layout (Apache Avro spec, "Object Container
Files"): magic ``Obj\\x01``, a file-metadata avro map (must carry
``avro.schema``; ``avro.codec`` null/absent only — this container has no
compression libs), a 16-byte sync marker, then data blocks of
``(record_count, byte_size, records..., sync)``. Reference parity: the
reference's connectors move Avro end-to-end (LiKafkaProducer payloads,
AvroMessageEncoderUtil.java frames single records; OCF is the at-rest
twin of that wire format).

Scale shape of the distributed read: ``binaryFile`` scan → one Arrow
``mapInPandas`` decode task per file, so parallelism = file count and a
task's memory is bounded by one file (writers here bound file size at
write time). OCF's sync markers would also support byte-range splitting
of huge single files; that needs a block-indexing DataSource partitioner
(sources/pyds.py is the place) and is intentionally not done while every
producer path writes bounded files.
"""

from __future__ import annotations

import hashlib
import json
import os
from typing import Any, Iterable, Iterator

from brooklin_spark.functions.avro_codec import (
    _read_varint,
    _write_varint,
    decode_value,
    encode_value,
)

MAGIC = b"Obj\x01"


def _sync_for(schema_json: str, path: str) -> bytes:
    """Deterministic 16-byte sync marker derived from (schema, file name).

    The spec only requires the marker be consistent within a file; readers
    always take it from the header, never re-derive it. Mixing the file
    name in keeps write_ocf byte-deterministic for identical inputs while
    making the marker non-predictable from the schema alone — a payload
    that embeds md5(schema) (a schema-registry-style digest field) can no
    longer collide with the marker and corrupt the split reader's
    false-sync scan. basename (not abspath) so a stage->promote rename
    across directories does not change what a re-write would produce."""
    return hashlib.md5(
        schema_json.encode() + b"\x00" + os.path.basename(path).encode()
    ).digest()


def write_ocf(
    path: str,
    schema: Any,
    records: Iterable[dict],
    records_per_block: int = 500,
) -> int:
    """Write records to ``path`` as an uncompressed OCF. Returns the
    record count. Deterministic bytes for identical inputs."""
    schema_json = json.dumps(schema, sort_keys=True)
    sync = _sync_for(schema_json, path)
    out = bytearray(MAGIC)
    meta = {"avro.schema": schema_json.encode(), "avro.codec": b"null"}
    _write_varint(out, len(meta))
    for k, v in sorted(meta.items()):
        encode_value("string", k, out)
        encode_value("bytes", v, out)
    _write_varint(out, 0)
    out.extend(sync)

    n = 0
    block: list[dict] = []

    def flush() -> None:
        if not block:
            return
        body = bytearray()
        for rec in block:
            encode_value(schema, rec, body)
        _write_varint(out, len(block))
        _write_varint(out, len(body))
        out.extend(body)
        out.extend(sync)
        block.clear()

    for rec in records:
        block.append(rec)
        n += 1
        if len(block) >= records_per_block:
            flush()
    flush()
    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "wb") as f:
        f.write(bytes(out))
    os.replace(tmp, path)
    return n


def read_ocf_bytes(data: bytes) -> tuple[Any, Iterator[dict]]:
    """Parse one OCF byte string → (writer_schema, record iterator)."""
    if data[:4] != MAGIC:
        raise ValueError(f"not an Avro OCF: magic {data[:4]!r}")
    meta: dict[str, bytes] = {}
    pos = 4
    while True:
        count, pos = _read_varint(data, pos)
        if count == 0:
            break
        for _ in range(abs(count)):
            k, pos = decode_value("string", data, pos)
            v, pos = decode_value("bytes", data, pos)
            meta[k] = v
    codec = meta.get("avro.codec", b"null")
    if codec not in (b"null", b""):
        raise ValueError(f"unsupported avro.codec {codec!r} (no compression libs)")
    schema = json.loads(meta["avro.schema"].decode())
    sync = data[pos : pos + 16]
    pos += 16

    def records() -> Iterator[dict]:
        p = pos
        while p < len(data):
            n_rec, p = _read_varint(data, p)
            size, p = _read_varint(data, p)
            end = p + size
            for _ in range(n_rec):
                rec, p = decode_value(schema, data, p)
                yield rec
            if p != end:
                raise ValueError(f"block size mismatch: ended at {p}, expected {end}")
            if data[p : p + 16] != sync:
                raise ValueError("sync marker mismatch (corrupt block boundary)")
            p += 16

    return schema, records()


def read_ocf(spark, path: str, spark_schema: str):
    """Distributed OCF read: binaryFile scan + one Arrow decode task per
    file. ``spark_schema`` is the DDL of the produced DataFrame; its
    column names must match the writer record fields."""
    import pandas as pd

    files = spark.read.format("binaryFile").load(path).select("content")
    cols = [c.split()[0] for c in spark_schema.split(",")]

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for content in pdf["content"]:
                _, recs = read_ocf_bytes(bytes(content))
                rows = list(recs)
                yield pd.DataFrame(
                    {c: [r[c] for r in rows] for c in cols}, columns=cols
                )

    # binaryFile files are non-splittable: Spark assigns whole files to
    # tasks (packing small ones per maxPartitionBytes) — exactly the
    # parallelism wanted; no repartition, no byte shuffle
    return files.mapInPandas(decode, schema=spark_schema)
