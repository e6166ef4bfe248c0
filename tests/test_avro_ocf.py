"""Avro Object Container File layer: byte-level roundtrip, corruption
detection, block layout, and the distributed reader."""

from __future__ import annotations

import json

import pytest

from brooklin_spark.functions.avro_ocf import (
    MAGIC,
    read_ocf,
    read_ocf_bytes,
    write_ocf,
)

SCHEMA = {
    "type": "record",
    "name": "T",
    "fields": [
        {"name": "k", "type": "long"},
        {"name": "s", "type": "string"},
        {"name": "x", "type": "double"},
    ],
}


def _recs(n):
    return [{"k": i, "s": f"s{i}", "x": i * 0.5} for i in range(n)]


def test_roundtrip_multi_block(tmp_path):
    p = str(tmp_path / "t.avro")
    n = write_ocf(p, SCHEMA, _recs(1234), records_per_block=100)
    assert n == 1234
    data = open(p, "rb").read()
    assert data[:4] == MAGIC
    schema, recs = read_ocf_bytes(data)
    assert schema["name"] == "T"
    out = list(recs)
    assert out == _recs(1234)


def test_deterministic_bytes(tmp_path):
    # Same basename in different dirs -> identical bytes (the sync marker
    # depends on (schema, basename) only, so a stage->promote rename or an
    # idempotent re-write reproduces the file exactly).
    (tmp_path / "d1").mkdir()
    (tmp_path / "d2").mkdir()
    p1, p2 = str(tmp_path / "d1" / "a.avro"), str(tmp_path / "d2" / "a.avro")
    write_ocf(p1, SCHEMA, _recs(50))
    write_ocf(p2, SCHEMA, _recs(50))
    assert open(p1, "rb").read() == open(p2, "rb").read()


def test_sync_marker_differs_per_file(tmp_path):
    # Different file names -> different markers: a payload embedding
    # md5(schema) can never alias every file's block boundary.
    p1, p2 = str(tmp_path / "a.avro"), str(tmp_path / "b.avro")
    write_ocf(p1, SCHEMA, _recs(5))
    write_ocf(p2, SCHEMA, _recs(5))
    b1, b2 = open(p1, "rb").read(), open(p2, "rb").read()
    assert b1[-16:] != b2[-16:]
    _, r1 = read_ocf_bytes(b1)
    _, r2 = read_ocf_bytes(b2)
    assert list(r1) == list(r2)


def test_bad_magic_rejected():
    with pytest.raises(ValueError, match="magic"):
        next(iter(read_ocf_bytes(b"NOPE" + b"\x00" * 64)[1]))


def test_compressed_codec_rejected(tmp_path):
    p = str(tmp_path / "t.avro")
    write_ocf(p, SCHEMA, _recs(3))
    data = bytearray(open(p, "rb").read())
    i = data.find(b"null", 4)
    data[i : i + 4] = b"defl"
    with pytest.raises(ValueError, match="codec"):
        read_ocf_bytes(bytes(data))


def test_corrupt_sync_detected(tmp_path):
    p = str(tmp_path / "t.avro")
    write_ocf(p, SCHEMA, _recs(10), records_per_block=5)
    data = bytearray(open(p, "rb").read())
    data[-1] ^= 0xFF  # flip a byte of the final sync marker
    _, recs = read_ocf_bytes(bytes(data))
    with pytest.raises(ValueError, match="sync"):
        list(recs)


def test_empty_file_roundtrip(tmp_path):
    p = str(tmp_path / "t.avro")
    assert write_ocf(p, SCHEMA, []) == 0
    schema, recs = read_ocf_bytes(open(p, "rb").read())
    assert list(recs) == []
    assert json.dumps(schema)  # parseable


def test_distributed_read(spark, tmp_path):
    d = tmp_path / "ocf"
    d.mkdir()
    for i in range(3):
        write_ocf(
            str(d / f"p{i}.avro"),
            SCHEMA,
            [{"k": i * 100 + j, "s": f"r{j}", "x": j * 1.5} for j in range(40)],
            records_per_block=16,
        )
    df = read_ocf(spark, str(d), "k bigint, s string, x double")
    assert df.count() == 120
    got = {r["k"] for r in df.collect()}
    assert got == {i * 100 + j for i in range(3) for j in range(40)}


def test_spi_split_reader_boundaries(spark, tmp_path):
    """Every block is decoded by exactly ONE byte-range split, for many
    split sizes (including sizes smaller than a block): union of split
    outputs == file contents, no dupes, no gaps."""
    from brooklin_spark.sources import pyds

    d = tmp_path / "ocf"
    d.mkdir()
    n = write_ocf(str(d / "one.avro"), SCHEMA, _recs(2000), records_per_block=64)
    assert n == 2000
    pyds.register(spark)
    for split in (200, 1 << 10, 8 << 10, 1 << 20):
        df = (
            spark.read.format("avro_ocf")
            .options(path=str(d), split_bytes=str(split))
            .load()
        )
        got = sorted(r["k"] for r in df.collect())
        assert got == list(range(2000)), f"split_bytes={split}"


def test_spi_schema_probe(tmp_path):
    from brooklin_spark.sources.pyds import AvroOcfDataSource

    p = str(tmp_path / "t.avro")
    write_ocf(p, SCHEMA, _recs(1))
    ds = AvroOcfDataSource(options={"path": str(tmp_path)})
    assert ds.schema() == "k bigint, s string, x double"


def test_spi_empty_dir_yields_nothing(spark, tmp_path):
    from brooklin_spark.sources import pyds
    from brooklin_spark.sources.pyds import AvroOcfReader

    r = AvroOcfReader({"path": str(tmp_path)})
    parts = r.partitions()
    assert len(parts) == 1 and parts[0].path == ""
    assert list(r.read(parts[0])) == []


def test_ocf_tail_stream_exactly_once_across_restart(spark, tmp_path):
    """OCF tail source: stop after the first micro-batches, restart on
    the same checkpoint — every record of every file delivered exactly
    once (trigger(once) steps bound each run to one batch)."""
    import os
    import time

    from brooklin_spark.sources import pyds

    pyds.register(spark)
    d = tmp_path / "land"
    d.mkdir()
    for i in range(5):
        write_ocf(
            str(d / f"f{i:03d}.avro"),
            SCHEMA,
            [{"k": i * 1000 + j, "s": f"r{j}", "x": 0.0} for j in range(50)],
            records_per_block=20,
        )
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "sinkout")
    os.makedirs(out)

    def start(once):
        s = (
            spark.readStream.format("avro_ocf")
            .options(path=str(d), max_files="2")
            .load()
            .select("k")
        )
        w = (
            s.writeStream.format("json")
            .option("path", out)
            .option("checkpointLocation", ckpt)
        )
        if once:
            w = w.trigger(once=True)
        return w.start()

    q = start(once=True)  # one micro-batch: files 0-1
    q.awaitTermination(60)
    q2 = start(once=False)
    q2.processAllAvailable()
    q2.stop()

    import glob
    import json

    keys = [
        json.loads(ln)["k"]
        for fp in glob.glob(os.path.join(out, "*.json"))
        for ln in open(fp)
    ]
    expect = [i * 1000 + j for i in range(5) for j in range(50)]
    assert sorted(keys) == expect, (len(keys), len(set(keys)))


def test_spi_reader_schema_resolution(spark, tmp_path):
    """Mixed writer generations under one reader schema: missing reader
    field takes its default on old files; a missing default errors."""
    import json

    from brooklin_spark.sources import pyds

    pyds.register(spark)
    d = tmp_path / "mixed"
    d.mkdir()
    v1 = {"type": "record", "name": "V1",
          "fields": [{"name": "k", "type": "long"}]}
    v2 = {"type": "record", "name": "V2",
          "fields": [{"name": "k", "type": "long"},
                     {"name": "tag", "type": "string"}]}
    write_ocf(str(d / "a.avro"), v1, [{"k": 1}, {"k": 2}])
    write_ocf(str(d / "b.avro"), v2, [{"k": 3, "tag": "x"}])
    reader = {"type": "record", "name": "R",
              "fields": [{"name": "k", "type": "long"},
                         {"name": "tag", "type": "string", "default": "D"}]}
    df = (
        spark.read.format("avro_ocf")
        .options(path=str(d), reader_schema=json.dumps(reader))
        .load()
    )
    got = {(r["k"], r["tag"]) for r in df.collect()}
    assert got == {(1, "D"), (2, "D"), (3, "x")}

    bad = {"type": "record", "name": "B",
           "fields": [{"name": "k", "type": "long"},
                      {"name": "nodefault", "type": "string"}]}
    df2 = (
        spark.read.format("avro_ocf")
        .options(path=str(d), reader_schema=json.dumps(bad))
        .load()
    )
    import pytest as _pt

    with _pt.raises(Exception, match="no default"):
        df2.collect()
