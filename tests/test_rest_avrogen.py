"""REST facade (DatastreamResources analog) + avrogenerator analog tests.

The HTTP tests drive a live embedded server over urllib — create / fetch /
pause / resume / partition-pause / delete round trips with the Rest.li
status-code semantics. The avrogen tests validate the generated schemas
against the JVM org.apache.avro parser (on Spark's classpath) and
round-trip rows through the engine's pure-Python Avro codec.
"""

from __future__ import annotations

import json
import os
import urllib.error
import urllib.request

import pytest

from brooklin_spark.functions import avrogen as AG
from brooklin_spark.manager import PipelineManager
from brooklin_spark.rest import DatastreamRestServer


def _req(method: str, url: str, body: dict | None = None, principal: str | None = None):
    data = json.dumps(body).encode() if body is not None else None
    req = urllib.request.Request(url, data=data, method=method)
    req.add_header("Content-Type", "application/json")
    if principal:
        req.add_header("X-Principal", principal)
    try:
        with urllib.request.urlopen(req, timeout=30) as resp:
            return resp.status, json.loads(resp.read().decode())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read().decode())


@pytest.fixture()
def server(spark, tmp_path):
    mgr = PipelineManager(spark, str(tmp_path / "mgr"))
    srv = DatastreamRestServer(mgr).start()
    yield srv
    srv.stop()


def _write(path: str, text: str) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write(text)


def test_rest_crud_and_lifecycle_round_trip(server, spark, tmp_path):
    base = server.address
    src = str(tmp_path / "in")
    _write(src + "/a.txt", "hello\n")
    spec = {
        "name": "restpipe",
        "connector": "file",
        "transport": "memory",
        "source_uri": f"file://{src}",
        "metadata": {"memory.table": "restpipe"},
    }
    code, out = _req("POST", f"{base}/datastreams", spec)
    assert code == 201 and out["name"] == "restpipe" and out["status"] == "READY"
    # duplicate create → 409 (the reference's already-exists rejection)
    code, _ = _req("POST", f"{base}/datastreams", spec)
    assert code == 409
    code, out = _req("GET", f"{base}/datastreams/restpipe")
    assert code == 200 and out["connector"] == "file"
    code, out = _req("GET", f"{base}/datastreams")
    assert code == 200 and [s["name"] for s in out] == ["restpipe"]
    # pause → status PAUSED; resume → READY (DatastreamResources.java:358,554)
    code, out = _req("POST", f"{base}/datastreams/restpipe/pause")
    assert code == 200 and out["status"] == "PAUSED"
    # pausing a PAUSED stream is an invalid transition → 400
    code, _ = _req("POST", f"{base}/datastreams/restpipe/pause")
    assert code == 400
    code, out = _req("POST", f"{base}/datastreams/restpipe/resume")
    assert code == 200 and out["status"] == "READY"
    # per-partition pause surface (DatastreamResources.java:604,682)
    code, _ = _req(
        "POST",
        f"{base}/datastreams/restpipe/pauseSourcePartitions",
        {"partitions": [3, 7]},
    )
    assert code == 200
    code, out = _req("GET", f"{base}/datastreams/restpipe/pausedSourcePartitions")
    assert code == 200 and out["paused"] == [3, 7]
    code, _ = _req(
        "POST",
        f"{base}/datastreams/restpipe/resumeSourcePartitions",
        {"partitions": [3, 7]},
    )
    assert code == 200
    # health = diagnostics scatter-gather
    code, diag = _req("GET", f"{base}/health")
    assert code == 200 and diag[0]["name"] == "restpipe"
    code, _ = _req("DELETE", f"{base}/datastreams/restpipe")
    assert code == 200
    code, _ = _req("GET", f"{base}/datastreams/restpipe")
    assert code == 404


def test_rest_unknown_routes_and_validation(server):
    base = server.address
    code, _ = _req("GET", f"{base}/datastreams/nope")
    assert code == 404
    code, _ = _req("POST", f"{base}/datastreams/nope/pause")
    assert code == 404
    code, _ = _req("POST", f"{base}/nonsense")
    assert code == 404
    # invalid spec (unknown connector) → 400, nothing created
    bad = {
        "name": "bad",
        "connector": "no-such",
        "transport": "memory",
        "source_uri": "file:///tmp/x",
    }
    code, out = _req("POST", f"{base}/datastreams", bad)
    assert code == 400 and "connector" in out["error"]
    code, _ = _req("GET", f"{base}/datastreams/bad")
    assert code == 404


def test_rest_authorizer_denial_is_403(spark, tmp_path):
    from brooklin_spark.security import owner_only

    mgr = PipelineManager(spark, str(tmp_path / "mgr"), authorizer=owner_only)
    srv = DatastreamRestServer(mgr).start()
    try:
        base = srv.address
        src = str(tmp_path / "in")
        _write(src + "/a.txt", "x\n")
        spec = {
            "name": "authz",
            "connector": "file",
            "transport": "memory",
            "source_uri": f"file://{src}",
            "metadata": {"memory.table": "authz", "owner": "alice"},
        }
        code, _ = _req("POST", f"{base}/datastreams", spec, principal="alice")
        assert code == 201
        # bob may not pause alice's stream (Authorizer UPDATE check)
        code, _ = _req("POST", f"{base}/datastreams/authz/pause", principal="bob")
        assert code == 403
        code, _ = _req("POST", f"{base}/datastreams/authz/pause", principal="alice")
        assert code == 200
        code, _ = _req("DELETE", f"{base}/datastreams/authz", principal="alice")
        assert code == 200
    finally:
        srv.stop()


# --------------------------------------------------------------------------
# avrogenerator analog
# --------------------------------------------------------------------------


def test_db_type_mapping_matches_reference_table():
    """Types.java:13-33 parity, including the NUMBER→string decimal rule
    and space handling (LONG RAW)."""
    assert AG.db_type_to_avro("NUMBER") == "string"
    assert AG.db_type_to_avro("VARCHAR2") == "string"
    assert AG.db_type_to_avro("LONG RAW") == "bytes"
    assert AG.db_type_to_avro("timestamp") == "long"
    assert AG.db_type_to_avro("DATE") == "long"
    with pytest.raises(ValueError):
        AG.db_type_to_avro("GEOMETRY")


def test_field_meta_wire_format_round_trip():
    """FieldMetadata.parseMetadata parity: 'k=v;' pairs, trailing ';'."""
    meta = "dbTableName=ANET_TOPICS;pk=anetId;"
    assert AG.parse_field_meta(meta) == {"dbTableName": "ANET_TOPICS", "pk": "anetId"}
    with pytest.raises(ValueError, match="Ill-formatted"):
        AG.parse_field_meta("novalue;")
    col = AG.ColumnMeta("AMOUNT", "NUMBER", 2, True, 10, 2)
    back = AG.ColumnMeta.from_meta_string(col.meta_string())
    assert back == col


def test_generated_schema_parses_in_jvm_avro(spark):
    """The generated JSON must be a valid Avro schema per the SAME parser
    the reference uses (org.apache.avro on Spark's classpath)."""
    cols = [
        AG.ColumnMeta("ID", "LONG", 0, nullable=False),
        AG.ColumnMeta("NAME", "VARCHAR2", 1, nullable=True),
        AG.ColumnMeta("AMOUNT", "NUMBER", 2, nullable=True, precision=10, scale=2),
        AG.ColumnMeta("CREATED", "TIMESTAMP", 3, nullable=False),
        AG.ColumnMeta("PAYLOAD", "BLOB", 4, nullable=True),
    ]
    schema = AG.generate_table_schema("APP", "ORDERS_T", cols, primary_keys=["ID"])
    jvm = spark.sparkContext._jvm
    parsed = jvm.org.apache.avro.Schema.Parser().parse(AG.schema_json(schema))
    assert parsed.getName() == "ORDERS_T"
    assert [str(f.name()) for f in parsed.getFields()] == [
        "ID", "NAME", "AMOUNT", "CREATED", "PAYLOAD",
    ]
    # nullable column → union [type, "null"] in the reference's order
    name_type = parsed.getField("NAME").schema()
    assert str(name_type.getType()) == "UNION"
    assert [str(t.getType()) for t in name_type.getTypes()] == ["STRING", "NULL"]
    # record meta carries table provenance + pk
    meta = AG.parse_field_meta(schema["meta"])
    assert meta["dbTableName"] == "ORDERS_T" and meta["pk"] == "ID"


def test_duckdb_describe_to_avro_and_codec_round_trip():
    """DatabaseSource-over-DuckDB on the orders table, then encode/decode
    a row through the engine's pure-Python Avro codec."""
    import duckdb

    from brooklin_spark.functions import avro_codec as C

    con = duckdb.connect()
    con.sql(
        "CREATE TABLE orders_t (o_orderkey BIGINT NOT NULL, o_comment VARCHAR, "
        "o_total DECIMAL(12,2), o_date DATE)"
    )
    schema = AG.duckdb_table_schema(con, "orders_t")
    by_name = {f["name"]: f for f in schema["fields"]}
    assert by_name["o_orderkey"]["type"] == "long"  # NOT NULL → bare type
    assert by_name["o_comment"]["type"] == ["string", "null"]
    assert by_name["o_total"]["type"] == ["string", "null"]  # NUMBER rule
    assert AG.parse_field_meta(by_name["o_total"]["meta"])["numberPrecision"] == "12"
    row = {"o_orderkey": 7, "o_comment": "fast", "o_total": "123.45", "o_date": 19000}
    payload = C.encode(schema, row)
    assert C.decode(schema, payload) == row


def test_spark_schema_to_avro(spark):
    """Engine-native path: a Spark StructType (with decimals) derives the
    same shape, valid per the JVM parser."""
    from pyspark.sql import types as T

    st = T.StructType(
        [
            T.StructField("k", T.LongType(), False),
            T.StructField("v", T.StringType(), True),
            T.StructField("amt", T.DecimalType(12, 2), True),
            T.StructField("ts", T.TimestampType(), False),
        ]
    )
    schema = AG.spark_schema_to_avro(st, "EVENTS_T")
    jvm = spark.sparkContext._jvm
    parsed = jvm.org.apache.avro.Schema.Parser().parse(AG.schema_json(schema))
    assert parsed.getName() == "EVENTS_T"
    amt = {f["name"]: f for f in schema["fields"]}["amt"]
    m = AG.parse_field_meta(amt["meta"])
    assert m["dbFieldType"] == "NUMBER" and m["numberScale"] == "2"


def test_rest_client_and_cli_round_trip(server, spark, tmp_path, capsys):
    """DatastreamRestClient + CLI analogs drive the live facade: create via
    CLI, read/pause/resume via client, exists/wait-till-deleted parity."""
    import json as _json

    from brooklin_spark.rest_client import (
        DatastreamRestClient,
        DatastreamRestError,
        main as cli_main,
    )

    base = server.address
    src = str(tmp_path / "in")
    _write(src + "/a.txt", "cli\n")
    spec = {
        "name": "clipipe",
        "connector": "file",
        "transport": "memory",
        "source_uri": f"file://{src}",
        "metadata": {"memory.table": "clipipe"},
    }
    rc = cli_main(["--uri", base, "-o", "create", "--spec", _json.dumps(spec)])
    assert rc == 0
    created = _json.loads(capsys.readouterr().out)
    assert created["name"] == "clipipe" and created["status"] == "READY"

    client = DatastreamRestClient(base)
    assert client.datastream_exists("clipipe")
    assert not client.datastream_exists("nope")
    assert [s["name"] for s in client.get_all_datastreams()] == ["clipipe"]
    assert client.pause("clipipe")["status"] == "PAUSED"
    assert client.resume("clipipe")["status"] == "READY"
    client.pause_source_partitions("clipipe", [1, 2])
    assert client.paused_source_partitions("clipipe")["paused"] == [1, 2]
    client.resume_source_partitions("clipipe")
    assert client.paused_source_partitions("clipipe")["paused"] == []
    # CLI READALL prints the list
    assert cli_main(["--uri", base, "-o", "READALL"]) == 0
    assert "clipipe" in capsys.readouterr().out
    # error surface: pausing a missing stream is a typed 404 error
    try:
        client.pause("missing")
        raise AssertionError("expected DatastreamRestError")
    except DatastreamRestError as e:
        assert e.status == 404
    client.delete_datastream("clipipe")
    client.wait_till_datastream_is_deleted("clipipe", timeout_s=10)


def test_rest_update_datastream(server, spark, tmp_path):
    """PUT /datastreams/{name}: metadata updates restart the live query on
    the SAME checkpoint (no replay); connector/transport/status changes
    are rejected (DatastreamResources.update:208 rules)."""
    from brooklin_spark.rest_client import DatastreamRestClient, DatastreamRestError

    base = server.address
    src = str(tmp_path / "in")
    _write(src + "/a.txt", "u1\n")
    client = DatastreamRestClient(base)
    spec = {
        "name": "upd",
        "connector": "file",
        "transport": "memory",
        "source_uri": f"file://{src}",
        "metadata": {"memory.table": "upd"},
    }
    client.create_datastream(spec)
    # wait for the FIRST delivery before updating, so the no-replay check
    # has a deterministic baseline (the restart must not re-deliver it)
    import time as _t0

    deadline0 = _t0.time() + 20
    while _t0.time() < deadline0:
        if (
            spark.catalog.tableExists("upd")
            and spark.sql("SELECT count(*) n FROM upd").first().n >= 1
        ):
            break
        _t0.sleep(0.3)
    assert spark.sql("SELECT count(*) n FROM upd").first().n == 1

    new_spec = dict(spec, metadata={"memory.table": "upd", "note": "v2"})
    out = client.update_datastream(new_spec)
    assert out["metadata"]["note"] == "v2" and out["status"] == "READY"
    # no replay: after the restart the destination still has exactly one row
    import time as _t

    deadline = _t.time() + 20
    while _t.time() < deadline:
        n = spark.sql("SELECT count(*) n FROM upd").first().n
        if n >= 1:
            break
        _t.sleep(0.3)
    assert spark.sql("SELECT count(*) n FROM upd").first().n == 1

    # rejected update shapes
    for bad, err in [
        (dict(new_spec, transport="noop"), "transport"),
        (dict(new_spec, status="PAUSED"), "status"),
        (dict(new_spec, name="other"), "no pipeline|name mismatch"),
    ]:
        try:
            client.update_datastream(bad)
            raise AssertionError(f"expected rejection for {bad}")
        except DatastreamRestError as e:
            assert e.status in (400, 404), str(e)
    client.delete_datastream("upd")


def test_rest_schema_registry_round_trip(spark, tmp_path):
    """The serde SchemaRegistry exposed over the facade: POST a generated
    Avro schema, GET it back by the returned id, and the id IS the frame
    digest serde.py embeds after the magic byte — so a payload framed by
    the engine resolves through the registry the facade serves."""
    import duckdb
    import json as _json
    import urllib.request

    from brooklin_spark.functions import avro_codec as C
    from brooklin_spark.functions import serde as SD
    from brooklin_spark.rest import DatastreamRestServer

    mgr = PipelineManager(spark, str(tmp_path / "mgr"))
    reg = SD.SchemaRegistry()
    srv = DatastreamRestServer(mgr, schema_registry=reg).start()
    try:
        base = srv.address
        con = duckdb.connect()
        con.sql("CREATE TABLE t (k BIGINT NOT NULL, v VARCHAR)")
        schema = AG.duckdb_table_schema(con, "t")
        code, out = _req("POST", f"{base}/schemas", schema)
        assert code == 201
        sid = out["id"]
        code, got = _req("GET", f"{base}/schemas/{sid}")
        assert code == 200 and got["schema"]["name"] == "t"
        # frame a record with the registry id; decode through the registry
        payload = C.encode(schema, {"k": 9, "v": "x"})
        framed = SD.MAGIC_BYTE + bytes.fromhex(sid) + payload
        assert reg.decode_framed(framed) == {"k": 9, "v": "x"}
        code, _ = _req("GET", f"{base}/schemas/{'0' * 32}")
        assert code == 404
    finally:
        srv.stop()


# --------------------------------------------------------------------------
# Property: every schema the generator can emit round-trips rows through
# the engine's Avro codec, including nullable unions and schema-resolution
# evolution (dropped writer fields vanish; the pipeline a registry frame
# travels: generate → register → encode → resolve).
# --------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st

_GEN_TYPES = ["LONG", "INTEGER", "VARCHAR2", "BLOB", "FLOAT", "DOUBLE", "NUMBER"]


def _value_for(db_type: str, nullable: bool, draw):
    base = {
        "LONG": st.integers(min_value=-(2**40), max_value=2**40),
        "INTEGER": st.integers(min_value=-(2**31), max_value=2**31 - 1),
        "VARCHAR2": st.text(max_size=20),
        "NUMBER": st.text("0123456789.", min_size=1, max_size=12),
        "BLOB": st.binary(max_size=16),
        # float32 must survive a float64 round-trip: draw exact halves
        "FLOAT": st.integers(-1000, 1000).map(lambda n: n / 2.0),
        "DOUBLE": st.floats(allow_nan=False, allow_infinity=False, width=64),
    }[db_type]
    return draw(st.none() | base) if nullable else draw(base)


@st.composite
def _table_and_rows(draw):
    n_cols = draw(st.integers(min_value=1, max_value=6))
    cols = []
    names = draw(
        st.lists(
            st.from_regex(r"[A-Z][A-Z0-9_]{0,8}", fullmatch=True),
            min_size=n_cols, max_size=n_cols, unique=True,
        )
    )
    for i, nm in enumerate(names):
        db_type = draw(st.sampled_from(_GEN_TYPES))
        nullable = draw(st.booleans())
        cols.append(
            AG.ColumnMeta(
                nm, db_type, i, nullable,
                precision=10 if db_type == "NUMBER" else None,
                scale=2 if db_type == "NUMBER" else None,
            )
        )
    rows = [
        {c.name: _value_for(c.db_type, c.nullable, draw) for c in cols}
        for _ in range(draw(st.integers(min_value=1, max_value=4)))
    ]
    return cols, rows


@settings(max_examples=40, deadline=None)
@given(_table_and_rows())
def test_generated_schema_codec_round_trip_property(tr):
    from brooklin_spark.functions import avro_codec as C

    cols, rows = tr
    schema = AG.generate_table_schema("S", "T_PROP", cols)
    for row in rows:
        assert C.decode(schema, C.encode(schema, row)) == row
    # evolution: a reader that drops the last column still decodes every
    # writer payload (the registry resolve path)
    if len(cols) > 1:
        reader = AG.generate_table_schema("S", "T_PROP", cols[:-1])
        dropped = cols[-1].name
        for row in rows:
            got = C.resolve(schema, reader, C.encode(schema, row))
            want = {k: v for k, v in row.items() if k != dropped}
            assert got == want


def test_metrics_route(server):
    """GET /metrics: the cluster metrics reduce
    (ServerComponentHealthAggregator analog) — poll snapshot + listener
    lifetime totals are both present."""
    code, out = _req("GET", f"{server.address}/metrics")
    assert code == 200
    assert {"pipelines", "active_queries", "listener"} <= set(out)
    lst = out["listener"]
    assert {"queries", "batches", "input_rows", "batch_ms_p50"} <= set(lst)


# --------------------------------------------------------------------------
# Round-8: nested FieldType trees (FieldType.java:8-31's struct/array
# kinds) — arrays, structs, arrays-of-structs derive to any depth.
# --------------------------------------------------------------------------


def test_avrogen_array_column():
    from brooklin_spark.functions.avrogen import ColumnMeta, generate_table_schema

    col = ColumnMeta(
        "phone_numbers", "ARRAY", 0, nullable=False,
        element=ColumnMeta("item", "VARCHAR", 0, nullable=False),
        type_name="PHONE_NUMBERS",
    )
    rec = generate_table_schema("s", "t", [col])
    f = rec["fields"][0]
    assert f["type"] == {
        "type": "array",
        "name": "phoneNumbers",  # UPPER_UNDERSCORE -> lowerCamel
        "items": "string",
    }


def test_avrogen_struct_column_nullable_union_order():
    from brooklin_spark.functions.avrogen import ColumnMeta, generate_table_schema

    col = ColumnMeta(
        "settings", "TABLE", 0, nullable=True,
        children=[
            ColumnMeta("volume", "INTEGER", 0, nullable=False),
            ColumnMeta("label", "VARCHAR", 1, nullable=True),
        ],
        type_name="SETTING",
    )
    rec = generate_table_schema("s", "t", [col])
    f = rec["fields"][0]
    # nullable union: real type FIRST, then "null" (AvroJson.nullableType)
    assert isinstance(f["type"], list) and f["type"][1] == "null"
    inner = f["type"][0]
    assert inner["type"] == "record" and inner["name"] == "SETTING"
    assert [c["name"] for c in inner["fields"]] == ["volume", "label"]
    assert f["default"] is None


def test_avrogen_array_of_struct_depth():
    from brooklin_spark.functions.avrogen import ColumnMeta, generate_table_schema

    elem = ColumnMeta(
        "addr", "TABLE", 0, nullable=False,
        children=[ColumnMeta("zip", "VARCHAR", 0, nullable=False)],
        type_name="ADDR",
    )
    col = ColumnMeta(
        "addresses", "ARRAY", 0, nullable=False, element=elem,
        type_name="ADDRESSES",
    )
    rec = generate_table_schema("s", "t", [col])
    items = rec["fields"][0]["type"]["items"]
    assert items["type"] == "record" and items["fields"][0]["name"] == "zip"


def test_avrogen_array_requires_element():
    import pytest

    from brooklin_spark.functions.avrogen import ColumnMeta, generate_table_schema

    with pytest.raises(ValueError, match="mono-typed"):
        generate_table_schema(
            "s", "t", [ColumnMeta("xs", "ARRAY", 0, nullable=False)]
        )


def test_avrogen_spark_nested_schema(spark):
    from pyspark.sql import types as T

    from brooklin_spark.functions.avrogen import spark_schema_to_avro

    schema = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField(
                "tags", T.ArrayType(T.StringType(), False), True
            ),
            T.StructField(
                "meta",
                T.StructType(
                    [
                        T.StructField("k", T.StringType(), True),
                        T.StructField(
                            "scores", T.ArrayType(T.DoubleType(), False), False
                        ),
                    ]
                ),
                False,
            ),
        ]
    )
    rec = spark_schema_to_avro(schema, "docs")
    by_name = {f["name"]: f for f in rec["fields"]}
    assert by_name["id"]["type"] == "long"
    tags = by_name["tags"]["type"]
    assert tags[1] == "null" and tags[0]["type"] == "array"
    assert tags[0]["items"] == "string"
    meta = by_name["meta"]["type"]
    assert meta["type"] == "record"
    inner = {f["name"]: f for f in meta["fields"]}
    assert inner["scores"]["type"]["items"] == "double"
