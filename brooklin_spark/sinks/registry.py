"""Sink registry: transport name → writer builder.

Each builder takes the envelope DataFrame (streaming) and the spec and
returns a started-ready DataStreamWriter. Checkpoint location and trigger
config are applied by the PipelineManager (one place, per pipeline).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql.streaming import DataStreamWriter
from pyspark.sql import functions as F

from brooklin_spark.model import PipelineSpec

SinkBuilder = Callable[[DataFrame, PipelineSpec], DataStreamWriter]

SINKS: dict[str, SinkBuilder] = {}


def sink(name: str) -> Callable[[SinkBuilder], SinkBuilder]:
    def deco(fn: SinkBuilder) -> SinkBuilder:
        SINKS[name] = fn
        return fn

    return deco


def _serde_applied(df: DataFrame, spec: PipelineSpec) -> DataFrame:
    """Serialize the envelope into `value` when the spec declares an
    envelope serde (DatastreamProducerRecord.java:73-88 — serdes run at
    send time, per destination). The materialize and directory transports
    consume raw values (they ARE the deserializing consumers), so they
    skip serdes."""
    if spec.transport in ("materialize", "directory"):
        return df
    from brooklin_spark.functions.serde import apply_serdes

    return apply_serdes(df, spec)


def build_writer(df: DataFrame, spec: PipelineSpec) -> DataStreamWriter:
    """Streaming writer for the spec's transport."""
    if spec.transport not in SINKS:
        raise ValueError(f"no sink builder for transport {spec.transport!r}")
    return SINKS[spec.transport](_serde_applied(df, spec), spec)


def write_batch(df: DataFrame, spec: PipelineSpec, spark=None) -> None:
    """Bounded-bootstrap path: write a batch envelope frame through the
    spec's transport (the same destinations, batch API). ``spark`` pins the
    session used for memory-table view registration when df comes from a
    foreachBatch clone."""
    df = _serde_applied(df, spec)
    t = spec.transport
    if t == "memory":
        _memory_append(spec.metadata.get("memory.table", spec.name), df, spark)
    elif t in ("parquet", "file"):
        path = (spec.dest_uri or "").removeprefix("parquet://").removeprefix("file://")
        if not path:
            raise ValueError(f"parquet sink needs dest_uri, got {spec.dest_uri!r}")
        df.write.mode("append").partitionBy("topic").parquet(path)
    elif t == "console":
        df.show(20, truncate=False)
    elif t == "noop":
        df.write.format("noop").mode("overwrite").save()
    elif t == "materialize":
        from brooklin_spark.sinks.materialize import _state_root, merge_batch

        merge_batch(df, _state_root(spec), spark)
    elif t == "directory":
        _directory_mirror(df, spec)
    elif t == "broken":
        _broken_send(df, spec, spark)
    elif t == "kafka":
        dest = (spec.dest_uri or "").removeprefix("kafka://")
        servers, _, topic = dest.partition("/")
        kafka_out_projection(df, topic or None).write.format("kafka").option(
            "kafka.bootstrap.servers", servers
        ).option("includeHeaders", "true").save()
    else:
        raise ValueError(f"transport {t!r} has no batch path")


# ---------------------------------------------------------------------------
# In-memory accumulating sink (ListBackedTransportProvider analog,
# datastream-testcommon/.../ListBackedTransportProvider.java). Implemented
# with foreachBatch instead of format("memory") because foreachBatch sinks
# support checkpoint recovery — pause/resume and crash-restart keep already-
# delivered records and replay only uncommitted batches (at-least-once).
# Driver-side accumulation: test/diagnostics use only, like the reference's.
# ---------------------------------------------------------------------------

_MEMORY_ROWS: dict[str, list] = {}
_MEMORY_SCHEMA: dict[str, object] = {}


def _memory_append(name: str, batch_df: DataFrame, spark=None) -> None:
    # NOTE: foreachBatch hands us a frame bound to a CLONED session; temp
    # views registered there are invisible to the user's session. Register
    # on the main session captured at sink-build time.
    rows = batch_df.collect()
    _MEMORY_ROWS.setdefault(name, []).extend(rows)
    _MEMORY_SCHEMA[name] = batch_df.schema
    spark = spark or batch_df.sparkSession
    spark.createDataFrame(_MEMORY_ROWS[name], _MEMORY_SCHEMA[name]).createOrReplaceTempView(name)


def drop_memory_table(spark, name: str) -> None:
    _MEMORY_ROWS.pop(name, None)
    _MEMORY_SCHEMA.pop(name, None)
    spark.catalog.dropTempView(name)


@sink("memory")
def memory_sink(df: DataFrame, spec: PipelineSpec) -> DataStreamWriter:
    name = spec.metadata.get("memory.table", spec.name)
    # register the view up front (empty until the first batch) so consumers
    # can query the destination as soon as the pipeline is READY
    spark = df.sparkSession
    if name not in _MEMORY_ROWS:
        _MEMORY_ROWS[name] = []
        _MEMORY_SCHEMA[name] = df.schema
        spark.createDataFrame([], df.schema).createOrReplaceTempView(name)
    return df.writeStream.foreachBatch(
        lambda batch_df, _epoch: _memory_append(name, batch_df, spark)
    ).outputMode("append")


@sink("parquet")
def parquet_sink(df: DataFrame, spec: PipelineSpec) -> DataStreamWriter:
    """Directory/file mirroring sink (DirectoryTransportProvider analog) as
    partitioned parquet — partitioned by topic so each pipeline's output
    prunes by destination, append-only at-least-once."""
    path = (spec.dest_uri or "").removeprefix("parquet://").removeprefix("file://")
    if not path:
        raise ValueError(f"parquet sink needs dest_uri, got {spec.dest_uri!r}")
    return (
        df.writeStream.format("parquet")
        .option("path", path)
        .partitionBy("topic")
        .outputMode("append")
    )


@sink("file")
def file_sink(df: DataFrame, spec: PipelineSpec) -> DataStreamWriter:
    return parquet_sink(df, spec)


@sink("console")
def console_sink(df: DataFrame, spec: PipelineSpec) -> DataStreamWriter:
    return df.writeStream.format("console").outputMode("append")


@sink("noop")
def noop_sink(df: DataFrame, spec: PipelineSpec) -> DataStreamWriter:
    """Discard sink (BrokenConnector/Dummy test analogs): runs the plan,
    writes nothing — used for throughput measurement."""
    return df.writeStream.format("noop").outputMode("append")


@sink("materialize")
def materialize_sink(df: DataFrame, spec: PipelineSpec) -> DataStreamWriter:
    """CDC MERGE sink: apply op-codes to a keyed state table (see
    sinks/materialize.py)."""
    from brooklin_spark.sinks.materialize import _state_root, merge_batch

    root = _state_root(spec)
    spark = df.sparkSession
    return df.writeStream.foreachBatch(
        lambda batch_df, _epoch: merge_batch(batch_df, root, spark)
    ).outputMode("append")


# ---------------------------------------------------------------------------
# Directory mirroring transport (DirectoryTransportProvider.java:48-98):
# reflect ENTRY_CREATED / ENTRY_MODIFIED / ENTRY_DELETED change events into
# the destination directory — copy on create, delete+copy on modify, delete
# on delete. File ops run on the driver per micro-batch, like the
# reference's send() (change batches are small by nature — they are
# directory events, not data volume).
# ---------------------------------------------------------------------------


def _directory_mirror(df: DataFrame, spec: PipelineSpec) -> None:
    import os

    dest = (spec.dest_uri or "").removeprefix("dir://").removeprefix("file://")
    if not dest:
        raise ValueError(f"directory sink needs dest_uri, got {spec.dest_uri!r}")
    os.makedirs(dest, exist_ok=True)
    for r in df.select("key", "value", "op_code").collect():
        name = bytes(r.key or b"").decode()
        if not name or os.sep in name:
            continue  # defensive: only mirror flat names inside dest
        target = os.path.join(dest, name)
        if r.op_code == "DELETE":
            try:
                os.remove(target)
            except FileNotFoundError:
                pass  # reference logs 'did not exist' and moves on
        else:  # INSERT = copy; UPDATE = delete+copy (same final state)
            with open(target, "wb") as f:
                f.write(bytes(r.value or b""))


@sink("directory")
def directory_sink(df: DataFrame, spec: PipelineSpec) -> DataStreamWriter:
    return df.writeStream.foreachBatch(
        lambda batch_df, _epoch: _directory_mirror(batch_df, spec)
    ).outputMode("append")


# ---------------------------------------------------------------------------
# Broken transport (BrokenConnector.java test-fixture philosophy applied to
# the send side): delivers to a memory table but raises on configured
# partitions while the module-level switch is set — drives the auto-pause /
# auto-resume paths in tests.
# ---------------------------------------------------------------------------

#: test switch: partitions whose sends fail (empty = healthy)
BROKEN_FAIL_PARTITIONS: set[int] = set()


def _broken_send(df: DataFrame, spec: PipelineSpec, spark=None) -> None:
    if BROKEN_FAIL_PARTITIONS:
        bad = df.filter(
            F.col("partition").isin(sorted(BROKEN_FAIL_PARTITIONS))
        ).count()
        if bad:
            raise RuntimeError(
                f"broken transport: simulated send error ({bad} rows)"
            )
    _memory_append(spec.metadata.get("memory.table", spec.name), df, spark)


@sink("broken")
def broken_sink(df: DataFrame, spec: PipelineSpec) -> DataStreamWriter:
    spark = df.sparkSession
    name = spec.metadata.get("memory.table", spec.name)
    if name not in _MEMORY_ROWS:  # queryable-before-first-delivery, like memory
        _MEMORY_ROWS[name] = []
        _MEMORY_SCHEMA[name] = df.schema
        spark.createDataFrame([], df.schema).createOrReplaceTempView(name)
    return df.writeStream.foreachBatch(
        lambda batch_df, _epoch: _broken_send(batch_df, spec, spark)
    ).outputMode("append")


def kafka_out_projection(df: DataFrame, dest_topic: str | None) -> DataFrame:
    """Envelope → the Kafka sink's record shape: key/value bytes, topic
    routing, and HEADERS — the envelope's map<string,binary> converts to
    the array<struct<key,value>> the Spark Kafka writer expects
    (BrooklinEnvelope._headers parity, BrooklinEnvelope.java:22-32; the
    reference's producer forwards headers on every send)."""
    headers = F.when(
        F.col("headers").isNotNull(),
        F.transform(
            F.map_entries(F.col("headers")),
            lambda e: F.struct(e["key"].alias("key"), e["value"].alias("value")),
        ),
    )
    return df.select(
        F.col("key").alias("key"),
        F.col("value").alias("value"),
        (F.lit(dest_topic) if dest_topic else F.col("topic")).alias("topic"),
        headers.alias("headers"),
    )


@sink("kafka")
def kafka_sink(df: DataFrame, spec: PipelineSpec) -> DataStreamWriter:
    """Kafka transport (KafkaTransportProvider.java:46,106-146 analog).

    Routing parity: explicit `partition` column if present (explicit
    partition routing, DatastreamProducerRecord.java:23), else the Kafka
    producer hashes the key (key-hash routing, KafkaTransportProvider
    .java:138-146). The `topic` column routes per-record destinations
    (mirror rewrite already applied by the source translate); headers
    forward as Kafka record headers. Requires spark-sql-kafka on the
    classpath plus `kafka.includeHeaders` on the writer.
    """
    dest = (spec.dest_uri or "").removeprefix("kafka://")
    servers, _, topic = dest.partition("/")
    out = kafka_out_projection(df, topic or None)
    return (
        out.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", servers)
        .option("includeHeaders", "true")
        .outputMode("append")
    )
