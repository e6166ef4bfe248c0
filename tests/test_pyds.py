"""Python DataSource SPI sources (brooklin_spark/sources/pyds.py):
chunked-snapshot batch reader and offset-replay stream reader."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F
from pyspark.sql.datasource import EqualTo, GreaterThan, IsNotNull, StringContains

from brooklin_spark.sources import pyds


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    pyds.register(spark)


def _load(spark, sf, **extra):
    opts = {"path": f"{sf}/customer.parquet", "pk": "c_custkey", "num_shards": "8"}
    opts.update(extra)
    return spark.read.format("chunked_duckdb").options(**opts).load()


def test_chunked_source_covers_table_exactly(spark, sf_correct):
    """Disjoint-total-cover: union of shard partitions == the table."""
    got = _load(spark, sf_correct).agg(
        F.count("*"), F.count_distinct("c_custkey"), F.sum("c_custkey")
    ).collect()[0]
    exp = (
        spark.read.parquet(f"{sf_correct}/customer.parquet")
        .agg(F.count("*"), F.count_distinct("c_custkey"), F.sum("c_custkey"))
        .collect()[0]
    )
    assert tuple(got) == tuple(exp)


def test_chunked_source_filter_state_is_per_query(spark, sf_correct):
    """Regression: pushed filters must not leak between queries. The
    reader object outlives a query and pushFilters is not re-invoked for
    filterless scans — the original append-only state returned the
    FILTERED count for an unfiltered count on a fresh load."""
    base = spark.read.parquet(f"{sf_correct}/customer.parquet")
    n_all = base.count()
    n_rich = base.filter("c_acctbal > 5000.0").count()
    assert n_rich < n_all
    got_rich = _load(spark, sf_correct).filter("c_acctbal > 5000.0").count()
    got_all = _load(spark, sf_correct).count()
    got_rich2 = _load(spark, sf_correct).filter("c_acctbal > 5000.0").count()
    assert (got_rich, got_all, got_rich2) == (n_rich, n_all, n_rich)


def test_push_filters_translation_and_residual():
    r = pyds.ChunkedDuckDBReader(
        {"path": "x.parquet", "pk": "k", "num_shards": "4"}
    )
    residual = list(
        r.pushFilters(
            [
                EqualTo(("c_mktsegment",), "BUILDING"),
                GreaterThan(("c_acctbal",), 100.5),
                IsNotNull(("c_name",)),
                StringContains(("c_name",), "x"),  # not pushable
            ]
        )
    )
    assert r.pushed == [
        "c_mktsegment = 'BUILDING'",
        "c_acctbal > 100.5",
        "c_name IS NOT NULL",
    ]
    assert len(residual) == 1 and isinstance(residual[0], StringContains)
    # consume-once: partitions() hands filters to tasks and clears state
    parts = r.partitions()
    assert len(parts) == 4 and parts[0].where and r.pushed == []


def test_sql_literal_escaping():
    assert pyds._sql_literal("o'brien") == "'o''brien'"
    assert pyds._sql_literal(True) == "TRUE"
    assert pyds._sql_literal(3) == "3"


def test_replay_stream_delivers_exactly_once(spark, sf_smoke):
    ck = tempfile.mkdtemp(prefix="bk-replay-")
    s = (
        spark.readStream.format("parquet_replay")
        .options(
            path=f"{sf_smoke}/customer.parquet", order_col="c_custkey", batch_rows="40"
        )
        .load()
    )
    q = (
        s.writeStream.format("memory")
        .queryName("replay_once_t")
        .option("checkpointLocation", ck)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = spark.sql(
        "SELECT count(*) n, count(distinct c_custkey) d FROM replay_once_t"
    ).collect()[0]
    exp = spark.read.parquet(f"{sf_smoke}/customer.parquet").count()
    assert (got.n, got.d) == (exp, exp)


def test_replay_stream_checkpoint_recovery(spark, sf_smoke):
    """Stop after the first micro-batch, restart on the SAME checkpoint:
    the second run must resume from the committed offset — full delivery,
    zero duplicates (the section 2.8 offset-commit contract)."""
    ck = tempfile.mkdtemp(prefix="bk-replay-rec-")

    def stream():
        return (
            spark.readStream.format("parquet_replay")
            .options(
                path=f"{sf_smoke}/customer.parquet",
                order_col="c_custkey",
                batch_rows="60",
            )
            .load()
        )

    first: list = []
    second: list = []

    q1 = (
        stream()
        .writeStream.foreachBatch(lambda df, _e: first.extend(df.collect()))
        .option("checkpointLocation", ck)
        .trigger(once=True)  # exactly one micro-batch, then stop
        .start()
    )
    q1.awaitTermination(120)
    total = spark.read.parquet(f"{sf_smoke}/customer.parquet").count()
    assert 0 < len(first) < total
    q2 = (
        stream()
        .writeStream.foreachBatch(lambda df, _e: second.extend(df.collect()))
        .option("checkpointLocation", ck)
        .start()
    )
    q2.processAllAvailable()
    q2.stop()
    keys1 = {r.c_custkey for r in first}
    keys2 = {r.c_custkey for r in second}
    # the recovered run delivers exactly the remainder, each key once
    assert len(first) + len(second) == total
    assert not (keys1 & keys2) and len(keys2) == len(second)


def test_txn_dir_writer_commit_abort_discipline(spark, tmp_path):
    """Two-phase commit contract of the txn_dir sink: staged files only
    become visible through the manifest; an aborted epoch's stages are
    discarded; a successful bounded drain leaves no stragglers in _tmp
    and the manifest row count equals the delivered rows."""
    import json
    import os

    from brooklin_spark.sources import pyds
    from brooklin_spark.sources.pyds import (
        TransactionalDirStreamWriter,
        _FileCommit,
        committed_files,
    )

    out = str(tmp_path / "out")
    os.makedirs(out)
    w = TransactionalDirStreamWriter({"path": out})

    class R:
        def __init__(self, d):
            self._d = d

        def asDict(self):
            return self._d

    # stage two task files, commit epoch 0
    m1 = w.write(iter([R({"k": 1}), R({"k": 2})]))
    m2 = w.write(iter([R({"k": 3})]))
    w.commit([m1, m2], 0)
    assert len(committed_files(out)) == 2
    # a torn epoch: staged but ABORTED — must stay invisible
    m3 = w.write(iter([R({"k": 99})]))
    w.abort([m3], 1)
    assert len(committed_files(out)) == 2
    assert not os.path.exists(m3.path)
    # empty-partition message: no file promoted, epoch still recorded
    m4 = w.write(iter([]))
    w.commit([m4], 2)
    manifest = [
        json.loads(ln) for ln in open(os.path.join(out, "_manifest.jsonl"))
    ]
    assert [m["epoch"] for m in manifest] == [0, 2]
    assert sum(m["rows"] for m in manifest) == 3
    # nothing left staged
    assert os.listdir(os.path.join(out, "_tmp")) == []
    assert isinstance(m1, _FileCommit)
    assert pyds.committed_files(str(tmp_path / "missing")) == []


def test_txn_dir_commit_is_idempotent_per_epoch(tmp_path):
    """Crash-restart re-delivery of the SAME batchId must not
    double-append: the second commit for an epoch discards its stages."""
    import os

    from brooklin_spark.sources.pyds import (
        TransactionalDirStreamWriter,
        committed_files,
    )

    out = str(tmp_path / "out")
    os.makedirs(out)
    w = TransactionalDirStreamWriter({"path": out})

    class R:
        def __init__(self, d):
            self._d = d

        def asDict(self):
            return self._d

    m = w.write(iter([R({"k": 1})]))
    w.commit([m], 7)
    # re-delivery of epoch 7 after a simulated restart
    m2 = w.write(iter([R({"k": 1})]))
    w.commit([m2], 7)
    assert len(committed_files(out)) == 1
    assert not os.path.exists(m2.path)


def test_txn_dir_sink_exactly_once_across_restart(spark, sf_smoke, tmp_path):
    """Stop the stream mid-replay, restart from the checkpoint, drain:
    the manifest-committed rows equal the source exactly once (unique
    keys, exact count) and epochs never repeat."""
    import json
    import os
    import time

    from brooklin_spark.sources import pyds

    pyds.register(spark)
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(out)
    src_path = f"{sf_smoke}/customer.parquet"
    n_total = spark.read.parquet(src_path).count()

    def start():
        return (
            spark.readStream.format("parquet_replay")
            .options(path=src_path, order_col="c_custkey", batch_rows="37")
            .load()
            .select("c_custkey", "c_name")
            .writeStream.format("txn_dir")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .start()
        )

    q = start()
    manifest = os.path.join(out, "_manifest.jsonl")
    deadline = time.time() + 60
    while time.time() < deadline:
        if os.path.exists(manifest) and sum(1 for _ in open(manifest)) >= 2:
            break
        time.sleep(0.2)
    q.stop()  # crash mid-replay

    q2 = start()
    q2.processAllAvailable()
    q2.stop()

    files = pyds.committed_files(out)
    rows = [json.loads(ln) for fp in files for ln in open(fp)]
    keys = [r["c_custkey"] for r in rows]
    assert len(keys) == n_total, (len(keys), n_total)
    assert len(set(keys)) == n_total
    epochs = [json.loads(ln)["epoch"] for ln in open(manifest)]
    assert len(epochs) == len(set(epochs)), epochs
