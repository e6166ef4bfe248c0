"""SparkSession factory tuned for the engine.

Scale rationale (100 TB target, tested on local[32]):
- AQE on: runtime coalescing, skew-join splitting, and dynamic join
  strategy switching replace hand-tuned shuffle partition counts when the
  same plans run on a 1000-executor cluster.
- ``spark.sql.shuffle.partitions`` defaults to the local core count here;
  on a real cluster AQE's coalescing makes the initial number a ceiling,
  not a tuning knob.
- Session timezone pinned to UTC so event-time semantics are identical
  across engines (and to the DuckDB correctness oracle).
- Arrow enabled: every pandas_udf / toPandas crosses the JVM<->Python
  boundary in columnar batches instead of pickled rows.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "brooklin-spark",
    cpus: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the engine's SparkSession.

    ``cpus`` defaults to $SPARK_GRAFT_CPUS or all local cores. On a real
    cluster the ``master`` is supplied externally and the local[] line is
    ignored by spark-submit; nothing else here is local-mode-specific.
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.default.parallelism", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # ~20% on decimal-heavy aggregates (measured q1/q5/q6 at sf0.1):
        # skips per-op overflow raises; decimal sums widen to precision 22
        # so silent overflow needs >10^20 — unreachable even at 100 TB
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # split small local files across cores; on a real cluster raise this
        # back toward 128m (files there are many and HDFS-block-sized)
        .config("spark.sql.files.maxPartitionBytes", "4m")
        .config("spark.sql.files.openCostInBytes", "1m")
        # testdata events.parquet stores TIMESTAMP(NANOS); Spark 4 refuses it
        # unless read as long — io.table() converts back to micros
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # RocksDB state store: keyed streaming state (dedup windows,
        # applyInPandasWithState totals/before-images, stream-stream join
        # buffers) lives off-heap/on-disk instead of on the executor heap —
        # at 100 TB / billions of keys the default HDFS-backed store OOMs
        # the executors. Changelog checkpointing ships per-batch deltas to
        # the checkpoint location instead of full SST snapshots.
        .config(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
        )
        .config(
            "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
            "true",
        )
        # small dims (region/nation/supplier/part at low SF) broadcast
        # freely, but FACT tables must never become build sides: at the
        # derived sf1 a 64MB threshold let the column-pruned 6M-row
        # lineitem broadcast in q3/q5/q10 (driver-built 6M-entry hash
        # relation, q5 7.9s); at 24MB those joins fall back to SMJ on the
        # join key (q5 3.4s) while every dimension still broadcasts at
        # any SF. AQE re-checks runtime sizes either way.
        .config("spark.sql.autoBroadcastJoinThreshold", str(24 * 1024 * 1024))
        # long multi-query sessions (the driver's 280-query correctness
        # sweep, bench.py, the parity tests) accumulate localCheckpoint
        # RDD blocks until a JVM GC lets ContextCleaner release them; a
        # 48g heap left alone collects far too rarely, so later queries
        # measure memory pressure instead of their plans (r9-opt: same
        # pathology bench.py now guards per-rep). The periodic driver GC
        # is Spark's own knob for exactly this — 2min bounds the leak
        # window without measurable overhead (default 30min).
        .config("spark.cleaner.periodicGC.interval", "2min")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
