"""Capacity planning helpers — the LoadBasedTaskCountEstimator analog
(reference: datastream-server/.../assignment/LoadBasedTaskCountEstimator.java:27,58-100
with defaults from LoadBasedPartitionAssignmentStrategyConfig.java:30-35).

Spark's scheduler owns placement (SURVEY §2.9), so assignment strategies are
non-goals — but the *sizing arithmetic* stays useful on Spark: it answers
"how many kafka partitions / executor cores does this pipeline need", i.e.
`minPartitions` on the Kafka source and executor counts for dynamic
allocation bounds.
"""

from __future__ import annotations

from dataclasses import dataclass

#: reference defaults (LoadBasedPartitionAssignmentStrategyConfig.java:30-35)
TASK_CAPACITY_MBPS = 4.0
TASK_CAPACITY_UTILIZATION_PCT = 90
DEFAULT_PARTITION_KB_RATE = 5.0
DEFAULT_PARTITION_MSGS_RATE = 5.0


@dataclass
class PartitionThroughput:
    """Per-partition observed inflow (KafkaThroughputInfo analog)."""

    partition: str
    bytes_in_kb_per_sec: float = DEFAULT_PARTITION_KB_RATE
    msgs_in_per_sec: float = DEFAULT_PARTITION_MSGS_RATE


def estimate_task_count(
    throughputs: list[PartitionThroughput],
    task_capacity_mbps: float = TASK_CAPACITY_MBPS,
    utilization_pct: int = TASK_CAPACITY_UTILIZATION_PCT,
    max_tasks: int | None = None,
) -> int:
    """Tasks needed to carry the aggregate inflow at the target utilization
    (LoadBasedTaskCountEstimator.getTaskCount:58-100): ceil(total KB/s ÷
    (capacity × utilization)), at least one task per non-empty stream,
    optionally capped."""
    import math

    if not throughputs:
        return 0
    total_kb = sum(t.bytes_in_kb_per_sec for t in throughputs)
    effective_kb = task_capacity_mbps * 1024.0 * (utilization_pct / 100.0)
    n = max(1, math.ceil(total_kb / effective_kb))
    if max_tasks is not None:
        n = min(n, max_tasks)
    return n


# ---------------------------------------------------------------------------
# Bucketed-layout sizing (round-7 measurement, BASELINE.md "bucketed spine
# at sf100"): Spark cannot split a bucket file, so N buckets caps scan
# parallelism at N tasks. 32 buckets (~43 MB each) was right at sf10 and
# WRONG at sf100 (~430 MB each inverted q5 to 1.4x SLOWER than the plain
# layout); 256 buckets (~55 MB each) restored the win and built 2.5x
# faster. This helper codifies that rule: size buckets to tens of MB AND
# at least the cluster's parallelism, as a power of two so co-bucketed
# tables stay join-compatible across doublings.
# ---------------------------------------------------------------------------

#: target on-disk bytes per bucket file (measured sweet spot 40-60 MB;
#: compressed parquet)
BUCKET_TARGET_BYTES = 64 * 1024 * 1024
#: never recommend more buckets than this (file-count pressure on the
#: namenode/listing path dominates past ~tens of thousands)
BUCKET_MAX = 65536


def advise_bucket_count(
    table_bytes: int,
    cluster_cores: int,
    target_bytes: int = BUCKET_TARGET_BYTES,
    max_buckets: int = BUCKET_MAX,
) -> int:
    """Recommend CLUSTERED BY ... INTO n BUCKETS for a fact table.

    n = the smallest power of two satisfying BOTH constraints:
    bytes/n <= target (bucket files stay splittable-scan-sized) and
    n >= cluster_cores (the layout never caps parallelism below the
    cluster). Power-of-two so two tables bucketed by this rule at
    different corpus sizes still co-locate after the smaller is rebuilt
    with a doubled count — and so the count survives AQE coalescing
    boundaries cleanly.
    """
    if table_bytes <= 0 or cluster_cores <= 0:
        raise ValueError("table_bytes and cluster_cores must be positive")
    n = 1
    while n < cluster_cores or table_bytes / n > target_bytes:
        if n >= max_buckets:
            break
        n *= 2
    return n


def advise_shuffle_partitions(
    shuffled_bytes: int,
    cluster_cores: int,
    target_bytes: int = 128 * 1024 * 1024,
) -> int:
    """spark.sql.shuffle.partitions for a job whose largest shuffle moves
    ``shuffled_bytes``: enough partitions that each fits the per-task
    memory comfort zone (~128 MB uncompressed), rounded up to a multiple
    of the cores so waves stay full; never below the core count."""
    import math

    if cluster_cores <= 0:
        raise ValueError("cluster_cores must be positive")
    need = max(1, math.ceil(shuffled_bytes / target_bytes))
    waves = max(1, math.ceil(need / cluster_cores))
    return waves * cluster_cores
