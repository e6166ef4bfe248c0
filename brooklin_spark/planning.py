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
