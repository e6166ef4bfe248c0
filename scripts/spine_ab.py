#!/usr/bin/env python
"""A/B the TPC-H spine at a given SF dir under candidate session configs.

  python scripts/spine_ab.py benchdata/sf10 [out.json]

Each variant runs in its OWN Spark session (fresh JVM via session stop +
rebuild) so configs can't leak. Best-of-N per query after an sf0.001
warmup, same discipline as scale_bench.py.
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SPINE = [
    "q1_pricing_summary",
    "q3_top_unshipped_orders",
    "q5_local_supplier_volume",
    "q10_returned_items",
]

#: candidate configs — each must be scale-safe (bounded per-task memory)
VARIANTS: dict[str, dict[str, str]] = {
    "baseline": {},
    # AQE converts SMJ->SHJ when every post-shuffle build partition is
    # below this bound: hash-join speed without sort, per-task build
    # memory capped at the threshold (scale-safe: partition count grows
    # with data, per-partition size is what AQE checks at runtime)
    "shj64m": {
        "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold": str(64 * 1024 * 1024),
    },
    "shj256m": {
        "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold": str(256 * 1024 * 1024),
    },
    # larger advisory partitions: fewer post-shuffle tasks on a 32-core
    # box; combined with the SHJ conversion bound
    "shj256m_adv128m": {
        "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold": str(256 * 1024 * 1024),
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": str(128 * 1024 * 1024),
    },
}


def run_variant(name: str, conf: dict[str, str], sf_dir: str, runs: int) -> dict:
    from pyspark.sql import SparkSession

    from brooklin_spark import registry
    from brooklin_spark.session import get_spark

    registry.load_all()
    # stop() clears both the active and the default session in supported
    # PySpark versions, so the next builder call creates a fresh one —
    # no private-attribute surgery (ADVICE r5).
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
    spark = get_spark(app_name=f"spine-ab-{name}", extra_conf=conf)
    warm = os.environ.get("SPARK_GRAFT_WARMUP_DIR", "/root/testdata/sf0.001")
    for q in SPINE:
        registry.QUERIES[q](spark, warm).write.format("noop").mode("overwrite").save()
    out: dict = {}
    for q in SPINE:
        fn = registry.QUERIES[q]
        best = float("inf")
        for _ in range(runs):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        out[q] = round(best, 3)
        print(f"  [{name}] {q}: {best:.3f}s", file=sys.stderr)
        gc.collect()
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "benchdata/sf10"
    out_path = sys.argv[2] if len(sys.argv) > 2 else None
    runs = int(os.environ.get("SCALE_BENCH_RUNS", "2"))
    book = {"sf_dir": sf_dir, "runs": runs, "variants": {}}
    for name, conf in VARIANTS.items():
        book["variants"][name] = run_variant(name, conf, sf_dir, runs)
    line = json.dumps(book)
    print(line)
    if out_path:
        with open(out_path, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
