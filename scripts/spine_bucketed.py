#!/usr/bin/env python
"""A/B the TPC-H spine on PLAIN parquet vs BUCKETED-orderkey tables.

  python scripts/spine_bucketed.py [sf_dir] [out.json]

The r5 verdict's one untried lever on the q5/q10/q3 gap: both fact
tables (orders, lineitem) are written ONCE as bucketed+sorted catalog
tables on the order key, so every orderkey join plans with zero Exchange
on the fact sides — the write-time shuffle amortizes across all
downstream queries (the 100 TB layout answer, not a per-query trick).

The registered queries run UNMODIFIED via io.table's "bucketed:" scheme;
plain and bucketed results are compared row-for-row in-process, and the
Exchange count of each physical plan is recorded in the book so the
claimed shuffle elimination is checkable, not asserted.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SPINE = ["q3_top_unshipped_orders", "q5_local_supplier_volume", "q10_returned_items"]
N_BUCKETS = int(os.environ.get("SPINE_BUCKETS", "32"))


def n_exchanges(df) -> int:
    # collect() first so AQE's FINAL plan is what gets counted — the
    # pre-execution executedPlan still carries ENSURE_REQUIREMENTS
    # exchanges that AQE later elides or converts. The adaptive plan's
    # toString prints BOTH the final and the initial plan; count only the
    # final section.
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    return plan.count("Exchange hashpartitioning")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "benchdata/sf10"
    out_path = sys.argv[2] if len(sys.argv) > 2 else None
    runs = int(os.environ.get("SCALE_BENCH_RUNS", "2"))

    from pyspark.sql import functions as F

    from brooklin_spark import registry
    from brooklin_spark.io import table
    from brooklin_spark.operators.bucketing import register_bucketed, write_bucketed
    from brooklin_spark.session import get_spark

    registry.load_all()
    spark = get_spark(app_name="spine-bucketed")
    db = "spine_" + os.path.basename(os.path.normpath(sf_dir)).replace(".", "_")
    marker = f"bucketed:{db}:{sf_dir}"
    book: dict = {"sf_dir": sf_dir, "db": db, "n_buckets": N_BUCKETS, "runs": runs}

    spark.sql(f"CREATE DATABASE IF NOT EXISTS {db}")
    build_s = {}
    warehouse = spark.conf.get(
        "spark.sql.warehouse.dir", "spark-warehouse"
    ).removeprefix("file:")
    for name, key in [("orders", "o_orderkey"), ("lineitem", "l_orderkey")]:
        if spark.catalog.tableExists(f"{db}.{name}"):
            continue
        loc = os.path.join(warehouse, f"{db}.db", name)
        if os.path.isdir(loc):
            # files from a prior session outlive the in-memory catalog —
            # re-attach them with the same bucket spec
            register_bucketed(spark, f"{db}.{name}", key, N_BUCKETS, loc)
            continue
        t0 = time.perf_counter()
        # repartition on the bucket key with the bucket count first: the
        # writer's bucket hash matches repartition's Murmur3 hash, so each
        # task holds exactly one bucket -> ONE sorted file per bucket ->
        # the sorted-bucket scan keeps its outputOrdering (multi-file
        # buckets would force a re-sort under the SMJ anyway)
        df = table(spark, sf_dir, name).repartition(N_BUCKETS, F.col(key))
        write_bucketed(df, f"{db}.{name}", key, N_BUCKETS, sort=True)
        build_s[name] = round(time.perf_counter() - t0, 3)
    book["build_s"] = build_s

    # correctness: bucketed layout must be invisible in the results
    mismatched = []
    for q in SPINE:
        a = registry.QUERIES[q](spark, sf_dir).toPandas()
        b = registry.QUERIES[q](spark, marker).toPandas()
        cols = sorted(a.columns)
        a = a[cols].sort_values(cols, ignore_index=True)
        b = b[cols].sort_values(cols, ignore_index=True)
        if not a.equals(b):
            mismatched.append(q)
    book["result_mismatch"] = mismatched

    warm = os.environ.get("SPARK_GRAFT_WARMUP_DIR", "/root/testdata/sf0.001")
    for q in SPINE:
        registry.QUERIES[q](spark, warm).write.format("noop").mode("overwrite").save()

    for variant, d in [("plain", sf_dir), ("bucketed", marker)]:
        times, exch = {}, {}
        for q in SPINE:
            fn = registry.QUERIES[q]
            exch[q] = n_exchanges(fn(spark, d))
            best = float("inf")
            for _ in range(runs):
                t0 = time.perf_counter()
                fn(spark, d).write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
            times[q] = round(best, 3)
            print(f"  [{variant}] {q}: {best:.3f}s ({exch[q]} exchanges)",
                  file=sys.stderr)
        book[variant] = {"times": times, "exchanges": exch}

    line = json.dumps(book)
    print(line)
    if out_path:
        with open(out_path, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
