#!/usr/bin/env python
"""The CUSTKEY-layout twin of spine_bucketed.py (r8 verdict item 5).

  python scripts/spine_custkey.py [sf_dir] [out.json]

spine_bucketed's orderkey layout made q3/q10 5.3x/2.8x faster at sf100
but left q5 at 1.2x: its residual cost is the custkey exchange of the
customer x orders join once the 15M-row customer side stops
broadcasting. This twin writes the layout a q5-shaped workload would
pick instead: customer AND orders bucketed+sorted on the CUSTOMER key
(so that join plans exchange-free) with lineitem bucketed on
l_orderkey (so the fact-fact join keeps its free side; only the
filtered orders+customer stream re-keys to orderkey).

Same checkable contract as spine_bucketed.py: results compared
row-for-row against the plain layout in-process, and the final-plan
Exchange count recorded per variant.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SPINE = ["q3_top_unshipped_orders", "q5_local_supplier_volume", "q10_returned_items"]
N_BUCKETS = int(os.environ.get("SPINE_BUCKETS", "32"))
LAYOUT = [
    ("customer", "c_custkey"),
    ("orders", "o_custkey"),
    ("lineitem", "l_orderkey"),
]


def n_exchanges(df) -> int:
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
    spark = get_spark(app_name="spine-custkey")
    db = "spinecust_" + os.path.basename(os.path.normpath(sf_dir)).replace(".", "_")
    marker = f"bucketed:{db}:{sf_dir}"
    book: dict = {"sf_dir": sf_dir, "db": db, "n_buckets": N_BUCKETS, "runs": runs,
                  "layout": dict(LAYOUT)}

    spark.sql(f"CREATE DATABASE IF NOT EXISTS {db}")
    build_s = {}
    warehouse = spark.conf.get(
        "spark.sql.warehouse.dir", "spark-warehouse"
    ).removeprefix("file:")
    for name, key in LAYOUT:
        if spark.catalog.tableExists(f"{db}.{name}"):
            continue
        loc = os.path.join(warehouse, f"{db}.db", name)
        if os.path.isdir(loc):
            register_bucketed(spark, f"{db}.{name}", key, N_BUCKETS, loc)
            continue
        t0 = time.perf_counter()
        # one sorted file per bucket — see spine_bucketed.py
        df = table(spark, sf_dir, name).repartition(N_BUCKETS, F.col(key))
        write_bucketed(df, f"{db}.{name}", key, N_BUCKETS, sort=True)
        # provenance stamp: lets q5's spine_twin() auto-route this layout
        from brooklin_spark.operators.bucketing import stamp_source, table_location

        stamp_source(
            table_location(spark, f"{db}.{name}"),
            os.path.join(sf_dir, f"{name}.parquet"),
        )
        build_s[name] = round(time.perf_counter() - t0, 3)
    book["build_s"] = build_s

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

    for variant, d in [("plain", sf_dir), ("custkey_bucketed", marker)]:
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
