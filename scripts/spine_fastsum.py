#!/usr/bin/env python
"""A/B the q5/q10 residual levers named by the r6 verdict: pre-join partial
aggregation and an integer-cents exact-sum path.

  python scripts/spine_fastsum.py [sf_dir] [out.json]   # expects the
  spine_bucketed db for sf_dir to exist (scripts/spine_bucketed.py)

Context (r6 stage breakdown): bucketed q5 is 8.8 s at sf10 with ZERO fact
exchange left — the residual is ~3 s exact-decimal arithmetic + ~4.7 s
broadcast-probe CPU over the unfiltered lineitem stream. Two candidate
levers:

1. **Pre-join partial aggregation** (the verdict's suggestion): aggregate
   revenue per (l_orderkey[, l_suppkey]) BEFORE the dim probes. Data check
   first: at every SF of this corpus (l_orderkey, l_suppkey) is ~unique
   (598,807 distinct of 600,000 rows at sf0.1), so the q5 form CANNOT
   shrink the stream — measured here to record the negative result. The
   q10 form (per-orderkey after the returnflag filter) shrinks ~1.8x.

2. **Integer-cents arithmetic**: the decimal policy computes
   DECIMAL(12,2) x DECIMAL(25,4) products per row — precision >18 leaves
   Spark's compact-long Decimal and every row pays a JVM BigDecimal
   multiply. The same EXACT sum is an int64 multiply: with money as
   1e2-scaled longs, revenue = ep_c * (100 - disc_c) is a 1e4-scaled
   long; partial sums stay long (primitive codegen); only the final
   per-group conversion touches decimal. Overflow discipline at 100 TB:
   per-(group, partition) partials are bounded by partition size
   (~10M rows x <=1.05e9 per row = 1e16 << 2^63), so phase 1 groups by
   (keys, spark_partition_id()) and phase 2 reduces the partials in
   DECIMAL — exact at ANY scale, never trusting a whole-group long.

Each variant is checked bit-identical to the registered (decimal-policy)
query on the same data before timing.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def cents(col: str, scale: int = 100) -> "F.Column":
    # primitive round-half-up: F.round(double) routes through BigDecimal
    # per row (the exact cost this path exists to remove); money doubles
    # carry <=2 decimals so x*100 sits within ~1e-9 of an integer and
    # floor(x*100 + 0.5) is exact — all long/double codegen primitives
    return (F.col(col) * scale + F.lit(0.5)).cast("long")


def q5_variant(spark, sf_dir, fact_first: bool, int_cents: bool):
    from brooklin_spark.functions.exact import dec, dsum, one_minus
    from brooklin_spark.io import table

    r = table(spark, sf_dir, "region")
    n = table(spark, sf_dir, "nation")
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp")
    )
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    if int_cents:
        li = li.withColumn("rev_c4", cents("l_extendedprice") * (100 - cents("l_discount")))
    dims = F.broadcast(r).join(n, n.n_regionkey == r.r_regionkey).join(
        c, c.c_nationkey == n.n_nationkey
    )
    if fact_first:
        j = (
            o.join(li, li.l_orderkey == o.o_orderkey)
            .join(dims, o.o_custkey == c.c_custkey)
        )
    else:
        j = dims.join(o, o.o_custkey == c.c_custkey).join(
            li, li.l_orderkey == o.o_orderkey
        )
    j = j.join(
        F.broadcast(s), (s.s_suppkey == li.l_suppkey) & (s.s_nationkey == n.n_nationkey)
    )
    if not int_cents:
        return j.groupBy("n_name").agg(
            dsum(dec("l_extendedprice") * one_minus("l_discount"), "revenue"),
            F.count("*").alias("n_items"),
        )
    part = j.groupBy("n_name", F.spark_partition_id().alias("_p")).agg(
        F.sum("rev_c4").alias("s_c4"), F.count("*").alias("c")
    )
    return part.groupBy("n_name").agg(
        (F.sum(F.col("s_c4").cast("decimal(38,0)")) / F.lit(10000))
        .cast("double")
        .alias("revenue"),
        F.sum("c").alias("n_items"),
    )


def q10_variant(spark, sf_dir, pre_agg: bool, int_cents: bool):
    from brooklin_spark.functions.exact import dec, dsum, one_minus
    from brooklin_spark.io import table

    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    cust = c.join(F.broadcast(n), n.n_nationkey == c.c_nationkey)
    if int_cents:
        rev_c4 = cents("l_extendedprice") * (100 - cents("l_discount"))
        if pre_agg:
            # per-orderkey exact partials: zero-exchange on the bucketed
            # scan (HashPartitioning(l_orderkey) satisfies the clustering)
            li_agg = li.groupBy("l_orderkey").agg(F.sum(rev_c4).alias("s_c4"))
            j = o.join(li_agg, li_agg.l_orderkey == o.o_orderkey).join(
                cust, o.o_custkey == c.c_custkey
            )
        else:
            j = o.join(li.withColumn("s_c4", rev_c4), F.col("l_orderkey") == o.o_orderkey).join(
                cust, o.o_custkey == c.c_custkey
            )
        # per-customer order counts are bounded (orders/customer does not
        # grow with SF), so the long partial sum can never overflow here
        agg = j.groupBy("c_custkey", "c_name", "n_name").agg(
            (F.sum(F.col("s_c4").cast("decimal(38,0)")) / F.lit(10000))
            .cast("double")
            .alias("revenue")
        )
    else:
        revenue = dec("l_extendedprice") * one_minus("l_discount")
        if pre_agg:
            li_agg = li.groupBy("l_orderkey").agg(F.sum(revenue).alias("_rev"))
            j = o.join(li_agg, li_agg.l_orderkey == o.o_orderkey).join(
                cust, o.o_custkey == c.c_custkey
            )
            agg = j.groupBy("c_custkey", "c_name", "n_name").agg(
                dsum(F.col("_rev"), "revenue")
            )
        else:
            j = o.join(li, F.col("l_orderkey") == o.o_orderkey).join(
                cust, o.o_custkey == c.c_custkey
            )
            agg = j.groupBy("c_custkey", "c_name", "n_name").agg(
                dsum(revenue, "revenue")
            )
    return agg.orderBy(F.desc("revenue"), F.asc("c_custkey")).limit(20)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "benchdata/sf10"
    out_path = sys.argv[2] if len(sys.argv) > 2 else None
    runs = int(os.environ.get("SCALE_BENCH_RUNS", "3"))

    from brooklin_spark import registry
    from brooklin_spark.session import get_spark

    registry.load_all()
    spark = get_spark(app_name="spine-fastsum")
    db = "spine_" + os.path.basename(os.path.normpath(sf_dir)).replace(".", "_")
    marker = f"bucketed:{db}:{sf_dir}"
    # the in-memory catalog is session-scoped; re-attach the bucketed files
    # spine_bucketed.py wrote (spec validated against _bucket_spec.json)
    from brooklin_spark.operators.bucketing import register_bucketed

    spark.sql(f"CREATE DATABASE IF NOT EXISTS {db}")
    warehouse = spark.conf.get(
        "spark.sql.warehouse.dir", "spark-warehouse"
    ).removeprefix("file:")
    n_buckets = int(os.environ.get("SPINE_BUCKETS", "32"))
    for name, key in [("orders", "o_orderkey"), ("lineitem", "l_orderkey")]:
        if spark.catalog.tableExists(f"{db}.{name}"):
            continue
        loc = os.path.join(warehouse, f"{db}.db", name)
        if not os.path.isdir(loc):
            raise SystemExit(f"run scripts/spine_bucketed.py {sf_dir} first (db {db})")
        register_bucketed(spark, f"{db}.{name}", key, n_buckets, loc)

    variants = {
        "q5_dims_decimal": lambda d: q5_variant(spark, d, False, False),
        "q5_dims_cents": lambda d: q5_variant(spark, d, False, True),
        "q5_fact_cents": lambda d: q5_variant(spark, d, True, True),
        "q10_plain_decimal": lambda d: q10_variant(spark, d, False, False),
        "q10_preagg_decimal": lambda d: q10_variant(spark, d, True, False),
        "q10_preagg_cents": lambda d: q10_variant(spark, d, True, True),
        "q10_plain_cents": lambda d: q10_variant(spark, d, False, True),
    }
    ref = {
        "q5": registry.QUERIES["q5_local_supplier_volume"],
        "q10": registry.QUERIES["q10_returned_items"],
    }

    book: dict = {"sf_dir": sf_dir, "db": db, "runs": runs, "mismatch": []}
    # bit-identical check vs the registered decimal-policy query (both
    # layouts) before any timing
    for name, fn in variants.items():
        base = ref[name.split("_")[0]]
        for layout in (sf_dir, marker):
            a = base(spark, layout).toPandas()
            b = fn(layout).toPandas()
            cols = sorted(a.columns)
            a = a[cols].sort_values(cols, ignore_index=True)
            b = b[cols].sort_values(cols, ignore_index=True)
            if not a.equals(b):
                book["mismatch"].append(f"{name}@{layout}")
    print("mismatch:", book["mismatch"], file=sys.stderr)

    warm = os.environ.get("SPARK_GRAFT_WARMUP_DIR", "/root/testdata/sf0.001")
    for fn in variants.values():
        fn(warm).write.format("noop").mode("overwrite").save()

    for layout_name, d in [("plain", sf_dir), ("bucketed", marker)]:
        times = {}
        for name, fn in variants.items():
            best = float("inf")
            for _ in range(runs):
                t0 = time.perf_counter()
                fn(d).write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
            times[name] = round(best, 3)
            print(f"  [{layout_name}] {name}: {best:.3f}s", file=sys.stderr)
        book[layout_name] = times

    line = json.dumps(book)
    print(line)
    if out_path:
        with open(out_path, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
