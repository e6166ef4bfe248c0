"""Relational operator inventory (SURVEY.md §2.6) over the TPC-H-ish tables.

Each query is a Catalyst built-in composition — scan/filter/project push down
to parquet, joins pick broadcast vs sort-merge by size (AQE re-checks at
runtime), aggregations do partial map-side combine. Scale notes are on each
query. Reference context: the Brooklin data plane has no relational operators
(SURVEY.md §2.6 — "None exist in the reference"); this layer is the analytics
surface the north star requires on top of the envelope tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from brooklin_spark.functions.exact import (
    DEC,
    c4_to_double,
    c4sum,
    cents,
    dec,
    dsum,
    one_minus,
    one_plus,
)
from brooklin_spark.io import table
from brooklin_spark.registry import query

# ---------------------------------------------------------------------------
# q1: pricing summary (TPC-H Q1 shape): wide groupBy-agg with exact sums.
# Scale: partial aggregation map-side; 4 output groups → no skew concern;
# scan prunes to 7 columns + pushes the shipdate filter into parquet.
# ---------------------------------------------------------------------------


@query(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2))) * (CAST(1 AS DECIMAL(12,2)) + CAST(l_tax AS DECIMAL(12,2)))) AS DOUBLE) AS sum_charge,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_price,
           CAST(SUM(CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r7: the integer-cents path (functions/exact.py) — the four decimal
    # product sums (precision >18: BigDecimal per row) become long
    # multiplies; per-(group, partition) long partials are overflow-safe
    # (charge_c6 <= 1.05e11 per row x ~10M rows/partition = 1e18 < 2^63,
    # and ANSI mode makes any breach loud, not silent); the final 4-group
    # aggregate converts exactly via decimal. Bit-identical to the dsum
    # form at sf0.1 AND sf10 (asserted before adoption); 4.9 -> 1.3 s at
    # sf10.
    li = table(spark, sf_dir, "lineitem")
    ep_c2, disc_c2, tax_c2 = (
        cents("l_extendedprice"),
        cents("l_discount"),
        cents("l_tax"),
    )
    rows = li.filter(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
    ).select(
        "l_returnflag",
        "l_linestatus",
        cents("l_quantity").alias("q_c2"),
        ep_c2.alias("e_c2"),
        disc_c2.alias("d_c2"),
        (ep_c2 * (100 - disc_c2)).alias("dp_c4"),
        (ep_c2 * (100 - disc_c2) * (100 + tax_c2)).alias("ch_c6"),
    )
    part = rows.groupBy(
        "l_returnflag", "l_linestatus", F.spark_partition_id().alias("_p")
    ).agg(
        F.sum("q_c2").alias("sq"),
        F.sum("e_c2").alias("se"),
        F.sum("d_c2").alias("sd"),
        F.sum("dp_c4").alias("sdp"),
        F.sum("ch_c6").alias("sch"),
        F.count("*").alias("c"),
    )

    def cnsum(col: str, scale: int, alias: str):
        return (
            (F.sum(F.col(col).cast("decimal(38,0)")) / F.lit(scale))
            .cast("double")
            .alias(alias)
        )

    def cndec(col: str):  # exact decimal total (for the avg numerators)
        return F.sum(F.col(col).cast("decimal(38,0)"))

    g = part.groupBy("l_returnflag", "l_linestatus").agg(
        cnsum("sq", 100, "sum_qty"),
        cnsum("se", 100, "sum_base_price"),
        cnsum("sdp", 10000, "sum_disc_price"),
        cnsum("sch", 1000000, "sum_charge"),
        (cndec("sq") / F.lit(100)).alias("_sqd"),
        (cndec("se") / F.lit(100)).alias("_sed"),
        (cndec("sd") / F.lit(100)).alias("_sdd"),
        F.sum("c").alias("count_order"),
    )
    return g.select(
        "l_returnflag",
        "l_linestatus",
        "sum_qty",
        "sum_base_price",
        "sum_disc_price",
        "sum_charge",
        (F.col("_sqd").cast("double") / F.col("count_order")).alias("avg_qty"),
        (F.col("_sed").cast("double") / F.col("count_order")).alias("avg_price"),
        (F.col("_sdd").cast("double") / F.col("count_order")).alias("avg_disc"),
        "count_order",
    )


# ---------------------------------------------------------------------------
# q3: three-way join + agg + top-k (TPC-H Q3 shape).
# Scale: customer filtered then joined (AQE may broadcast the filtered side);
# orders⋈lineitem is the big shuffle — both sides hash on the order key;
# top-10 via exact decimal revenue with orderkey tie-break.
# ---------------------------------------------------------------------------


@query(
    "q3_top_unshipped_orders",
    oracle="""
    WITH rev AS (
      SELECT o.o_orderkey,
             strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
             CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l.l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
      FROM customer c
      JOIN orders o ON c.c_custkey = o.o_custkey
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      WHERE c.c_mktsegment = 'BUILDING'
        AND o.o_orderdate < TIMESTAMP '1998-07-01'
        AND l.l_shipdate > TIMESTAMP '1998-07-01'
      GROUP BY o.o_orderkey, o.o_orderdate
    )
    SELECT * FROM rev ORDER BY revenue DESC, o_orderkey ASC LIMIT 10
    """,
)
def q3_top_unshipped_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-07-01").cast("timestamp")
    )
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-07-01").cast("timestamp")
    )
    # integer-cents (see q1/q5): per-ORDER groups bound the long sum by
    # lines-per-order. The top-k sort runs on the LONG total directly —
    # revenue = s_c4/1e4 is strictly monotonic (ties included), so the
    # ordering is identical and only the 10 surviving rows ever touch
    # decimal (a per-group conversion measured SLOWER than the decimal
    # policy at sf10: 1M divisions for 10 kept rows).
    rev_c4 = cents("l_extendedprice") * (100 - cents("l_discount"))
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderkey", "o_orderdate")
        .agg(F.sum(rev_c4).alias("s_c4"))
        .orderBy(F.desc("s_c4"), F.asc("o_orderkey"))
        .limit(10)
        .select(
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            c4_to_double(F.col("s_c4"), "revenue"),
        )
    )


# ---------------------------------------------------------------------------
# q5: five-way star join through region→nation→customer + supplier co-nation.
# Scale: region/nation/supplier are small dims → broadcast; the single big
# shuffle is orders⋈lineitem on the order key. Join order is dims-first
# (customer⋈orders, then lineitem): unlike q10, lineitem here is UNFILTERED,
# so a fact-first order would push the full 24M-row joined stream through a
# custkey exchange — measured same-session at sf10: plain dims-first 11.1s
# vs fact-first 16.1s. On the bucketed-orderkey layout fact-first flips to
# the winner (8.7s vs 10.9s, zero fact Exchange) — that variant lives in
# scripts/spine_bucketed.py as the layout-tuned plan; the registered form
# stays the plain-layout winner since the driver's layout is plain parquet.
# Residual vs DuckDB at sf10 is NOT exchange-bound: bucketed o⋈li+decimal
# partial agg alone is 4.0s of the 8.7s (exact-decimal revenue policy),
# the remaining ~4.7s is broadcast-probe join CPU over the 24M-row stream.
# r7 levers on that residual (scripts/spine_fastsum.py, all variants
# bit-identical to the decimal form):
# - pre-join partial aggregation CANNOT shrink this stream: (l_orderkey,
#   l_suppkey) is ~unique in the corpus (598,807 distinct of 600,000 rows
#   at sf0.1) — the verdict's suggested rewrite was measured pointless
#   before timing and recorded as a data fact;
# - integer-cents revenue (functions/exact.py cents/c4sum): the per-row
#   BigDecimal multiply becomes a long multiply, partial sums per
#   (n_name, partition) stay long — overflow-safe at any corpus size
#   because partials are bounded by PARTITION size (~10M rows x <=1.05e9
#   per row = 1e16 << 2^63) — and only the 25-nation final touches
#   decimal. Measured sf10 bucketed 8.9 -> 7.5 s, plain 12.2 -> 11.8 s.
# ---------------------------------------------------------------------------


@query(
    "q5_local_supplier_volume",
    oracle="""
    SELECT n.n_name,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l.l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM region r
    JOIN nation n ON n.n_regionkey = r.r_regionkey
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey AND s.s_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
    GROUP BY n.n_name
    """,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    # layout-aware spine fallback (r10): when a provenance-stamped bucketed
    # twin of this corpus exists (customer/orders on the customer key,
    # lineitem on l_orderkey — the 100 TB layout scripts/spine_custkey.py
    # builds), route the scans through it: the custkey and orderkey
    # exchanges disappear (sf100 book: 6 -> 3 exchanges, 86.9 -> 40.0 s,
    # spine_custkey_sf100_b256.json). Without a twin — the driver's bench
    # and correctness environments — sf_dir is returned unchanged and the
    # plan is identical to r9's. Results are layout-invisible (tested).
    from brooklin_spark.operators.bucketing import spine_twin

    sf_dir = spine_twin(spark, sf_dir) or sf_dir
    r = table(spark, sf_dir, "region")
    n = table(spark, sf_dir, "nation")
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp")
    )
    li = table(spark, sf_dir, "lineitem").withColumn(
        "rev_c4", cents("l_extendedprice") * (100 - cents("l_discount"))
    )
    s = table(spark, sf_dir, "supplier")
    part = (
        F.broadcast(r)
        .join(n, n.n_regionkey == r.r_regionkey)
        .join(c, c.c_nationkey == n.n_nationkey)
        .join(o, o.o_custkey == c.c_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(
            F.broadcast(s),
            (s.s_suppkey == li.l_suppkey) & (s.s_nationkey == n.n_nationkey),
        )
        # phase 1: long partials per (nation, partition) — bounded by
        # partition size, so int64 can never overflow at any corpus scale
        .groupBy("n_name", F.spark_partition_id().alias("_p"))
        .agg(F.sum("rev_c4").alias("s_c4"), F.count("*").alias("c"))
    )
    return part.groupBy("n_name").agg(
        c4sum(F.col("s_c4"), "revenue"), F.sum("c").alias("n_items")
    )


# ---------------------------------------------------------------------------
# q6: pure scan-filter-agg; the whole WHERE pushes into the parquet scan.
# ---------------------------------------------------------------------------


@query(
    "q6_forecast_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.04 AND 0.06 AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    # integer-cents: ep_c2 * disc_c2 <= ~5e7 per row, so even a 100 TB
    # global long total sits ~30x under 2^63 (and ANSI would make a
    # breach loud); one decimal conversion on the single output row
    li = table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.04)
            & (F.col("l_discount") <= 0.06)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            c4_to_double(
                F.sum(cents("l_extendedprice") * cents("l_discount")), "revenue"
            ),
            F.count("*").alias("n_items"),
        )
    )


# ---------------------------------------------------------------------------
# q10: returned items by customer — join + agg + top-k with dim re-join.
# Fact-first join order: orders⋈lineitem runs while both sides still carry
# their scan partitioning (zero Exchange on the bucketed layout), then
# customer⋈nation attaches to the joined stream. Unlike q5, lineitem is
# FILTERED here (returnflag = 'R' keeps ~1/4), so the stream that meets
# the custkey join is small — measured same-session at sf10: plain
# fact-first 5.6s vs dims-first 6.4s; bucketed fact-first 2.1s (4 -> 0
# fact exchanges, 1.6x DuckDB where the r5 dims-first form was 4.7x).
# r7 (scripts/spine_fastsum.py, bit-identical): revenue partials are
# pre-aggregated PER ORDERKEY before the orders join — ~1.8x stream
# shrink (110,598 surviving orders for 200,025 'R' rows at sf0.1), free
# of any new exchange on the bucketed layout (HashPartitioning(
# l_orderkey) satisfies the groupBy's clustering) — and money rides the
# integer-cents path (functions/exact.py): per-orderkey long partials
# are bounded by lines-per-order, the per-customer final is decimal.
# Measured sf10: plain 7.2 -> 5.2 s, bucketed 3.2 -> 2.2 s.
# ---------------------------------------------------------------------------


@query(
    "q10_returned_items",
    oracle="""
    WITH rev AS (
      SELECT c.c_custkey, c.c_name, n.n_name,
             CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l.l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
      FROM customer c
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      JOIN orders o ON o.o_custkey = c.c_custkey
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      WHERE l.l_returnflag = 'R'
      GROUP BY c.c_custkey, c.c_name, n.n_name
    )
    SELECT * FROM rev ORDER BY revenue DESC, c_custkey ASC LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    rev_c4 = cents("l_extendedprice") * (100 - cents("l_discount"))
    # per-orderkey exact long partials BEFORE the joins (zero-exchange on
    # a bucketed-orderkey scan; lines-per-order bounds the long sum)
    li_agg = li.groupBy("l_orderkey").agg(F.sum(rev_c4).alias("s_c4"))
    cust = c.join(F.broadcast(n), n.n_nationkey == c.c_nationkey)
    # per-customer totals stay long (orders-per-customer is bounded, not
    # corpus-scaled); the top-k sorts on the long total — monotonic with
    # revenue, ties included — and only 20 rows touch decimal
    return (
        o.join(li_agg, li_agg.l_orderkey == o.o_orderkey)
        .join(cust, o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum("s_c4").alias("t_c4"))
        .orderBy(F.desc("t_c4"), F.asc("c_custkey"))
        .limit(20)
        .select("c_custkey", "c_name", "n_name", c4_to_double(F.col("t_c4"), "revenue"))
    )


# ---------------------------------------------------------------------------
# Broadcast hash join: lineitem ⋈ broadcast(part) — the canonical small-dim
# pattern; at 100 TB part stays MBs while lineitem is TBs, so the explicit
# broadcast hint removes the shuffle entirely.
# ---------------------------------------------------------------------------


@query(
    "join_broadcast_part_revenue",
    oracle="""
    SELECT p.p_brand,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l.l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_size >= 20
    GROUP BY p.p_brand
    """,
)
def join_broadcast_part_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").filter(F.col("p_size") >= 20)
    # integer-cents, two-phase (brand groups are corpus-scaled): long
    # partials per (brand, partition), decimal at the brand-count final
    rev_c4 = cents("l_extendedprice") * (100 - cents("l_discount"))
    part = (
        li.join(F.broadcast(p), p.p_partkey == li.l_partkey)
        .groupBy("p_brand", F.spark_partition_id().alias("_p"))
        .agg(F.sum(rev_c4).alias("s_c4"), F.count("*").alias("c"))
    )
    return part.groupBy("p_brand").agg(
        c4sum(F.col("s_c4"), "revenue"), F.sum("c").alias("n_items")
    )


# ---------------------------------------------------------------------------
# Semi / anti joins (EXISTS / NOT EXISTS).
# Scale: left_semi/left_anti shuffle only the join key of the probe side and
# never duplicate rows — strictly cheaper than inner+distinct.
# ---------------------------------------------------------------------------


@query(
    "join_semi_customers_with_big_orders",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
    """,
)
def join_semi_customers_with_big_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name", "c_acctbal"
    )


@query(
    "join_anti_customers_without_orders",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def join_anti_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


# ---------------------------------------------------------------------------
# Theta/band (non-equi) join against a tiny literal band table.
# Scale: non-equi joins force nested-loop unless one side broadcasts — the
# band table is 5 rows, so broadcast-nested-loop is the right plan and stays
# right at any fact-side scale.
# ---------------------------------------------------------------------------

_BANDS = [
    ("band_0000_0100", 0.0, 100.0),
    ("band_0100_0500", 100.0, 500.0),
    ("band_0500_1000", 500.0, 1000.0),
    ("band_1000_5000", 1000.0, 5000.0),
    ("band_5000_plus", 5000.0, 1e12),
]


@query(
    "join_band_price_histogram",
    oracle="""
    WITH bands(band, lo, hi) AS (VALUES
      ('band_0000_0100', 0.0, 100.0), ('band_0100_0500', 100.0, 500.0),
      ('band_0500_1000', 500.0, 1000.0), ('band_1000_5000', 1000.0, 5000.0),
      ('band_5000_plus', 5000.0, 1000000000000.0))
    SELECT b.band, COUNT(*) AS n_items,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS total_price
    FROM lineitem l JOIN bands b ON l.l_extendedprice >= b.lo AND l.l_extendedprice < b.hi
    GROUP BY b.band
    """,
)
def join_band_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    bands = spark.createDataFrame(_BANDS, ["band", "lo", "hi"])
    return (
        li.join(
            F.broadcast(bands),
            (li.l_extendedprice >= bands.lo) & (li.l_extendedprice < bands.hi),
        )
        .groupBy("band")
        .agg(F.count("*").alias("n_items"), dsum(dec("l_extendedprice"), "total_price"))
    )


# ---------------------------------------------------------------------------
# Window functions: top-k per group and running totals.
# Scale: one shuffle on the partition key; heavy skew on a hot customer is
# bounded because frames are per-customer (row_number short-circuits at k
# under WindowGroupLimit in recent Spark).
# ---------------------------------------------------------------------------


@query(
    "window_topk_orders_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
           o_totalprice, rn
    FROM (
      SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
      FROM orders)
    WHERE rn <= 3
    """,
)
def window_topk_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 3)
        .select(
            "o_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_totalprice",
            "rn",
        )
    )


@query(
    "window_running_customer_spend",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend,
           ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS order_seq
    FROM orders
    """,
)
def window_running_customer_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(dec("o_totalprice"))
        .over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
        .cast("double")
        .alias("running_spend"),
        F.row_number().over(w).cast("long").alias("order_seq"),
    )


# ---------------------------------------------------------------------------
# Rollup / cube (grouping sets).
# Scale: Spark expands grouping sets before the shuffle (one pass), partial
# aggregation still applies; output cardinality is the sum of the sets.
# ---------------------------------------------------------------------------


@query(
    "rollup_region_nation_balance",
    oracle="""
    SELECT COALESCE(r_name, 'ALL') AS region_name,
           COALESCE(n_name, 'ALL') AS nation_name,
           COUNT(c_custkey) AS n_customers,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_balance
    FROM customer
    JOIN nation ON n_nationkey = c_nationkey
    JOIN region ON r_regionkey = n_regionkey
    GROUP BY ROLLUP(r_name, n_name)
    """,
)
def rollup_region_nation_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    joined = c.join(F.broadcast(n), n.n_nationkey == c.c_nationkey).join(
        F.broadcast(r), r.r_regionkey == n.n_regionkey
    )
    return (
        joined.rollup("r_name", "n_name")
        .agg(
            F.count("c_custkey").alias("n_customers"),
            dsum(dec("c_acctbal"), "total_balance"),
        )
        .select(
            F.coalesce("r_name", F.lit("ALL")).alias("region_name"),
            F.coalesce("n_name", F.lit("ALL")).alias("nation_name"),
            "n_customers",
            "total_balance",
        )
    )


@query(
    "cube_order_priority_status",
    oracle="""
    SELECT COALESCE(o_orderpriority, 'ALL') AS priority,
           COALESCE(o_orderstatus, 'ALL') AS status,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_price
    FROM orders
    GROUP BY CUBE(o_orderpriority, o_orderstatus)
    """,
)
def cube_order_priority_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return (
        o.cube("o_orderpriority", "o_orderstatus")
        .agg(F.count("*").alias("n_orders"), dsum(dec("o_totalprice"), "total_price"))
        .select(
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            "n_orders",
            "total_price",
        )
    )


# ---------------------------------------------------------------------------
# Set operations: UNION / INTERSECT / EXCEPT with distinct semantics.
# ---------------------------------------------------------------------------


@query(
    "setops_customer_segments",
    oracle="""
    WITH big_spenders AS (
      SELECT DISTINCT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 200000),
    building AS (
      SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
    rich AS (
      SELECT c_custkey FROM customer WHERE c_acctbal > 5000)
    SELECT 'union' AS op, COUNT(*) AS n FROM (SELECT * FROM building UNION SELECT * FROM rich)
    UNION ALL
    SELECT 'intersect' AS op, COUNT(*) AS n FROM (SELECT * FROM building INTERSECT SELECT * FROM big_spenders)
    UNION ALL
    SELECT 'except' AS op, COUNT(*) AS n FROM (SELECT * FROM rich EXCEPT SELECT * FROM big_spenders)
    """,
)
def setops_customer_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    # two readers (intersect + except): checkpoint the fact-derived key
    # set so the orders scan+distinct runs once
    big = (
        o.filter(F.col("o_totalprice") > 200000)
        .select(F.col("o_custkey").alias("c_custkey"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    building = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    rich = c.filter(F.col("c_acctbal") > 5000).select("c_custkey")
    u = building.union(rich).distinct().agg(F.count("*").alias("n")).select(
        F.lit("union").alias("op"), "n"
    )
    i = building.intersect(big).agg(F.count("*").alias("n")).select(
        F.lit("intersect").alias("op"), "n"
    )
    e = rich.subtract(big).agg(F.count("*").alias("n")).select(
        F.lit("except").alias("op"), "n"
    )
    return u.unionAll(i).unionAll(e)


# ---------------------------------------------------------------------------
# Distinct + multi-distinct aggregation.
# Scale: Spark plans multiple COUNT(DISTINCT) via expand + two-phase agg —
# one shuffle; fine. approx_count_distinct (HLL) is the 100 TB path but is
# engine-specific, so the oracle-checked query uses exact distincts.
# ---------------------------------------------------------------------------


@query(
    "distinct_parts_per_brand",
    oracle="""
    SELECT p_brand,
           COUNT(DISTINCT p_type) AS n_types,
           COUNT(DISTINCT p_size) AS n_sizes,
           COUNT(*) AS n_parts
    FROM part GROUP BY p_brand
    """,
)
def distinct_parts_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part")
    return p.groupBy("p_brand").agg(
        F.countDistinct("p_type").alias("n_types"),
        F.countDistinct("p_size").alias("n_sizes"),
        F.count("*").alias("n_parts"),
    )


# ---------------------------------------------------------------------------
# Global sort + limit (top-k). Spark turns orderBy().limit(k) into
# TakeOrderedAndProject — per-partition top-k then driver merge, no full sort.
# ---------------------------------------------------------------------------


@query(
    "topk_expensive_orders",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice, strftime(o_orderdate, '%Y-%m-%d') AS orderdate
    FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 25
    """,
)
def topk_expensive_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(25)
        .select(
            "o_orderkey",
            "o_custkey",
            "o_totalprice",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        )
    )


# ---------------------------------------------------------------------------
# Scalar function battery: string/math/date built-ins, all whole-stage
# codegen'd JVM expressions (no Python in the loop).
# ---------------------------------------------------------------------------


@query(
    "scalar_function_battery",
    oracle="""
    SELECT p_partkey,
           UPPER(p_name) AS name_upper,
           SUBSTR(p_name, 1, 8) AS name_prefix,
           LENGTH(p_name) AS name_len,
           REPLACE(p_type, ' ', '_') AS type_snake,
           CONCAT(p_brand, ':', CAST(p_size AS VARCHAR)) AS brand_size,
           ABS(p_retailprice - 1000.0) AS price_dev,
           SQRT(CAST(p_size AS DOUBLE)) AS size_sqrt,
           ROUND(LN(p_retailprice + 1.0), 8) AS price_ln,
           p_partkey % 7 AS key_mod
    FROM part
    """,
)
def scalar_function_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.length("p_name").cast("long").alias("name_len"),
        F.regexp_replace("p_type", " ", "_").alias("type_snake"),
        F.concat_ws(":", "p_brand", F.col("p_size").cast("string")).alias("brand_size"),
        F.abs(F.col("p_retailprice") - 1000.0).alias("price_dev"),
        F.sqrt(F.col("p_size").cast("double")).alias("size_sqrt"),
        # libm last-ulp divergence across engines → round to 8 (noise ~1e-15)
        F.round(F.log(F.col("p_retailprice") + 1.0), 8).alias("price_ln"),
        (F.col("p_partkey") % 7).alias("key_mod"),
    )


@query(
    "scalar_date_battery",
    oracle="""
    SELECT o_orderkey,
           year(o_orderdate) AS order_year,
           month(o_orderdate) AS order_month,
           day(o_orderdate) AS order_day,
           date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS days_since_epoch_start,
           strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS due_date
    FROM orders WHERE o_orderkey % 10 = 0
    """,
)
def scalar_date_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 10 == 0)
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("order_year"),
        F.month("o_orderdate").cast("long").alias("order_month"),
        F.dayofmonth("o_orderdate").cast("long").alias("order_day"),
        F.datediff("o_orderdate", F.lit("1995-01-01")).cast("long").alias("days_since_epoch_start"),
        F.date_format(F.date_add("o_orderdate", 30), "yyyy-MM-dd").alias("due_date"),
    )


# ---------------------------------------------------------------------------
# Pivot (conditional aggregation) over the events stream table.
# ---------------------------------------------------------------------------

_EVENT_TYPES = ["click", "view", "purchase", "signup", "error"]


@query(
    "pivot_events_per_user",
    oracle="""
    SELECT user_id,
           COUNT(*) FILTER (WHERE event_type = 'click') AS click,
           COUNT(*) FILTER (WHERE event_type = 'view') AS view,
           COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
           COUNT(*) FILTER (WHERE event_type = 'signup') AS signup,
           COUNT(*) FILTER (WHERE event_type = 'error') AS error
    FROM events GROUP BY user_id
    """,
)
def pivot_events_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy("user_id")
        .pivot("event_type", _EVENT_TYPES)
        .agg(F.count(F.lit(1)))
        .na.fill(0, _EVENT_TYPES)
    )


# ---------------------------------------------------------------------------
# Event-time bucketing (batch analog of a tumbling window) + JSON extraction.
# ---------------------------------------------------------------------------


@query(
    "events_hourly_rollup",
    oracle="""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
    FROM events GROUP BY 1, 2
    """,
)
def events_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "event_type",
        )
        .agg(F.count("*").alias("n_events"), dsum(dec("value"), "total_value"))
    )


@query(
    "events_json_extract",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
           MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
    FROM events GROUP BY event_type
    """,
)
def events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return e.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(k).alias("sum_k"),
        F.min(k).alias("min_k"),
        F.max(k).alias("max_k"),
    )


# ---------------------------------------------------------------------------
# Sessionization: gap-based sessions via lag + cumulative flag sum — the
# batch analog of session_window() (streaming variant in queries/streaming.py).
# Scale: single shuffle on user_id; window frames are per-user.
# ---------------------------------------------------------------------------


@query(
    "sessionize_events",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN date_diff('second',
                                 LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                                 ts) > 1800
                  OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS is_new
      FROM events),
    sessions AS (
      SELECT user_id, event_id, ts,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
      FROM flagged)
    SELECT user_id, COUNT(DISTINCT session_seq) AS n_sessions,
           COUNT(*) AS n_events,
           CAST(COUNT(*) AS DOUBLE) / COUNT(DISTINCT session_seq) AS events_per_session
    FROM sessions GROUP BY user_id
    """,
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w)
    gap_s = F.unix_timestamp("ts") - F.unix_timestamp(prev_ts)
    is_new = F.when(prev_ts.isNull() | (gap_s > 1800), 1).otherwise(0)
    sessions = e.select("user_id", "ts", "event_id", is_new.alias("is_new")).select(
        "user_id",
        "event_id",
        F.sum("is_new")
        .over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
        .alias("session_seq"),
    )
    return sessions.groupBy("user_id").agg(
        F.countDistinct("session_seq").alias("n_sessions"),
        F.count("*").alias("n_events"),
        (F.count("*").cast("double") / F.countDistinct("session_seq")).alias(
            "events_per_session"
        ),
    )


# ---------------------------------------------------------------------------
# As-of join: each purchase matched to the user's most recent prior click.
# Spark lacks a native as-of join; the composition is a single window pass
# (union-tag + conditional running max), which scales as one shuffle on the
# key — strictly better than the naive inequality self-join, which explodes.
# Generic operator form in brooklin_spark/operators/asof.py.
# ---------------------------------------------------------------------------


@query(
    "asof_purchase_to_last_click",
    oracle="""
    WITH tagged AS (
      SELECT user_id, ts, event_id, event_type, value,
             MAX(CASE WHEN event_type = 'click' THEN ts END) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_click_ts
      FROM events WHERE event_type IN ('click', 'purchase'))
    SELECT event_id, user_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
           strftime(last_click_ts, '%Y-%m-%d %H:%M:%S') AS last_click_ts,
           CASE WHEN last_click_ts IS NOT NULL
                THEN date_diff('second', last_click_ts, ts) END AS seconds_since_click
    FROM tagged WHERE event_type = 'purchase'
    """,
)
def asof_purchase_to_last_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    last_click = F.max(
        F.when(F.col("event_type") == "click", F.col("ts"))
    ).over(w)
    return (
        e.withColumn("last_click_ts", last_click)
        .filter(F.col("event_type") == "purchase")
        .select(
            "event_id",
            "user_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
            F.date_format("last_click_ts", "yyyy-MM-dd HH:mm:ss").alias("last_click_ts"),
            F.when(
                F.col("last_click_ts").isNotNull(),
                F.unix_timestamp("ts") - F.unix_timestamp("last_click_ts"),
            ).alias("seconds_since_click"),
        )
    )


# ---------------------------------------------------------------------------
# Hash-sharded snapshot scan: the Spark analog of the reference's chunked
# JDBC reader (ChunkedQueryManager.java:16-56 — MOD(hash(pk), N) predicates).
# Verifies the shard function partitions the table completely and evenly;
# the same predicate list drives spark.read.jdbc(predicates=[...]) so each
# executor pulls one disjoint shard (operators in sources/jdbc_chunked.py).
# ---------------------------------------------------------------------------


@query(
    "snapshot_hash_shards",
    oracle="""
    SELECT ascii(substr(md5(CAST(l_orderkey AS VARCHAR) || '-' || CAST(l_linenumber AS VARCHAR)), 1, 1)) % 4 AS shard,
           COUNT(*) AS n_rows,
           CAST(SUM(l_orderkey) AS BIGINT) AS key_sum
    FROM lineitem GROUP BY 1
    """,
)
def snapshot_hash_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    pk = F.concat_ws(
        "-", F.col("l_orderkey").cast("string"), F.col("l_linenumber").cast("string")
    )
    shard = F.ascii(F.substring(F.md5(pk), 1, 1)) % 4
    return li.groupBy(shard.alias("shard")).agg(
        F.count("*").alias("n_rows"), F.sum("l_orderkey").alias("key_sum")
    )


# ---------------------------------------------------------------------------
# Pure-SQL interface: the same engine surface through spark.sql() over
# registered views (io.register_views) — users who think in SQL get the
# identical Catalyst plans the DataFrame API produces; this query pins
# that the SQL front door stays wired.
# ---------------------------------------------------------------------------


@query(
    "sql_interface_revenue_by_region",
    oracle="""
    SELECT r.r_name AS region,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l.l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem l
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    GROUP BY r.r_name
    """,
)
def sql_interface_revenue_by_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    from brooklin_spark.io import register_views

    register_views(spark, sf_dir, "lineitem", "supplier", "nation", "region")
    return spark.sql(
        """
        SELECT r.r_name AS region,
               CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                        * (CAST(1 AS DECIMAL(12,2)) - CAST(l.l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue,
               COUNT(*) AS n_items
        FROM lineitem l
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        JOIN region r ON r.r_regionkey = n.n_regionkey
        GROUP BY r.r_name
        """
    )


# ---------------------------------------------------------------------------
# Full-outer join: rich-customer vs rich-supplier nation profiles — the
# rarity filters make some nations genuinely one-sided, so both outer
# directions produce real NULL-extended rows. At scale a full outer on a
# grouping key is one co-partitioned shuffle join; neither side broadcasts
# (broadcast cannot implement full-outer's unmatched-build-side rows).
# ---------------------------------------------------------------------------


@query(
    "join_full_outer_nation_wealth",
    oracle="""
    WITH rc AS (
      SELECT c_nationkey AS nk, COUNT(*) AS n_rich_cust,
             round(SUM(c_acctbal), 2) AS cust_bal
      FROM customer WHERE c_acctbal > 9900 GROUP BY c_nationkey),
    rs AS (
      SELECT s_nationkey AS nk, COUNT(*) AS n_rich_supp,
             round(SUM(s_acctbal), 2) AS supp_bal
      FROM supplier WHERE s_acctbal > 9900 GROUP BY s_nationkey)
    SELECT COALESCE(rc.nk, rs.nk) AS nationkey,
           COALESCE(n_rich_cust, 0) AS n_rich_cust,
           COALESCE(n_rich_supp, 0) AS n_rich_supp,
           COALESCE(cust_bal, 0.0)::DOUBLE AS cust_bal,
           COALESCE(supp_bal, 0.0)::DOUBLE AS supp_bal
    FROM rc FULL OUTER JOIN rs ON rc.nk = rs.nk
    """,
)
def join_full_outer_nation_wealth(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 9900)
    s = table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") > 9900)
    rc = c.groupBy(F.col("c_nationkey").alias("nk_c")).agg(
        F.count("*").alias("n_rich_cust"),
        F.round(F.sum("c_acctbal").cast("double"), 2).alias("cust_bal"),
    )
    rs = s.groupBy(F.col("s_nationkey").alias("nk_s")).agg(
        F.count("*").alias("n_rich_supp"),
        F.round(F.sum("s_acctbal").cast("double"), 2).alias("supp_bal"),
    )
    j = rc.join(rs, rc.nk_c == rs.nk_s, "full_outer")
    return j.select(
        F.coalesce("nk_c", "nk_s").alias("nationkey"),
        F.coalesce("n_rich_cust", F.lit(0)).alias("n_rich_cust"),
        F.coalesce("n_rich_supp", F.lit(0)).alias("n_rich_supp"),
        F.coalesce("cust_bal", F.lit(0.0)).alias("cust_bal"),
        F.coalesce("supp_bal", F.lit(0.0)).alias("supp_bal"),
    )


# ---------------------------------------------------------------------------
# Runtime bloom-filter join pruning: urgent-order revenue by month. The
# selective orders filter (1/5 of the table) joins the unfiltered
# lineitem scan on the order key — the shape Spark's runtime row-level
# filtering (spark.sql.optimizer.runtime.bloomFilter.*, on by default)
# targets at scale: a bloom filter built from the filtered creation side
# is pushed into the application-side scan, so lineitem rows for
# non-urgent orders die at the scan instead of riding the shuffle. At
# bench SF the creation side is small enough that AQE broadcasts and no
# filter is needed; tests/test_plan_quality.py pins the injection itself
# under production thresholds (broadcast off, scan-size floor zeroed) by
# asserting BloomFilterMightContain reaches the lineitem scan's filter.
# ---------------------------------------------------------------------------


@query(
    "join_runtime_bloom_urgent_revenue",
    oracle="""
    SELECT strftime(date_trunc('month', o.o_orderdate), '%Y-%m') AS month,
           CAST(COUNT(DISTINCT o.o_orderkey) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                    * (CAST(1 AS DECIMAL(12,2)) - CAST(l.l_discount AS DECIMAL(12,2)))) AS DOUBLE)
             AS revenue
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderpriority = '1-URGENT'
    GROUP BY 1
    """,
)
def join_runtime_bloom_urgent_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    li = table(spark, sf_dir, "lineitem")
    revenue = dec("l_extendedprice") * one_minus("l_discount")
    return (
        o.join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM").alias("month"))
        .agg(
            F.countDistinct("o_orderkey").cast("bigint").alias("n_orders"),
            dsum(revenue, "revenue"),
        )
    )
