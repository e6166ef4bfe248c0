"""Second batch of TPC-H-shaped relational queries, adapted to the testdata
schema (no partsupp / shipmode / phone columns — each query keeps the plan
shape of its TPC-H counterpart on the columns that exist).

Also: grouping sets (Spark 4 DataFrame API), unpivot/melt, analytic window
battery, and an approx-distinct sketch (rows-only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from brooklin_spark.functions.exact import c4sum, cents, dec, dsum, one_minus
from brooklin_spark.io import table
from brooklin_spark.operators import layout as _layout
from brooklin_spark.registry import query

_REV = "CAST(l.l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l.l_discount AS DECIMAL(12,2)))"


# ---------------------------------------------------------------------------
# q7 shape: two-nation trade volume by year — 5-way join, two dim lookups
# into the same nation table, conjunctive OR on the pair.
# ---------------------------------------------------------------------------


@query(
    "q7_nation_volume",
    oracle=f"""
    SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           CAST(EXTRACT(year FROM l.l_shipdate) AS BIGINT) AS l_year,
           CAST(SUM({_REV}) AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey  = o.o_custkey
    JOIN supplier s ON s.s_suppkey  = l.l_suppkey
    JOIN nation sn  ON sn.n_nationkey = s.s_nationkey
    JOIN nation cn  ON cn.n_nationkey = c.c_nationkey
    WHERE (sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
       OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1')
    GROUP BY 1, 2, 3
    """,
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    sn = n.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))
    cn = n.select(F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation"))
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(o, o.o_orderkey == li.l_orderkey)
        .join(c, c.c_custkey == o.o_custkey)
        .join(F.broadcast(s), s.s_suppkey == li.l_suppkey)
        .join(F.broadcast(sn), F.col("sn_key") == s.s_nationkey)
        .join(F.broadcast(cn), F.col("cn_key") == c.c_nationkey)
        .filter(pair)
        # integer-cents two-phase (functions/exact.py): long partials per
        # (group, partition), decimal only at the 2x|years| final
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("bigint").alias("l_year"),
            F.spark_partition_id().alias("_p"),
        )
        .agg(
            F.sum(cents("l_extendedprice") * (100 - cents("l_discount"))).alias(
                "s_c4"
            )
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(c4sum(F.col("s_c4"), "revenue"))
    )


# ---------------------------------------------------------------------------
# q8 shape: market share of one supplier-nation within a customer region,
# by order year — conditional share of an exact-decimal revenue sum.
# ---------------------------------------------------------------------------


@query(
    "q8_market_share",
    oracle=f"""
    WITH flows AS (
      SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
             sn.n_name AS supp_nation, {_REV} AS rev
      FROM lineitem l
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey  = o.o_custkey
      JOIN nation cn  ON cn.n_nationkey = c.c_nationkey
      JOIN region r   ON r.r_regionkey = cn.n_regionkey
      JOIN supplier s ON s.s_suppkey  = l.l_suppkey
      JOIN nation sn  ON sn.n_nationkey = s.s_nationkey
      WHERE r.r_name = 'ASIA')
    SELECT o_year,
           CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN rev ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
             / CAST(SUM(rev) AS DOUBLE) AS mkt_share
    FROM flows GROUP BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    cn = n.select(F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region"))
    sn = n.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))
    rev = dec("l_extendedprice") * one_minus("l_discount")
    flows = (
        li.join(o, o.o_orderkey == li.l_orderkey)
        .join(c, c.c_custkey == o.o_custkey)
        .join(F.broadcast(cn), F.col("cn_key") == c.c_nationkey)
        .join(F.broadcast(r.filter(F.col("r_name") == "ASIA")), F.col("r_regionkey") == F.col("cn_region"))
        .join(F.broadcast(s), s.s_suppkey == li.l_suppkey)
        .join(F.broadcast(sn), F.col("sn_key") == s.s_nationkey)
        .select(
            F.year("o_orderdate").cast("bigint").alias("o_year"),
            "supp_nation",
            rev.alias("rev"),
        )
    )
    nat = F.when(F.col("supp_nation") == "NATION_3", F.col("rev")).otherwise(
        F.lit(0).cast("decimal(12,2)")
    )
    return flows.groupBy("o_year").agg(
        (F.sum(nat).cast("double") / F.sum("rev").cast("double")).alias("mkt_share")
    )


# ---------------------------------------------------------------------------
# q13 shape: customer order-count distribution — outer join with an ON-clause
# filter, two-level aggregation.
# ---------------------------------------------------------------------------


@query(
    "q13_customer_distribution",
    oracle="""
    WITH c_orders AS (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c LEFT JOIN orders o
        ON o.o_custkey = c.c_custkey AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey)
    SELECT c_count, COUNT(*) AS custdist
    FROM c_orders GROUP BY c_count
    """,
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    counts = (
        c.join(o, o.o_custkey == c.c_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return counts.groupBy("c_count").agg(F.count("*").alias("custdist"))


# ---------------------------------------------------------------------------
# q15 shape: top supplier by quarterly revenue — aggregate view + scalar max
# subquery (exact decimal, so the max comparison is deterministic).
# ---------------------------------------------------------------------------


@query(
    "q15_top_supplier",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01'
      GROUP BY l_suppkey)
    SELECT s.s_suppkey, s.s_name, CAST(r.total_revenue AS DOUBLE) AS total_revenue
    FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    s = table(spark, sf_dir, "supplier")
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(dec("l_extendedprice") * one_minus("l_discount")).alias("total_revenue")
    )
    # scalar max as a broadcast 1-row aggregate joined back on equality —
    # no unpartitioned window anywhere. The per-supplier aggregate
    # (|suppliers| rows, not |lineitem|) is checkpointed once so the two
    # readers (max branch + probe) never rescan the fact table.
    revenue = revenue.localCheckpoint(eager=False)
    mx = revenue.agg(F.max("total_revenue").alias("mx"))
    top = revenue.join(F.broadcast(mx), F.col("total_revenue") == F.col("mx"))
    return top.join(s, s.s_suppkey == top.supplier_no).select(
        "s_suppkey", "s_name", F.col("total_revenue").cast("double").alias("total_revenue")
    )


# ---------------------------------------------------------------------------
# q17 shape: correlated per-part average quantity (0.2×avg) — join against a
# grouped aggregate of the same fact table.
# ---------------------------------------------------------------------------


@query(
    "q17_small_quantity_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0 AS avg_yearly
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#1'
      AND l.l_quantity < (
        SELECT 0.2 * AVG(l2.l_quantity) FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    # quantities are small exact integers in double; AVG = exact-int sum /
    # count is IEEE-identical across engines, so the 0.2×avg boundary is safe
    avg_qty = li.groupBy(F.col("l_partkey").alias("ap_key")).agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("qty_cut")
    )
    return (
        li.join(F.broadcast(p), p.p_partkey == li.l_partkey)
        .join(avg_qty, F.col("ap_key") == li.l_partkey)
        .filter(F.col("l_quantity") < F.col("qty_cut"))
        .agg((F.sum(dec("l_extendedprice")).cast("double") / 7.0).alias("avg_yearly"))
    )


# ---------------------------------------------------------------------------
# q21 shape (adapted — no commit/receipt dates in the testdata): suppliers
# that were the SOLE supplier on finished multi-item orders. Exists/anti
# semantics over a self-referencing fact slice.
# ---------------------------------------------------------------------------


@query(
    "q21_sole_supplier_orders",
    oracle="""
    WITH fo AS (SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F'),
    li AS (
      SELECT DISTINCT l.l_orderkey, l.l_suppkey
      FROM lineitem l JOIN fo ON fo.o_orderkey = l.l_orderkey),
    sole AS (
      SELECT a.l_orderkey, a.l_suppkey FROM li a
      WHERE NOT EXISTS (
        SELECT 1 FROM li b
        WHERE b.l_orderkey = a.l_orderkey AND b.l_suppkey <> a.l_suppkey))
    SELECT s.s_name, COUNT(*) AS n_sole_orders
    FROM sole JOIN supplier s ON s.s_suppkey = sole.l_suppkey
    GROUP BY s.s_name
    """,
)
def q21_sole_supplier_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    pairs = (
        li.join(o, o.o_orderkey == li.l_orderkey, "left_semi")
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    other = pairs.select(
        F.col("l_orderkey").alias("b_orderkey"), F.col("l_suppkey").alias("b_suppkey")
    )
    sole = pairs.join(
        other,
        (F.col("b_orderkey") == F.col("l_orderkey"))
        & (F.col("b_suppkey") != F.col("l_suppkey")),
        "left_anti",
    )
    return (
        sole.join(F.broadcast(s), s.s_suppkey == sole.l_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("n_sole_orders"))
    )


# ---------------------------------------------------------------------------
# q2 shape (adapted — no partsupp): min-per-group correlated subquery with
# join-back (cheapest part per type).
# ---------------------------------------------------------------------------


@query(
    "q2_min_price_part_per_type",
    oracle="""
    SELECT p.p_type, p.p_partkey, p.p_retailprice
    FROM part p
    WHERE p.p_retailprice = (
      SELECT MIN(p2.p_retailprice) FROM part p2 WHERE p2.p_type = p.p_type)
    """,
)
def q2_min_price_part_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part")
    mins = p.groupBy(F.col("p_type").alias("mt")).agg(
        F.min("p_retailprice").alias("min_price")
    )
    return (
        p.join(F.broadcast(mins), (F.col("mt") == p.p_type) & (p.p_retailprice == F.col("min_price")))
        .select("p_type", "p_partkey", "p_retailprice")
    )


# ---------------------------------------------------------------------------
# Grouping sets (Spark 4 DataFrame API): distinct group-bys in one pass —
# ((priority, status), (priority), ()) with explicit grouping markers.
# ---------------------------------------------------------------------------


@query(
    "groupingsets_priority_status",
    oracle="""
    SELECT COALESCE(o_orderpriority, 'ALL') AS priority,
           COALESCE(o_orderstatus, 'ALL') AS status,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_price
    FROM orders
    GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus), (o_orderpriority), ())
    """,
)
def groupingsets_priority_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return (
        o.groupingSets(
            [["o_orderpriority", "o_orderstatus"], ["o_orderpriority"], []],
            "o_orderpriority",
            "o_orderstatus",
        )
        .agg(
            F.count("*").alias("n_orders"),
            dsum(dec("o_totalprice"), "total_price"),
        )
        .select(
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            "n_orders",
            "total_price",
        )
    )


# ---------------------------------------------------------------------------
# Unpivot/melt: wide measures -> long (measure, value) — Spark df.unpivot vs
# SQL UNION ALL; exact decimal sums per measure.
# ---------------------------------------------------------------------------


@query(
    "unpivot_lineitem_measures",
    oracle="""
    WITH long AS (
      SELECT l_returnflag, 'extendedprice' AS measure, CAST(l_extendedprice AS DECIMAL(12,2)) AS v FROM lineitem
      UNION ALL
      SELECT l_returnflag, 'discount', CAST(l_discount AS DECIMAL(12,2)) FROM lineitem
      UNION ALL
      SELECT l_returnflag, 'tax', CAST(l_tax AS DECIMAL(12,2)) FROM lineitem)
    SELECT l_returnflag, measure, CAST(SUM(v) AS DOUBLE) AS total, COUNT(*) AS n
    FROM long GROUP BY l_returnflag, measure
    """,
)
def unpivot_lineitem_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        dec("l_extendedprice").alias("extendedprice"),
        dec("l_discount").alias("discount"),
        dec("l_tax").alias("tax"),
    )
    long = li.unpivot(
        ids=["l_returnflag"],
        values=["extendedprice", "discount", "tax"],
        variableColumnName="measure",
        valueColumnName="v",
    )
    return long.groupBy("l_returnflag", "measure").agg(
        dsum(F.col("v"), "total"), F.count("*").alias("n")
    )


# ---------------------------------------------------------------------------
# Analytic window battery: lag/lead/first/last/ntile over each customer's
# order history — one window spec, one shuffle on the partition key.
# ---------------------------------------------------------------------------


@query(
    "window_analytic_battery",
    oracle="""
    SELECT o_custkey, o_orderkey,
           LAG(o_orderkey) OVER w AS prev_order,
           LEAD(o_orderkey) OVER w AS next_order,
           FIRST_VALUE(o_orderkey) OVER w AS first_order,
           NTILE(4) OVER (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC) AS qtile
    FROM orders
    WHERE o_custkey < 500
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
    """,
)
def window_analytic_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 500)
    w = W.partitionBy("o_custkey").orderBy(F.asc("o_orderdate"), F.asc("o_orderkey"))
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.lag("o_orderkey").over(w).alias("prev_order"),
        F.lead("o_orderkey").over(w).alias("next_order"),
        F.first("o_orderkey").over(w).alias("first_order"),
        F.ntile(4).over(w).cast("bigint").alias("qtile"),
    )


# ---------------------------------------------------------------------------
# q16 shape (adapted — supplier relationships come from lineitem instead of
# partsupp): distinct supplier count per part attribute — a distinct
# aggregate over a join, planned as the two-phase expand/agg.
# ---------------------------------------------------------------------------


@query(
    "q16_supplier_part_counts",
    oracle="""
    SELECT p.p_brand, p.p_type, COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_size IN (1, 5, 9, 13) AND p.p_brand <> 'Brand#3'
    GROUP BY p.p_brand, p.p_type
    """,
)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").filter(
        F.col("p_size").isin(1, 5, 9, 13) & (F.col("p_brand") != "Brand#3")
    )
    return (
        li.join(F.broadcast(p), p.p_partkey == li.l_partkey)
        .groupBy("p_brand", "p_type")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


# ---------------------------------------------------------------------------
# q9 shape (adapted — no partsupp): product-line profit by supplier nation
# and year; profit = revenue − 10% of retail value of goods moved. Exact
# decimal arithmetic end-to-end, name LIKE filter on the part dim.
# ---------------------------------------------------------------------------


@query(
    "q9_product_profit",
    oracle="""
    SELECT sn.n_name AS nation,
           CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
           CAST(SUM(
             CAST(l.l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l.l_discount AS DECIMAL(12,2)))
             - CAST(0.1 AS DECIMAL(12,2)) * CAST(p.p_retailprice AS DECIMAL(12,2)) * CAST(l.l_quantity AS DECIMAL(12,2))
           ) AS DOUBLE) AS profit
    FROM lineitem l
    JOIN part p     ON p.p_partkey = l.l_partkey AND p.p_name LIKE '%widget%'
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation sn  ON sn.n_nationkey = s.s_nationkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    GROUP BY 1, 2
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    o = table(spark, sf_dir, "orders")
    amount = dec("l_extendedprice") * one_minus("l_discount") - F.lit(0.1).cast(
        "decimal(12,2)"
    ) * dec("p_retailprice") * dec("l_quantity")
    return (
        li.join(F.broadcast(p), p.p_partkey == li.l_partkey)
        .join(F.broadcast(s), s.s_suppkey == li.l_suppkey)
        .join(F.broadcast(n), n.n_nationkey == s.s_nationkey)
        .join(o, o.o_orderkey == li.l_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("o_year"),
        )
        .agg(dsum(amount, "profit"))
    )


# ---------------------------------------------------------------------------
# Salted skew join: result identical to the plain join (oracle = plain SQL);
# the Spark plan spreads each supplier key over 16 salt buckets.
# ---------------------------------------------------------------------------


@query(
    "join_salted_skew_supplier_revenue",
    oracle="""
    SELECT s.s_nationkey,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l.l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey
    GROUP BY s.s_nationkey
    """,
)
def join_salted_skew_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from brooklin_spark.operators.skew import salted_join

    li = table(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_extendedprice", "l_discount"
    )
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    j = salted_join(li, s, "l_suppkey", "s_suppkey", salt_buckets=16)
    # integer-cents two-phase: long partials per (nation, partition),
    # decimal only at the 25-nation final
    part = j.groupBy("s_nationkey", F.spark_partition_id().alias("_p")).agg(
        F.sum(cents("l_extendedprice") * (100 - cents("l_discount"))).alias("s_c4"),
        F.count("*").alias("c"),
    )
    return part.groupBy("s_nationkey").agg(
        c4sum(F.col("s_c4"), "revenue"), F.sum("c").alias("n_items")
    )


# ---------------------------------------------------------------------------
# Sketch aggregates. HLL sketch VALUES differ across engines by design, so
# the oracle-checked contract is the sketch's accuracy GUARANTEE: exact
# distinct counts carry the values, and booleans assert the 1%-rsd
# estimates landed within 5% (5 standard deviations — deterministically
# true for a correct HLL, and the property a user of the sketch relies on).
# ---------------------------------------------------------------------------


@query(
    "approx_distinct_sketch",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS exact_parts,
           COUNT(DISTINCT l_orderkey) AS exact_orders,
           TRUE AS parts_within_5pct,
           TRUE AS orders_within_5pct
    FROM lineitem GROUP BY l_returnflag
    """,
)
def approx_distinct_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", rsd=0.01).alias("approx_parts"),
        F.count_distinct("l_partkey").alias("exact_parts"),
        F.approx_count_distinct("l_orderkey", rsd=0.01).alias("approx_orders"),
        F.count_distinct("l_orderkey").alias("exact_orders"),
    )

    def within(approx: str, exact: str):
        return (
            F.abs(F.col(approx) - F.col(exact)) / F.col(exact) <= 0.05
        ).alias(approx.replace("approx_", "") + "_within_5pct")

    return agg.select(
        "l_returnflag",
        "exact_parts",
        "exact_orders",
        within("approx_parts", "exact_parts"),
        within("approx_orders", "exact_orders"),
    )


# ---------------------------------------------------------------------------
# Bucketed range join: overlapping 45-day promo windows × orders — the
# equi-join scale path for interval containment (see operators/rangejoin.py;
# contrast with join_band_price_histogram's broadcast-nested-loop, which is
# only right because its build side is 5 rows).
# ---------------------------------------------------------------------------

_PROMO_WINDOWS = [(f"w{k:02d}", 150 + 30 * k, 150 + 30 * k + 44) for k in range(24)]


@query(
    "range_join_promo_windows",
    oracle=f"""
    WITH wins(window_id, lo, hi) AS (VALUES
      {", ".join(f"('{w}', {lo}, {hi})" for w, lo, hi in _PROMO_WINDOWS)}),
    o AS (
      SELECT o_orderkey, o_totalprice,
             DATEDIFF('day', TIMESTAMP '1995-01-01', o_orderdate) AS d
      FROM orders)
    SELECT window_id, COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_price
    FROM o JOIN wins ON o.d >= wins.lo AND o.d <= wins.hi
    GROUP BY window_id
    """,
)
def range_join_promo_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    from brooklin_spark.operators.rangejoin import bucketed_range_join

    o = table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_totalprice",
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("timestamp")).alias("d"),
    )
    wins = spark.createDataFrame(_PROMO_WINDOWS, ["window_id", "lo", "hi"])
    j = bucketed_range_join(o, wins, value_col="d", lo_col="lo", hi_col="hi", width=30)
    return j.groupBy("window_id").agg(
        F.count("*").alias("n_orders"),
        dsum(dec("o_totalprice"), "total_price"),
    )


# ---------------------------------------------------------------------------
# Exact percentile battery: interpolated quantiles per group (Spark
# percentile() == DuckDB quantile_cont — both exact linear interpolation
# over the sorted values; round-8 for the libm division). The exact twin
# of the sketchy approx_percentile family; at scale the exact form costs a
# per-group sort, which is why approx_distinct_sketch exists beside it.
# ---------------------------------------------------------------------------


@query(
    "percentile_battery",
    oracle="""
    SELECT l_returnflag,
           round(quantile_cont(l_extendedprice, 0.25), 8) AS price_p25,
           round(quantile_cont(l_extendedprice, 0.5), 8) AS price_p50,
           round(quantile_cont(l_extendedprice, 0.75), 8) AS price_p75,
           round(quantile_cont(l_extendedprice, 0.99), 8) AS price_p99,
           round(quantile_cont(l_quantity, 0.5), 8) AS qty_median,
           COUNT(*) AS n
    FROM lineitem GROUP BY l_returnflag
    """,
)
def percentile_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    # ONE percentile aggregate per column (array of quantiles): each exact
    # percentile buffers every group value, so 4 scalar aggregates would
    # pay the buffer 4x — the array form computes all quantiles from a
    # single buffer (measured ~3x at sf0.1)
    qs = F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75), F.lit(0.99))
    agg = li.groupBy("l_returnflag").agg(
        F.percentile(F.col("l_extendedprice"), qs).alias("pp"),
        F.percentile(F.col("l_quantity"), F.lit(0.5)).alias("qm"),
        F.count("*").alias("n"),
    )
    return agg.select(
        "l_returnflag",
        F.round(F.col("pp")[0], 8).alias("price_p25"),
        F.round(F.col("pp")[1], 8).alias("price_p50"),
        F.round(F.col("pp")[2], 8).alias("price_p75"),
        F.round(F.col("pp")[3], 8).alias("price_p99"),
        F.round(F.col("qm"), 8).alias("qty_median"),
        "n",
    )


# ---------------------------------------------------------------------------
# q11 shape (adapted — no partsupp): "important part value". Per-part
# revenue contributed by suppliers from two nations, keeping parts whose
# value exceeds a fixed fraction of the group total. The TPC-H plan shape
# (grouped aggregate + HAVING vs a scalar subquery over the SAME
# aggregate) is preserved: the aggregate is computed once, the global
# total rides an unpartitioned window over the (small) per-part result
# instead of a second scan or a driver collect. Exact decimal arithmetic
# makes the threshold comparison engine-identical.
# ---------------------------------------------------------------------------


@query(
    "q11_important_part_value",
    oracle=f"""
    WITH pv AS (
      SELECT l.l_partkey, SUM({_REV}) AS value
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      WHERE n.n_name IN ('NATION_7', 'NATION_8')
      GROUP BY l.l_partkey)
    SELECT p.p_partkey, p.p_name, CAST(pv.value AS DOUBLE) AS part_value
    FROM pv JOIN part p ON p.p_partkey = pv.l_partkey
    WHERE CAST(pv.value AS DOUBLE) > (SELECT CAST(SUM(value) AS DOUBLE) FROM pv) * 0.001
    """,
)
def q11_important_part_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_7", "NATION_8")
    )
    p = table(spark, sf_dir, "part")
    picked = s.join(F.broadcast(n), n.n_nationkey == s.s_nationkey).select("s_suppkey")
    # no broadcast hint on picked: it is a FRACTION of the supplier table
    # (2 of 25 nations), unbounded at scale — AQE broadcasts it when its
    # runtime size allows, falls back to a key shuffle when it doesn't
    pv = (
        li.join(picked, picked.s_suppkey == li.l_suppkey)
        .groupBy("l_partkey")
        .agg(F.sum(dec("l_extendedprice") * one_minus("l_discount")).alias("value"))
    )
    # scalar total as a broadcast 1-row aggregate cross-joined back — no
    # unpartitioned window. The per-part aggregate (|parts| rows, not
    # |lineitem|) is checkpointed once so the two readers (total branch +
    # probe) never rescan the fact join.
    pv = pv.localCheckpoint(eager=False)
    tot = pv.agg(F.sum("value").alias("total"))
    flt = pv.join(F.broadcast(tot)).filter(
        F.col("value").cast("double") > F.col("total").cast("double") * F.lit(0.001)
    )
    return flt.join(p, p.p_partkey == flt.l_partkey).select(
        "p_partkey", "p_name", F.col("value").cast("double").alias("part_value")
    )


# ---------------------------------------------------------------------------
# q20 shape (adapted — no partsupp/availqty): "dominant supplier
# promotion candidates". TPC-H q20 keeps suppliers whose stock of a
# name-filtered part exceeds half the quantity shipped in a year; without
# availqty the analogous predicate is a supplier that shipped MORE THAN
# HALF of a part's total 1997 volume. The nested-subquery chain
# (name-filtered parts -> per-(supplier, part) shipped quantity ->
# correlated half-of-total threshold -> semi-join back to supplier) is
# the same; quantities are small exact integers so 0.5x is exact.
# ---------------------------------------------------------------------------


@query(
    "q20_dominant_supplier_candidates",
    oracle="""
    WITH shipped AS (
      SELECT l.l_suppkey, l.l_partkey, SUM(l.l_quantity) AS qty
      FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey
      WHERE p.p_name LIKE 'small%'
        AND l.l_shipdate >= TIMESTAMP '1997-01-01'
        AND l.l_shipdate < TIMESTAMP '1998-01-01'
      GROUP BY l.l_suppkey, l.l_partkey),
    tot AS (SELECT l_partkey, SUM(qty) AS total_qty FROM shipped GROUP BY l_partkey),
    dominant AS (
      SELECT DISTINCT sh.l_suppkey FROM shipped sh
      JOIN tot t ON t.l_partkey = sh.l_partkey
      WHERE sh.qty > 0.5 * t.total_qty)
    SELECT s.s_suppkey, s.s_name, n.n_name
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE s.s_suppkey IN (SELECT l_suppkey FROM dominant)
    """,
)
def q20_dominant_supplier_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    p = table(spark, sf_dir, "part").filter(F.col("p_name").startswith("small"))
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    shipped = (
        li.join(F.broadcast(p), p.p_partkey == li.l_partkey, "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    # per-part totals re-aggregate the per-(supplier, part) result — the
    # second agg rides the first shuffle's partitioning on l_partkey only
    # when keys align; AQE broadcasts tot back (|filtered parts| rows)
    tot = shipped.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        F.sum("qty").alias("total_qty")
    )
    # tot is per-(filtered)part — unbounded at scale; leave the broadcast
    # decision to AQE's runtime stats rather than forcing it
    dominant = (
        shipped.join(tot, F.col("t_partkey") == shipped.l_partkey)
        .filter(F.col("qty") > F.lit(0.5) * F.col("total_qty"))
        .select("l_suppkey")
        .distinct()
    )
    return (
        s.join(dominant, dominant.l_suppkey == s.s_suppkey, "left_semi")
        .join(F.broadcast(n), n.n_nationkey == s.s_nationkey)
        .select("s_suppkey", "s_name", "n_name")
    )


# ---------------------------------------------------------------------------
# Approx-percentile sketch with a bounded-error contract (same pattern as
# approx_distinct_sketch): Spark's approx_percentile (Greenwald-Khanna,
# accuracy=10000 => rank error <= 1e-4·N) must land inside the exact
# [p-1%, p+1%] interpolated bracket. The oracle pins the exact quantiles
# and TRUE for the bounds — the property a sketch user relies on. At
# 100 TB the sketch is mergeable map-side state vs the exact form's
# per-group value buffer.
# ---------------------------------------------------------------------------


@query(
    "approx_percentile_sketch",
    oracle="""
    SELECT l_returnflag,
           ROUND(quantile_cont(l_extendedprice, 0.5), 8) AS exact_p50,
           ROUND(quantile_cont(l_extendedprice, 0.9), 8) AS exact_p90,
           TRUE AS p50_within_1pct_rank,
           TRUE AS p90_within_1pct_rank
    FROM lineitem GROUP BY l_returnflag
    """,
)
def approx_percentile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    qs = F.array(*(F.lit(x) for x in (0.49, 0.5, 0.51, 0.89, 0.9, 0.91)))
    agg = li.groupBy("l_returnflag").agg(
        F.approx_percentile(F.col("l_extendedprice"), F.lit(0.5), F.lit(10000)).alias("ap50"),
        F.approx_percentile(F.col("l_extendedprice"), F.lit(0.9), F.lit(10000)).alias("ap90"),
        F.percentile(F.col("l_extendedprice"), qs).alias("ex"),
    )
    return agg.select(
        "l_returnflag",
        F.round(F.col("ex")[1], 8).alias("exact_p50"),
        F.round(F.col("ex")[4], 8).alias("exact_p90"),
        ((F.col("ap50") >= F.col("ex")[0]) & (F.col("ap50") <= F.col("ex")[2])).alias(
            "p50_within_1pct_rank"
        ),
        ((F.col("ap90") >= F.col("ex")[3]) & (F.col("ap90") <= F.col("ex")[5])).alias(
            "p90_within_1pct_rank"
        ),
    )


# ---------------------------------------------------------------------------
# ANALYZE-style column statistics — the profiler pass that feeds a
# cost-based optimizer (row count, null fraction, NDV, min/max per
# column). One scan, one aggregate row, unpivoted to long form; at 100 TB
# this is the same single-pass multi-aggregate ANALYZE TABLE runs.
# ---------------------------------------------------------------------------

_STATS_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


@query(
    "table_column_stats",
    oracle=f"""
    WITH a AS (
      SELECT COUNT(*) AS n_rows,
             {", ".join(
               f"COUNT({c}) AS nn_{c}, COUNT(DISTINCT {c}) AS nd_{c}, "
               f"MIN({c}) AS mn_{c}, MAX({c}) AS mx_{c}" for c in _STATS_COLS)}
      FROM lineitem)
    {" UNION ALL ".join(
      f"SELECT '{c}' AS col_name, n_rows, n_rows - nn_{c} AS n_nulls, "
      f"nd_{c} AS n_distinct, CAST(mn_{c} AS DOUBLE) AS min_val, "
      f"CAST(mx_{c} AS DOUBLE) AS max_val FROM a" for c in _STATS_COLS)}
    """,
)
def table_column_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    aggs = [F.count("*").alias("n_rows")]
    for c in _STATS_COLS:
        aggs += [
            F.count(c).alias(f"nn_{c}"),
            F.count_distinct(F.col(c)).alias(f"nd_{c}"),
            F.min(c).alias(f"mn_{c}"),
            F.max(c).alias(f"mx_{c}"),
        ]
    a = li.agg(*aggs)
    # explode-of-structs, NOT a unionAll of per-column selects: a union
    # would re-execute the whole aggregate (and its scan) once per column
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"),
                F.col("n_rows").alias("n_rows"),
                (F.col("n_rows") - F.col(f"nn_{c}")).alias("n_nulls"),
                F.col(f"nd_{c}").alias("n_distinct"),
                F.col(f"mn_{c}").cast("double").alias("min_val"),
                F.col(f"mx_{c}").cast("double").alias("max_val"),
            )
            for c in _STATS_COLS
        ]
    )
    return a.select(F.explode(rows).alias("s")).select("s.*")


# ---------------------------------------------------------------------------
# Equi-width histogram profile (data distribution for CBO / skew
# detection): 20 width_bucket bins over o_totalprice with data-derived
# bounds. The 1-row min/max aggregate broadcasts back into the binning
# scan — two passes, no driver collect, both map-side combinable.
# ---------------------------------------------------------------------------


@query(
    "profile_price_histogram",
    oracle="""
    WITH b AS (SELECT MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi FROM orders),
    binned AS (
      SELECT LEAST(CAST(FLOOR((o_totalprice - b.lo) / (b.hi - b.lo) * 20) AS BIGINT), 19) AS bin
      FROM orders CROSS JOIN b)
    SELECT bin, COUNT(*) AS n_orders
    FROM binned GROUP BY 1
    """,
)
def profile_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    b = o.agg(F.min("o_totalprice").alias("lo"), F.max("o_totalprice").alias("hi"))
    # same IEEE op order as the SQL twin: (v - lo) / (hi - lo) * 20
    bin_expr = F.least(
        F.floor((F.col("o_totalprice") - F.col("lo")) / (F.col("hi") - F.col("lo")) * 20),
        F.lit(19),
    ).cast("bigint")
    return (
        o.crossJoin(F.broadcast(b))
        .groupBy(bin_expr.alias("bin"))
        .agg(F.count("*").alias("n_orders"))
    )


# ---------------------------------------------------------------------------
# Z-order layout statistics: Morton-interleave orders on (order day,
# price-in-cents), both bucketed to 8 bits with all-integer arithmetic
# (exact cross-engine), then profile the 256 coarse z-buckets. The
# per-bucket min/max spans exhibit the property the layout exists for:
# rows co-located by z are close in BOTH dimensions, so parquet min/max
# stats prune files for a filter on EITHER column (operators/layout.py
# zvalue/zorder_repartition is the write-side step).
# ---------------------------------------------------------------------------


@query(
    "layout_zorder_stats",
    oracle=f"""
    WITH m AS (
      SELECT MIN(DATEDIFF('day', TIMESTAMP '1995-01-01', o_orderdate)) AS dlo,
             MAX(DATEDIFF('day', TIMESTAMP '1995-01-01', o_orderdate)) AS dhi,
             MIN(CAST(round(o_totalprice * 100) AS BIGINT)) AS plo,
             MAX(CAST(round(o_totalprice * 100) AS BIGINT)) AS phi
      FROM orders),
    b AS (
      SELECT LEAST(((DATEDIFF('day', TIMESTAMP '1995-01-01', o_orderdate) - m.dlo) * 256)
                     // (m.dhi - m.dlo + 1), 255) AS xb,
             LEAST(((CAST(round(o_totalprice * 100) AS BIGINT) - m.plo) * 256)
                     // (m.phi - m.plo + 1), 255) AS yb
      FROM orders CROSS JOIN m),
    z AS (
      SELECT xb, yb, __ZSQL__ AS zv FROM b)
    SELECT CAST(zv // 256 AS BIGINT) AS z_bucket,
           COUNT(*) AS n_orders,
           CAST(MIN(xb) AS BIGINT) AS min_day_bucket,
           CAST(MAX(xb) AS BIGINT) AS max_day_bucket,
           CAST(MIN(yb) AS BIGINT) AS min_price_bucket,
           CAST(MAX(yb) AS BIGINT) AS max_price_bucket
    FROM z GROUP BY 1
    """.replace("__ZSQL__", _layout.zvalue_sql("xb", "yb")),
)
def layout_zorder_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from brooklin_spark.operators.layout import zvalue

    o = table(spark, sf_dir, "orders")
    day = F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("timestamp"))
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    m = o.agg(
        F.min(day).alias("dlo"),
        F.max(day).alias("dhi"),
        F.min(cents).alias("plo"),
        F.max(cents).alias("phi"),
    )
    # all-integer bucketing via div (exact, matches DuckDB //)
    b = o.crossJoin(F.broadcast(m)).select(
        F.least(
            F.expr(
                "(CAST(datediff(o_orderdate, timestamp'1995-01-01') AS BIGINT) - dlo) * 256 div (dhi - dlo + 1)"
            ),
            F.lit(255).cast("bigint"),
        ).alias("xb"),
        F.least(
            F.expr(
                "(CAST(round(o_totalprice * 100) AS BIGINT) - plo) * 256 div (phi - plo + 1)"
            ),
            F.lit(255).cast("bigint"),
        ).alias("yb"),
    )
    z = b.select("xb", "yb", zvalue("xb", "yb").alias("zv"))
    return z.groupBy(F.expr("zv div 256").cast("bigint").alias("z_bucket")).agg(
        F.count("*").alias("n_orders"),
        F.min("xb").cast("bigint").alias("min_day_bucket"),
        F.max("xb").cast("bigint").alias("max_day_bucket"),
        F.min("yb").cast("bigint").alias("min_price_bucket"),
        F.max("yb").cast("bigint").alias("max_price_bucket"),
    )


# ---------------------------------------------------------------------------
# Skew-key profile: the diagnostic run BEFORE choosing a salting factor —
# top-20 heaviest join keys with their share of the table and a
# rows-vs-uniform amplification factor. One count aggregate + a
# TakeOrdered top-k over the (small) per-key result; at 100 TB this is
# the exact query a pipeline runs to decide operators/skew.py's N.
# ---------------------------------------------------------------------------


@query(
    "skew_key_profile",
    oracle="""
    WITH per_key AS (
      SELECT l_suppkey AS key, COUNT(*) AS n FROM lineitem GROUP BY l_suppkey),
    tot AS (SELECT SUM(n) AS total, COUNT(*) AS n_keys FROM per_key),
    ranked AS (
      SELECT key, n, ROW_NUMBER() OVER (ORDER BY n DESC, key ASC) AS rk
      FROM per_key)
    SELECT r.key, CAST(r.n AS BIGINT) AS n_rows,
           round(CAST(r.n AS DOUBLE) / t.total, 6) AS share,
           round(CAST(r.n AS DOUBLE) * t.n_keys / t.total, 6) AS x_uniform
    FROM ranked r CROSS JOIN tot t
    WHERE r.rk <= 20
    """,
)
def skew_key_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    per_key = li.groupBy(F.col("l_suppkey").alias("key")).agg(
        F.count("*").alias("n")
    )
    tot = per_key.agg(
        F.sum("n").alias("total"), F.count("*").alias("n_keys")
    )
    ranked = per_key.withColumn(
        "rk", F.row_number().over(W.orderBy(F.desc("n"), F.asc("key")))
    ).filter(F.col("rk") <= 20)
    return ranked.crossJoin(F.broadcast(tot)).select(
        "key",
        F.col("n").cast("bigint").alias("n_rows"),
        F.round(F.col("n").cast("double") / F.col("total"), 6).alias("share"),
        F.round(F.col("n").cast("double") * F.col("n_keys") / F.col("total"), 6).alias(
            "x_uniform"
        ),
    )


# ---------------------------------------------------------------------------
# NULL-semantics battery: the corpus carries no NULLs, so they are
# synthesized with NULLIF and pushed through the surfaces where engines
# classically diverge — COUNT(*) vs COUNT(col), null group keys,
# null-safe equality, COALESCE chains, SUM-of-empty. Cross-engine
# agreement here pins the ANSI behaviors the whole oracle matrix
# silently relies on.
# ---------------------------------------------------------------------------


@query(
    "scalar_null_battery",
    oracle="""
    WITH d AS (
      SELECT o_orderkey,
             NULLIF(o_orderstatus, 'O') AS status_n,
             NULLIF(o_totalprice, 0.0) AS price_n,
             CASE WHEN o_orderkey % 7 = 0 THEN NULL ELSE o_orderpriority END AS prio_n
      FROM orders)
    SELECT COALESCE(status_n, '<null>') AS status_key,
           COUNT(*) AS n_rows,
           COUNT(prio_n) AS n_prio_nonnull,
           CAST(SUM(CASE WHEN prio_n IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_prio_null,
           CAST(SUM(CASE WHEN status_n IS NOT DISTINCT FROM NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_nullsafe_null,
           CAST(SUM(CAST(price_n AS DECIMAL(12,2))) AS DOUBLE) AS price_sum,
           COALESCE(CAST(MIN(CASE WHEN 1 = 0 THEN price_n END) AS DOUBLE), -1.0)
             AS min_of_empty
    FROM d GROUP BY status_n
    """,
)
def scalar_null_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    d = o.select(
        "o_orderkey",
        F.nullif(F.col("o_orderstatus"), F.lit("O")).alias("status_n"),
        F.nullif(F.col("o_totalprice"), F.lit(0.0)).alias("price_n"),
        F.when(F.col("o_orderkey") % 7 == 0, F.lit(None)).otherwise(
            F.col("o_orderpriority")
        ).alias("prio_n"),
    )
    return d.groupBy("status_n").agg(
        F.count("*").alias("n_rows"),
        F.count("prio_n").alias("n_prio_nonnull"),
        F.sum(F.col("prio_n").isNull().cast("int")).cast("bigint").alias("n_prio_null"),
        F.sum(F.col("status_n").eqNullSafe(F.lit(None)).cast("int"))
        .cast("bigint")
        .alias("n_nullsafe_null"),
        F.sum(F.col("price_n").cast("decimal(12,2)")).cast("double").alias("price_sum"),
        F.coalesce(
            F.min(F.when(F.lit(1) == 0, F.col("price_n"))).cast("double"), F.lit(-1.0)
        ).alias("min_of_empty"),
    ).select(
        F.coalesce(F.col("status_n"), F.lit("<null>")).alias("status_key"),
        "n_rows",
        "n_prio_nonnull",
        "n_prio_null",
        "n_nullsafe_null",
        "price_sum",
        "min_of_empty",
    )


# ---------------------------------------------------------------------------
# Data-quality validation report (dbt-test style): one row per check —
# key uniqueness, referential integrity, value ranges, accepted values,
# cross-field consistency — with violation counts. A pipeline gates
# promotion on this table; every check is a scan-local aggregate or a
# single anti-join, unioned into the report.
# ---------------------------------------------------------------------------


@query(
    "dq_validation_report",
    oracle="""
    SELECT 'orders_pk_unique' AS check_name,
           (SELECT CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT) FROM orders) AS n_violations
    UNION ALL
    SELECT 'orders_custkey_fk',
           (SELECT CAST(COUNT(*) AS BIGINT) FROM orders o
            WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
    UNION ALL
    SELECT 'lineitem_orderkey_fk',
           (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem l
            WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
    UNION ALL
    SELECT 'lineitem_qty_range',
           (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem
            WHERE l_quantity < 1 OR l_quantity > 50)
    UNION ALL
    SELECT 'lineitem_discount_range',
           (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem
            WHERE l_discount < 0.0 OR l_discount > 0.1)
    UNION ALL
    SELECT 'orders_status_accepted',
           (SELECT CAST(COUNT(*) AS BIGINT) FROM orders
            WHERE o_orderstatus NOT IN ('O', 'F', 'P'))
    UNION ALL
    SELECT 'orders_price_positive',
           (SELECT CAST(COUNT(*) AS BIGINT) FROM orders WHERE o_totalprice <= 0)
    """,
)
def dq_validation_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    c = table(spark, sf_dir, "customer")

    def row(name: str, df_count) -> DataFrame:
        return df_count.select(
            F.lit(name).alias("check_name"),
            F.col("n").cast("bigint").alias("n_violations"),
        )

    # all scan-local checks per table ride ONE conditional aggregate over
    # ONE scan (the drift-PSI discipline), then unpivot to report rows —
    # per-check .agg() calls would scan orders 4x and lineitem 3x
    ord_checks = o.agg(
        (F.count("*") - F.count_distinct(F.col("o_orderkey"))).alias("pk"),
        F.coalesce(
            F.sum((~F.col("o_orderstatus").isin("O", "F", "P")).cast("long")),
            F.lit(0),
        ).alias("status"),
        F.coalesce(
            F.sum((F.col("o_totalprice") <= 0).cast("long")), F.lit(0)
        ).alias("price"),
    ).select(
        F.expr(
            "stack(3, 'orders_pk_unique', pk, 'orders_status_accepted', status,"
            " 'orders_price_positive', price) AS (check_name, n_violations)"
        )
    ).select("check_name", F.col("n_violations").cast("bigint").alias("n_violations"))
    li_checks = li.agg(
        # coalesce: sum over an EMPTY table is NULL, but a DQ report
        # must say 0 violations, not "not evaluated"
        F.coalesce(
            F.sum(
                ((F.col("l_quantity") < 1) | (F.col("l_quantity") > 50)).cast("long")
            ),
            F.lit(0),
        ).alias("qty"),
        F.coalesce(
            F.sum(
                ((F.col("l_discount") < 0.0) | (F.col("l_discount") > 0.1)).cast("long")
            ),
            F.lit(0),
        ).alias("disc"),
    ).select(
        F.expr(
            "stack(2, 'lineitem_qty_range', qty, 'lineitem_discount_range', disc)"
            " AS (check_name, n_violations)"
        )
    ).select("check_name", F.col("n_violations").cast("bigint").alias("n_violations"))
    checks = [
        ord_checks,
        row(
            "orders_custkey_fk",
            o.join(c, c.c_custkey == o.o_custkey, "left_anti").agg(
                F.count("*").alias("n")
            ),
        ),
        row(
            "lineitem_orderkey_fk",
            li.join(o, o.o_orderkey == li.l_orderkey, "left_anti").agg(
                F.count("*").alias("n")
            ),
        ),
        li_checks,
    ]
    out = checks[0]
    for ch in checks[1:]:
        out = out.unionAll(ch)
    return out


# ---------------------------------------------------------------------------
# Pareto / ABC analysis: rank parts by revenue, cut the DESCENDING
# cumulative share at 80% (A) and 95% (B) — the inventory-curation
# report every warehouse team runs, and the third first-class consumer
# of the distrank decomposition: the global prefix sum runs through
# operators/distrank.py global_running_sum (range repartition +
# per-partition ordered cumsum + <=B carry-in offsets), so no part-
# scale SinglePartition window exists even though the cut needs an
# exact GLOBAL cumulative. Class boundaries compare in integer cents
# (5*cum vs 4*total, 20*cum vs 19*total) — no float boundary.
# ---------------------------------------------------------------------------


@query(
    "parts_pareto_abc",
    oracle="""
    WITH rev AS (
      SELECT l_partkey,
             SUM(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                 AS BIGINT)) AS cents
      FROM lineitem GROUP BY l_partkey),
    ranked AS (
      SELECT l_partkey, cents,
             SUM(cents) OVER (ORDER BY cents DESC, l_partkey ASC
                              ROWS UNBOUNDED PRECEDING) AS cum,
             SUM(cents) OVER () AS total
      FROM rev),
    classed AS (
      SELECT CASE WHEN 5 * cum <= 4 * total THEN 'A'
                  WHEN 20 * cum <= 19 * total THEN 'B'
                  ELSE 'C' END AS abc_class,
             cents
      FROM ranked)
    SELECT abc_class,
           COUNT(*) AS n_parts,
           CAST(SUM(cents) AS BIGINT) AS revenue_cents
    FROM classed GROUP BY abc_class
    """,
)
def parts_pareto_abc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from brooklin_spark.operators.distrank import global_running_sum

    li = table(spark, sf_dir, "lineitem")
    cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("bigint")
    rev = li.groupBy("l_partkey").agg(F.sum(cents).alias("cents"))
    ranked = global_running_sum(
        rev,
        [F.col("cents").desc(), F.col("l_partkey").asc()],
        "cents",
        out="cum",
        total_out="total",
    )
    abc = F.when(5 * F.col("cum") <= 4 * F.col("total"), "A").when(
        20 * F.col("cum") <= 19 * F.col("total"), "B"
    ).otherwise("C")
    return ranked.groupBy(abc.alias("abc_class")).agg(
        F.count("*").alias("n_parts"),
        F.sum("cents").cast("bigint").alias("revenue_cents"),
    )


# ---------------------------------------------------------------------------
# Benford first-digit audit on order totals — the classic financial
# anomaly screen. First significant digit comes from the INTEGER-cents
# string (both engines render int64 identically; no float log10 on the
# comparison path), and every output float is a per-row formula of that
# digit's exact count + the exact total: observed share, Benford's
# expected share log10(1+1/d), and the chi-square contribution
# (obs-exp)^2/exp scaled by n. 9 rows. ONE fact-scale groupBy(digit);
# 100 TB: the digit extraction rides the scan (codegen string ops), the
# grid is 9 rows, nothing else moves.
# ---------------------------------------------------------------------------


@query(
    "orders_benford_digit_audit",
    oracle="""
    WITH d AS (
      SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT)
                         AS VARCHAR), 1, 1) AS BIGINT) AS digit
      FROM orders WHERE o_totalprice > 0),
    g AS (SELECT digit, COUNT(*) AS n FROM d GROUP BY digit),
    t AS (SELECT SUM(n) AS total FROM g)
    SELECT g.digit, CAST(g.n AS BIGINT) AS n,
           round(g.n * 1.0 / t.total, 8) AS observed,
           round(log10(1 + 1.0 / g.digit), 8) AS expected,
           round(power(g.n * 1.0 / t.total - log10(1 + 1.0 / g.digit), 2)
                 / log10(1 + 1.0 / g.digit) * t.total, 8) AS chi2_term
    FROM g CROSS JOIN t ORDER BY g.digit
    """,
)
def orders_benford_digit_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 0)
    digit = F.substring(cents("o_totalprice").cast("string"), 1, 1).cast("bigint")
    g = o.groupBy(digit.alias("digit")).agg(F.count("*").alias("n"))
    # 9-row grid: the scalar total broadcasts back (AQE), no second scan
    t = g.agg(F.sum("n").alias("total"))
    obs = F.col("n") / F.col("total")
    exp = F.log10(1 + 1.0 / F.col("digit"))
    return (
        g.crossJoin(F.broadcast(t))
        .select(
            "digit",
            F.col("n").cast("bigint").alias("n"),
            F.round(obs, 8).alias("observed"),
            F.round(exp, 8).alias("expected"),
            F.round(F.pow(obs - exp, 2) / exp * F.col("total"), 8).alias("chi2_term"),
        )
        .orderBy("digit")
    )


# ---------------------------------------------------------------------------
# Time-RANGE window frame: per-customer trailing-7-day order spend — the
# one window-frame kind the analytic battery didn't cover (RANGE over an
# event-time axis, where same-key ties share a frame, vs the battery's
# ROWS frames). Spark has no INTERVAL range frames, so the frame rides
# an epoch-day axis: rangeBetween(-6, 0) over datediff(o_orderdate,
# epoch) — value-identical to the oracle's RANGE BETWEEN INTERVAL '6
# days' PRECEDING (order timestamps are date-grain in this corpus).
# Money stays integer-cents inside the frame sum. Output: each
# customer's PEAK trailing-7-day spend. One custkey exchange carries
# both the window and the final groupBy. 100 TB: window state is
# per-customer and 7-day-bounded; no self-join formulation.
# ---------------------------------------------------------------------------


@query(
    "window_range_7day_spend",
    oracle="""
    WITH spans AS (
      SELECT o_custkey,
             SUM(CAST(round(o_totalprice * 100) AS BIGINT)) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate
               RANGE BETWEEN INTERVAL '6 days' PRECEDING AND CURRENT ROW
             ) AS spend7
      FROM orders)
    SELECT o_custkey, COUNT(*) AS n_orders,
           CAST(MAX(spend7) AS BIGINT) AS peak_7day_cents
    FROM spans GROUP BY o_custkey
    """,
)
def window_range_7day_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    day = F.datediff(F.col("o_orderdate").cast("date"), F.lit("1990-01-01").cast("date"))
    w = (
        W.partitionBy("o_custkey")
        .orderBy(day)
        .rangeBetween(-6, W.currentRow)
    )
    spans = o.select(
        "o_custkey",
        F.sum(cents("o_totalprice")).over(w).alias("spend7"),
    )
    return spans.groupBy("o_custkey").agg(
        F.count("*").alias("n_orders"),
        F.max("spend7").cast("bigint").alias("peak_7day_cents"),
    )


# ---------------------------------------------------------------------------
# Herfindahl-Hirschman supplier concentration per nation — the antitrust
# concentration index (Σ share²) over supplier revenue shares, the
# complement of the Gini operator (inequality) on the supply side.
# Revenue rides integer cents; each share is ONE exact-integer division
# and the Σ share² fold is a per-nation sum of ≤|suppliers| doubles
# rounded 8dp (the libm policy). Plan: one suppkey-keyed fact aggregate,
# a broadcast supplier→nation dim join, then a nation-grain aggregate —
# two shrinking exchanges, no fact-fact join. 100 TB: unchanged; the
# share arithmetic is supplier-scale.
# ---------------------------------------------------------------------------


@query(
    "supplier_hhi_by_nation",
    oracle="""
    WITH sup AS (
      SELECT l_suppkey, SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS cents
      FROM lineitem GROUP BY l_suppkey),
    nat AS (
      SELECT n.n_name, s.s_suppkey, sup.cents,
             SUM(sup.cents) OVER (PARTITION BY n.n_name) AS nation_cents
      FROM sup JOIN supplier s ON s.s_suppkey = sup.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey)
    SELECT n_name AS nation,
           CAST(COUNT(*) AS BIGINT) AS n_suppliers,
           CAST(MAX(nation_cents) AS BIGINT) AS revenue_cents,
           round(SUM(power(cents * 1.0 / nation_cents, 2)), 8) AS hhi,
           round(MAX(cents * 1.0 / nation_cents), 8) AS top_share
    FROM nat GROUP BY n_name
    """,
)
def supplier_hhi_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    sup = li.groupBy("l_suppkey").agg(
        F.sum(cents("l_extendedprice")).alias("cents")
    )
    nat = (
        sup.join(F.broadcast(s), s.s_suppkey == sup.l_suppkey)
        .join(F.broadcast(n), n.n_nationkey == s.s_nationkey)
        .select("n_name", "cents")
        .withColumn(
            "nation_cents", F.sum("cents").over(W.partitionBy("n_name"))
        )
    )
    share = F.col("cents") / F.col("nation_cents")
    return nat.groupBy(F.col("n_name").alias("nation")).agg(
        F.count("*").cast("bigint").alias("n_suppliers"),
        F.max("nation_cents").cast("bigint").alias("revenue_cents"),
        F.round(F.sum(F.pow(share, 2)), 8).alias("hhi"),
        F.round(F.max(share), 8).alias("top_share"),
    )


# ---------------------------------------------------------------------------
# Chi-square test of independence on the brand × type contingency table
# (+ Cramér's V effect size) — the categorical-association test the
# battery lacked (the Benford audit tests goodness-of-fit against a
# FIXED distribution; this tests two observed factors against each
# other). Every expected count is row_total·col_total/n from exact
# integers, each cell's term is a single formula, and the cell grid is
# |brands|×|types| (metadata-scale) after ONE fact groupBy; the margins
# ride grid-scale windows, not second scans. 100 TB: one keyed exchange,
# then arithmetic on a few hundred rows.
# ---------------------------------------------------------------------------


@query(
    "parts_brand_type_chi2",
    oracle="""
    WITH cells AS (
      SELECT p_brand, p_type, COUNT(*) AS o FROM part GROUP BY 1, 2),
    m AS (
      SELECT p_brand, p_type, o,
             SUM(o) OVER (PARTITION BY p_brand) AS rt,
             SUM(o) OVER (PARTITION BY p_type) AS ct,
             SUM(o) OVER () AS n
      FROM cells),
    t AS (
      SELECT n,
             (o - rt * ct * 1.0 / n) * (o - rt * ct * 1.0 / n)
               / (rt * ct * 1.0 / n) AS term
      FROM m),
    dims AS (
      SELECT COUNT(DISTINCT p_brand) AS r, COUNT(DISTINCT p_type) AS c
      FROM part)
    SELECT CAST((SELECT COUNT(*) FROM cells) AS BIGINT) AS n_cells,
           CAST((d.r - 1) * (d.c - 1) AS BIGINT) AS dof,
           round(SUM(term), 6) AS chi2,
           round(sqrt(SUM(term) / (MAX(t.n) * LEAST(d.r - 1, d.c - 1))), 8)
             AS cramers_v
    FROM t CROSS JOIN dims d GROUP BY d.r, d.c
    """,
)
def parts_brand_type_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part")
    cells = p.groupBy("p_brand", "p_type").agg(F.count("*").alias("o"))
    rt = F.sum("o").over(W.partitionBy("p_brand"))
    ct = F.sum("o").over(W.partitionBy("p_type"))
    n = F.sum("o").over(W.partitionBy())
    exp = rt * ct / n
    m = cells.select(
        F.col("o"), exp.alias("e"), n.alias("n")
    )
    dims = p.agg(
        F.count_distinct("p_brand").alias("r"),
        F.count_distinct("p_type").alias("c"),
    )
    term = (F.col("o") - F.col("e")) * (F.col("o") - F.col("e")) / F.col("e")
    return (
        m.crossJoin(F.broadcast(dims))
        .groupBy("r", "c")
        .agg(
            F.count("*").cast("bigint").alias("n_cells"),
            F.round(F.sum(term), 6).alias("chi2"),
            F.round(
                F.sqrt(
                    F.sum(term)
                    / (F.max("n") * F.least(F.col("r") - 1, F.col("c") - 1))
                ),
                8,
            ).alias("cramers_v"),
        )
        .select(
            "n_cells",
            ((F.col("r") - 1) * (F.col("c") - 1)).cast("bigint").alias("dof"),
            "chi2",
            "cramers_v",
        )
    )
