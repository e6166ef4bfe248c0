"""Additional relational shapes: statistical aggregates, correlated
subqueries, HAVING, disjunctive predicate pushdown, scalar subqueries —
rounding out the SURVEY §2.6 inventory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from brooklin_spark.functions.exact import dec, dsum, one_minus
from brooklin_spark.io import table
from brooklin_spark.registry import query

# ---------------------------------------------------------------------------
# Statistical aggregate battery: exact interpolated percentiles, sample
# stddev/variance, correlation/covariance. round(8): both engines compute
# the same formula on doubles; only last-ulp accumulation order differs.
# At 100 TB these become approx_percentile / sketches — exact versions are
# the oracle-checkable baseline.
# ---------------------------------------------------------------------------


@query(
    "stats_battery",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) AS n,
           ROUND(percentile_cont(0.5) WITHIN GROUP (ORDER BY l_extendedprice), 8) AS price_p50,
           ROUND(percentile_cont(0.9) WITHIN GROUP (ORDER BY l_extendedprice), 8) AS price_p90,
           ROUND(stddev_samp(l_quantity), 8) AS qty_stddev,
           ROUND(var_samp(l_quantity), 8) AS qty_var,
           ROUND(corr(l_extendedprice, l_quantity), 8) AS price_qty_corr,
           ROUND(covar_samp(l_extendedprice, l_quantity), 8) AS price_qty_covar
    FROM lineitem GROUP BY l_returnflag
    """,
)
def stats_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.round(F.percentile("l_extendedprice", F.lit(0.5)), 8).alias("price_p50"),
        F.round(F.percentile("l_extendedprice", F.lit(0.9)), 8).alias("price_p90"),
        F.round(F.stddev_samp("l_quantity"), 8).alias("qty_stddev"),
        F.round(F.var_samp("l_quantity"), 8).alias("qty_var"),
        F.round(F.corr("l_extendedprice", "l_quantity"), 8).alias("price_qty_corr"),
        F.round(F.covar_samp("l_extendedprice", "l_quantity"), 8).alias("price_qty_covar"),
    )


# ---------------------------------------------------------------------------
# q12 shape: join + conditional aggregation (CASE inside SUM).
# ---------------------------------------------------------------------------


@query(
    "q12_returnflag_priority",
    oracle="""
    SELECT l.l_returnflag,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE l.l_returnflag IN ('R', 'A')
      AND l.l_shipdate >= TIMESTAMP '1996-01-01'
    GROUP BY l.l_returnflag
    """,
)
def q12_returnflag_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q12 shape (the testdata lacks l_shipmode; l_returnflag plays the
    grouping role — same join + conditional-aggregation plan)."""
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag").isin("R", "A")
        & (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("bigint").alias("low_line_count"),
        )
    )


# ---------------------------------------------------------------------------
# q14 shape: promo revenue ratio (conditional decimal sums -> ratio).
# ---------------------------------------------------------------------------


@query(
    "q14_promo_revenue",
    oracle="""
    SELECT CAST(SUM(CASE WHEN p.p_type LIKE 'PROMO%'
                 THEN CAST(l.l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l.l_discount AS DECIMAL(12,2)))
                 ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE) AS promo_revenue,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l.l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS total_revenue,
           CAST(SUM(CASE WHEN p.p_type LIKE 'PROMO%'
                 THEN CAST(l.l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l.l_discount AS DECIMAL(12,2)))
                 ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
             / CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l.l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS promo_ratio
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01' AND l.l_shipdate < TIMESTAMP '1997-07-01'
    """,
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    p = table(spark, sf_dir, "part")
    rev = dec("l_extendedprice") * one_minus("l_discount")
    promo = F.when(F.col("p_type").like("PROMO%"), rev).otherwise(
        F.lit(0).cast("decimal(12,2)")
    )
    out = li.join(F.broadcast(p), p.p_partkey == li.l_partkey).agg(
        dsum(promo, "promo_revenue"),
        dsum(rev, "total_revenue"),
    )
    return out.select(
        "promo_revenue",
        "total_revenue",
        (F.col("promo_revenue") / F.col("total_revenue")).alias("promo_ratio"),
    )


# ---------------------------------------------------------------------------
# q18 shape: HAVING on a grouped sum, then dim re-join + top-k.
# ---------------------------------------------------------------------------


@query(
    "q18_large_orders",
    oracle="""
    WITH big AS (
      SELECT l_orderkey, CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS total_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 150)
    SELECT c.c_custkey, c.c_name, o.o_orderkey, b.total_qty,
           strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate
    FROM big b
    JOIN orders o ON o.o_orderkey = b.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    ORDER BY b.total_qty DESC, o.o_orderkey ASC LIMIT 20
    """,
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(dec("l_quantity")).alias("q"))
        .filter(F.col("q") > 150)
        .select("l_orderkey", F.col("q").cast("double").alias("total_qty"))
    )
    return (
        big.join(o, o.o_orderkey == big.l_orderkey)
        .join(c, c.c_custkey == o.o_custkey)
        .select(
            "c_custkey", "c_name", "o_orderkey", "total_qty",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        )
        .orderBy(F.desc("total_qty"), F.asc("o_orderkey"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# q19 shape: disjunctive multi-attribute predicates (OR-of-ANDs) — a
# pushdown/codegen stress; the whole filter evaluates in the scan stage.
# ---------------------------------------------------------------------------


@query(
    "q19_discounted_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l.l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15 AND l.l_quantity BETWEEN 1 AND 21)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 10 AND 30 AND l.l_quantity BETWEEN 10 AND 40)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 20 AND 50 AND l.l_quantity BETWEEN 20 AND 50)
    """,
)
def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), p.p_partkey == li.l_partkey)
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15) & F.col("l_quantity").between(1, 21))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(10, 30) & F.col("l_quantity").between(10, 40))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(20, 50) & F.col("l_quantity").between(20, 50))
    )
    rev = dec("l_extendedprice") * one_minus("l_discount")
    return j.filter(cond).agg(dsum(rev, "revenue"), F.count("*").alias("n_items"))


# ---------------------------------------------------------------------------
# q4 shape: correlated EXISTS — planned as a left-semi join.
# ---------------------------------------------------------------------------


@query(
    "q4_order_priority_check",
    oracle="""
    SELECT o.o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-10-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
    GROUP BY o.o_orderpriority
    """,
)
def q4_order_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem")
    late = o.join(
        li,
        (li.l_orderkey == o.o_orderkey) & (li.l_shipdate > o.o_orderdate),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count("*").alias("order_count"))


# ---------------------------------------------------------------------------
# q22 shape: scalar subquery (global average) + anti join.
# ---------------------------------------------------------------------------


@query(
    "q22_global_sales_opportunity",
    oracle="""
    WITH avg_bal AS (
      -- exact decimal-sum/count (matches the Spark side bit-for-bit; plain
      -- AVG(double) would differ in the last ulp and flip boundary rows)
      SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS a
      FROM customer WHERE c_acctbal > 0),
    rich_idle AS (
      -- "no recent orders": the testdata gives every customer at least one
      -- order overall, so the classic no-orders-at-all predicate is vacuous
      SELECT c.c_custkey, c.c_acctbal, c.c_nationkey
      FROM customer c, avg_bal
      WHERE c.c_acctbal > avg_bal.a
        AND NOT EXISTS (SELECT 1 FROM orders o
                        WHERE o.o_custkey = c.c_custkey
                          AND o.o_orderdate >= TIMESTAMP '1998-01-01'))
    SELECT c_nationkey AS nationkey, COUNT(*) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
    FROM rich_idle GROUP BY c_nationkey
    """,
)
def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    # scalar subquery: global average of positive balances.
    # AVG of doubles is order-sensitive in the last ulps; compute it exactly
    # as decimal-sum/count (same in the oracle via AVG — see note below).
    avg_row = (
        c.filter(F.col("c_acctbal") > 0)
        .agg((F.sum(dec("c_acctbal")).cast("double") / F.count("*")).alias("a"))
        .collect()[0]
    )
    rich = c.filter(F.col("c_acctbal") > avg_row.a)
    recent = o.filter(F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp"))
    idle = rich.join(recent, recent.o_custkey == rich.c_custkey, "left_anti")
    return idle.groupBy(F.col("c_nationkey").alias("nationkey")).agg(
        F.count("*").alias("numcust"),
        dsum(dec("c_acctbal"), "totacctbal"),
    )
