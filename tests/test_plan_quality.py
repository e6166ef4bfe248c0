"""Plan-shape assertions: the 100 TB design claims, machine-checked.

Each test pins a property that must survive scale-up: predicate pushdown
into the parquet scan, column pruning, dimension broadcast, top-k without a
global sort, shuffle counts bounded.
"""

from __future__ import annotations

from brooklin_spark import registry
from brooklin_spark.plans import (
    broadcast_join_count,
    executed_plan,
    pushed_filters,
    read_schema_columns,
    shuffle_count,
)

registry.load_all()


def _q(spark, sf, name):
    return registry.QUERIES[name](spark, sf)


def test_q1_filter_pushdown_and_pruning(spark, sf_correct):
    df = _q(spark, sf_correct, "q1_pricing_summary")
    pushed = " ".join(pushed_filters(df))
    assert "l_shipdate" in pushed, f"shipdate filter not pushed: {pushed}"
    scans = read_schema_columns(df)
    assert scans and all(
        scan
        <= {
            "l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
            "l_discount", "l_tax", "l_shipdate",
        }
        for scan in scans
    ), f"scan reads more columns than needed: {scans}"


def test_q6_all_predicates_pushed(spark, sf_correct):
    df = _q(spark, sf_correct, "q6_forecast_revenue")
    pushed = " ".join(pushed_filters(df))
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in pushed, f"{col} not in pushed filters: {pushed}"
    scans = read_schema_columns(df)
    assert all(len(s) <= 4 for s in scans), f"pruning failed: {scans}"


def test_q5_broadcasts_small_dims(spark, sf_correct):
    df = _q(spark, sf_correct, "q5_local_supplier_volume")
    assert broadcast_join_count(df) >= 3  # region, nation, supplier at least


def test_q10_broadcasts_nation(spark, sf_correct):
    df = _q(spark, sf_correct, "q10_returned_items")
    assert broadcast_join_count(df) >= 1


def test_topk_uses_take_ordered_not_global_sort(spark, sf_correct):
    df = _q(spark, sf_correct, "topk_expensive_orders")
    plan = executed_plan(df)
    assert "TakeOrderedAndProject" in plan, plan


def test_band_join_is_broadcast_nested_loop(spark, sf_correct):
    df = _q(spark, sf_correct, "join_band_price_histogram")
    plan = executed_plan(df)
    assert "BroadcastNestedLoopJoin" in plan


def test_semi_anti_join_operators(spark, sf_correct):
    semi = executed_plan(_q(spark, sf_correct, "join_semi_customers_with_big_orders"))
    anti = executed_plan(_q(spark, sf_correct, "join_anti_customers_without_orders"))
    assert "LeftSemi" in semi
    assert "LeftAnti" in anti


def test_single_agg_query_shuffle_budget(spark, sf_correct):
    """A scan+groupBy should be exactly one exchange (partial agg map-side)."""
    df = _q(spark, sf_correct, "q1_pricing_summary")
    assert shuffle_count(df) <= 1, executed_plan(df)


def test_envelope_translate_is_shuffle_free(spark, sf_correct):
    df = _q(spark, sf_correct, "cdc_envelope_translate")
    assert shuffle_count(df) == 0, "pure projection must not shuffle"


def test_partial_aggregation_before_shuffle(spark, sf_correct):
    plan = executed_plan(_q(spark, sf_correct, "q1_pricing_summary"))
    # two HashAggregate levels (partial + final) around the exchange
    assert plan.count("HashAggregate") >= 2


def test_salted_join_is_shuffled_hash(spark, sf_correct):
    """Salting pins the shuffled-hash path (broadcast would make the salt a
    no-op); the salt spreads each key across 16 buckets."""
    plan = executed_plan(_q(spark, sf_correct, "join_salted_skew_supplier_revenue"))
    assert "ShuffledHashJoin" in plan
    assert "BroadcastHashJoin" not in plan


def test_q7_q9_broadcast_dims(spark, sf_correct):
    """Multi-way fact joins broadcast every dimension side — the fact table
    is never shuffled for a dim lookup."""
    assert broadcast_join_count(_q(spark, sf_correct, "q7_nation_volume")) >= 3
    assert broadcast_join_count(_q(spark, sf_correct, "q9_product_profit")) >= 3


def test_q17_correlated_avg_broadcasts_part(spark, sf_correct):
    assert broadcast_join_count(_q(spark, sf_correct, "q17_small_quantity_revenue")) >= 1


def test_bucketed_range_join_avoids_nested_loop(spark, sf_correct):
    """The bucketed range join must plan as a hash equi-join on the bucket
    key — the whole point of the bucketing rewrite."""
    plan = executed_plan(_q(spark, sf_correct, "range_join_promo_windows"))
    assert "NestedLoop" not in plan
    assert "HashJoin" in plan
