"""Round-9 wave-4 property tests: invariants the oracle hash-compare can't
express (one-sided sketch error, greedy-selection structure, frame
containment, distribution identities) for the CMS / bootstrap / Benford /
KN-bigram / MMR / HITS / cohort-LTV / RANGE-frame / burstiness /
rate-shift operators."""

from __future__ import annotations

from pyspark.sql import functions as F

from brooklin_spark import registry
from brooklin_spark.functions.exact import cents
from brooklin_spark.io import table


def _q(name, spark, sf):
    registry.load_all()
    return registry.QUERIES[name](spark, sf)


def test_cms_estimate_is_one_sided(spark, sf_smoke):
    rows = _q("events_count_min_sketch", spark, sf_smoke).collect()
    assert rows, "probe set empty"
    for r in rows:
        assert r.cms_est >= r.true_cnt  # CMS never undercounts
        assert r.over == r.cms_est - r.true_cnt
    # the probed truth IS the exact top-k (same ordering as heavy hitters)
    hh = {r.user_id for r in _q("events_heavy_hitters", spark, sf_smoke).collect()}
    assert {r.user_id for r in rows} == hh


def test_bootstrap_means_bounded_by_value_range(spark, sf_smoke):
    rows = _q("events_hash_bootstrap_means", spark, sf_smoke).collect()
    assert len(rows) == 32
    e = table(spark, sf_smoke, "events").filter(F.col("value").isNotNull())
    lo, hi, n = e.agg(
        F.min("value"), F.max("value"), F.count("*")
    ).collect()[0]
    for r in rows:
        assert 0 <= r.n_drawn <= 3 * n
        assert lo - 1e-6 <= r.resample_mean <= hi + 1e-6  # convex combination


def test_benford_distribution_identities(spark, sf_smoke):
    rows = _q("orders_benford_digit_audit", spark, sf_smoke).collect()
    assert {r.digit for r in rows} <= set(range(1, 10))
    assert abs(sum(r.observed for r in rows) - 1.0) < 1e-5
    n_orders = table(spark, sf_smoke, "orders").filter(
        F.col("o_totalprice") > 0
    ).count()
    assert sum(r.n for r in rows) == n_orders
    for r in rows:
        assert r.chi2_term >= 0


def test_kneser_ney_probabilities_valid(spark, sf_smoke):
    rows = _q("text_kneser_ney_bigram", spark, sf_smoke).collect()
    assert rows
    counts = [r.c2 for r in rows]
    assert counts == sorted(counts, reverse=True)  # top-k by count
    for r in rows:
        assert 0.0 < r.p_kn <= 1.0


def test_mmr_selection_structure(spark, sf_smoke):
    rows = sorted(
        _q("embedding_mmr_diverse_topk", spark, sf_smoke).collect(),
        key=lambda r: r.rank,
    )
    assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
    ids = [r.vec_id for r in rows]
    assert len(set(ids)) == len(ids)  # no repeats
    # greedy step 1 is pure relevance: rank-1 holds the pool max
    assert rows[0].relevance == max(r.relevance for r in rows)


def test_hits_authority_is_subnormalized(spark, sf_smoke):
    rows = _q("graph_hits_authorities", spark, sf_smoke).collect()
    assert rows
    total = sum(r.authority for r in rows)
    assert 0 < total <= 1.0 + 1e-6  # top-k slice of an L1-normalized dist
    for r in rows:
        assert r.authority > 0
        assert r.n_buyers >= 1
        assert r.node.startswith("s")


def test_cohort_ltv_cumsum_monotone(spark, sf_smoke):
    rows = _q("orders_cohort_ltv", spark, sf_smoke).collect()
    by_cohort: dict = {}
    for r in rows:
        assert r.age_months >= 0
        by_cohort.setdefault(r.cohort_month, []).append(r)
    for grp in by_cohort.values():
        grp.sort(key=lambda r: r.age_months)
        run = 0
        for r in grp:
            run += r.revenue_cents
            assert r.cum_revenue_cents == run  # cumsum ties out exactly


def test_range_frame_contains_current_row(spark, sf_smoke):
    rows = {
        r.o_custkey: r
        for r in _q("window_range_7day_spend", spark, sf_smoke).collect()
    }
    o = table(spark, sf_smoke, "orders")
    per_cust = o.groupBy("o_custkey").agg(
        F.max(cents("o_totalprice")).alias("max_cents"),
        F.count("*").alias("n"),
    ).collect()
    for pc in per_cust:
        r = rows[pc.o_custkey]
        assert r.n_orders == pc.n
        # every frame includes its own row, so the peak covers the max order
        assert r.peak_7day_cents >= pc.max_cents


def test_burstiness_floor_and_idf_sign(spark, sf_smoke):
    rows = _q("text_term_burstiness", spark, sf_smoke).collect()
    assert rows
    for r in rows:
        assert r.cf >= r.df >= 1
        assert r.burstiness >= 1.0  # cf/df >= 1 by definition
        assert r.idf >= 0.0


def test_rate_shift_counts_partition_total(spark, sf_smoke):
    rows = _q("events_rate_shift_poisson", spark, sf_smoke).collect()
    e = table(spark, sf_smoke, "events")
    totals = {
        r.event_type: r.n
        for r in e.groupBy("event_type").agg(F.count("*").alias("n")).collect()
    }
    for r in rows:
        assert r.c_first + r.c_second == totals[r.event_type]
        if r.c_first == r.c_second:
            assert r.z == 0.0
