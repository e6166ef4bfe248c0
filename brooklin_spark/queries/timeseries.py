"""Time-series diagnostics over the events stream: lag-k autocorrelation
and CUSUM change-point detection — the monitoring shapes a long-running
ingest pipeline (reference: the Brooklin health/metrics surface,
datastream-server/.../DatastreamServer.java diagnostics endpoints) feeds
an alerting layer.

Scale shape: both queries first collapse the event stream to ONE row per
calendar day (a single map-side-combined groupBy — the only fact-scale
shuffle), then operate on the calendar-scale daily series (|days| rows:
~3.6k rows even for a decade of data). Cross-engine float parity comes
from keeping every aggregate in exact BIGINT arithmetic and applying one
identical IEEE-double formula at the end.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from brooklin_spark.io import table
from brooklin_spark.registry import query

_ACF_MAX_LAG = 7


def _daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily counts, MATERIALIZED once (localCheckpoint): both consumers
    reference the aggregate twice (self-join sides / totals+sequence),
    and without the checkpoint each reference re-scans the fact table —
    measured 3.6 s -> 1.9 s at sf1 for the ACF query. The checkpoint is
    |days| rows, so materialization cost is nil at any scale."""
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy(F.col("ts").cast("date").alias("day"))
        .agg(F.count("*").alias("c"))
        .localCheckpoint()
    )


# ---------------------------------------------------------------------------
# Lag-k autocorrelation of the daily event-count series, k = 1..7.
# Pairs (x_d, x_{d+k}) are formed by a self-JOIN on day arithmetic — no
# global window anywhere, so the plan holds at any calendar length. The
# Pearson r is computed from six exact BIGINT sums (n, Σx, Σy, Σxy, Σx²,
# Σy²); only the final closed-form expression runs in double, identically
# on both engines (sums are cast to double first: the formula then
# survives daily counts past the BIGINT-product range at 100 TB).
# ---------------------------------------------------------------------------


@query(
    "events_autocorrelation",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day, COUNT(*) AS c FROM events GROUP BY 1),
    lags AS (SELECT UNNEST(generate_series(1, {_ACF_MAX_LAG})) AS lag),
    paired AS (
      SELECT l.lag, a.c AS x, b.c AS y
      FROM lags l JOIN daily a ON TRUE
      JOIN daily b ON b.day = a.day + CAST(l.lag AS INTEGER)),
    mom AS (
      SELECT lag,
             COUNT(*) AS n,
             SUM(x) AS sx, SUM(y) AS sy, SUM(x * y) AS sxy,
             SUM(x * x) AS sx2, SUM(y * y) AS sy2
      FROM paired GROUP BY lag)
    SELECT CAST(lag AS BIGINT) AS lag, CAST(n AS BIGINT) AS n_pairs,
           round(
             (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / nullif(sqrt((CAST(n AS DOUBLE) * CAST(sx2 AS DOUBLE)
                            - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                           * (CAST(n AS DOUBLE) * CAST(sy2 AS DOUBLE)
                              - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 0),
             8) AS acf
    FROM mom
    """,
)
def events_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = _daily(spark, sf_dir)
    lags = spark.range(1, _ACF_MAX_LAG + 1).select(F.col("id").alias("lag"))
    a = daily.alias("a")
    b = daily.alias("b")
    paired = (
        a.crossJoin(F.broadcast(lags))
        .join(
            b,
            F.col("b.day")
            == F.date_add(F.col("a.day"), F.col("lag").cast("int")),
        )
        .select("lag", F.col("a.c").alias("x"), F.col("b.c").alias("y"))
    )
    # second-moment sums in DECIMAL(38,0): a 1e9-events/day series over a
    # decade sums x^2 past BIGINT range. DuckDB's SUM(BIGINT) already
    # widens to HUGEINT; this is the Spark-side equivalent (exact, and
    # trivial cost — the input is |days| rows per lag)
    dec = "decimal(38,0)"
    mom = paired.groupBy("lag").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum((F.col("x") * F.col("y")).cast(dec)).alias("sxy"),
        F.sum((F.col("x") * F.col("x")).cast(dec)).alias("sx2"),
        F.sum((F.col("y") * F.col("y")).cast(dec)).alias("sy2"),
    )
    n, sx, sy = [F.col(c).cast("double") for c in ("n", "sx", "sy")]
    sxy, sx2, sy2 = [F.col(c).cast("double") for c in ("sxy", "sx2", "sy2")]
    den = F.sqrt((n * sx2 - sx * sx) * (n * sy2 - sy * sy))
    acf = F.round((n * sxy - sx * sy) / F.nullif(den, F.lit(0.0)), 8)
    return mom.select(
        F.col("lag").cast("bigint").alias("lag"),
        F.col("n").cast("bigint").alias("n_pairs"),
        acf.alias("acf"),
    )


# ---------------------------------------------------------------------------
# CUSUM change-point: the single split day t* maximizing
# |S_t - (t/n)·S_n| over the daily-count series (the classic cumulative-
# sum statistic; ties break to the earliest day). The cumulative sum runs
# in ONE Window over the |days|-row daily aggregate — calendar scale by
# construction (a decade is ~3.6k rows through one task), the same
# documented shape as the events_concurrency_profile sweep-line; the
# fact-scale work is the map-side-combined daily groupBy before it.
# Scalar totals (n, S_n) come from a broadcast 1-row aggregate join, not
# a second pass.
# ---------------------------------------------------------------------------


@query(
    "events_changepoint_cusum",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day, COUNT(*) AS c FROM events GROUP BY 1),
    tot AS (SELECT COUNT(*) AS n, SUM(c) AS total FROM daily),
    seq AS (
      SELECT day, c,
             ROW_NUMBER() OVER (ORDER BY day) AS t,
             SUM(c) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS s
      FROM daily),
    scored AS (
      SELECT seq.day, seq.t, seq.s, tot.n, tot.total,
             abs(CAST(seq.s AS DOUBLE)
                 - CAST(seq.t AS DOUBLE) * CAST(tot.total AS DOUBLE)
                   / CAST(tot.n AS DOUBLE)) AS stat
      FROM seq, tot
      WHERE seq.t < tot.n)
    SELECT strftime(day, '%Y-%m-%d') AS split_day,
           CAST(t AS BIGINT) AS t_split,
           CAST(n AS BIGINT) AS n_days,
           round(stat, 8) AS cusum_stat,
           round(CAST(s AS DOUBLE) / CAST(t AS DOUBLE), 8) AS mean_before,
           round(CAST(total - s AS DOUBLE) / CAST(n - t AS DOUBLE), 8)
             AS mean_after
    FROM scored
    ORDER BY stat DESC, day ASC
    LIMIT 1
    """,
)
def events_changepoint_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = _daily(spark, sf_dir)
    tot = daily.agg(
        F.count("*").alias("n"), F.sum("c").alias("total")
    )
    w = W.orderBy("day")
    seq = daily.select(
        "day",
        "c",
        F.row_number().over(w).alias("t"),
        F.sum("c").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)).alias("s"),
    )
    scored = (
        seq.crossJoin(F.broadcast(tot))
        .filter(F.col("t") < F.col("n"))
        .withColumn(
            "stat",
            F.abs(
                F.col("s").cast("double")
                - F.col("t").cast("double")
                * F.col("total").cast("double")
                / F.col("n").cast("double")
            ),
        )
    )
    return (
        scored.orderBy(F.col("stat").desc(), F.col("day").asc())
        .limit(1)
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("split_day"),
            F.col("t").cast("bigint").alias("t_split"),
            F.col("n").cast("bigint").alias("n_days"),
            F.round("stat", 8).alias("cusum_stat"),
            F.round(F.col("s").cast("double") / F.col("t").cast("double"), 8).alias(
                "mean_before"
            ),
            F.round(
                (F.col("total") - F.col("s")).cast("double")
                / (F.col("n") - F.col("t")).cast("double"),
                8,
            ).alias("mean_after"),
        )
    )


# ---------------------------------------------------------------------------
# Series similarity: pairwise Pearson correlation between the per-type
# daily-count series (the time-series-similarity-search shape — EDBT'19
# streaming-series similarity — collapsed to the exact all-pairs case:
# |event_types| series, so the pair space is tiny even though each
# series is fact-derived). One fact-scale (type, day) groupBy, one
# day-keyed self-join (types meet only on shared days), exact BIGINT /
# DECIMAL moments, one final IEEE formula — same parity discipline as
# the ACF above.
# ---------------------------------------------------------------------------


@query(
    "events_series_correlation",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS c
      FROM events GROUP BY 1, 2),
    paired AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             a.c AS x, b.c AS y
      FROM daily a JOIN daily b
        ON a.day = b.day AND a.event_type < b.event_type),
    mom AS (
      SELECT type_a, type_b, COUNT(*) AS n,
             SUM(x) AS sx, SUM(y) AS sy, SUM(x * y) AS sxy,
             SUM(x * x) AS sx2, SUM(y * y) AS sy2
      FROM paired GROUP BY 1, 2)
    SELECT type_a, type_b, CAST(n AS BIGINT) AS n_days,
           round(
             (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / nullif(sqrt((CAST(n AS DOUBLE) * CAST(sx2 AS DOUBLE)
                            - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                           * (CAST(n AS DOUBLE) * CAST(sy2 AS DOUBLE)
                              - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 0),
             8) AS corr
    FROM mom
    """,
)
def events_series_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    daily = (
        e.groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .agg(F.count("*").alias("c"))
        .localCheckpoint()  # two join sides; |types|*|days| rows
    )
    a, b = daily.alias("a"), daily.alias("b")
    paired = a.join(
        b,
        (F.col("a.day") == F.col("b.day"))
        & (F.col("a.event_type") < F.col("b.event_type")),
    ).select(
        F.col("a.event_type").alias("type_a"),
        F.col("b.event_type").alias("type_b"),
        F.col("a.c").alias("x"),
        F.col("b.c").alias("y"),
    )
    dec = "decimal(38,0)"
    mom = paired.groupBy("type_a", "type_b").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum((F.col("x") * F.col("y")).cast(dec)).alias("sxy"),
        F.sum((F.col("x") * F.col("x")).cast(dec)).alias("sx2"),
        F.sum((F.col("y") * F.col("y")).cast(dec)).alias("sy2"),
    )
    n, sx, sy = [F.col(c).cast("double") for c in ("n", "sx", "sy")]
    sxy, sx2, sy2 = [F.col(c).cast("double") for c in ("sxy", "sx2", "sy2")]
    den = F.sqrt((n * sx2 - sx * sx) * (n * sy2 - sy * sy))
    return mom.select(
        "type_a",
        "type_b",
        F.col("n").cast("bigint").alias("n_days"),
        F.round((n * sxy - sx * sy) / F.nullif(den, F.lit(0.0)), 8).alias("corr"),
    )


# ---------------------------------------------------------------------------
# DTW series distance: exact dynamic-time-warping distance (|x-y| local
# cost, unconstrained band) between every pair of per-type daily-count
# series — the alignment-tolerant complement of the Pearson matrix
# above (EDBT'19 distributed time-series similarity class). Integer
# arithmetic end-to-end, so cross-engine equality is exact.
#
# Spark: one fact-scale (type, day) groupBy, per-type ordered arrays,
# |types|^2/2 pairs, DP in a vectorized Arrow kernel (O(n*m) per pair,
# row-at-a-time numpy) — series live as arrays, pairs are the unit of
# parallelism (the right shape when series count >> series length).
# Oracle: recursive CTE over DP rows; the inner recurrence is re-cast
# entry-point form — new_row[j] = min over k<=j of (row-run cost k..j +
# min(prev[k], prev[k-1])) — because SQL lambdas can't carry the
# within-row sequential dependency; verified equal to the classic DP on
# randomized series (tests/test_new_operator_properties.py).
# ---------------------------------------------------------------------------


@query(
    "events_series_dtw",
    oracle="""
    WITH RECURSIVE
    daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS c
      FROM events GROUP BY 1, 2),
    ser AS (
      SELECT event_type, list(c ORDER BY day) AS v
      FROM daily GROUP BY event_type),
    p AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             a.v AS x, b.v AS y
      FROM ser a JOIN ser b ON a.event_type < b.event_type),
    dtw(type_a, type_b, x, y, i, row) AS (
      SELECT type_a, type_b, x, y, 1,
             list_transform(generate_series(1, len(y)),
               j -> list_sum(list_transform(generate_series(1, j),
                      t -> abs(x[1] - y[t]))))
      FROM p
      UNION ALL
      SELECT type_a, type_b, x, y, i + 1,
             list_transform(generate_series(1, len(y)), j ->
               list_min(list_transform(generate_series(1, j), k ->
                 list_sum(list_transform(generate_series(k, j),
                   t -> abs(x[i + 1] - y[t])))
                 + CASE WHEN k = 1 THEN row[1]
                        ELSE least(row[k], row[k - 1]) END)))
      FROM dtw WHERE i < len(x))
    SELECT type_a, type_b,
           CAST(len(x) AS BIGINT) AS n_a, CAST(len(y) AS BIGINT) AS n_b,
           CAST(row[len(y)] AS BIGINT) AS dtw_dist
    FROM dtw WHERE i = len(x)
    """,
)
def events_series_dtw(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import pandas_udf

    e = table(spark, sf_dir, "events")
    ser = (
        e.groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .agg(F.count("*").alias("c"))
        .groupBy("event_type")
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("day", "c"))),
                lambda s: s["c"],
            ).alias("v")
        )
        .localCheckpoint()  # two join sides, |types| rows
    )

    @pandas_udf("bigint")
    def _dtw(xs: pd.Series, ys: pd.Series) -> pd.Series:
        import numpy as np

        out = []
        for x, y in zip(xs, ys):
            x = np.asarray(x, dtype=np.int64)
            y = np.asarray(y, dtype=np.int64)
            m = len(y)
            prev = np.cumsum(np.abs(x[0] - y))
            for i in range(1, len(x)):
                cost = np.abs(x[i] - y)
                row = np.empty(m, dtype=np.int64)
                row[0] = cost[0] + prev[0]
                for j in range(1, m):
                    row[j] = cost[j] + min(prev[j], prev[j - 1], row[j - 1])
                prev = row
            out.append(int(prev[-1]))
        return pd.Series(out)

    a, b = ser.alias("a"), ser.alias("b")
    pairs = a.join(b, F.col("a.event_type") < F.col("b.event_type")).select(
        F.col("a.event_type").alias("type_a"),
        F.col("b.event_type").alias("type_b"),
        F.col("a.v").alias("x"),
        F.col("b.v").alias("y"),
    )
    return pairs.select(
        "type_a",
        "type_b",
        F.size("x").cast("bigint").alias("n_a"),
        F.size("y").cast("bigint").alias("n_b"),
        _dtw("x", "y").alias("dtw_dist"),
    )


# ---------------------------------------------------------------------------
# Burst windows (gaps-and-islands): maximal runs of consecutive days
# where a type's daily count exceeds its own mean — the burst
# detector an ops pipeline pages on. Island id = day_index - run_index
# (the classic difference trick), both ranks computed in PER-TYPE
# windows (hash-partitioned; |types| series of calendar length). The
# above-mean flag is exact: both engines compare n_days * c > total in
# BIGINT (i.e. c > mean without dividing), so no float boundary can
# disagree between engines.
# ---------------------------------------------------------------------------


@query(
    "events_burst_windows",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS c
      FROM events GROUP BY 1, 2),
    stats AS (
      SELECT event_type, COUNT(*) AS n_days, SUM(c) AS total
      FROM daily GROUP BY 1),
    flagged AS (
      SELECT d.event_type, d.day, d.c
      FROM daily d JOIN stats s ON s.event_type = d.event_type
      WHERE s.n_days * d.c > s.total),
    ranked AS (
      SELECT event_type, day, c,
             day - CAST(ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day)
                        AS INTEGER) AS island
      FROM flagged)
    SELECT event_type,
           strftime(MIN(day), '%Y-%m-%d') AS burst_start,
           strftime(MAX(day), '%Y-%m-%d') AS burst_end,
           COUNT(*) AS n_days,
           CAST(MAX(c) AS BIGINT) AS peak,
           CAST(SUM(c) AS BIGINT) AS volume
    FROM ranked GROUP BY event_type, island
    """,
)
def events_burst_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    daily = (
        e.groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .agg(F.count("*").alias("c"))
        .localCheckpoint()  # feeds stats join + flag filter
    )
    stats = daily.groupBy("event_type").agg(
        F.count("*").alias("n_days"), F.sum("c").alias("total")
    )
    flagged = daily.join(F.broadcast(stats), "event_type").filter(
        F.col("n_days") * F.col("c") > F.col("total")
    )
    win = W.partitionBy("event_type").orderBy("day")
    ranked = flagged.withColumn(
        "island",
        F.date_sub(F.col("day"), F.row_number().over(win)),
    )
    return ranked.groupBy("event_type", "island").agg(
        F.date_format(F.min("day"), "yyyy-MM-dd").alias("burst_start"),
        F.date_format(F.max("day"), "yyyy-MM-dd").alias("burst_end"),
        F.count("*").alias("n_days"),
        F.max("c").cast("bigint").alias("peak"),
        F.sum("c").cast("bigint").alias("volume"),
    ).drop("island")


# ---------------------------------------------------------------------------
# Seasonal decomposition (ratio-to-moving-average): per event type, the
# day-of-week seasonal index of the daily volume — classical multiplicative
# decomposition where the trend is a centered 7-day moving sum and the
# seasonal index per weekday is the TREND-WEIGHTED mean of the detrended
# ratios: index(dow) = 7 * sum(c) / sum(sum7) over full-window days.
# Weighting by the trend keeps every moment in exact BIGINT arithmetic —
# the only IEEE operation is the single final division, so cross-engine
# parity is exact (the repo's standard timeseries float policy). Edge days
# without a full 7-row window are excluded, as in classical decomposition.
# A 7-ROW window is only a 7-DAY window when the daily series has no gaps,
# so windows are additionally required to span exactly 6 calendar days
# (datediff(max_day, min_day) = 6) — a sparse series (an event type with
# zero-event days) would otherwise silently average across >7 days.
#
# Scale shape: one map-side-combined fact-scale groupBy to daily counts;
# the window and the dow aggregate run on the |types| x |days|
# calendar-scale series.
# ---------------------------------------------------------------------------


@query(
    "events_seasonal_decompose",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS c
      FROM events GROUP BY 1, 2),
    ma AS (
      SELECT event_type, day, c,
             SUM(c) OVER (PARTITION BY event_type ORDER BY day
                          ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS sum7,
             COUNT(*) OVER (PARTITION BY event_type ORDER BY day
                            ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS n7,
             MIN(day) OVER (PARTITION BY event_type ORDER BY day
                            ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS day_lo,
             MAX(day) OVER (PARTITION BY event_type ORDER BY day
                            ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS day_hi
      FROM daily)
    SELECT event_type, CAST(isodow(day) - 1 AS INTEGER) AS dow,
           COUNT(*) AS n_days,
           CAST(SUM(c) AS BIGINT) AS volume,
           CAST(7.0 * SUM(c) AS DOUBLE) / SUM(sum7) AS seasonal_index
    FROM ma WHERE n7 = 7 AND day_hi - day_lo = 6
    GROUP BY 1, 2
    """,
)
def events_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    daily = e.groupBy("event_type", F.col("ts").cast("date").alias("day")).agg(
        F.count("*").alias("c")
    )
    win = (
        W.partitionBy("event_type").orderBy("day").rowsBetween(-3, 3)
    )
    ma = daily.select(
        "event_type",
        "day",
        "c",
        F.sum("c").over(win).alias("sum7"),
        F.count("*").over(win).alias("n7"),
        F.min("day").over(win).alias("day_lo"),
        F.max("day").over(win).alias("day_hi"),
    ).filter(
        (F.col("n7") == 7) & (F.datediff("day_hi", "day_lo") == 6)
    )
    return ma.groupBy(
        "event_type", F.weekday("day").cast("int").alias("dow")
    ).agg(
        F.count("*").alias("n_days"),
        F.sum("c").cast("bigint").alias("volume"),
        ((F.lit(7.0) * F.sum("c")) / F.sum("sum7")).alias("seasonal_index"),
    )


# ---------------------------------------------------------------------------
# Holt linear (double-exponential) forecast of daily order revenue: the
# level+trend smoother every capacity dashboard runs one notch above a
# plain EWMA (events_ewma_daily). The recursion over days is inherently
# sequential, so the plan follows the module's two-tier shape: ONE
# fact-scale groupBy collapses orders to the daily series (integer cents,
# exact), then the calendar-scale recursion (~2.4k rows here, ~3.6k for a
# decade — bounded by the calendar, NOT the corpus) runs in one
# applyInPandas group, mirrored by a DuckDB recursive CTE. Cross-engine
# float parity: alpha = beta = 0.5 keeps every smoothing step a
# power-of-two multiply-add, and BOTH engines evaluate the identical
# expression tree over IEEE doubles left-to-right, so the states stay
# bit-identical with NO per-step rounding; only the final report rounds.
# ---------------------------------------------------------------------------


@query(
    "orders_holt_linear_forecast",
    oracle="""
    WITH RECURSIVE daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
      FROM orders GROUP BY 1),
    ser AS (
      SELECT list(cents / 100.0 ORDER BY day) AS y, COUNT(*) AS n
      FROM daily),
    holt(t, l, b, sae, y, n) AS (
      SELECT 1, y[1], y[2] - y[1], CAST(0.0 AS DOUBLE), y, n FROM ser
      UNION ALL
      SELECT t + 1,
             0.5 * y[t + 1] + 0.5 * (l + b),
             0.5 * ((0.5 * y[t + 1] + 0.5 * (l + b)) - l) + 0.5 * b,
             sae + abs(y[t + 1] - (l + b)),
             y, n
      FROM holt WHERE t < n)
    SELECT CAST(n AS BIGINT) AS n_days,
           round(l, 6) AS level, round(b, 6) AS trend,
           round(l + b, 6) AS forecast_1d,
           round(l + 7 * b, 6) AS forecast_7d,
           round(sae / (n - 1), 6) AS mae_1step
    FROM holt WHERE t = n
    """,
)
def orders_holt_linear_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    o = table(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").cast("date").alias("day")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias("cents")
    )

    def holt(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("day").reset_index(drop=True)
        y = [c / 100.0 for c in pdf["cents"].tolist()]
        n = len(y)
        l, b, sae = y[0], y[1] - y[0], 0.0
        # expression order mirrors the oracle CTE exactly — alpha=beta=0.5
        # keeps each step in dyadic multiply-adds, bit-identical across
        # engines without intermediate rounding
        for t in range(1, n):
            l_new = 0.5 * y[t] + 0.5 * (l + b)
            b_new = 0.5 * (l_new - l) + 0.5 * b
            sae = sae + abs(y[t] - (l + b))
            l, b = l_new, b_new
        return pd.DataFrame(
            {"n_days": [n], "l": [l], "b": [b], "sae": [sae]}
        )

    res = daily.groupBy(F.lit(1).alias("g")).applyInPandas(
        holt, "n_days long, l double, b double, sae double"
    )
    return res.select(
        F.col("n_days"),
        F.round("l", 6).alias("level"),
        F.round("b", 6).alias("trend"),
        F.round(F.col("l") + F.col("b"), 6).alias("forecast_1d"),
        F.round(F.col("l") + 7 * F.col("b"), 6).alias("forecast_7d"),
        F.round(F.col("sae") / (F.col("n_days") - 1), 6).alias("mae_1step"),
    )
