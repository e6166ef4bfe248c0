"""Streaming operator queries (rows-only driver check — genuinely streaming
semantics, not expressible as DuckDB batch SQL: watermark state, stateful
dedup and session state live in the streaming engine).

Scale notes: all three are single-shuffle stateful operators keyed by their
group keys; state is bounded by the watermark horizon, which is what makes
them viable on an unbounded 100 TB/day stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from brooklin_spark.registry import query
from brooklin_spark.streaming.pipelines import events_stream, run_to_completion


@query("streaming_windowed_counts")
def streaming_windowed_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time windows with a 30-minute watermark —
    the windowed-aggregation capability the reference lacks (SURVEY §2.8)."""
    s = events_stream(spark, sf_dir)
    agg = (
        s.withWatermark("ts", "30 minutes")
        .groupBy(F.window("ts", "1 hour"), F.col("event_type"))
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("total_value"))
        .select(
            F.date_format("window.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )
    return run_to_completion(agg, mode="complete")


@query("streaming_dedup_watermark")
def streaming_dedup_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful record dedup within the watermark horizon
    (dropDuplicatesWithinWatermark) — bounded-state exactly-once-per-key
    delivery on top of an at-least-once stream (the record-level dedup the
    reference explicitly lacks, SURVEY §2.7)."""
    s = events_stream(spark, sf_dir)
    deduped = (
        s.withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["user_id", "event_type"])
        .select("event_id", "user_id", "event_type")
    )
    return run_to_completion(deduped, mode="append")


@query("streaming_sliding_counts")
def streaming_sliding_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding event-time windows (1-hour window, 30-minute slide): each
    event lands in two overlapping windows; state per (window, type) is
    bounded by the watermark horizon."""
    s = events_stream(spark, sf_dir)
    agg = (
        s.withWatermark("ts", "30 minutes")
        .groupBy(F.window("ts", "1 hour", "30 minutes"), F.col("event_type"))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.date_format("window.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            F.date_format("window.end", "yyyy-MM-dd HH:mm:ss").alias("window_end"),
            "event_type",
            "n_events",
        )
    )
    return run_to_completion(agg, mode="complete")


@query("streaming_stream_stream_join")
def streaming_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream time-interval join: purchases joined to the clicks that
    preceded them by <= 30 minutes for the same user. Both sides carry
    watermarks so join state is bounded by the interval + watermark horizon
    (the property that keeps state finite on an unbounded stream)."""
    clicks = (
        events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("click_user"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", "1 hour")
    )
    purchases = (
        events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("purchase_user"),
            F.col("ts").alias("purchase_ts"),
            F.col("value").alias("purchase_value"),
        )
        .withWatermark("purchase_ts", "1 hour")
    )
    joined = purchases.join(
        clicks,
        F.expr(
            """purchase_user = click_user
               AND click_ts <= purchase_ts
               AND click_ts >= purchase_ts - INTERVAL 30 MINUTES"""
        ),
    ).select(
        "purchase_id",
        "click_id",
        F.col("purchase_user").alias("user_id"),
        "purchase_value",
    )
    return run_to_completion(joined, mode="append")


@query("streaming_stateful_user_totals")
def streaming_stateful_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: per-user running
    (count, total value) kept in explicit group state — the extension point
    for operators Spark lacks natively (SURVEY §2.10 'record-level UDF on
    data: absent in reference'). State is one small tuple per user — O(keys)
    not O(events), the bound that survives unbounded input."""
    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    s = events_stream(spark, sf_dir)

    def totals(key: tuple, pdfs, state: GroupState):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            [{"user_id": key[0], "n_events": n, "total_value": round(total, 6)}]
        )

    out = s.groupBy("user_id").applyInPandasWithState(
        totals,
        outputStructType="user_id bigint, n_events bigint, total_value double",
        stateStructType="n bigint, total double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return run_to_completion(out, mode="update")


@query("streaming_cdc_before_image")
def streaming_cdc_before_image(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful CDC before-image population: per key, attach the previous
    payload to every change (BrooklinEnvelope._previousValue semantics,
    SURVEY §1.2) — state is one (last_scn, last_value) tuple per key, so
    it's O(keys) on an unbounded stream. Events within a batch are applied
    in scn order."""
    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    s = events_stream(spark, sf_dir).select(
        F.col("user_id"), F.col("event_id").alias("scn"), F.col("props").alias("value")
    )

    def attach_prev(key: tuple, pdfs, state: GroupState):
        last_scn, last_val = state.get if state.exists else (-1, None)
        rows = []
        batch = pd.concat(list(pdfs), ignore_index=True) if pdfs else pd.DataFrame()
        if len(batch):
            for _, r in batch.sort_values("scn").iterrows():
                rows.append(
                    {
                        "user_id": key[0],
                        "scn": int(r["scn"]),
                        "value": r["value"],
                        "previous_value": last_val,
                    }
                )
                last_scn, last_val = int(r["scn"]), r["value"]
            state.update((last_scn, last_val))
        yield pd.DataFrame(
            rows,
            columns=["user_id", "scn", "value", "previous_value"],
        )

    out = s.groupBy("user_id").applyInPandasWithState(
        attach_prev,
        outputStructType="user_id bigint, scn bigint, value string, previous_value string",
        stateStructType="last_scn bigint, last_value string",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return run_to_completion(out, mode="append")


@query("streaming_session_windows")
def streaming_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based session windows (session_window, 30-minute gap) — the
    streaming twin of the batch sessionize_events query."""
    s = events_stream(spark, sf_dir)
    agg = (
        s.withWatermark("ts", "30 minutes")
        .groupBy(F.session_window("ts", "30 minutes"), F.col("user_id"))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("user_id"),
            F.date_format("session_window.start", "yyyy-MM-dd HH:mm:ss").alias(
                "session_start"
            ),
            F.date_format("session_window.end", "yyyy-MM-dd HH:mm:ss").alias(
                "session_end"
            ),
            "n_events",
        )
    )
    return run_to_completion(agg, mode="complete")
