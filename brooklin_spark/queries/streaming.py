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
