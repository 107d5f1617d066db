"""Stream-stream event-time joins.

The missing piece beyond stream-static enrichment: joining two live
streams (view→click attribution) requires BOTH sides buffered in
watermark-bounded state, with an event-time range condition so the
engine can expire state.  Without the time bound, stream-stream state
grows forever; with it, each side keeps only `watermark + interval`
of history per key — bounded memory regardless of stream length.

Scale: the join shuffles both streams by user_id (state co-location);
the time-range residual keeps matching O(events-in-window) per key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def split_views_clicks(events: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Project the two event streams an attribution join consumes."""
    views = events.where(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("v_ts"),
        F.col("event_id").alias("view_id"),
    )
    clicks = events.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
        F.col("event_id").alias("click_id"),
    )
    return views, clicks


def attribution_join(
    views: DataFrame,
    clicks: DataFrame,
    within: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Inner stream-stream join: each (view, click) pair for the same
    user where the click lands in [view_ts, view_ts + within].

    Works identically for batch inputs (no watermark applied) and
    streaming inputs (watermark bounds both state stores) — the test
    harness runs both and asserts equality.
    """
    if views.isStreaming:
        views = views.withWatermark("v_ts", watermark)
    if clicks.isStreaming:
        clicks = clicks.withWatermark("c_ts", watermark)
    cond = F.expr(
        "v_user = c_user AND c_ts >= v_ts "
        f"AND c_ts <= v_ts + interval {within}"
    )
    return views.join(clicks, cond, "inner").select(
        F.col("v_user").alias("user_id"), "view_id", "click_id", "v_ts", "c_ts"
    )


def attribution_join_outer(
    views: DataFrame,
    clicks: DataFrame,
    within: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Left-outer stream-stream interval join: every view emits exactly
    once — matched views as (view, click) pairs immediately, unmatched
    views with a NULL click once the watermark passes ``v_ts + within``
    and their state expires.  The attribution COMPLETENESS query: which
    impressions never converted.

    Null-padded rows are only decidable up to the watermark horizon:
    a view is guaranteed emitted (matched or not) once the global
    watermark — min over both sides of (max event time - watermark) —
    strictly passes ``v_ts + within``.  Callers comparing against a
    batch twin must restrict both sides to that closed region; rows
    later than the horizon may still be buffered when the stream ends.
    """
    if views.isStreaming:
        views = views.withWatermark("v_ts", watermark)
    if clicks.isStreaming:
        clicks = clicks.withWatermark("c_ts", watermark)
    cond = F.expr(
        "v_user = c_user AND c_ts >= v_ts "
        f"AND c_ts <= v_ts + interval {within}"
    )
    return views.join(clicks, cond, "left_outer").select(
        F.col("v_user").alias("user_id"), "view_id", "click_id", "v_ts", "c_ts"
    )
