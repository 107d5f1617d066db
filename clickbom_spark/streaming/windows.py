"""Windowed event-time aggregations.

Each function is a plain DataFrame→DataFrame transformation, so the SAME
code path serves batch queries (registry + DuckDB oracle) and Structured
Streaming (applied to a ``readStream`` DataFrame with a watermark — see
pipeline.py).  That symmetry is the point: Spark's unified batch/stream
semantics mean the batch oracle check also validates the streaming
operator's arithmetic; streaming-only concerns (late data, state
eviction) are covered by the watermark tests in tests/test_streaming.py.

The reference has no streaming surface (SURVEY.md §2.10) — the closest
analog is its append-mode incremental table load
(/root/reference/entrypoint.sh:207-217).  These operators are the
north-star extension over the ``events`` table.

Scale notes: a windowed groupBy shuffles on (window, keys); state size
in streaming is bounded by the watermark horizon.  Session windows use
Spark's built-in session_window (state merge in Tungsten, not Python).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# exact decimal aggregation for cross-engine (DuckDB-oracle) float parity;
# same pattern as clickbom_spark.queries.DEC (not imported: queries/
# __init__ imports the module that imports us)
DEC = "decimal(18,2)"


def tumbling_counts(
    events: DataFrame, size: str = "10 minutes", ts_col: str = "ts"
) -> DataFrame:
    """Tumbling event-time windows: per (window, event_type) counts+sums."""
    return (
        events.groupBy(F.window(ts_col, size).alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def sliding_counts(
    events: DataFrame,
    size: str = "10 minutes",
    slide: str = "5 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """Sliding (hopping) windows: each event lands in size/slide windows."""
    return (
        events.groupBy(F.window(ts_col, size, slide).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("total_value"),
        )
        .select(F.col("w.start").alias("window_start"), "n_events", "total_value")
    )


def session_stats(
    events: DataFrame, gap: str = "30 minutes", ts_col: str = "ts"
) -> DataFrame:
    """Session windows per user: a session closes after ``gap`` of
    inactivity; window end = last event + gap (Spark semantics)."""
    return (
        events.groupBy(
            F.session_window(ts_col, gap).alias("w"), F.col("user_id")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("total_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )
