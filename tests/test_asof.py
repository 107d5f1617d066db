"""As-of join semantics against a hand-computed frame: latest prior-or-
equal right row per key; null when none; ties at equal ts match."""

from __future__ import annotations

from datetime import datetime

from clickbom_spark.ext.asof import asof_join


def ts(s):
    return datetime.fromisoformat(s)


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [
            (1, ts("2024-01-01T10:00:00"), "l1"),
            (1, ts("2024-01-01T10:05:00"), "l2"),
            (1, ts("2024-01-01T09:00:00"), "l0"),  # before any right row
            (2, ts("2024-01-01T10:00:00"), "l3"),  # equal-ts tie
            (3, ts("2024-01-01T10:00:00"), "l4"),  # key with no right rows
        ],
        "user_id long, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [
            (1, ts("2024-01-01T09:30:00"), 10.0),
            (1, ts("2024-01-01T10:02:00"), 20.0),
            (2, ts("2024-01-01T10:00:00"), 30.0),
            (2, ts("2024-01-01T11:00:00"), 40.0),
        ],
        "user_id long, ts timestamp, value double",
    )
    out = {
        r["tag"]: (r["value_r"], r["ts_r"])
        for r in asof_join(left, right, by=["user_id"]).collect()
    }
    assert out["l0"] == (None, None)
    assert out["l1"] == (10.0, ts("2024-01-01T09:30:00"))
    assert out["l2"] == (20.0, ts("2024-01-01T10:02:00"))
    assert out["l3"] == (30.0, ts("2024-01-01T10:00:00"))  # <= includes ties
    assert out["l4"] == (None, None)


def test_asof_join_preserves_left_rowcount(spark):
    from clickbom_spark.session import read_table
    from pyspark.sql import functions as F
    from tests.conftest import SF_SMOKE

    events = read_table(spark, SF_SMOKE, "events")
    clicks = events.where(F.col("event_type") == "click")
    views = events.where(F.col("event_type") == "view")
    out = asof_join(
        clicks, views, by=["user_id"], right_payload=["event_id", "value"]
    )
    assert out.count() == clicks.count()
