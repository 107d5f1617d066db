"""Structured Streaming: stream-mode output must equal the (oracle-
checked) batch output of the same transformations, plus watermark dedup
and the foreachBatch sink path."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from clickbom_spark.session import read_table
from clickbom_spark.streaming import (
    dedup_within_watermark,
    read_events_stream,
    run_to_memory_sink,
    tumbling_counts,
    write_foreach_batch,
)
from clickbom_spark.streaming.windows import session_stats
from tests.conftest import SF_SMOKE


def rows_set(df, cols):
    return {tuple(r[c] for c in cols) for r in df.collect()}


def test_stream_tumbling_equals_batch(spark):
    batch = tumbling_counts(read_table(spark, SF_SMOKE, "events"))
    stream = tumbling_counts(
        read_events_stream(spark, SF_SMOKE).withWatermark("ts", "1 hour")
    )
    run_to_memory_sink(stream, "t_tumbling")
    got = spark.table("t_tumbling")
    cols = ["window_start", "event_type", "n_events", "total_value"]
    assert rows_set(got, cols) == rows_set(batch, cols)


def test_stream_session_equals_batch(spark):
    batch = session_stats(read_table(spark, SF_SMOKE, "events"))
    stream = session_stats(
        read_events_stream(spark, SF_SMOKE).withWatermark("ts", "1 hour")
    )
    run_to_memory_sink(stream, "t_session")
    got = spark.table("t_session")
    cols = ["user_id", "session_start", "session_end", "n_events", "total_value"]
    assert rows_set(got, cols) == rows_set(batch, cols)


def test_stream_sliding_equals_batch(spark):
    from clickbom_spark.streaming import sliding_counts

    batch = sliding_counts(read_table(spark, SF_SMOKE, "events"))
    stream = sliding_counts(
        read_events_stream(spark, SF_SMOKE).withWatermark("ts", "1 hour")
    )
    run_to_memory_sink(stream, "t_sliding")
    got = spark.table("t_sliding")
    cols = ["window_start", "n_events", "total_value"]
    assert rows_set(got, cols) == rows_set(batch, cols)


def test_stream_dedup_within_watermark(spark):
    events = read_table(spark, SF_SMOKE, "events")
    batch_n = events.dropDuplicates(["user_id", "event_type"]).count()
    stream = dedup_within_watermark(
        read_events_stream(spark, SF_SMOKE), ["user_id", "event_type"]
    )
    run_to_memory_sink(stream, "t_dedup")
    assert spark.table("t_dedup").count() == batch_n


def test_stream_static_join_equals_batch(spark):
    """Stream-static join: the static dimension is re-read per micro-
    batch and joined without streaming state — enrichment-at-ingest."""
    events = read_table(spark, SF_SMOKE, "events")
    dim = events.select("user_id").distinct().withColumn(
        "segment", F.pmod("user_id", F.lit(5))
    )
    batch = (
        events.join(dim, "user_id")
        .groupBy("segment")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    stream = (
        read_events_stream(spark, SF_SMOKE)
        .withWatermark("ts", "1 hour")
        .join(dim, "user_id")
        .groupBy("segment")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    run_to_memory_sink(stream, "t_stream_static")
    got = spark.table("t_stream_static")
    cols = ["segment", "n_events"]
    assert rows_set(got, cols) == rows_set(batch, cols)


def test_foreach_batch_parquet_sink(spark):
    batch = tumbling_counts(read_table(spark, SF_SMOKE, "events"))
    stream = tumbling_counts(
        read_events_stream(spark, SF_SMOKE).withWatermark("ts", "1 hour")
    )
    with tempfile.TemporaryDirectory() as tmp:
        out = f"{tmp}/out"

        def write_batch(df, epoch_id):
            df.withColumn("epoch", F.lit(epoch_id)).write.mode("append").parquet(out)

        write_foreach_batch(stream, write_batch, f"{tmp}/ckpt")
        got = spark.read.parquet(out).drop("epoch")
        cols = ["window_start", "event_type", "n_events", "total_value"]
        assert rows_set(got, cols) == rows_set(batch, cols)


def test_stream_stream_join_equals_batch(spark):
    """Stream-stream interval join (view→click attribution): both
    sides watermarked, event-time range bounds the state stores.
    Result must equal the identical join over batch inputs."""
    from clickbom_spark.streaming.joins import attribution_join, split_views_clicks

    events = read_table(spark, SF_SMOKE, "events")
    batch = attribution_join(*split_views_clicks(events))

    s_views, s_clicks = split_views_clicks(read_events_stream(spark, SF_SMOKE))
    stream = attribution_join(s_views, s_clicks)
    run_to_memory_sink(stream, "t_ss_join")
    got = spark.table("t_ss_join")
    cols = ["user_id", "view_id", "click_id"]
    assert rows_set(got, cols) == rows_set(batch, cols)
    assert got.count() == batch.count()


def test_stream_stream_outer_join_equals_batch_below_horizon(spark):
    """Left-outer interval join: within the watermark-closed region
    (views strictly below LEAST(max view ts, max click ts) - 40 min)
    the streamed result — including NULL-click rows emitted on state
    expiry by the availableNow no-data flush — must equal the batch
    left join exactly."""
    from clickbom_spark.streaming.joins import (
        attribution_join_outer,
        split_views_clicks,
    )

    events = read_table(spark, SF_SMOKE, "events")
    horizon = events.groupBy().agg(
        (
            F.least(
                F.max(F.when(F.col("event_type") == "view", F.col("ts"))),
                F.max(F.when(F.col("event_type") == "click", F.col("ts"))),
            )
            - F.expr("interval 40 minutes")
        ).alias("h")
    )

    def below_horizon(df):
        return df.join(F.broadcast(horizon)).where(F.col("v_ts") < F.col("h"))

    batch = below_horizon(attribution_join_outer(*split_views_clicks(events)))

    s_views, s_clicks = split_views_clicks(read_events_stream(spark, SF_SMOKE))
    run_to_memory_sink(
        attribution_join_outer(s_views, s_clicks), "t_ss_outer_join"
    )
    got = below_horizon(spark.table("t_ss_outer_join"))
    cols = ["user_id", "view_id", "click_id"]
    assert rows_set(got, cols) == rows_set(batch, cols)
    assert got.count() == batch.count()
    # the outer join must actually produce null-padded rows
    assert got.where(F.col("click_id").isNull()).count() > 0


def test_outer_attribution_timezone_independent(spark):
    """Regression (caught by the Asia/Tokyo strict-parity sweep): the
    outer attribution query's watermark-horizon cut must not shift
    with the session timezone — the sink's TIMESTAMP (LTZ) v_ts and
    the batch table's NTZ horizon are compared in timezone-free epoch
    micros, so the oracle-exact answer holds under any session TZ."""
    from clickbom_spark.queries import REGISTRY
    from tests.conftest import SF_CORRECT
    from tests.test_parity import canon, run_oracle

    spec = REGISTRY["q_stream_stream_attribution_outer"]
    old = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "Asia/Tokyo")
    try:
        got = canon(spec.fn(spark, SF_CORRECT).toPandas())
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)
    want = canon(run_oracle(spec.oracle, SF_CORRECT))
    import pandas as pd

    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)
