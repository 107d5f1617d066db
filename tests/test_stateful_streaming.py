"""applyInPandasWithState: keyed state must accumulate across real
micro-batch boundaries (multiple files, maxFilesPerTrigger=1) and the
final running totals must equal the batch aggregation exactly."""

from __future__ import annotations

import tempfile

import pytest

from pyspark.sql import functions as F
from pyspark.sql import types as T

from clickbom_spark.queries import epoch_us
from clickbom_spark.session import read_table
from clickbom_spark.streaming.stateful import keep_latest_per_key, running_user_totals
from tests.conftest import SF_SMOKE


def test_state_accumulates_across_microbatches(spark):
    events = read_table(spark, SF_SMOKE, "events")
    expected = {
        (r["user_id"], r["n_events"], r["total_cents"])
        for r in events.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("total_cents"),
        )
        .collect()
    }

    with tempfile.TemporaryDirectory() as tmp:
        src = f"{tmp}/src"
        # 4 files -> 4 micro-batches with maxFilesPerTrigger=1
        events.repartition(4).write.parquet(src)
        stream = (
            spark.readStream.schema(events.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        totals = running_user_totals(stream)

        final: dict[int, tuple] = {}
        n_batches = 0

        def collect_batch(df, epoch_id):
            nonlocal n_batches
            n_batches += 1
            for r in df.collect():
                # later epochs overwrite: the running total is monotone
                final[r["user_id"]] = (r["user_id"], r["n_events"], r["total_cents"])

        q = (
            totals.writeStream.foreachBatch(collect_batch)
            .option("checkpointLocation", f"{tmp}/ckpt")
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    assert n_batches >= 4, f"expected >=4 micro-batches, got {n_batches}"
    assert set(final.values()) == expected

def test_stream_keep_latest_equals_batch_cdc(spark):
    """Streaming CDC compaction converges to the batch keep-latest
    result regardless of micro-batch slicing (same (ts, event_id)
    total order as q_keep_latest_event)."""
    from pyspark.sql.window import Window

    events = read_table(spark, SF_SMOKE, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    w_expected = {
        (r["user_id"], r["event_type"], r["event_id"], r["ts_us"], r["value"])
        for r in events.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "user_id", "event_type", "event_id",
            epoch_us("ts").alias("ts_us"), "value",
        )
        .collect()
    }

    with tempfile.TemporaryDirectory() as tmp:
        src = f"{tmp}/src"
        events.repartition(4).write.parquet(src)
        stream = (
            spark.readStream.schema(events.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        latest = keep_latest_per_key(stream)

        final: dict[tuple, tuple] = {}
        n_batches = 0

        def collect_batch(df, epoch_id):
            nonlocal n_batches
            n_batches += 1
            for r in df.collect():
                final[(r["user_id"], r["event_type"])] = (
                    r["user_id"], r["event_type"], r["event_id"],
                    r["ts_us"], r["value"],
                )

        q = (
            latest.writeStream.foreachBatch(collect_batch)
            .option("checkpointLocation", f"{tmp}/ckpt")
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    assert n_batches >= 4, f"expected >=4 micro-batches, got {n_batches}"
    assert set(final.values()) == w_expected


def _protobuf_available() -> bool:
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


@pytest.mark.skipif(
    not _protobuf_available(),
    reason="transformWithStateInPandas needs protobuf (state-server "
    "protocol); not available in this container",
)
def test_tws_running_totals_equals_batch(spark):
    """transformWithStateInPandas twin converges to the batch aggregate
    (and therefore to the applyInPandasWithState result)."""
    from pyspark.sql.window import Window

    from clickbom_spark.streaming.stateful import running_user_totals_tws

    events = read_table(spark, SF_SMOKE, "events")
    with tempfile.TemporaryDirectory() as d:
        events.repartition(3).write.parquet(f"{d}/src")
        stream = (
            spark.readStream.schema(events.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{d}/src")
        )
        q = (
            running_user_totals_tws(stream)
            .writeStream.format("memory")
            .queryName("m_tws_totals")
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        w = Window.partitionBy("user_id").orderBy(F.desc("n_events"))
        final = (
            spark.table("m_tws_totals")
            .withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .drop("rn")
        )
        batch = events.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value") * 100)).cast("long").alias("total_cents"),
        )
        got = {tuple(r) for r in final.collect()}
        want = {tuple(r) for r in batch.collect()}
        assert got == want
