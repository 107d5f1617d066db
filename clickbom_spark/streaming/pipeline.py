"""Structured Streaming plumbing: sources, watermarks, dedup, sinks.

Mirrors the reference's incremental-load semantics
(/root/reference/entrypoint.sh:207-217: append vs truncate) as a proper
streaming pipeline: file source → event-time watermark → windowed agg /
dedup → idempotent sink.

Local tests drive these with ``trigger(availableNow=True)`` (process
everything then stop), which is also the production pattern for
incremental batch over an object store: each run picks up new files,
state lives in the checkpoint dir.
"""

from __future__ import annotations

import os
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def read_events_stream(
    spark: SparkSession,
    sf_dir: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source stream over the events table.

    Schema comes from a batch peek (streams need a declared schema);
    the parquet TIMESTAMP(NANOS) → timestamp conversion matches
    session.read_table so batch and stream rows are identical.
    """
    path = os.path.join(sf_dir, "events.parquet")
    # Runtime-settable; the driver contract hands us an externally built
    # SparkSession, so this cannot be assumed preset by get_spark()
    # (same events TIMESTAMP(NANOS) quirk read_table handles).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    batch_schema = spark.read.parquet(path).schema
    # The file stream source requires a directory basePath; the corpus
    # stores each table as a single parquet file, so stream the parent
    # directory with a glob filter on the table file.
    reader = (
        spark.readStream.schema(batch_schema)
        .option("basePath", sf_dir)
        .option("pathGlobFilter", "events.parquet")
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    df = reader.parquet(sf_dir)
    for field in df.schema.fields:
        if field.name == "ts" and isinstance(field.dataType, T.LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif field.name == "ts" and isinstance(field.dataType, T.TimestampNTZType):
            # Watermarks require TIMESTAMP (LTZ).  Rebuild from wall-clock
            # epoch micros — timezone-free, so the instant is identical in
            # any session timezone (epoch_us is the NTZ-safe micros).
            from clickbom_spark.queries import epoch_us

            df = df.withColumn("ts", F.timestamp_micros(epoch_us("ts")))
    return df


def dedup_within_watermark(
    events: DataFrame,
    keys: list[str],
    watermark: str = "1 hour",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming dedup: drop rows whose key was already seen within the
    watermark horizon — state is evicted as the watermark advances, so
    memory is bounded (the unbounded-state version of U2's
    dropDuplicates).  Works on batch DataFrames too (plain dedup)."""
    if events.isStreaming:
        return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            keys
        )
    return events.dropDuplicates(keys)


def run_to_memory_sink(
    stream_df: DataFrame, query_name: str, timeout_s: int = 120
) -> None:
    """Run an availableNow pass into an in-memory table (tests/dev)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete" if _has_aggregation(stream_df) else "append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_s)


def write_foreach_batch(
    stream_df: DataFrame,
    batch_fn: Callable[[DataFrame, int], None],
    checkpoint_dir: str,
    output_mode: str = "update",
    timeout_s: int = 120,
) -> None:
    """foreachBatch sink: the streaming path to any batch writer (JDBC /
    ClickHouse / parquet).  Each micro-batch DataFrame is handed to
    ``batch_fn(df, epoch_id)``; exactly-once comes from the checkpoint +
    an idempotent writer (e.g. epoch-keyed partitions)."""
    q = (
        stream_df.writeStream.foreachBatch(batch_fn)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_s)


def _has_aggregation(df: DataFrame) -> bool:
    plan = df._jdf.queryExecution().logical().toString()
    return "Aggregate" in plan
