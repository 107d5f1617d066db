"""Incremental materialized rollup via streaming foreachBatch state merge.

The streaming twin of q_agg_state_merge's contract: a rollup table
maintained incrementally — each micro-batch reduced to partial states
(exact decimal sum + count) and MERGED into the running state table —
must equal the one-shot batch aggregate after the replay, regardless
of how the changelog is sliced into micro-batches.  This is how a
100 TB pipeline keeps dashboards fresh without rescanning: per-batch
work is O(batch + |keys|), never O(history).
"""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from clickbom_spark.session import read_table
from tests.conftest import SF_SMOKE


def _partial_states(df):
    return df.groupBy("event_type").agg(
        F.sum(F.col("value").cast("decimal(18,2)")).alias("state_sum"),
        F.count(F.lit(1)).alias("state_cnt"),
    )


def test_incremental_rollup_equals_batch(spark):
    events = read_table(spark, SF_SMOKE, "events")
    with tempfile.TemporaryDirectory() as d:
        src = f"{d}/src"
        events.repartition(5).write.parquet(src)  # 5 micro-batches

        state = {}  # event_type -> (Decimal sum, int count)

        def merge_batch(batch_df, _epoch):
            for r in _partial_states(batch_df).collect():
                s, c = state.get(r.event_type, (0, 0))
                state[r.event_type] = (s + r.state_sum, c + r.state_cnt)

        stream = (
            spark.readStream.schema(events.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = stream.writeStream.foreachBatch(merge_batch).trigger(
            availableNow=True
        ).start()
        q.awaitTermination(120)

        batch = {
            r.event_type: (r.state_sum, r.state_cnt)
            for r in _partial_states(events).collect()
        }
        assert state == batch


def test_incremental_rollup_slicing_invariant(spark):
    """Different micro-batch slicings converge to the same states."""
    events = read_table(spark, SF_SMOKE, "events")
    results = []
    for n_files in (2, 7):
        with tempfile.TemporaryDirectory() as d:
            src = f"{d}/src"
            events.repartition(n_files).write.parquet(src)
            state = {}

            def merge_batch(batch_df, _epoch, state=state):
                for r in _partial_states(batch_df).collect():
                    s, c = state.get(r.event_type, (0, 0))
                    state[r.event_type] = (s + r.state_sum, c + r.state_cnt)

            stream = (
                spark.readStream.schema(events.schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(src)
            )
            q = stream.writeStream.foreachBatch(merge_batch).trigger(
                availableNow=True
            ).start()
            q.awaitTermination(120)
            results.append(state)
    assert results[0] == results[1]
