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
