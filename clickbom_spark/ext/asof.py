"""As-of (point-in-time) join — the time-series operator Spark lacks.

For each left row, attach the single most recent right row with
``right.ts <= left.ts`` within the same key group (the semantics of
DuckDB/QuestDB ASOF JOIN and pandas merge_asof).

Implementation is the union+window trick, NOT a range join:

    tag right rows side=0, left rows side=1
    union → window per key ordered by (ts, side)
    carry = last(right_payload, ignorenulls) over rows unbounded→current
    keep left rows; their carried payload is the as-of match

Cost: one shuffle on the key + one in-partition sort — linear at any
scale, no candidate blow-up, no cross product.  Right-side payload is
packed into one struct so the window carries a single column.

A range join (equi key + ts between) is the WRONG plan for as-of: it
produces all-prior-rows candidates per left row (quadratic in the
per-key event count) before a per-left-row argmax.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: list[str],
    ts_col: str = "ts",
    right_payload: list[str] | None = None,
    suffix: str = "_r",
    direction: str = "backward",
    tolerance_us: int | None = None,
) -> DataFrame:
    """Left as-of join: every left row, plus ``<payload>{suffix}``
    columns (and ``{ts_col}{suffix}``) from the latest right row with
    ``right.{ts_col} <= left.{ts_col}`` sharing the ``by`` keys; null
    when no prior right row exists.

    ``direction`` (pandas merge_asof parity): "backward" (default)
    matches the latest right row at-or-before; "forward" the earliest
    right row at-or-after — same union+window shape with the sort
    reversed.  ``tolerance_us``: maximum staleness in microseconds
    (for timestamp ``ts_col``) or in the column's own units (numeric
    ``ts_col``); a match farther away resolves to null, exactly like
    merge_asof's tolerance.  Both knobs are post-window expressions —
    the plan stays one shuffle + one in-partition sort."""
    right_payload = right_payload or [
        c for c in right.columns if c not in by and c != ts_col
    ]
    payload = F.struct(
        F.col(ts_col).alias(ts_col + suffix),
        *[F.col(c).alias(c + suffix) for c in right_payload],
    )

    left_cols = left.columns  # includes the by keys
    r = right.select(
        *[
            (F.col(c) if c in by else F.lit(None).cast(left.schema[c].dataType)).alias(c)
            for c in left_cols
        ],
        F.col(ts_col).alias("_ts"),
        F.lit(0).alias("_side"),
        payload.alias("_rp"),
    )
    l = left.select(
        *left_cols,
        F.col(ts_col).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r.schema["_rp"].dataType).alias("_rp"),
    )
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction}")
    # at equal ts, side 0 (right) sorts first so ties match (<= / >=)
    order_ts = F.col("_ts") if direction == "backward" else F.col("_ts").desc()
    w = (
        Window.partitionBy(*by)
        .orderBy(order_ts, "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = l.unionByName(r, allowMissingColumns=False).withColumn(
        "_asof", F.last("_rp", ignorenulls=True).over(w)
    )
    match = F.col("_asof")
    if tolerance_us is not None:
        m_ts = F.col(f"_asof.{ts_col}{suffix}")
        ts_type = dict(zip(left.columns, left.schema.fields))[
            ts_col
        ].dataType.typeName()
        if ts_type.startswith("timestamp"):
            fwd = F.timestamp_diff("MICROSECOND", F.col("_ts"), m_ts)
        else:
            fwd = (m_ts - F.col("_ts")).cast("long")
        staleness = -fwd if direction == "backward" else fwd
        match = F.when(staleness <= F.lit(tolerance_us), match)
    return carried.where(F.col("_side") == 1).withColumn(
        "_asof", match
    ).select(*left_cols, F.col("_asof.*"))
