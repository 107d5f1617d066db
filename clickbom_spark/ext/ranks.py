"""Distributed exact global rank — the scale-safe total order.

A total-order window (``Window.orderBy`` with no ``partitionBy``)
funnels the entire relation through ONE task: correct at test scale,
the textbook killer at 100 TB.  This module computes the same exact
1-indexed global rank with a two-pass range-bucket plan that stays
partition-parallel end to end:

1. a cheap boundary pass derives ~``num_buckets`` value cut points for
   the leading order column via ``approxQuantile``.  The approximation
   only moves rows between buckets (load balance), it can never change
   a row's rank, because
2. rows are assigned a bucket BY VALUE (a deterministic expression, so
   re-executing the plan is safe — no reliance on physical partition
   ids), per-bucket counts roll into cumulative offsets (a tiny frame,
   one row per bucket, broadcast back), and the exact rank is
   ``bucket offset + partition-local row_number``.

Ties on the leading column always land in the same bucket, so any
tie-break columns in ``order_cols`` are resolved entirely inside the
partition-local window — the composite order is exact.

The only single-partition work is the window over the per-bucket count
frame (≤ ``num_buckets`` rows) — O(buckets), not O(rows).

Requirements: the leading order column must be numeric and non-null.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _bucket_boundaries(
    df: DataFrame, order_col: str, num_buckets: int, rel_err: float = 0.001
) -> list[float]:
    """Interior quantile cut points of ``order_col``, deduplicated
    ascending (skewed data may collapse cut points — buckets then merge,
    which costs balance, never correctness)."""
    probs = [i / num_buckets for i in range(1, num_buckets)]
    vals = df.select(F.col(order_col).cast("double").alias("_ord")).stat.approxQuantile(
        "_ord", probs, rel_err
    )
    out: list[float] = []
    for v in vals:
        if not out or v > out[-1]:
            out.append(v)
    return out


def with_global_rank(
    df: DataFrame,
    order_cols: Sequence[str],
    rank_col: str = "_rank",
    total_col: str | None = None,
    num_buckets: int | None = None,
) -> DataFrame:
    """Add an exact 1-indexed global rank over ``order_cols`` (ascending)
    without a single-partition sort.

    Optionally also adds ``total_col`` = total row count (useful for
    rank-derived statistics like NTILE or percent_rank).  The input is
    scanned twice (boundary pass + rank pass) — persist upstream frames
    that are expensive to recompute.
    """
    lead = order_cols[0]
    if num_buckets is None:
        num_buckets = df.sparkSession.sparkContext.defaultParallelism
    bounds = _bucket_boundaries(df, lead, num_buckets)
    lead_d = F.col(lead).cast("double")
    # NULL lead values sort FIRST (Spark's ascending default), so they
    # belong in bucket 0 — made explicit here because a NULL comparison
    # would otherwise produce a NULL bucket and the offset equi-join
    # would silently DROP those rows.
    bkt = F.lit(0)
    for b in bounds:
        bkt = bkt + F.coalesce(
            (lead_d >= F.lit(b)).cast("int"), F.lit(0)
        )
    bucketed = df.withColumn("_bkt", bkt)

    cnt = bucketed.groupBy("_bkt").agg(F.count(F.lit(1)).alias("_cnt"))
    w_off = Window.orderBy("_bkt").rowsBetween(Window.unboundedPreceding, -1)
    w_all = Window.orderBy("_bkt").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    offs = cnt.select(
        "_bkt",
        F.coalesce(F.sum("_cnt").over(w_off), F.lit(0)).alias("_off"),
        F.sum("_cnt").over(w_all).alias("_total"),
    )

    w_loc = Window.partitionBy("_bkt").orderBy(*[F.col(c) for c in order_cols])
    out = bucketed.join(F.broadcast(offs), "_bkt").withColumn(
        rank_col, (F.col("_off") + F.row_number().over(w_loc)).cast("long")
    )
    if total_col is not None:
        out = out.withColumn(total_col, F.col("_total"))
    return out.drop("_bkt", "_off", "_total")


def ntile_expr(rank, total, k: int):
    """Exact SQL ``NTILE(k)`` bucket for a 1-indexed global ``rank`` out
    of ``total`` rows, as a pure Column expression: the first
    ``total % k`` tiles hold ``total div k + 1`` rows, the rest
    ``total div k`` — identical to DuckDB/Spark NTILE semantics, but
    computable from a distributed rank instead of a total-order window.
    """
    i = rank
    q = F.floor(total / F.lit(k)).cast("long")
    r = (total % F.lit(k)).cast("long")
    big_span = r * (q + F.lit(1))
    tile_big = F.floor((i + q) / (q + F.lit(1)))
    tile_small = r + F.floor((i - big_span + q - F.lit(1)) / q)
    return F.when(i <= big_span, tile_big).otherwise(tile_small).cast("long")
