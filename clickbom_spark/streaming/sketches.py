"""Streaming bounded-memory frequency and quantile sketches.

``streaming_heavy_hitters``: the streaming twin of
``ext.sketches.heavy_hitters`` — a Misra–Gries summary maintained in
KEYED STATE across micro-batches, for streams whose key cardinality
exceeds what an exact streaming ``groupBy().count()`` could hold.

``streaming_quantile_sketch``: the streaming twin of
``ext.sketches.quantile_sketch`` — per-bucket KLL compactor summaries
whose latest union is a weight-exact summary of the whole stream.

Both kernels delegate their core update steps to ``ext.sketches``
(``mg_ingest`` / ``kll_compact``): the invariants — the MG survival
bound and KLL weight conservation — are load-bearing for the batch
twins' consumers, so exactly one implementation of each may exist.

State layout: the stream is bucketed by a deterministic hash of the
value into ``n_buckets`` groups; each bucket's state is one summary,
serialized as parallel arrays — bounded regardless of how many
distinct values the stream carries.  Nulls are filtered before
bucketing (matching the batch twins' non-null contracts); NaN is
additionally excluded from the quantile sketch (it has no rank).
The per-batch output emits each touched bucket's complete current
summary; downstream replaces per bucket and either recounts exactly
(the batch operator's pattern) or estimates from the union.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from clickbom_spark.ext.sketches import hll_bucket_rho, kll_compact, mg_ingest

HH_OUTPUT_SCHEMA = "bucket int, value string, est_count long, n_bucket long"
HH_STATE_SCHEMA = "vals array<string>, cnts array<long>, n long"


def _bucket_of(value_str, n_buckets: int):
    return F.pmod(
        F.conv(F.substring(F.md5(value_str), 1, 6), 16, 10).cast("int"),
        F.lit(n_buckets),
    )


def _mg_update(k: int):
    def fn(
        key: tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            vals, cnts, n = state.get
            counters = dict(zip(list(vals), [int(c) for c in cnts]))
            n = int(n)
        else:
            counters, n = {}, 0
        for pdf in batches:
            n += len(pdf)
            vc = pdf["value"].value_counts(dropna=False)
            mg_ingest(counters, dict(vc.items()), k)
        state.update((list(counters.keys()), list(counters.values()), n))
        yield pd.DataFrame(
            {
                "bucket": [key[0]] * len(counters),
                "value": list(counters.keys()),
                "est_count": list(counters.values()),
                "n_bucket": [n] * len(counters),
            }
        )

    return fn


def streaming_heavy_hitters(
    events: DataFrame, value_col: str, n_buckets: int = 8, k: int = 16
) -> DataFrame:
    """Bounded-memory streaming heavy hitters over ``value_col``.

    Emits, per micro-batch, the current MG candidates of every bucket
    the batch touched: (bucket, value, est_count lower bound,
    n_bucket).  Total state is ≤ n_buckets × k counters regardless of
    the stream's distinct-value cardinality — the property an exact
    streaming count cannot offer.  Nulls are excluded, matching the
    batch twin's non-null N.
    """
    v = F.col(value_col).cast("string")
    bucketed = events.where(F.col(value_col).isNotNull()).select(
        _bucket_of(v, n_buckets).alias("bucket"), v.alias("value")
    )
    return bucketed.groupBy("bucket").applyInPandasWithState(
        _mg_update(k),
        outputStructType=HH_OUTPUT_SCHEMA,
        stateStructType=HH_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---- Streaming HyperLogLog registers ------------------------------------


def streaming_hll_registers(
    events: DataFrame, value_col: str, p: int = 8
) -> DataFrame:
    """Streaming HLL distinct-count state — the third streaming sketch,
    and the one that needs NO custom state handler: registers are a
    monotone per-bucket ``max(rho)``, which Structured Streaming's
    built-in stateful aggregation maintains exactly (update mode emits
    each touched bucket's current register per micro-batch).  State is
    ≤ 2^p rows forever, and the latest registers equal the batch
    twin's on the same prefix — merge/union semantics come free from
    max's monotonicity.  Estimate downstream with
    ``ext.sketches.hll_estimate`` after spine-filling, or the
    spine-free math of ``hll_distinct_by``.
    """
    bucket, rho = hll_bucket_rho(F.col(value_col), p)
    return (
        events.where(F.col(value_col).isNotNull())
        .select(bucket.alias("bucket"), rho.alias("rho"))
        .groupBy("bucket")
        .agg(F.max("rho").alias("rho"))
    )


# ---- Streaming KLL-style quantile sketch --------------------------------

QS_OUTPUT_SCHEMA = "bucket int, value double, weight long, n_bucket long"
QS_STATE_SCHEMA = "vals array<double>, lvls array<int>, flips array<int>, n long"


def _kll_update(k: int):
    def fn(
        key: tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            vals, lvls, flips_arr, n = state.get
            n_levels = (max(lvls) + 1) if len(lvls) else 1
            n_levels = max(n_levels, len(flips_arr))
            levels: list[list] = [[] for _ in range(n_levels)]
            for v, l in zip(vals, lvls):
                levels[l].append(float(v))
            flips = [int(f) for f in flips_arr] + [0] * (
                n_levels - len(flips_arr)
            )
            n = int(n)
        else:
            levels, flips, n = [[]], [0], 0

        for pdf in batches:
            for v in pdf["value"]:
                n += 1
                levels[0].append(float(v))
                if len(levels[0]) >= k:
                    kll_compact(levels, flips, k)

        out_vals, out_lvls, out_w = [], [], []
        for l, buf in enumerate(levels):
            for v in buf:
                out_vals.append(v)
                out_lvls.append(l)
                out_w.append(1 << l)
        state.update((out_vals, out_lvls, flips, n))
        yield pd.DataFrame(
            {
                "bucket": [key[0]] * len(out_vals),
                "value": out_vals,
                "weight": out_w,
                "n_bucket": [n] * len(out_vals),
            }
        )

    return fn


def streaming_quantile_sketch(
    events: DataFrame, value_col: str, n_buckets: int = 4, k: int = 128
) -> DataFrame:
    """Streaming KLL quantile summary in bounded keyed state.

    Values hash into ``n_buckets`` groups, each maintaining one KLL
    compactor sketch across micro-batches; every touched bucket emits
    its complete current (value, weight) summary per batch.  The UNION
    of the latest per-bucket summaries is a weight-exact summary of the
    whole stream (Σ weight = non-null, non-NaN rows seen), consumable
    by ``ext.sketches.approx_quantiles_from_sketch`` — the streaming
    analog of ClickHouse's quantileState merge tree.  State per bucket
    is O(k·log(n/k)) values regardless of stream length.
    """
    c = F.col(value_col).cast("double")
    bucketed = events.where(c.isNotNull() & ~F.isnan(c)).select(
        _bucket_of(c.cast("string"), n_buckets).alias("bucket"),
        c.alias("value"),
    )
    return bucketed.groupBy("bucket").applyInPandasWithState(
        _kll_update(k),
        outputStructType=QS_OUTPUT_SCHEMA,
        stateStructType=QS_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
