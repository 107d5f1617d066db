"""Deterministic weighted sampling without replacement.

Efraimidis–Spirakis (2006) exponential-sort sampling: give each row
the key ``-ln(u) / w`` (u uniform, w its weight) and keep the k
SMALLEST keys — exactly a weighted sample without replacement, and
per-group it is one window top-k.

Spark shape: u is derandomized through the portable md5-hex uniform
(the repo's standard trick), so membership is a pure function of the
row id — reproducible under any partitioning, identical in any engine,
and therefore fully SQL-oracle-checkable.  Everything is built-in
expressions + one partitioned window; the per-group top-k never forms
a global sort.

This is the "sample 10k docs per domain, proportional to quality
weight" primitive of a curation pipeline — the weighted counterpart of
the deterministic hash sample (`q_hash_sample`) and stratified sample
(`q_stratified_sample`).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def uniform_of(id_col: Column) -> Column:
    """Deterministic (0,1) uniform from a row id: md5 hex prefix over
    16^6 with a half-step offset — the same portable construction as
    the DSIR Gumbel draw (any engine recomputes it bit-for-bit)."""
    return (
        F.conv(F.substring(F.md5(id_col.cast("string")), 1, 6), 16, 10).cast(
            "double"
        )
        + 0.5
    ) / F.lit(16777216.0)


def es_key(id_col: Column, weight: Column) -> Column:
    """Efraimidis–Spirakis sort key ``-ln(u)/w``; rows with
    non-positive, null, or NaN weight get NULL (excluded by the rank —
    NaN must be tested explicitly because Spark orders NaN above every
    number, so a bare ``w > 0`` would let a corrupt 0/0 quality ratio
    into the sample)."""
    w = weight.cast("double")
    return F.when((w > 0) & ~F.isnan(w), -F.log(uniform_of(id_col)) / w)


def weighted_sample_per_key(
    df: DataFrame,
    key_cols: Sequence[str],
    weight_col: str,
    k: int,
    id_col: str,
    key_out: str = "es_key",
    rank_out: str = "es_rank",
) -> DataFrame:
    """k-per-group weighted sample without replacement (deterministic).

    Adds ``key_out`` (the ES key, rounded to 10 decimals for
    engine-portable tie behavior) and ``rank_out`` (1..k within each
    group, ordered by key ascending with the row id as tie-break), and
    keeps only the sampled rows.  Groups smaller than k keep all their
    positive-weight rows.  Zero/negative/null weights never qualify.
    """
    key = F.round(es_key(F.col(id_col), F.col(weight_col)), 10)
    w = Window.partitionBy(*key_cols).orderBy(key_out, id_col)
    return (
        df.withColumn(key_out, key)
        .where(F.col(key_out).isNotNull())
        .withColumn(rank_out, F.row_number().over(w).cast("long"))
        .where(F.col(rank_out) <= k)
    )
