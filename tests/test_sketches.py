"""Misra–Gries heavy hitters: exactness vs full groupBy-count, the
pigeonhole completeness bound, and partitioning invariance."""

from __future__ import annotations

from pyspark.sql import functions as F

from clickbom_spark.ext.sketches import heavy_hitters


def _exact(df, col, k):
    n = df.where(F.col(col).isNotNull()).count()
    return {
        (r[col], r["cnt"])
        for r in df.where(F.col(col).isNotNull())
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") * k > F.lit(n))
        .collect()
    }


def _skewed_rows():
    # zipf-ish: 'a' x 400, 'b' x 150, 'c' x 60, long tail of singletons
    rows = ["a"] * 400 + ["b"] * 150 + ["c"] * 60
    rows += [f"t{i}" for i in range(300)]
    rows += [None] * 10
    return [(i, v) for i, v in enumerate(rows)]


def test_heavy_hitters_equals_exact_groupby(spark):
    df = spark.createDataFrame(_skewed_rows(), "id long, v string")
    for k in (4, 8, 16):
        got = {
            (r["v"], r["cnt"])
            for r in heavy_hitters(df, "v", k=k).collect()
        }
        assert got == _exact(df, "v", k), k


def test_heavy_hitters_partitioning_invariant(spark):
    """The candidate superset depends on partitioning; the final
    answer must not."""
    df = spark.createDataFrame(_skewed_rows(), "id long, v string")
    a = {
        (r["v"], r["cnt"])
        for r in heavy_hitters(df.repartition(1), "v", k=8).collect()
    }
    b = {
        (r["v"], r["cnt"])
        for r in heavy_hitters(df.repartition(13, "v"), "v", k=8).collect()
    }
    c = {
        (r["v"], r["cnt"])
        for r in heavy_hitters(df.repartition(32), "v", k=8).collect()
    }
    assert a == b == c == _exact(df, "v", k=8)


def test_heavy_hitters_no_qualifying_items(spark):
    """A uniform corpus has no item above N/k — empty result, no
    crash."""
    df = spark.createDataFrame(
        [(i, f"u{i}") for i in range(200)], "id long, v string"
    )
    assert heavy_hitters(df, "v", k=8).count() == 0


def test_heavy_hitters_rejects_reserved_column_names(spark):
    import pytest as _pytest

    df = spark.createDataFrame([(1, "a")], "id long, cnt string")
    with _pytest.raises(ValueError):
        heavy_hitters(df, "cnt", k=4)
