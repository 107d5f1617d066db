"""Empty-input behavior of the round-5 operators: a filter that
matches nothing must flow through every operator without crashing and
with the mathematically right degenerate answer."""

from __future__ import annotations

import math

from pyspark.sql import functions as F


def _empty(spark, schema: str):
    return spark.createDataFrame([], schema)


def test_heavy_hitters_empty(spark):
    from clickbom_spark.ext.sketches import (
        heavy_hitters,
        heavy_hitters_by,
        heavy_hitters_weighted,
    )

    e = _empty(spark, "v string, w long, g string")
    assert heavy_hitters(e, "v", k=4).count() == 0
    assert heavy_hitters_weighted(e, "v", "w", k=4).count() == 0
    assert heavy_hitters_by(e, "v", ["g"], k=4).count() == 0


def test_quantile_sketch_empty(spark):
    from clickbom_spark.ext.sketches import (
        approx_quantiles_from_sketch,
        quantile_sketch,
    )

    sk = quantile_sketch(_empty(spark, "x double"), "x")
    assert sk.count() == 0
    (est,) = approx_quantiles_from_sketch(sk, [0.5])
    assert math.isnan(est)


def test_hll_empty_estimates_zero(spark):
    from clickbom_spark.ext.sketches import (
        hll_distinct_by,
        hll_estimate,
        hll_registers,
    )

    regs = hll_registers(_empty(spark, "v long"), "v", p=8)
    assert regs.count() == 256
    est = hll_estimate(regs, p=8).collect()[0]["est_hll"]
    assert est == 0.0  # linear counting with all buckets empty
    assert hll_distinct_by(
        _empty(spark, "v long, g string"), "v", ["g"]
    ).count() == 0


def test_sequence_ops_empty_and_no_matching_levels(spark):
    from clickbom_spark.ext.sequences import (
        sequence_count,
        window_funnel_level,
    )

    e = _empty(spark, "user_id long, t long, event_id long, l int")
    assert window_funnel_level(
        e, ["user_id"], F.col("t"), F.col("event_id"), F.col("l"), 3, 100
    ).count() == 0
    df = spark.createDataFrame([("",), ("xyz",)], "seq string")
    got = df.select(sequence_count(F.col("seq"), ["v", "c"]).alias("c")).collect()
    assert [r["c"] for r in got] == [0, 0]


def test_weighted_quantiles_and_auc_empty(spark):
    from clickbom_spark.ext.learn import exact_auc
    from clickbom_spark.ext.ranks import exact_weighted_quantiles

    wq = exact_weighted_quantiles(
        _empty(spark, "v double, w long"), "v", "w", [0.5]
    ).collect()[0]
    assert wq["q50"] is None
    auc = exact_auc(
        _empty(spark, "score double, y double"), "score", "y"
    ).collect()[0]
    assert auc["n_pos"] == 0 and auc["n_neg"] == 0
    # 0/0 — no defined AUC; must be NaN/None, never a fabricated number
    assert auc["auc"] is None or math.isnan(auc["auc"])


def test_triangle_count_empty_and_single_edge(spark):
    from clickbom_spark.ext.graph import triangle_count

    assert (
        triangle_count(_empty(spark, "u long, v long")).collect()[0][
            "n_triangles"
        ]
        == 0
    )
    one = spark.createDataFrame([(1, 2)], "u long, v long")
    row = triangle_count(one).collect()[0]
    assert (row["n_nodes"], row["n_edges"], row["n_triangles"]) == (2, 1, 0)


def test_gd_training_empty_raises_cleanly(spark):
    """Training on zero rows cannot produce a model — the gradient
    mean is undefined; assert the failure is a clean ZeroDivision-like
    signal, not a silent NaN model."""
    from clickbom_spark.ext.learn import logreg_train_gd

    import pytest

    e = _empty(spark, "y double, x0 double")
    with pytest.raises(ValueError, match="empty feature frame"):
        logreg_train_gd(e, ["x0"], "y", epochs=1)
