"""Laws for the distributed GD trainer (ext/learn.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from clickbom_spark.ext.learn import (
    dot,
    fast_sigmoid,
    logreg_stats,
    logreg_train_gd,
)

FEATS = ["x0", "x1"]


def _synth(spark, n=400, sep=True, parts=4):
    """Labeled points along one axis; separable at x1 = 0 when sep."""
    rows = []
    for i in range(n):
        x1 = (i - n / 2) / (n / 4)
        noise = 0.0 if sep else (0.8 if i % 7 == 0 else 0.0)
        y = 1.0 if (x1 + noise) > 0 else 0.0
        rows.append((y, 1.0, x1))
    return spark.createDataFrame(
        rows, "y double, x0 double, x1 double"
    ).repartition(parts)


def test_weights_invariant_under_partitioning(spark):
    """Decimal gradient sums are order-independent, so the learned
    weights must be bit-identical under any partitioning."""
    a = logreg_train_gd(_synth(spark, parts=1), FEATS, "y", epochs=3)
    b = logreg_train_gd(_synth(spark, parts=13), FEATS, "y", epochs=3)
    assert a == b


def test_training_reduces_error_and_separates(spark):
    df = _synth(spark).persist()
    try:
        history = logreg_train_gd(df, FEATS, "y", lr=4.0, epochs=5)

        def mse(w):
            p = fast_sigmoid(dot(w, FEATS))
            return df.agg(
                F.avg((p - F.col("y")) * (p - F.col("y")))
            ).collect()[0][0]

        assert mse(history[-1]) < mse([0.0, 0.0])  # w=0 gives 0.25
        stats = logreg_stats(df, FEATS, "y", history[-1]).collect()[0]
        assert stats["n_correct"] / stats["n"] >= 0.95
    finally:
        df.unpersist()


def test_epoch_history_is_prefix_stable(spark):
    """Epoch k's weights do not depend on how many epochs follow."""
    df = _synth(spark).persist()
    try:
        h2 = logreg_train_gd(df, FEATS, "y", epochs=2)
        h4 = logreg_train_gd(df, FEATS, "y", epochs=4)
        assert h4[:2] == h2
    finally:
        df.unpersist()


def test_exact_auc_matches_reference_with_ties(spark):
    """Distributed AUC == the textbook tie-aware Mann–Whitney AUC on
    random scores with heavy ties, and is partitioning-invariant."""
    import random

    from clickbom_spark.ext.learn import exact_auc

    rng = random.Random(9)
    rows = [
        (float(rng.randrange(0, 20)) / 10.0, float(rng.randrange(0, 2)))
        for _ in range(500)
    ]

    def ref_auc(pairs):
        pos = [s for s, y in pairs if y == 1.0]
        neg = [s for s, y in pairs if y == 0.0]
        wins = ties = 0
        for p in pos:
            for n in neg:
                if p > n:
                    wins += 1
                elif p == n:
                    ties += 1
        return (wins + 0.5 * ties) / (len(pos) * len(neg))

    df = spark.createDataFrame(rows, "score double, y double")
    got = exact_auc(df, "score", "y").collect()[0]
    assert abs(got["auc"] - ref_auc(rows)) < 1e-12
    got13 = exact_auc(df.repartition(13), "score", "y").collect()[0]
    assert got13["auc"] == got["auc"]
    # degenerate sanity: perfectly separable scores give AUC 1
    sep = spark.createDataFrame(
        [(float(i), 1.0 if i >= 50 else 0.0) for i in range(100)],
        "score double, y double",
    )
    assert exact_auc(sep, "score", "y").collect()[0]["auc"] == 1.0
