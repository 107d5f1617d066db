"""Distributed gradient-descent training of a linear quality
classifier — the "train a fastText-style quality filter on the
corpus" step of a curation pipeline, expressed the Spark-native way:
the model lives on the driver (like k-means centers, the BPE rule
list, or PageRank's dangling mass), each epoch is ONE hash-free
aggregate over the feature frame computing the full-batch gradient,
and executors never see Python.

Engine-portable by construction, so a SQL oracle can replay training
bit-for-bit:

- the sigmoid is the algebraic "fast sigmoid" 0.5 + z/(2(1+|z|)) —
  only +,*,/,abs, all IEEE-correctly-rounded, no libm exp() whose ULP
  drift differs across engines (its 0.5-crossing at z=0 matches the
  logistic, so decision accuracy is the standard one);
- per-row gradient terms are rounded to 9 decimals and cast to
  decimal(22,9) before summing (the repo's standard portable-sum
  pattern, cf. queries/text.py quality scores and PageRank's rounded
  contributions): decimal sums are exact and ORDER-INDEPENDENT, so
  the learned weights do not depend on partitioning;
- weight updates are scalar double arithmetic on the driver.

At 100 TB: one corpus scan per epoch over a persisted slim feature
projection (4 doubles + label per doc), each epoch a map-side-combined
aggregate shuffling one row per partition — the textbook full-batch GD
shape on a cluster.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

GRAD_DECIMALS = 9
_GRAD_DEC_T = "decimal(22,9)"


def fast_sigmoid(z: Column) -> Column:
    """0.5 + z / (2·(1+|z|)) — algebraic sigmoid, exact cross-engine."""
    return F.lit(0.5) + z / (F.lit(2.0) * (F.lit(1.0) + F.abs(z)))


def dot(weights: Sequence[float], feature_cols: Sequence[str]) -> Column:
    """Left-associated w·x with the weights as plan literals."""
    z = F.lit(float(weights[0])) * F.col(feature_cols[0])
    for w, c in zip(weights[1:], feature_cols[1:]):
        z = z + F.lit(float(w)) * F.col(c)
    return z


def logreg_train_gd(
    features: DataFrame,
    feature_cols: Sequence[str],
    label_col: str,
    lr: float = 4.0,
    epochs: int = 3,
) -> list[list[float]]:
    """Full-batch gradient descent from w=0; returns the weight vector
    after every epoch (``epochs`` rows of ``len(feature_cols)``).

    Each epoch collects one aggregate row: the per-feature mean of
    round((sigmoid(w·x) - y)·x_j, 9) summed exactly in decimal.  The
    caller should persist ``features`` (it is scanned once per epoch).
    """
    w = [0.0] * len(feature_cols)
    history: list[list[float]] = []
    for _ in range(epochs):
        err = fast_sigmoid(dot(w, feature_cols)) - F.col(label_col)
        aggs = [
            (
                F.sum(
                    F.round(err * F.col(c), GRAD_DECIMALS).cast(_GRAD_DEC_T)
                ).cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias(f"g{j}")
            for j, c in enumerate(feature_cols)
        ]
        row = features.agg(*aggs).collect()[0]
        if row["g0"] is None:
            raise ValueError(
                "logreg_train_gd: empty feature frame — the gradient "
                "mean is undefined, refusing to train a vacuous model"
            )
        w = [w[j] - lr * row[f"g{j}"] for j in range(len(feature_cols))]
        history.append(list(w))
    return history


def logreg_stats(
    features: DataFrame,
    feature_cols: Sequence[str],
    label_col: str,
    weights: Sequence[float],
) -> DataFrame:
    """One-row (n, n_correct) decision stats for a weight vector: the
    fast sigmoid crosses 0.5 exactly at z=0, so prediction is
    sign(w·x) — integer-exact cross-engine."""
    z = dot(weights, feature_cols)
    correct = (z >= 0) == (F.col(label_col) == F.lit(1.0))
    return features.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.when(correct, 1).otherwise(0)).cast("long").alias("n_correct"),
    )


def exact_auc(
    features: DataFrame, score_col: str, label_col: str
) -> DataFrame:
    """Exact ROC AUC (tie-aware Mann–Whitney U) with NO global sort:

        AUC = (Σ_{positives} avgrank(score) − n_pos(n_pos+1)/2)
              / (n_pos · n_neg)

    Scores collapse to distinct values (hash aggregate) carrying
    (count, positive count); the value-bucketed exact prefix sum
    (ext/ranks.py — no single-partition window) gives each distinct
    score its cumulative count, from which the tie-averaged rank is
    ``prefix_before + (cnt+1)/2``.  All integer arithmetic until the
    single final division, so the statistic is engine-portable
    bit-for-bit.  Returns one row (n_pos, n_neg, auc).
    """
    from clickbom_spark.ext.ranks import with_global_prefix_sum

    y = F.col(label_col).cast("double")
    s = F.col(score_col)
    per_score = (
        features.where(s.isNotNull() & y.isNotNull())
        .groupBy(s.alias("_s"))
        .agg(
            F.count(F.lit(1)).alias("_cnt"),
            F.sum(F.when(y == 1.0, 1).otherwise(0)).cast("long").alias("_pos"),
        )
    )
    pfx = with_global_prefix_sum(per_score, ["_s"], "_cnt", prefix_col="_cum")
    # tie-averaged rank summed over the positives of this score value:
    # pos * (prefix_before + (cnt+1)/2); scale by 2 to stay integral
    rank2 = F.col("_pos") * (
        2 * (F.col("_cum") - F.col("_cnt")) + F.col("_cnt") + 1
    )
    agg = pfx.agg(
        F.coalesce(F.sum("_pos"), F.lit(0)).cast("long").alias("n_pos"),
        F.coalesce(F.sum("_cnt") - F.sum("_pos"), F.lit(0))
        .cast("long")
        .alias("n_neg"),
        F.coalesce(F.sum(rank2), F.lit(0)).cast("long").alias("_r2"),
    )
    # try_divide: a one-class or empty input has no defined AUC — NULL,
    # never an ANSI divide-by-zero error or a fabricated number
    auc = F.try_divide(
        F.col("_r2").cast("double")
        - F.col("n_pos").cast("double") * (F.col("n_pos") + 1).cast("double"),
        F.lit(2.0)
        * F.col("n_pos").cast("double")
        * F.col("n_neg").cast("double"),
    )
    return agg.select("n_pos", "n_neg", auc.alias("auc"))
