"""Reference-implementation tests for the round-11 operators: each
Spark op is pinned against a hand-worked truth table on data small
enough to verify by eye."""

from __future__ import annotations

from pyspark.sql import functions as F


def _funnel(spark, seq, mode, window_us=1000):
    """seq: list of (t, level) for one user."""
    from clickbom_spark.ext.sequences import window_funnel_level

    df = spark.createDataFrame(
        [("u", t, i, l) for i, (t, l) in enumerate(seq)],
        "k string, t long, tie long, l int",
    )
    rows = window_funnel_level(
        df, ["k"], F.col("t"), F.col("tie"), F.col("l"),
        n_levels=3, window_us=window_us, mode=mode,
    ).collect()
    return rows[0]["funnel_level"]


def test_window_funnel_strict_deduplication_truth_table(spark):
    # A B B C: the repeated B finds its slot already set -> interrupt,
    # achieved depth 2 is final (the later C is never processed)
    assert _funnel(spark, [(1, 1), (2, 2), (3, 2), (4, 3)],
                   "strict_deduplication") == 2
    # A B C: clean chain unaffected
    assert _funnel(spark, [(1, 1), (2, 2), (3, 3)],
                   "strict_deduplication") == 3
    # A A B: repeated level-1 events just overwrite the chain start
    # (ClickHouse's unconditional first-slot write) — no interruption
    assert _funnel(spark, [(1, 1), (2, 1), (3, 2)],
                   "strict_deduplication") == 2
    # B A B: the first B matches nothing (no chain yet), the second
    # advances the A-chain — slot was never set, so no interruption
    assert _funnel(spark, [(1, 2), (2, 1), (3, 2)],
                   "strict_deduplication") == 2
    # A B C C: the duplicate C interrupts and returns ITS condition
    # number (3) — here equal to the achieved depth
    assert _funnel(spark, [(1, 1), (2, 2), (3, 3), (4, 3)],
                   "strict_deduplication") == 3
    # A B C B: ClickHouse early-returns the DUPLICATE's condition
    # number (2) even though depth 3 was already achieved — the
    # AggregateFunctionWindowFunnel `return events_list[i].second`
    assert _funnel(spark, [(1, 1), (2, 2), (3, 3), (4, 2)],
                   "strict_deduplication") == 2
    # interruption also blocks LATER deepening: A B B ... C stays 2
    assert _funnel(spark, [(1, 1), (2, 2), (3, 2), (10, 3)],
                   "strict_deduplication") == 2
    # window still enforced from chain start
    assert _funnel(spark, [(1, 1), (5000, 2)],
                   "strict_deduplication") == 1


def test_window_funnel_strict_increase_truth_table(spark):
    # equal timestamps stall the chain: B at the same instant as A
    # cannot advance (last-step time must be STRICTLY before)
    assert _funnel(spark, [(1, 1), (1, 2)], "strict_increase") == 1
    # strictly increasing chain completes
    assert _funnel(spark, [(1, 1), (2, 2), (3, 3)],
                   "strict_increase") == 3
    # C sharing B's timestamp stalls at 2; a later C would finish
    assert _funnel(spark, [(1, 1), (2, 2), (2, 3)],
                   "strict_increase") == 2
    assert _funnel(spark, [(1, 1), (2, 2), (2, 3), (3, 3)],
                   "strict_increase") == 3
    # default mode allows the equal-timestamp advance (contrast)
    assert _funnel(spark, [(1, 1), (1, 2)], "default") == 2
    # a LATER A re-anchors the chain; B after it still advances
    assert _funnel(spark, [(1, 1), (5, 1), (6, 2)],
                   "strict_increase") == 2
    # window from chain start still enforced
    assert _funnel(spark, [(1, 1), (5000, 2)], "strict_increase") == 1


def test_window_funnel_unknown_mode_raises(spark):
    import pytest

    from clickbom_spark.ext.sequences import window_funnel_level

    df = spark.createDataFrame([("u", 1, 1, 1)],
                               "k string, t long, tie long, l int")
    with pytest.raises(ValueError, match="mode"):
        window_funnel_level(df, ["k"], F.col("t"), F.col("tie"),
                            F.col("l"), 3, 10, mode="bogus")
