"""Reference-implementation tests for the round-9 operators: each
Spark op is pinned against a transparent Python reimplementation (or a
hand-worked truth table) on data small enough to verify by eye."""

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


def test_window_funnel_strict_order_truth_table(spark):
    # A B D C: default reaches 3; strict_order stops at D with depth 2
    seq = [(1, 1), (2, 2), (3, 0), (4, 3)]
    assert _funnel(spark, seq, "default") == 3
    assert _funnel(spark, seq, "strict_order") == 2
    # D A B C: foreign event BEFORE the chain is harmless
    seq = [(1, 0), (2, 1), (3, 2), (4, 3)]
    assert _funnel(spark, seq, "strict_order") == 3
    # A B C D: kill after completion keeps the achieved depth
    seq = [(1, 1), (2, 2), (3, 3), (4, 0)]
    assert _funnel(spark, seq, "strict_order") == 3
    # A D A B C: first chain killed at 1, fresh chain completes
    seq = [(1, 1), (2, 0), (3, 1), (4, 2), (5, 3)]
    assert _funnel(spark, seq, "strict_order") == 3
    # A B D A B: best-before-kill (2) beats the live chain (2) — and
    # the kill does not let the stale B extend the new chain's window
    seq = [(1, 1), (2, 2), (3, 0), (4, 1), (5, 2)]
    assert _funnel(spark, seq, "strict_order") == 2
    # window still enforced from chain start in strict mode
    seq = [(1, 1), (2, 2), (5000, 3)]
    assert _funnel(spark, seq, "strict_order") == 2


def test_window_funnel_mode_validation(spark):
    import pytest

    from clickbom_spark.ext.sequences import window_funnel_level

    df = spark.createDataFrame([("u", 1, 1, 1)],
                               "k string, t long, tie long, l int")
    with pytest.raises(ValueError, match="mode"):
        window_funnel_level(df, ["k"], F.col("t"), F.col("tie"),
                            F.col("l"), 3, 10, mode="strict_dedup")


def _geohash_ref(lat: float, lon: float, length: int = 8) -> str:
    """Independent textbook geohash: binary subdivision of the
    lat/lon ranges, 5 bits per base32 char, even bits longitude."""
    b32 = "0123456789bcdefghjkmnpqrstuvwxyz"
    lat_rng, lon_rng = [-90.0, 90.0], [-180.0, 180.0]
    bits, out, even = 0, [], True
    ch = 0
    while len(out) < length:
        rng, x = (lon_rng, lon) if even else (lat_rng, lat)
        mid = (rng[0] + rng[1]) / 2
        ch <<= 1
        if x >= mid:
            ch |= 1
            rng[0] = mid
        else:
            rng[1] = mid
        even = not even
        bits += 1
        if bits == 5:
            out.append(b32[ch])
            bits, ch = 0, 0
    return "".join(out)


def test_geohash_expr_matches_textbook_encoder(spark):
    """The integer-arithmetic geohash must agree with the classic
    binary-subdivision encoder on grid-aligned coordinates."""
    from clickbom_spark.queries.staged_r9 import _geohash_expr

    cases = [(14764, 19040), (0, 0), (17999, 35999), (9000, 18000),
             (4321, 29876)]
    df = spark.createDataFrame(cases, "lat_e2 long, lon_e2 long")
    from pyspark.sql import functions as FF
    got = [
        r["g"]
        for r in df.select(
            FF.expr(_geohash_expr("lat_e2", "lon_e2", "DIV")).alias("g")
        ).collect()
    ]
    want = [
        _geohash_ref(lat_e2 / 100.0 - 90.0, lon_e2 / 100.0 - 180.0)
        for lat_e2, lon_e2 in cases
    ]
    assert got == want
