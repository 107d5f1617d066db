"""Weighted sampling (Efraimidis–Spirakis): determinism, weight
proportionality, and group semantics."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from clickbom_spark.ext.sampling import weighted_sample_per_key


def _rows():
    # two groups; group 'a' has one 50x-weight row among 99 unit rows
    rows = [(i, "a", 50.0 if i == 0 else 1.0) for i in range(100)]
    rows += [(100 + i, "b", float(i % 3)) for i in range(30)]  # some w=0
    rows += [(200, "c", None)]  # null weight: never sampled
    return rows


def test_weighted_sample_matches_local_replay(spark):
    """The sample equals a local Python replay of the exact same
    ES-key construction — membership is a pure function of (id, w)."""
    df = spark.createDataFrame(_rows(), "id long, grp string, w double")
    got = {
        (r["grp"], r["id"], r["es_rank"])
        for r in weighted_sample_per_key(df, ["grp"], "w", k=5, id_col="id").collect()
    }

    import hashlib

    def u_of(i):
        h = hashlib.md5(str(i).encode()).hexdigest()[:6]
        return (int(h, 16) + 0.5) / 16777216.0

    expected = set()
    by_grp: dict = {}
    for i, g, w in _rows():
        if w is None or w <= 0:
            continue
        by_grp.setdefault(g, []).append((round(-math.log(u_of(i)) / w, 10), i))
    for g, items in by_grp.items():
        items.sort()
        for rank, (_, i) in enumerate(items[:5], 1):
            expected.add((g, i, rank))
    assert got == expected


def test_weighted_sample_favors_heavy_rows(spark):
    """Across many disjoint trials (distinct groups), the 50x-weight
    row must be sampled at k=1 far more often than any unit row."""
    rows = []
    for t in range(200):
        for j in range(10):
            rows.append((t * 1000 + j, f"g{t}", 50.0 if j == 0 else 1.0))
    df = spark.createDataFrame(rows, "id long, grp string, w double")
    out = weighted_sample_per_key(df, ["grp"], "w", k=1, id_col="id").collect()
    heavy_wins = sum(1 for r in out if r["id"] % 1000 == 0)
    # P(heavy wins) = 50/59 ≈ 0.85; 200 trials → far above half
    assert len(out) == 200
    assert heavy_wins > 140, heavy_wins


def test_weighted_sample_small_groups_keep_all_positive(spark):
    df = spark.createDataFrame(
        [(1, "x", 2.0), (2, "x", 1.0), (3, "x", 0.0)], "id long, grp string, w double"
    )
    out = weighted_sample_per_key(df, ["grp"], "w", k=5, id_col="id").collect()
    assert {r["id"] for r in out} == {1, 2}
    assert {r["es_rank"] for r in out} == {1, 2}


def test_weighted_sample_excludes_nan_weights(spark):
    """NaN weights (e.g. 0/0 from an upstream ratio) must never enter
    the sample — Spark orders NaN above all numbers, so a bare w > 0
    gate would admit them."""
    df = spark.createDataFrame(
        [(1, "x", 2.0), (2, "x", float("nan")), (3, "x", 1.0)],
        "id long, grp string, w double",
    )
    out = weighted_sample_per_key(df, ["grp"], "w", k=5, id_col="id").collect()
    assert {r["id"] for r in out} == {1, 3}
