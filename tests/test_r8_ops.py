"""Reference-implementation checks for the round-8 ext operators on
seeded random inputs — independent of the driver corpora, so a green
parity row can't be corpus luck.  Each distributed operator is
compared against a plain-Python reference on data small enough to
enumerate."""

from __future__ import annotations

import math
import random

import pyspark.sql.functions as F

from clickbom_spark.ext.dedup import containment_join_prefix
from clickbom_spark.ext.graph import bfs_distances
from clickbom_spark.ext.ranks import (
    exact_weighted_quantiles_by_group,
    ks_2sample,
)


def test_containment_join_matches_bruteforce(spark):
    """Prefix filtering must be LOSSLESS for containment: every pair
    with c(a→b) >= t surfaces, none below does — including the
    awkward-threshold case (t = 2/3, whose double product can round
    either way) and fully-contained short docs."""
    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(60)]
    docs = []
    for i in range(40):
        n = rng.randint(3, 20)
        docs.append((i, rng.sample(vocab, n)))
    # plant exact containments: short docs that are subsets of long ones
    docs.append((100, docs[0][1][:4]))
    docs.append((101, docs[1][1]))  # identical token set
    t = 2 / 3
    want = set()
    for ia, wa in docs:
        for ib, wb in docs:
            if ia == ib:
                continue
            c = len(set(wa) & set(wb)) / len(set(wa))
            if c >= t:
                want.add((ia, ib))
    df = spark.createDataFrame(docs, "doc_id long, w array<string>")
    got = {
        (r["id_a"], r["id_b"])
        for r in containment_join_prefix(df, "doc_id", "w", t).collect()
    }
    assert got == want and want


def test_ks_2sample_matches_python_reference(spark):
    rng = random.Random(11)
    a = [round(rng.gauss(0, 1), 3) for _ in range(400)]
    b = [round(rng.gauss(0.4, 1.2), 3) for _ in range(300)]
    rows = [(v, 1) for v in a] + [(v, 0) for v in b]
    df = spark.createDataFrame(rows, "x double, side int").repartition(7)
    got = ks_2sample(df, "x", F.col("side") == 1).collect()[0]
    # python reference over pooled distinct values
    xs = sorted(set(a) | set(b))
    ca = cb = 0
    d = 0.0
    sa, sb = sorted(a), sorted(b)
    import bisect

    for x in xs:
        ca = bisect.bisect_right(sa, x)
        cb = bisect.bisect_right(sb, x)
        d = max(d, abs(ca / len(a) - cb / len(b)))
    assert got["n_a"] == 400 and got["n_b"] == 300
    assert abs(got["d_stat"] - d) < 1e-12


def test_bfs_distances_matches_python_bfs(spark):
    rng = random.Random(13)
    n = 120
    edges = set()
    for _ in range(260):
        u, v = rng.randrange(n), rng.randrange(n)
        if u != v:
            edges.add((u, v))
    adj: dict[int, list[int]] = {}
    for u, v in edges:
        adj.setdefault(u, []).append(v)
    # reference BFS from node 0
    from collections import deque

    dist = {0: 0}
    q = deque([0])
    while q:
        u = q.popleft()
        for v in adj.get(u, []):
            if v not in dist:
                dist[v] = dist[u] + 1
                q.append(v)
    e = spark.createDataFrame(sorted(edges), "src long, dst long")
    seeds = spark.createDataFrame([(0,)], "node long")
    got = {
        r["node"]: r["hop"] for r in bfs_distances(e, seeds).collect()
    }
    assert got == dist


def test_weighted_quantiles_by_group_matches_reference(spark):
    rng = random.Random(17)
    rows = []
    for g in ("a", "b", "c"):
        for _ in range(300):
            rows.append((g, round(rng.uniform(0, 100), 2),
                         rng.randint(1, 9)))
    # adversarial: one group dominated by a single repeated value
    rows += [("d", 5.0, 3)] * 50 + [("d", 99.0, 1)]
    df = spark.createDataFrame(rows, "g string, v double, w long")
    got = {
        r["g"]: (r["q25"], r["q50"], r["q90"])
        for r in exact_weighted_quantiles_by_group(
            df, "g", "v", "w", [0.25, 0.5, 0.9]
        ).collect()
    }

    def ref(g):
        items = sorted((v, w) for gg, v, w in rows if gg == g)
        total = sum(w for _, w in items)
        out = []
        for p in (0.25, 0.5, 0.9):
            cum = 0
            for v, w in items:
                cum += w
                if cum >= p * total:
                    out.append(v)
                    break
        return tuple(out)

    for g in ("a", "b", "c", "d"):
        assert got[g] == ref(g), g


def test_containment_prefix_never_all_pairs(spark):
    """The probe side must explode only prefix tokens: with threshold
    0.9 the prefix is ~10% of each doc, so the candidate count stays
    far below the quadratic bound on a corpus of unrelated docs."""
    rng = random.Random(23)
    vocab = [f"t{i}" for i in range(4000)]
    docs = [
        (i, rng.sample(vocab, 30)) for i in range(200)
    ]
    df = spark.createDataFrame(docs, "doc_id long, w array<string>")
    pairs = containment_join_prefix(df, "doc_id", "w", 0.9).collect()
    # unrelated random docs at 0.9 containment: essentially no pairs
    assert len(pairs) < 10


def test_math_sanity_user_entropy_formula():
    """The explicit 5-term entropy chain equals -Σ p log2 p."""
    counts = [7, 0, 3, 5, 1]
    n = sum(counts)
    want = -sum(
        (c / n) * math.log2(c / n) for c in counts if c
    )
    chain = 0.0
    for c in counts:
        chain += 0.0 if c == 0 else -(c / n) * math.log2(c / n)
    assert abs(chain - want) < 1e-15


def test_mann_whitney_matches_python_reference(spark):
    """Doubled rank sums with midrank ties vs a direct python
    computation on data dense enough to force many ties."""
    rng = random.Random(29)
    a = [rng.randint(0, 30) * 1.0 for _ in range(250)]
    b = [rng.randint(5, 40) * 1.0 for _ in range(180)]
    rows = [(v, 1) for v in a] + [(v, 0) for v in b]
    from clickbom_spark.ext.ranks import mann_whitney_u

    df = spark.createDataFrame(rows, "x double, side int").repartition(9)
    got = mann_whitney_u(df, "x", F.col("side") == 1).collect()[0]
    # reference: midranks over the pooled sample
    pooled = sorted(a + b)
    # rank of value v = average of positions of its occurrences (1-based)
    first = {}
    count = {}
    for i, v in enumerate(pooled, 1):
        first.setdefault(v, i)
        count[v] = count.get(v, 0) + 1
    r1 = sum(first[v] + (count[v] - 1) / 2 for v in a)
    u1 = len(a) * len(b) + len(a) * (len(a) + 1) / 2 - r1
    tie = sum(t**3 - t for t in count.values())
    assert got["n_a"] == 250 and got["n_b"] == 180
    assert got["u1_x2"] == int(round(2 * u1))
    assert got["tie_term"] == tie
