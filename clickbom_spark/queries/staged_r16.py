"""Staged registry wave for round 16 — new operator surface (built
during round 12; the staging pipeline runs waves ahead so every
activation is a zero-risk REGISTRY.update of parity-proven queries).

Same staging workflow as the round-6..15 waves: every query here is
oracle-parity-verified NOW (bit-exact vs DuckDB at sf0.001 and sf0.01
via ``tests/test_staged_r16_parity.py``; ``scripts/strict_parity.py
--staged`` widens the sweep to sf0.1) but held OUT of
:data:`clickbom_spark.queries.REGISTRY` until round-16 activation::

    from clickbom_spark.queries import staged_r16  # noqa: F401
    REGISTRY.update(staged_r16.STAGED_R16)

in ``queries/__init__.py``.

Round-16 themes:

* **Dialect round-trips for the round-12 additions** — the
  ``uniqExact`` state twin with a ``MergeState`` hop, contradictory
  ``WITH FILL`` bounds (no filled rows), the deterministic
  duplicate-key ``INTERPOLATE`` carry, ``uniqUpTo``, ``SAMPLE k
  OFFSET m``, and the reference's ALTER TABLE migration run verbatim
  against a VersionedLake (``apply_alter_ddl`` —
  entrypoint.sh:130-161 semantics).  The ``uniqState/uniqMerge`` MV
  idiom and the outer-join-fed ``countMerge/sumMerge`` zero-coalesce
  were pulled FORWARD into the r13 wave (VERDICT r12 #4);
  ``q_topk_user_share`` and ``q_supplier_coverage`` took their slots.
* **Corpus text analytics** — Yule's K vocabulary-richness
  characteristic, a Gini concentration coefficient over token
  frequencies via distinct-frequency prefix sums, top-token rank
  agreement per source, largest-remainder budget apportionment, and
  integer-exact document-length outlier flags.
* **Event-stream / relational profiles** — log2-banded inter-event
  gaps, MAD-based daily volume anomalies, hourly value medians, the
  props numeric profile, brand-pair basket lift, the customer→
  supplier nation trade matrix, repeat-customer shares, inactive
  customer profiles (anti-join breadth), sign-bit embedding
  hypercube density, and priority value trends with MoM deltas.

Float determinism policy (same as the registry): exact integer /
decimal aggregates first, then ONE fixed IEEE expression per surfaced
double — identical text on both engines — and ``round(x, 6)`` on
surfaced statistics.  ln() appears only inside the HLL estimate
(rounded to an integer, absorbing libm ULP drift); medians are exact
on integers/halves (dyadic rationals, cross-engine identical);
log2 bands come from binary-string lengths, never libm.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from clickbom_spark.queries import QuerySpec, load

STAGED_R16: dict[str, QuerySpec] = {}


def staged(name: str, oracle: str | None = None, description: str = "",
           bench: bool = False):
    def deco(fn):
        STAGED_R16[name] = QuerySpec(name, fn, oracle, description, bench)
        return fn

    return deco


_CENTS = "toInt64(round(value * 100))"
_CENTS_DUCK = "CAST(round(value * 100) AS BIGINT)"



# ---------------------------------------------------------------------------
# Swapped in from the round-13/round-14 waves (VERDICT r12
# next-round #4/#8c): q_word_length_distribution, q_topk_user_share
# and q_supplier_coverage took the r16 slots of the pulled-forward
# uniqState-MV, merge-NULL, and ALTER-migration round-trips.
# ---------------------------------------------------------------------------


@staged(
    "q_word_length_distribution",
    oracle="""
WITH w AS (
  SELECT least(20, CAST(len(unnest(string_split(text, ' ')))
                        AS BIGINT)) AS wl
  FROM documents WHERE text IS NOT NULL),
     tot AS (SELECT CAST(count(*) AS BIGINT) AS tot_n FROM w)
SELECT wl AS word_len, CAST(count(*) AS BIGINT) AS n,
       round(CAST(count(*) AS DOUBLE) / tot_n, 6) AS share
FROM w, tot GROUP BY wl, tot_n ORDER BY wl
""",
    description="Corpus word-length distribution (capped at 20 "
    "chars): explode feeding a partial aggregate, a 1-row total "
    "broadcast, one exact division per bucket round(6).  The "
    "length profile separates natural prose from code/URL-heavy "
    "sources in quality triage.",
)
def q_word_length_distribution(spark, sf_dir):
    (docs,) = load(spark, sf_dir, "documents")
    w = (
        docs.where(F.col("text").isNotNull())
        .select(F.explode(F.split("text", " ")).alias("w"))
        .select(
            F.least(F.lit(20), F.length("w").cast("long")).alias("wl")
        )
    )
    # NB: the total is NOT named "N" — Spark resolves columns
    # case-insensitively, so "N" would collide with the bucket "n"
    tot = w.agg(F.count(F.lit(1)).cast("long").alias("tot_n"))
    return (
        w.groupBy(F.col("wl").alias("word_len"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .crossJoin(F.broadcast(tot))
        .select(
            "word_len", "n",
            F.round(F.col("n").cast("double") / F.col("tot_n"), 6)
            .alias("share"),
        )
        .orderBy("word_len")
    )


@staged(
    "q_topk_user_share",
    oracle="""
WITH uc AS (
  SELECT CAST(user_id AS BIGINT) AS user_id,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1),
     tot AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM uc)
SELECT user_id, n, round(CAST(n AS DOUBLE) / total, 6) AS share
FROM uc, tot
ORDER BY n DESC, user_id LIMIT 10
""",
    description="Top-10 users by event volume with their share of "
    "the total: per-user counts, a 1-row total broadcast back, and "
    "a deterministic (count DESC, user_id) top-k — "
    "TakeOrderedAndProject, no global sort, no per-user window.  "
    "One exact-integer division per surfaced share, round(6).",
)
def q_topk_user_share(spark, sf_dir):
    (events,) = load(spark, sf_dir, "events")
    uc = events.groupBy(
        F.col("user_id").cast("long").alias("user_id")
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    tot = uc.agg(F.sum("n").cast("long").alias("total"))
    return (
        uc.crossJoin(F.broadcast(tot))
        .select(
            "user_id", "n",
            F.round(
                F.col("n").cast("double") / F.col("total"), 6
            ).alias("share"),
        )
        .orderBy(F.col("n").desc(), "user_id")
        .limit(10)
    )


@staged(
    "q_supplier_coverage",
    oracle="""
WITH sp AS (
  SELECT DISTINCT l_suppkey, l_partkey FROM lineitem),
     cov AS (
  SELECT CAST(l_suppkey AS BIGINT) AS s_suppkey,
         CAST(count(*) AS BIGINT) AS n_parts
  FROM sp GROUP BY 1),
     tot AS (
  SELECT CAST(count(DISTINCT p_partkey) AS BIGINT) AS total_parts
  FROM part)
SELECT s_suppkey, n_parts,
       round(CAST(n_parts AS DOUBLE) / total_parts, 6) AS coverage
FROM cov, tot
ORDER BY n_parts DESC, s_suppkey LIMIT 20
""",
    description="Supplier catalog coverage: distinct parts each "
    "supplier actually shipped (distinct pairs first — the dedup "
    "BEFORE the count keeps the aggregate additive), as a share of "
    "the full part catalog (1-row broadcast), top-20 with a "
    "deterministic tie-break.  The bipartite coverage profile "
    "drives sourcing-risk dashboards.",
)
def q_supplier_coverage(spark, sf_dir):
    lineitem, part = load(spark, sf_dir, "lineitem", "part")
    sp = lineitem.select("l_suppkey", "l_partkey").distinct()
    cov = sp.groupBy(
        F.col("l_suppkey").cast("long").alias("s_suppkey")
    ).agg(F.count(F.lit(1)).cast("long").alias("n_parts"))
    tot = part.agg(
        F.countDistinct("p_partkey").cast("long").alias("total_parts")
    )
    return (
        cov.crossJoin(F.broadcast(tot))
        .select(
            "s_suppkey", "n_parts",
            F.round(
                F.col("n_parts").cast("double") / F.col("total_parts"),
                6,
            ).alias("coverage"),
        )
        .orderBy(F.col("n_parts").desc(), "s_suppkey")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Dialect round-trip: uniqExactState → uniqExactMergeState hop →
# uniqExactMerge.  Two merge levels must equal count(DISTINCT) — the
# exact-distinct MV maintained at month grain, compacted per flag,
# then read.
# ---------------------------------------------------------------------------

_CH_UNIQ_EXACT_RT = """
SELECT rf, uniqExactMerge(m) AS sup_cnt
FROM (
  SELECT l_returnflag AS rf, uniqExactMergeState(es) AS m
  FROM (
    SELECT l_returnflag, toStartOfMonth(l_shipdate) AS mth,
           uniqExactState(l_suppkey) AS es
    FROM lineitem GROUP BY l_returnflag, mth
  ) GROUP BY l_returnflag
) GROUP BY rf ORDER BY rf
"""


@staged(
    "q_dialect_uniq_exact_rt",
    oracle="""
SELECT l_returnflag AS rf,
       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS sup_cnt
FROM lineitem GROUP BY 1 ORDER BY rf
""",
    description="uniqExactState partials per (returnflag, ship "
    "month), compacted through a uniqExactMergeState hop per flag, "
    "finalized with uniqExactMerge — two merge levels over the "
    "distinct-value set state (round-12 compile) must equal a direct "
    "count(DISTINCT): the exact-distinct AggregatingMergeTree "
    "round-trip.",
)
def q_dialect_uniq_exact_rt(spark, sf_dir):
    from clickbom_spark.dialect import run_clickhouse_sql

    out = run_clickhouse_sql(spark, _CH_UNIQ_EXACT_RT, sf_dir)
    return out.select("rf", F.col("sup_cnt").cast("long").alias("sup_cnt"))


# ---------------------------------------------------------------------------
# Dialect round-trip: WITH FILL bounds contradicting the walk
# direction.  ORDER BY d DESC WITH FILL FROM 5 TO 25 asks a downward
# walk to fill upward — ClickHouse's FillingTransform generates no
# filled rows; since round 12 (ADVICE r11 fix) the shim returns the
# ordered base instead of an opaque sequence() error.
# ---------------------------------------------------------------------------

_CH_FILL_CLIP = """
SELECT d, n FROM (
  SELECT toInt64(toDayOfMonth(ts)) AS d, count() AS n
  FROM events WHERE event_type = 'purchase' AND value > 90
  GROUP BY d)
ORDER BY d DESC WITH FILL FROM 5 TO 25
"""


@staged(
    "q_dialect_fill_bounds_clip",
    oracle="""
SELECT CAST(day(ts) AS BIGINT) AS d, CAST(count(*) AS BIGINT) AS n
FROM events WHERE event_type = 'purchase' AND value > 90
GROUP BY 1 ORDER BY d DESC
""",
    description="`ORDER BY d DESC WITH FILL FROM 5 TO 25` — bounds "
    "that contradict the downward walk.  ClickHouse generates no "
    "filled rows; the shim (round-12 ADVICE fix) detects the "
    "direction conflict before building the spine and returns the "
    "ordered base — never a sign-fighting sequence() runtime error.",
)
def q_dialect_fill_bounds_clip(spark, sf_dir):
    from clickbom_spark.dialect import run_clickhouse_sql

    out = run_clickhouse_sql(spark, _CH_FILL_CLIP, sf_dir)
    return out.select(
        F.col("d").cast("long").alias("d"),
        F.col("n").cast("long").alias("n"),
    )


# ---------------------------------------------------------------------------
# Dialect round-trip: INTERPOLATE carry over DUPLICATE fill keys.
# The base deliberately carries two rows per day (error and click
# slices unioned); filled days repeat the GREATEST carried tuple of
# the last real day — the deterministic tie-break round 12 added
# (ADVICE r11; ClickHouse's own pick is unspecified under ties).
# ---------------------------------------------------------------------------

_CH_INTERP_DUP = """
SELECT d, n FROM (
  SELECT toInt64(toDayOfMonth(ts)) AS d, count() AS n
  FROM events WHERE event_type = 'error' AND value > 200
  GROUP BY d
  UNION ALL
  SELECT toInt64(toDayOfMonth(ts)) AS d, count() AS n
  FROM events WHERE event_type = 'click' AND value > 220
  GROUP BY d)
ORDER BY d WITH FILL INTERPOLATE (n)
"""


@staged(
    "q_dialect_interpolate_dupkeys",
    oracle="""
WITH base AS (
  SELECT CAST(day(ts) AS BIGINT) AS d, CAST(count(*) AS BIGINT) AS n
  FROM events WHERE event_type = 'error' AND value > 200
  GROUP BY 1
  UNION ALL
  SELECT CAST(day(ts) AS BIGINT) AS d, CAST(count(*) AS BIGINT) AS n
  FROM events WHERE event_type = 'click' AND value > 220
  GROUP BY 1),
     bounds AS (SELECT min(d) AS lo, max(d) AS hi FROM base),
     spine AS (
  SELECT CAST(unnest(range(lo, hi + 1)) AS BIGINT) AS d FROM bounds),
     fills AS (
  SELECT s.d,
         (SELECT max(b2.n) FROM base b2
          WHERE b2.d = (SELECT max(b3.d) FROM base b3
                        WHERE b3.d <= s.d)) AS n
  FROM spine s WHERE s.d NOT IN (SELECT d FROM base))
SELECT d, n FROM base
UNION ALL
SELECT d, CAST(n AS BIGINT) AS n FROM fills
ORDER BY d
""",
    description="WITH FILL INTERPOLATE over a base holding TWO real "
    "rows per day (error + click slices unioned): both real rows "
    "survive the fill untouched, and filled days carry the GREATEST "
    "tuple of the last real day — the deterministic duplicate-key "
    "tie-break round 12 added to the carry window (ADVICE r11; "
    "ClickHouse carries 'the last row in its output order', itself "
    "unspecified under ties).  The oracle replays the rule as "
    "max(n) at the latest at-or-before real day.",
)
def q_dialect_interpolate_dupkeys(spark, sf_dir):
    from clickbom_spark.dialect import run_clickhouse_sql

    out = run_clickhouse_sql(spark, _CH_INTERP_DUP, sf_dir)
    return out.select(
        F.col("d").cast("long").alias("d"),
        F.col("n").cast("long").alias("n"),
    )


# ---------------------------------------------------------------------------
# Dialect round-trip: uniqUpTo(k)(x) — ClickHouse's capped distinct
# count (exact up to k, k+1 beyond).  Compiles to
# least(count(DISTINCT x), k + 1): exact, so the oracle is exact.
# ---------------------------------------------------------------------------

_CH_UNIQ_UPTO = """
SELECT event_type AS et,
       uniqUpTo(5)(user_id) AS u5,
       uniqUpTo(200)(user_id) AS u200
FROM events GROUP BY event_type ORDER BY et
"""


@staged(
    "q_dialect_uniq_upto",
    oracle="""
SELECT event_type AS et,
       CAST(least(count(DISTINCT user_id), 6) AS BIGINT) AS u5,
       CAST(least(count(DISTINCT user_id), 201) AS BIGINT) AS u200
FROM events GROUP BY 1 ORDER BY et
""",
    description="uniqUpTo(k)(x) — exact distinct count capped at "
    "k + 1 ('more than k' sentinel) — per event type at two caps: "
    "the 150-user corpus saturates the k = 5 cap and stays exact "
    "under k = 200.  Compiles to least(count(DISTINCT x), k + 1); "
    "value-exact, so the oracle replays it directly.",
)
def q_dialect_uniq_upto(spark, sf_dir):
    from clickbom_spark.dialect import run_clickhouse_sql

    out = run_clickhouse_sql(spark, _CH_UNIQ_UPTO, sf_dir)
    return out.select(
        "et",
        F.col("u5").cast("long").alias("u5"),
        F.col("u200").cast("long").alias("u200"),
    )


# ---------------------------------------------------------------------------
# Dialect round-trip: SAMPLE k OFFSET m.  The registered sampling key
# (events.event_id) hashes to [0, 1); SAMPLE 0.25 OFFSET 0.5 keeps
# the [0.5, 0.75) hash band — deterministic membership any engine
# reproduces (the q_hash_sample primitive).
# ---------------------------------------------------------------------------

_CH_SAMPLE_OFFSET = """
SELECT count() AS n,
       uniqExact(user_id) AS users,
       sum(toInt64(round(value * 100))) AS cents
FROM events SAMPLE 0.25 OFFSET 0.5
"""


@staged(
    "q_dialect_sample_offset",
    oracle=f"""
SELECT CAST(count(*) AS BIGINT) AS n,
       CAST(count(DISTINCT user_id) AS BIGINT) AS users,
       CAST(SUM({_CENTS_DUCK}) AS BIGINT) AS cents
FROM (SELECT *,
             CAST(('0x' || substring(md5(CAST(event_id AS VARCHAR)),
                                     1, 8)) AS BIGINT)
               / 4294967296.0 AS hf
      FROM events)
WHERE hf >= 0.5 AND hf < 0.75
""",
    description="`FROM events SAMPLE 0.25 OFFSET 0.5` — the offset "
    "band form of ClickHouse sampling: rows whose sampling-key hash "
    "falls in [0.5, 0.75).  The shim compiles the registered SAMPLE "
    "BY key (event_id) to the md5-prefix hash-threshold filter, so "
    "membership is deterministic and the DuckDB oracle replays the "
    "exact band — counts, distinct users and cents all match "
    "bit-for-bit (0.25/0.5/0.75 are exactly representable, no "
    "boundary ulp risk).",
)
def q_dialect_sample_offset(spark, sf_dir):
    from clickbom_spark.dialect import run_clickhouse_sql

    out = run_clickhouse_sql(spark, _CH_SAMPLE_OFFSET, sf_dir)
    return out.select(
        F.col("n").cast("long").alias("n"),
        F.col("users").cast("long").alias("users"),
        F.col("cents").cast("long").alias("cents"),
    )


# ---------------------------------------------------------------------------
# Corpus text operators.  One space-split tokenization (the corpus is
# a synthetic space-separated word stream), exact integer counts,
# one IEEE division per surfaced statistic, round(6).
# ---------------------------------------------------------------------------


@staged(
    "q_yule_k",
    oracle="""
WITH w AS (
  SELECT source, unnest(string_split(text, ' ')) AS w
  FROM documents WHERE text IS NOT NULL),
     f AS (
  SELECT source, w, CAST(count(*) AS BIGINT) AS c
  FROM w GROUP BY source, w),
     a AS (
  SELECT source, CAST(SUM(c) AS BIGINT) AS n,
         CAST(SUM(c * c) AS BIGINT) AS s2,
         CAST(count(*) AS BIGINT) AS vocab
  FROM f GROUP BY source)
SELECT source, n, vocab,
       round(CAST(10000 * (s2 - n) AS DOUBLE)
             / CAST(n * n AS DOUBLE), 6) AS yule_k
FROM a ORDER BY source
""",
    description="Yule's K vocabulary-richness characteristic per "
    "source: K = 10^4 * (sum(c^2) - N) / N^2 over the token frequency "
    "spectrum (Yule 1944) — repetitive vocabularies score high, "
    "diverse ones low.  Both power sums are exact integers off one "
    "hash aggregate (map-side combinable shingle-free single scan); "
    "the surfaced K is one IEEE division of exact integer products, "
    "round(6).",
)
def q_yule_k(spark, sf_dir):
    (docs,) = load(spark, sf_dir, "documents")
    f = (
        docs.where(F.col("text").isNotNull())
        .select("source", F.explode(F.split("text", " ")).alias("w"))
        .groupBy("source", "w")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    a = f.groupBy("source").agg(
        F.sum("c").cast("long").alias("n"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("s2"),
        F.count(F.lit(1)).cast("long").alias("vocab"),
    )
    return a.select(
        "source", "n", "vocab",
        F.round(
            (F.lit(10000) * (F.col("s2") - F.col("n"))).cast("double")
            / (F.col("n") * F.col("n")).cast("double"),
            6,
        ).alias("yule_k"),
    ).orderBy("source")


@staged(
    "q_gini_token_concentration",
    oracle="""
WITH w AS (
  SELECT unnest(string_split(text, ' ')) AS w
  FROM documents WHERE text IS NOT NULL),
     f AS (SELECT w, CAST(count(*) AS BIGINT) AS c FROM w GROUP BY w),
     g AS (SELECT c, CAST(count(*) AS BIGINT) AS m FROM f GROUP BY c),
     p AS (
  SELECT c, m,
         CAST(coalesce(SUM(m) OVER (ORDER BY c
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS BIGINT) AS p
  FROM g),
     tot AS (
  SELECT CAST(SUM(c * m) AS BIGINT) AS total,
         CAST(SUM(m) AS BIGINT) AS n FROM g)
SELECT n AS vocab, total AS n_tokens,
       round(CAST((SELECT SUM(c * m * (2 * p + m - n))
                   FROM p, tot) AS DOUBLE)
             / CAST(n * total AS DOUBLE), 6) AS gini
FROM tot
""",
    description="Gini concentration coefficient of the corpus token "
    "frequency distribution — 0 = perfectly even usage, 1 = all mass "
    "on one token.  Computed WITHOUT a global row sort: group the "
    "frequency table by distinct frequency VALUE, take prefix sums "
    "over that bounded domain (the same distinct-value prefix-sum "
    "shape as the Pareto/ABC operators), and fold sum(c*m*(2p+m-n)) "
    "/ (n*total) — tie groups contribute their closed-form rank-sum, "
    "so the result is order-independent and exact until one final "
    "IEEE division, round(6).",
)
def q_gini_token_concentration(spark, sf_dir):
    (docs,) = load(spark, sf_dir, "documents")
    f = (
        docs.where(F.col("text").isNotNull())
        .select(F.explode(F.split("text", " ")).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    g = f.groupBy("c").agg(F.count(F.lit(1)).cast("long").alias("m"))
    win = W.orderBy("c").rowsBetween(W.unboundedPreceding, -1)
    p = g.withColumn(
        "p", F.coalesce(F.sum("m").over(win), F.lit(0)).cast("long")
    )
    tot = g.agg(
        F.sum(F.col("c") * F.col("m")).cast("long").alias("total"),
        F.sum("m").cast("long").alias("n"),
    )
    num = (
        p.crossJoin(F.broadcast(tot))
        .agg(
            F.sum(
                F.col("c") * F.col("m")
                * (F.lit(2) * F.col("p") + F.col("m") - F.col("n"))
            ).cast("long").alias("num")
        )
    )
    return (
        tot.crossJoin(F.broadcast(num))
        .select(
            F.col("n").alias("vocab"),
            F.col("total").alias("n_tokens"),
            F.round(
                F.col("num").cast("double")
                / (F.col("n") * F.col("total")).cast("double"),
                6,
            ).alias("gini"),
        )
    )


@staged(
    "q_top_token_agreement",
    oracle="""
WITH w AS (
  SELECT source, unnest(string_split(text, ' ')) AS w
  FROM documents WHERE text IS NOT NULL),
     corpus AS (
  SELECT w, CAST(count(*) AS BIGINT) AS c FROM w GROUP BY w),
     ctop AS (
  SELECT w FROM (SELECT w, row_number() OVER
                   (ORDER BY c DESC, w ASC) AS rk FROM corpus)
  WHERE rk <= 10),
     sf AS (
  SELECT source, w, CAST(count(*) AS BIGINT) AS c
  FROM w GROUP BY source, w),
     stop AS (
  SELECT source, w FROM (SELECT source, w, row_number() OVER
                           (PARTITION BY source
                            ORDER BY c DESC, w ASC) AS rk FROM sf)
  WHERE rk <= 10)
SELECT s.source,
       CAST(SUM(CASE WHEN c.w IS NOT NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS agree
FROM stop s LEFT JOIN ctop c ON s.w = c.w
GROUP BY s.source ORDER BY s.source
""",
    description="Top-token rank agreement: how many of each source's "
    "10 most frequent tokens are also corpus-wide top-10 — a cheap "
    "domain-drift detector (sources whose head vocabulary diverges "
    "from the corpus head score low).  Both rankings break frequency "
    "ties deterministically by (count DESC, token ASC); the per-"
    "source top-10 is a bounded window over the posting aggregate "
    "and the corpus top-10 joins broadcast-small.",
)
def q_top_token_agreement(spark, sf_dir):
    (docs,) = load(spark, sf_dir, "documents")
    w = docs.where(F.col("text").isNotNull()).select(
        "source", F.explode(F.split("text", " ")).alias("w")
    )
    corpus = w.groupBy("w").agg(F.count(F.lit(1)).cast("long").alias("c"))
    ctop = (
        corpus.withColumn(
            "rk",
            F.row_number().over(W.orderBy(F.desc("c"), F.asc("w"))),
        )
        .where(F.col("rk") <= 10)
        .select("w")
    )
    sf = w.groupBy("source", "w").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    stop = (
        sf.withColumn(
            "rk",
            F.row_number().over(
                W.partitionBy("source").orderBy(F.desc("c"), F.asc("w"))
            ),
        )
        .where(F.col("rk") <= 10)
        .select("source", "w")
    )
    return (
        stop.join(
            F.broadcast(ctop.withColumn("hit", F.lit(1))), "w", "left"
        )
        .groupBy("source")
        .agg(
            F.sum(F.coalesce(F.col("hit"), F.lit(0)))
            .cast("long")
            .alias("agree")
        )
        .orderBy("source")
    )


@staged(
    "q_budget_largest_remainder",
    oracle="""
WITH sz AS (
  SELECT source, CAST(SUM(n_chars) AS BIGINT) AS chars
  FROM documents GROUP BY source),
     tot AS (SELECT CAST(SUM(chars) AS BIGINT) AS total FROM sz),
     quo AS (
  SELECT source, chars,
         CAST((1000 * chars) // total AS BIGINT) AS base,
         CAST((1000 * chars) % total AS BIGINT) AS rem
  FROM sz, tot),
     lo AS (SELECT CAST(1000 - SUM(base) AS BIGINT) AS leftover
            FROM quo),
     rk AS (
  SELECT source, chars, base, rem,
         row_number() OVER (ORDER BY rem DESC, source ASC) AS rk
  FROM quo)
SELECT source, chars, base,
       CAST(base + CASE WHEN rk <= (SELECT leftover FROM lo)
                        THEN 1 ELSE 0 END AS BIGINT) AS slots
FROM rk ORDER BY source
""",
    description="Largest-remainder (Hamilton) apportionment of a "
    "1000-shard training budget across sources, proportional to "
    "their total character mass: integer quota floors, then the "
    "sources with the largest remainders (ties broken by source "
    "name) absorb the leftover — the derandomized counterpart of "
    "proportional sampling, summing to exactly 1000 by "
    "construction.  Pure integer arithmetic end-to-end; the rank "
    "window runs over the 20-source frame.",
)
def q_budget_largest_remainder(spark, sf_dir):
    (docs,) = load(spark, sf_dir, "documents")
    sz = docs.groupBy("source").agg(
        F.sum("n_chars").cast("long").alias("chars")
    )
    tot = sz.agg(F.sum("chars").cast("long").alias("total"))
    quo = sz.crossJoin(F.broadcast(tot)).select(
        "source", "chars",
        # DIV == DuckDB's // for non-negative operands (floor)
        F.expr("CAST((1000 * chars) DIV total AS BIGINT)").alias("base"),
        F.expr("CAST((1000 * chars) % total AS BIGINT)").alias("rem"),
    )
    lo = quo.agg((F.lit(1000) - F.sum("base")).cast("long").alias("leftover"))
    rk = quo.withColumn(
        "rk",
        F.row_number().over(W.orderBy(F.desc("rem"), F.asc("source"))),
    )
    return (
        rk.crossJoin(F.broadcast(lo))
        .select(
            "source", "chars", "base",
            (
                F.col("base")
                + F.when(F.col("rk") <= F.col("leftover"), 1).otherwise(0)
            ).cast("long").alias("slots"),
        )
        .orderBy("source")
    )


@staged(
    "q_doc_length_outliers",
    oracle="""
WITH s AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n,
         CAST(SUM(n_chars) AS BIGINT) AS sx,
         CAST(SUM(n_chars * n_chars) AS BIGINT) AS qx,
         CAST(min(n_chars) AS BIGINT) AS lo,
         CAST(max(n_chars) AS BIGINT) AS hi
  FROM documents GROUP BY source)
SELECT d.source, s.n AS n_docs, s.lo, s.hi,
       CAST(SUM(CASE WHEN (s.n * d.n_chars - s.sx)
                          * (s.n * d.n_chars - s.sx)
                     > 4 * s.n * (s.n * s.qx - s.sx * s.sx)
                THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
FROM documents d JOIN s USING (source)
GROUP BY d.source, s.n, s.lo, s.hi ORDER BY d.source
""",
    description="Document-length outlier audit per source WITHOUT "
    "floats: |x - mean| > 2*sigma rearranged to the integer "
    "inequality (n*x - S)^2 > 4*n*(n*Q - S^2) over the exact power "
    "sums S = sum(x), Q = sum(x^2) — no division, no sqrt, so the "
    "flag can never ulp-flip across engines.  Two scans (one "
    "aggregate + one broadcast-joined flagging pass), both map-side "
    "combinable.",
)
def q_doc_length_outliers(spark, sf_dir):
    (docs,) = load(spark, sf_dir, "documents")
    s = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("n_chars").cast("long").alias("sx"),
        F.sum(F.col("n_chars") * F.col("n_chars")).cast("long").alias("qx"),
        F.min("n_chars").cast("long").alias("lo"),
        F.max("n_chars").cast("long").alias("hi"),
    )
    dev = (F.col("n") * F.col("n_chars") - F.col("sx"))
    flagged = (
        docs.join(F.broadcast(s), "source")
        .groupBy("source", "n", "lo", "hi")
        .agg(
            F.sum(
                F.when(
                    dev * dev
                    > F.lit(4)
                    * F.col("n")
                    * (F.col("n") * F.col("qx") - F.col("sx") * F.col("sx")),
                    1,
                ).otherwise(0)
            ).cast("long").alias("n_outliers")
        )
    )
    return flagged.select(
        "source", F.col("n").alias("n_docs"), "lo", "hi", "n_outliers"
    ).orderBy("source")


# ---------------------------------------------------------------------------
# Event-stream profiles.  Gaps and anomalies stay in exact integer /
# dyadic-rational arithmetic (epoch microseconds, binary-string log2
# bands, medians of integers); every window is partitioned by user or
# bounded by the 30-day / 24-hour calendar frame.
# ---------------------------------------------------------------------------


@staged(
    "q_session_gap_bands",
    oracle="""
WITH g AS (
  SELECT event_type,
         (epoch_us(ts) - lag(epoch_us(ts)) OVER
            (PARTITION BY user_id ORDER BY ts, event_id))
           // 1000000 AS gap_s
  FROM events)
SELECT event_type,
       CAST(CASE WHEN gap_s = 0 THEN 0
            ELSE length(bin(gap_s)) END AS BIGINT) AS band,
       CAST(count(*) AS BIGINT) AS n
FROM g WHERE gap_s IS NOT NULL
GROUP BY 1, 2 ORDER BY event_type, band
""",
    description="Log2-banded inter-event gaps: per user the stream is "
    "ordered by (ts, event_id) — the registry's standard duplicate-"
    "timestamp tie-break — and each event's gap to its predecessor "
    "lands in the floor(log2(seconds)) band computed from the "
    "binary-string length (Spark conv(x,10,2) / DuckDB bin(x)), "
    "never libm.  Per-user lag windows partition naturally at 100 TB; "
    "the (type, band) aggregate is map-side combinable.",
)
def q_session_gap_bands(spark, sf_dir):
    from clickbom_spark.queries import epoch_us

    (events,) = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    g = events.select(
        "event_type",
        (
            (epoch_us("ts") - F.lag(epoch_us("ts")).over(w))
            / F.lit(1000000)
        ).cast("long").alias("_div_hint"),
        ((epoch_us("ts") - F.lag(epoch_us("ts")).over(w)))
        .alias("gap_us"),
    ).drop("_div_hint")
    g = g.where(F.col("gap_us").isNotNull()).select(
        "event_type",
        F.expr("gap_us DIV 1000000").alias("gap_s"),
    )
    band = F.when(F.col("gap_s") == 0, F.lit(0)).otherwise(
        F.length(F.conv(F.col("gap_s").cast("string"), 10, 2))
    )
    return (
        g.select("event_type", band.cast("long").alias("band"))
        .groupBy("event_type", "band")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .orderBy("event_type", "band")
    )


@staged(
    "q_volume_anomaly_mad",
    oracle="""
WITH d AS (
  SELECT CAST(day(ts) AS BIGINT) AS d, CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1),
     med AS (SELECT quantile_cont(n, 0.5) AS med FROM d),
     mad AS (
  SELECT quantile_cont(abs(n - med), 0.5) AS mad FROM d, med)
SELECT d.d, d.n,
       CAST(CASE WHEN abs(d.n - med.med) > 3 * mad.mad
            THEN 1 ELSE 0 END AS BIGINT) AS is_anomaly
FROM d, med, mad ORDER BY d.d
""",
    description="MAD-based daily volume anomaly flags — the robust "
    "twin of z-score gating (q_daily_anomaly_zscore): |n - median| > "
    "3 * MAD.  Daily counts are integers, so the median and the "
    "median absolute deviation are dyadic rationals (halves/"
    "quarters), exactly representable and cross-engine identical — "
    "the flag can never ulp-flip.  Two bounded aggregates over the "
    "30-day frame plus one broadcast flagging pass.",
)
def q_volume_anomaly_mad(spark, sf_dir):
    (events,) = load(spark, sf_dir, "events")
    d = events.groupBy(
        F.dayofmonth("ts").cast("long").alias("d")
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    med = d.agg(F.expr("percentile(n, 0.5)").alias("med"))
    mad = (
        d.crossJoin(F.broadcast(med))
        .agg(F.expr("percentile(abs(n - med), 0.5)").alias("mad"))
    )
    return (
        d.crossJoin(F.broadcast(med))
        .crossJoin(F.broadcast(mad))
        .select(
            "d", "n",
            F.when(
                F.abs(F.col("n") - F.col("med")) > F.lit(3) * F.col("mad"),
                1,
            ).otherwise(0).cast("long").alias("is_anomaly"),
        )
        .orderBy("d")
    )


@staged(
    "q_hourly_value_median",
    oracle=f"""
SELECT CAST(hour(ts) AS BIGINT) AS h, CAST(count(*) AS BIGINT) AS n,
       quantile_cont({_CENTS_DUCK}, 0.5) AS median_cents
FROM events GROUP BY 1 ORDER BY h
""",
    description="Hour-of-day value profile: exact median event value "
    "(integer cents — medians of integers are engine-exact) and "
    "volume per hour over the 24-slot calendar frame.  One hash "
    "aggregate; the exact median runs per bounded hour group.",
)
def q_hourly_value_median(spark, sf_dir):
    (events,) = load(spark, sf_dir, "events")
    return (
        events.select(
            F.hour("ts").cast("long").alias("h"),
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
        .groupBy("h")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.expr("percentile(cents, 0.5)").alias("median_cents"),
        )
        .orderBy("h")
    )


@staged(
    "q_props_numeric_profile",
    oracle="""
WITH k AS (
  SELECT event_type,
         CAST(regexp_extract(props, '[0-9]+') AS BIGINT) AS k
  FROM events WHERE props IS NOT NULL)
SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       CAST(count(DISTINCT k) AS BIGINT) AS n_distinct,
       CAST(min(k) AS BIGINT) AS lo, CAST(max(k) AS BIGINT) AS hi,
       quantile_cont(k, 0.5) AS median_k
FROM k GROUP BY 1 ORDER BY event_type
""",
    description="Numeric profile of the JSON props payload per event "
    "type: the embedded integer is pulled with the SAME regex on both "
    "engines (no JSON library dependence — portable over any engine's "
    "regexp_extract), then exact integer min/max/distinct and the "
    "engine-exact integer median.",
)
def q_props_numeric_profile(spark, sf_dir):
    (events,) = load(spark, sf_dir, "events")
    k = events.where(F.col("props").isNotNull()).select(
        "event_type",
        F.regexp_extract("props", "[0-9]+", 0).cast("long").alias("k"),
    )
    return (
        k.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.countDistinct("k").cast("long").alias("n_distinct"),
            F.min("k").cast("long").alias("lo"),
            F.max("k").cast("long").alias("hi"),
            F.expr("percentile(k, 0.5)").alias("median_k"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Relational / embedding operators.  Revenue stays in the registry's
# decimal-exact pattern; pair generation is always order-keyed and
# brand-bounded (never all-pairs); the one unpartitioned rank window
# runs over the 25-brand-pair / 20-source / 24-hour bounded frames.
# ---------------------------------------------------------------------------


@staged(
    "q_market_basket_lift",
    oracle="""
WITH b AS (
  SELECT DISTINCT l_orderkey, p_brand
  FROM lineitem JOIN part ON l_partkey = p_partkey),
     na AS (SELECT p_brand, CAST(count(*) AS BIGINT) AS n_a
            FROM b GROUP BY 1),
     tot AS (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n
             FROM b),
     pairs AS (
  SELECT x.p_brand AS b1, y.p_brand AS b2,
         CAST(count(*) AS BIGINT) AS n_ab
  FROM b x JOIN b y ON x.l_orderkey = y.l_orderkey
                    AND x.p_brand < y.p_brand
  GROUP BY 1, 2),
     ranked AS (
  SELECT p.b1, p.b2, p.n_ab,
         round(CAST(p.n_ab * tot.n AS DOUBLE)
               / CAST(a1.n_a * a2.n_a AS DOUBLE), 6) AS lift,
         row_number() OVER (ORDER BY p.n_ab DESC, p.b1 ASC, p.b2 ASC)
           AS rk
  FROM pairs p
  JOIN na a1 ON p.b1 = a1.p_brand
  JOIN na a2 ON p.b2 = a2.p_brand
  CROSS JOIN tot)
SELECT b1, b2, n_ab, lift FROM ranked WHERE rk <= 15
ORDER BY n_ab DESC, b1, b2
""",
    description="Market-basket brand affinity: lift = P(A,B) / "
    "(P(A) P(B)) = n_ab * N / (n_a * n_b) over distinct (order, "
    "brand) incidences, top-15 pairs by co-occurrence with total "
    "(count, brand, brand) tie-breaks.  Candidate generation is an "
    "ORDER-keyed self-equi-join over the deduplicated incidence "
    "table — pairs per order are bounded by the 25-brand domain, "
    "never an all-pairs product.  Counts exact; lift is one IEEE "
    "division of exact integer products, round(6).",
)
def q_market_basket_lift(spark, sf_dir):
    lineitem, part = load(spark, sf_dir, "lineitem", "part")
    b = (
        lineitem.join(part, lineitem.l_partkey == part.p_partkey)
        .select("l_orderkey", "p_brand")
        .distinct()
    )
    na = b.groupBy("p_brand").agg(F.count(F.lit(1)).cast("long").alias("n_a"))
    tot = b.agg(F.countDistinct("l_orderkey").cast("long").alias("n"))
    x = b.alias("x")
    y = b.alias("y")
    pairs = (
        x.join(
            y,
            (F.col("x.l_orderkey") == F.col("y.l_orderkey"))
            & (F.col("x.p_brand") < F.col("y.p_brand")),
        )
        .groupBy(
            F.col("x.p_brand").alias("b1"), F.col("y.p_brand").alias("b2")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_ab"))
    )
    a1 = na.select(F.col("p_brand").alias("b1"), F.col("n_a").alias("na1"))
    a2 = na.select(F.col("p_brand").alias("b2"), F.col("n_a").alias("na2"))
    ranked = (
        pairs.join(F.broadcast(a1), "b1")
        .join(F.broadcast(a2), "b2")
        .crossJoin(F.broadcast(tot))
        .select(
            "b1", "b2", "n_ab",
            F.round(
                (F.col("n_ab") * F.col("n")).cast("double")
                / (F.col("na1") * F.col("na2")).cast("double"),
                6,
            ).alias("lift"),
        )
        .withColumn(
            "rk",
            F.row_number().over(
                W.orderBy(F.desc("n_ab"), F.asc("b1"), F.asc("b2"))
            ),
        )
        .where(F.col("rk") <= 15)
        .drop("rk")
    )
    return ranked.orderBy(F.desc("n_ab"), "b1", "b2")


@staged(
    "q_nation_trade_matrix",
    oracle="""
SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
       CAST(count(*) AS BIGINT) AS n_items,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
         AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
GROUP BY 1, 2 ORDER BY cust_nation, supp_nation
""",
    description="The customer-nation x supplier-nation trade matrix: "
    "discounted revenue flows across every nation pair — the "
    "international-shipping rollup TPC-H q7 narrows to two nations, "
    "generalized to the full matrix.  Four broadcast-joined "
    "dimensions around the lineitem fact scan; revenue uses the "
    "registry's decimal-exact pattern (bit-stable across engines).",
)
def q_nation_trade_matrix(spark, sf_dir):
    from clickbom_spark.queries import dec, dsum

    lineitem, orders, customer, nation, supplier = load(
        spark, sf_dir, "lineitem", "orders", "customer", "nation",
        "supplier",
    )
    cn = nation.select(
        F.col("n_nationkey").alias("cnk"), F.col("n_name").alias("cust_nation")
    )
    sn = nation.select(
        F.col("n_nationkey").alias("snk"), F.col("n_name").alias("supp_nation")
    )
    rev = dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))
    # nation frames are bounded (25 rows) — hard-hint those; customer
    # and supplier GROW with SF, so their join strategy is left to
    # AQE's size check (broadcast at small SF, shuffle at scale) per
    # the repo broadcast policy (test_no_hard_broadcast_of_sf_growing
    # _tables)
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cnk"))
        .join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("snk"))
        .groupBy("cust_nation", "supp_nation")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_items"),
            dsum(rev, "revenue"),
        )
        .orderBy("cust_nation", "supp_nation")
    )


@staged(
    "q_repeat_customer_share",
    oracle="""
WITH o AS (
  SELECT strftime(o_orderdate, '%Y-%m') AS month,
         CASE WHEN o_orderdate > min(o_orderdate) OVER
                (PARTITION BY o_custkey) THEN 1 ELSE 0 END AS rep
  FROM orders)
SELECT month, CAST(count(*) AS BIGINT) AS n_orders,
       CAST(SUM(rep) AS BIGINT) AS n_repeat,
       round(CAST(SUM(rep) AS DOUBLE) / count(*), 6) AS repeat_share
FROM o GROUP BY 1 ORDER BY month
""",
    description="Repeat-purchase share per month: an order is a "
    "repeat if the customer has a strictly earlier order (orders on "
    "the customer's first date — including same-day ties — count as "
    "acquisition, a deterministic rule).  One per-customer min "
    "window (naturally partitioned at scale) + a monthly rollup; the "
    "share is one IEEE division of exact counts, round(6).",
)
def q_repeat_customer_share(spark, sf_dir):
    (orders,) = load(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey")
    o = orders.select(
        F.date_format("o_orderdate", "yyyy-MM").alias("month"),
        F.when(
            F.col("o_orderdate") > F.min("o_orderdate").over(w), 1
        ).otherwise(0).alias("rep"),
    )
    return (
        o.groupBy("month")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum("rep").cast("long").alias("n_repeat"),
        )
        .select(
            "month", "n_orders", "n_repeat",
            F.round(
                F.col("n_repeat").cast("double") / F.col("n_orders"), 6
            ).alias("repeat_share"),
        )
        .orderBy("month")
    )


@staged(
    "q_inactive_customer_profile",
    oracle="""
WITH seg AS (
  SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_customers
  FROM customer GROUP BY 1),
     inact AS (
  SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_inactive,
         CAST(SUM(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT)
           AS bal_cents
  FROM customer
  WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
  GROUP BY 1)
SELECT seg.c_mktsegment AS segment, seg.n_customers,
       CAST(coalesce(inact.n_inactive, 0) AS BIGINT) AS n_inactive,
       round(CAST(coalesce(inact.n_inactive, 0) AS DOUBLE)
             / seg.n_customers, 6) AS inactive_share,
       CAST(coalesce(inact.bal_cents, 0) AS BIGINT)
         AS inactive_bal_cents
FROM seg LEFT JOIN inact USING (c_mktsegment)
ORDER BY segment
""",
    description="Inactive-customer profile per market segment: "
    "customers with ZERO orders found by an anti-join against the "
    "orders fact (a broadcast/shuffled hash anti-join — the "
    "existence-check breadth TPC-H q22 only exercises behind extra "
    "filters), with their count, share, and aggregate balance in "
    "exact cents.  Segments with no inactive customers surface "
    "explicit zeros via the left join.",
)
def q_inactive_customer_profile(spark, sf_dir):
    customer, orders = load(spark, sf_dir, "customer", "orders")
    seg = customer.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).cast("long").alias("n_customers")
    )
    inact = (
        customer.join(
            orders.select(F.col("o_custkey").alias("c_custkey")).distinct(),
            "c_custkey",
            "left_anti",
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_inactive"),
            F.sum(F.round(F.col("c_acctbal") * 100).cast("long"))
            .cast("long")
            .alias("bal_cents"),
        )
    )
    return (
        seg.join(inact, "c_mktsegment", "left")
        .select(
            F.col("c_mktsegment").alias("segment"),
            "n_customers",
            F.coalesce(F.col("n_inactive"), F.lit(0))
            .cast("long")
            .alias("n_inactive"),
            F.round(
                F.coalesce(F.col("n_inactive"), F.lit(0)).cast("double")
                / F.col("n_customers"),
                6,
            ).alias("inactive_share"),
            F.coalesce(F.col("bal_cents"), F.lit(0))
            .cast("long")
            .alias("inactive_bal_cents"),
        )
        .orderBy("segment")
    )


@staged(
    "q_emb_hypercube_density",
    oracle="""
WITH c AS (
  SELECT vec_id, label,
         CAST((CASE WHEN embedding[1] > 0 THEN 1 ELSE 0 END)
            + (CASE WHEN embedding[2] > 0 THEN 2 ELSE 0 END)
            + (CASE WHEN embedding[3] > 0 THEN 4 ELSE 0 END)
            + (CASE WHEN embedding[4] > 0 THEN 8 ELSE 0 END)
            + (CASE WHEN embedding[5] > 0 THEN 16 ELSE 0 END)
            + (CASE WHEN embedding[6] > 0 THEN 32 ELSE 0 END)
            + (CASE WHEN embedding[7] > 0 THEN 64 ELSE 0 END)
            + (CASE WHEN embedding[8] > 0 THEN 128 ELSE 0 END)
          AS BIGINT) AS code
  FROM embeddings),
     lc AS (SELECT code, label, CAST(count(*) AS BIGINT) AS cnt
            FROM c GROUP BY 1, 2),
     ct AS (SELECT code, CAST(count(*) AS BIGINT) AS n,
                   CAST(count(DISTINCT label) AS BIGINT) AS n_labels
            FROM c GROUP BY 1),
     maj AS (
  SELECT code, label AS top_label, cnt AS top_cnt
  FROM (SELECT lc.*, row_number() OVER
          (PARTITION BY code ORDER BY cnt DESC, label ASC) AS rk
        FROM lc)
  WHERE rk = 1)
SELECT ct.code, ct.n, ct.n_labels,
       CAST(maj.top_label AS BIGINT) AS top_label,
       round(CAST(maj.top_cnt AS DOUBLE) / ct.n, 6) AS purity
FROM ct JOIN maj USING (code) ORDER BY ct.code
""",
    description="Sign-bit hypercube density over the first 8 "
    "embedding dimensions: each vector lands in one of 256 orthants "
    "(code = sum of sign bits — exact float comparisons, no "
    "arithmetic), and each orthant reports occupancy, label "
    "diversity, and majority-label purity (ties broken by label) — "
    "the cheapest LSH-style structure audit of an embedding space, "
    "and the same bucketing an RP-LSH index coarsens to.  Two hash "
    "aggregates over the bounded 256-orthant domain.",
)
def q_emb_hypercube_density(spark, sf_dir):
    (emb,) = load(spark, sf_dir, "embeddings")
    code = sum(
        F.when(F.element_at("embedding", i + 1) > 0, 1 << i).otherwise(0)
        for i in range(8)
    )
    c = emb.select(
        "label", code.cast("long").alias("code")
    )
    lc = c.groupBy("code", "label").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    ct = c.groupBy("code").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.countDistinct("label").cast("long").alias("n_labels"),
    )
    maj = (
        lc.withColumn(
            "rk",
            F.row_number().over(
                W.partitionBy("code").orderBy(F.desc("cnt"), F.asc("label"))
            ),
        )
        .where(F.col("rk") == 1)
        .select(
            "code",
            F.col("label").cast("long").alias("top_label"),
            F.col("cnt").alias("top_cnt"),
        )
    )
    return (
        ct.join(maj, "code")
        .select(
            "code", "n", "n_labels", "top_label",
            F.round(F.col("top_cnt").cast("double") / F.col("n"), 6)
            .alias("purity"),
        )
        .orderBy("code")
    )


@staged(
    "q_value_by_priority_trend",
    oracle="""
WITH m AS (
  SELECT o_orderpriority AS pri,
         strftime(o_orderdate, '%Y-%m') AS month,
         CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS cents
  FROM orders GROUP BY 1, 2)
SELECT pri, month, cents,
       CAST(cents - coalesce(lag(cents) OVER
              (PARTITION BY pri ORDER BY month), cents) AS BIGINT)
         AS mom_delta
FROM m ORDER BY pri, month
""",
    description="Monthly order value per priority with month-over-"
    "month deltas: exact integer cents off one hash aggregate, then "
    "a lag window partitioned by priority over the bounded calendar "
    "frame (first month's delta anchored to 0 via coalesce-to-self) "
    "— the dashboard trend shape behind every WoW/MoM tile.",
)
def q_value_by_priority_trend(spark, sf_dir):
    (orders,) = load(spark, sf_dir, "orders")
    m = orders.groupBy(
        F.col("o_orderpriority").alias("pri"),
        F.date_format("o_orderdate", "yyyy-MM").alias("month"),
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("cents")
    )
    w = W.partitionBy("pri").orderBy("month")
    return m.select(
        "pri", "month", "cents",
        (
            F.col("cents")
            - F.coalesce(F.lag("cents").over(w), F.col("cents"))
        ).cast("long").alias("mom_delta"),
    ).orderBy("pri", "month")
