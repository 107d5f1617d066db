"""Staged registry wave for round 18 — new operator surface (built
during round 12; the staging pipeline runs waves ahead so every
activation is a zero-risk REGISTRY.update of parity-proven queries).

Same staging workflow as the round-6..17 waves: every query here is
oracle-parity-verified NOW (bit-exact vs DuckDB at sf0.001 and sf0.01
via ``tests/test_staged_r18_parity.py``; ``scripts/strict_parity.py
--staged`` widens the sweep to sf0.1) but held OUT of
:data:`clickbom_spark.queries.REGISTRY` until round-18 activation::

    from clickbom_spark.queries import staged_r18  # noqa: F401
    REGISTRY.update(staged_r18.STAGED_R18)

in ``queries/__init__.py``.

Round-18 themes:

* **Dialect round-trips for the round-12 compiles** — the
  ``sumMap/minMap/maxMap`` per-key array-HOF folds (zero-total drop
  exercised end-to-end), the ``GLOBAL [NOT] IN`` strip, and a
  composed PREWHERE + SETTINGS + FORMAT statement.
* **Lake lifecycle** — ``vacuum`` after compaction: snapshot
  retention, physical file reclamation, and read correctness on the
  surviving head version.
* **Activity analytics** — DAU/WAU stickiness, new-vs-returning
  splits, event-type co-occurrence, session-count distributions,
  hourly peak-to-mean load factors.
* **Exact order-statistic inference** — distribution-free median
  confidence intervals via binomial order-statistic indices, exact
  spend quartiles, Lorenz revenue deciles, quartile coefficients of
  dispersion.
* **Corpus and embedding statistics** — hapax share, arithmetic
  readability (Coleman–Liau over exact counts), token coverage
  thresholds off the frequency spectrum, stopword-density bands,
  per-dimension sign concordance (phi), and the label-centroid
  cosine matrix.

Float determinism policy (same as the registry): exact integer /
decimal aggregates first, then ONE fixed IEEE expression per surfaced
double — identical text on both engines — and ``round(x, 6)`` on
surfaced statistics.  ``sqrt`` is IEEE-754 correctly rounded, so
identical integer inputs give bit-identical doubles cross-engine;
embedding elements quantize as ``floor(double(x)·10⁶)`` (the r14
centroid-shift lesson) so every sum is exact integer/decimal.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from clickbom_spark.queries import QuerySpec, load

STAGED_R18: dict[str, QuerySpec] = {}


def staged(name: str, oracle: str | None = None, description: str = "",
           bench: bool = False):
    def deco(fn):
        STAGED_R18[name] = QuerySpec(name, fn, oracle, description, bench)
        return fn

    return deco


_CENTS_DUCK = "CAST(round(value * 100) AS BIGINT)"
_OCENTS_DUCK = "CAST(round(o_totalprice * 100) AS BIGINT)"


# ---------------------------------------------------------------------------
# Dialect round-trips: the round-12 sumMap/minMap/maxMap compile, the
# GLOBAL [NOT] IN strip, and the PREWHERE/SETTINGS/FORMAT composition.
# ---------------------------------------------------------------------------

_CH_SUMMAP_DAILY = """
SELECT event_type,
       arrayStringConcat(tupleElement(
         sumMap([toDayOfMonth(ts)], [toInt64(round(value * 100))]),
         1), ',') AS days,
       arrayStringConcat(tupleElement(
         sumMap([toDayOfMonth(ts)], [toInt64(round(value * 100))]),
         2), ',') AS cents
FROM events GROUP BY event_type ORDER BY event_type
"""


@staged(
    "q_dialect_summap_daily",
    oracle="""
WITH per AS (
  SELECT event_type, CAST(day(ts) AS BIGINT) AS k,
         CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sv
  FROM events GROUP BY 1, 2)
SELECT event_type,
       array_to_string(list(k ORDER BY k) FILTER (WHERE sv <> 0), ',')
         AS days,
       array_to_string(list(sv ORDER BY k) FILTER (WHERE sv <> 0), ',')
         AS cents
FROM per GROUP BY event_type ORDER BY event_type
""",
    description="ClickHouse `sumMap([day], [cents])` through the "
    "round-12 per-key array-HOF fold compile (dialect._map_agg): a "
    "day-of-month revenue map per event type, keys ascending, "
    "tuple-of-arrays shape reached via tupleElement.  The DuckDB "
    "oracle replays the explode-group-listagg equivalent INCLUDING "
    "sumMap's zero-total key drop (FILTER sv <> 0) — ClickHouse's "
    "SumMap skips zero accumulators at result materialization.",
)
def q_dialect_summap_daily(spark, sf_dir):
    from clickbom_spark.dialect import run_clickhouse_sql

    out = run_clickhouse_sql(spark, _CH_SUMMAP_DAILY, sf_dir)
    return out.select(
        "event_type",
        F.col("days").cast("string").alias("days"),
        F.col("cents").cast("string").alias("cents"),
    )


_CH_MINMAP_BANDS = """
SELECT l_returnflag,
       arrayStringConcat(tupleElement(minMap([toInt64(l_quantity) % 10],
         [toInt64(round(l_extendedprice * 100))]), 1), ',') AS bands,
       arrayStringConcat(tupleElement(minMap([toInt64(l_quantity) % 10],
         [toInt64(round(l_extendedprice * 100))]), 2), ',') AS min_cents,
       arrayStringConcat(tupleElement(maxMap([toInt64(l_quantity) % 10],
         [toInt64(round(l_extendedprice * 100))]), 2), ',') AS max_cents
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


@staged(
    "q_dialect_minmap_bands",
    oracle="""
WITH per AS (
  SELECT l_returnflag, CAST(l_quantity AS BIGINT) % 10 AS k,
         MIN(CAST(round(l_extendedprice * 100) AS BIGINT)) AS mn,
         MAX(CAST(round(l_extendedprice * 100) AS BIGINT)) AS mx
  FROM lineitem GROUP BY 1, 2)
SELECT l_returnflag,
       array_to_string(list(k ORDER BY k), ',') AS bands,
       array_to_string(list(mn ORDER BY k), ',') AS min_cents,
       array_to_string(list(mx ORDER BY k), ',') AS max_cents
FROM per GROUP BY l_returnflag ORDER BY l_returnflag
""",
    description="`minMap`/`maxMap` through the same round-12 compile "
    "— per quantity-band (qty % 10) price floors and ceilings per "
    "return flag, both tuple components surfaced.  Unlike sumMap, "
    "min/max keep every key (no zero-drop) — the law difference the "
    "unit tests pin, exercised here end-to-end at three SFs against "
    "a DuckDB min/max-per-band replay.",
)
def q_dialect_minmap_bands(spark, sf_dir):
    from clickbom_spark.dialect import run_clickhouse_sql

    out = run_clickhouse_sql(spark, _CH_MINMAP_BANDS, sf_dir)
    return out.select(
        "l_returnflag",
        F.col("bands").cast("string").alias("bands"),
        F.col("min_cents").cast("string").alias("min_cents"),
        F.col("max_cents").cast("string").alias("max_cents"),
    )


_CH_GLOBAL_IN = """
SELECT o_orderpriority, count() AS n,
       sum(toInt64(round(o_totalprice * 100))) AS cents
FROM orders
WHERE o_custkey GLOBAL IN (SELECT c_custkey FROM customer
                           WHERE c_acctbal > 5000)
  AND o_orderkey GLOBAL NOT IN (SELECT l_orderkey FROM lineitem
                                WHERE l_returnflag = 'R')
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


@staged(
    "q_dialect_global_in",
    oracle=f"""
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
       CAST(SUM({_OCENTS_DUCK}) AS BIGINT) AS cents
FROM orders
WHERE o_custkey IN (SELECT c_custkey FROM customer
                    WHERE c_acctbal > 5000)
  AND o_orderkey NOT IN (SELECT l_orderkey FROM lineitem
                         WHERE l_returnflag = 'R')
GROUP BY o_orderpriority ORDER BY o_orderpriority
""",
    description="`GLOBAL IN` / `GLOBAL NOT IN` (ClickHouse's "
    "one-shot-subquery distribution hint) stripped by the round-12 "
    "dialect fix — the keyword used to leak through verbatim and die "
    "in Spark's parser.  High-balance customers' orders with no "
    "returned line, by priority; Catalyst plans both IN-subqueries "
    "as semi/anti joins on its own.",
)
def q_dialect_global_in(spark, sf_dir):
    from clickbom_spark.dialect import run_clickhouse_sql

    out = run_clickhouse_sql(spark, _CH_GLOBAL_IN, sf_dir)
    return out.select(
        "o_orderpriority",
        F.col("n").cast("long").alias("n"),
        F.col("cents").cast("long").alias("cents"),
    ).orderBy("o_orderpriority")


_CH_PREWHERE_SETTINGS = """
SELECT o_orderstatus, count() AS n,
       max(toInt64(round(o_totalprice * 100))) AS max_cents
FROM orders PREWHERE o_totalprice > 1000
WHERE o_orderpriority != '1-URGENT'
GROUP BY o_orderstatus ORDER BY o_orderstatus
SETTINGS max_threads = 8, max_block_size = 4096 FORMAT TSV
"""


@staged(
    "q_dialect_prewhere_settings",
    oracle=f"""
SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
       MAX({_OCENTS_DUCK}) AS max_cents
FROM orders
WHERE o_totalprice > 1000 AND o_orderpriority != '1-URGENT'
GROUP BY o_orderstatus ORDER BY o_orderstatus
""",
    description="A dashboard-shaped composition: PREWHERE merged "
    "into WHERE with AND (storage-pushdown hint — Catalyst pushes "
    "the predicate to the parquet scan anyway), trailing "
    "`SETTINGS k = v, …` and `FORMAT TSV` stripped (execution "
    "directives, not semantics).  One statement exercising three "
    "clause rewrites at once, value-checked against the plain "
    "conjunction.",
)
def q_dialect_prewhere_settings(spark, sf_dir):
    from clickbom_spark.dialect import run_clickhouse_sql

    out = run_clickhouse_sql(spark, _CH_PREWHERE_SETTINGS, sf_dir)
    return out.select(
        "o_orderstatus",
        F.col("n").cast("long").alias("n"),
        F.col("max_cents").cast("long").alias("max_cents"),
    ).orderBy("o_orderstatus")


# ---------------------------------------------------------------------------
# Lake lifecycle: vacuum after compaction.
# ---------------------------------------------------------------------------


@staged(
    "q_lake_vacuum_reclaim",
    oracle=f"""
SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
       CAST(SUM({_OCENTS_DUCK}) AS BIGINT) AS cents
FROM orders GROUP BY 1 ORDER BY 1
""",
    description="Lake vacuum end-to-end (ext/manifest.py "
    "VersionedLake.vacuum): three commits build history, compact() "
    "rewrites the head into fewer files, vacuum(keep_last=1) drops "
    "the superseded snapshots and physically deletes every data "
    "file no surviving snapshot references — the function asserts "
    "files were reclaimed and the on-disk parquet count shrank.  "
    "The surviving head must still read EXACTLY the full orders "
    "table (the DuckDB oracle), proving vacuum is metadata-safe: "
    "it can never delete a file the current version references.",
)
def q_lake_vacuum_reclaim(spark, sf_dir):
    import glob as _glob
    import uuid as _uuid

    from clickbom_spark.ext.manifest import VersionedLake, compact
    from clickbom_spark.queries.staged import _TMP

    (orders,) = load(spark, sf_dir, "orders")
    base = orders.select(
        "o_orderkey", "o_orderstatus",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    tag = _uuid.uuid4().hex[:8]
    path = os.path.join(_TMP, f"vacuum_{tag}")
    shutil.rmtree(path, ignore_errors=True)
    try:
        lake = VersionedLake.create(
            spark, path, base.where(F.col("o_orderkey") % 3 == 0),
            n_files=4,
        )
        for rem in (1, 2):
            lake.upsert(base.where(F.col("o_orderkey") % 3 == rem),
                        ["o_orderkey"])
        compact(lake, target_files=2)

        def _nfiles():
            return len(_glob.glob(os.path.join(path, "*.parquet")))

        before = _nfiles()
        removed = lake.vacuum(keep_last=1)
        after = _nfiles()
        assert removed and after < before, (
            f"vacuum reclaimed nothing: {before} -> {after}"
        )
        rows = (
            lake.read()
            .groupBy("o_orderstatus")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n"),
                F.sum("cents").cast("long").alias("cents"),
            )
            .orderBy("o_orderstatus")
            .collect()
        )
    finally:
        shutil.rmtree(path, ignore_errors=True)
    return spark.createDataFrame(
        rows, "o_orderstatus string, n bigint, cents bigint"
    ).orderBy("o_orderstatus")


# ---------------------------------------------------------------------------
# Activity analytics: stickiness, new-vs-returning, co-occurrence,
# session counts, hourly load factor.  All exact integer counts; one
# IEEE division per surfaced ratio, round(6).
# ---------------------------------------------------------------------------


@staged(
    "q_dau_wau_stickiness",
    oracle="""
WITH ud AS (SELECT DISTINCT CAST(ts AS DATE) AS d, user_id
            FROM events),
     dau AS (SELECT d, CAST(count(DISTINCT user_id) AS BIGINT) AS dau
             FROM ud GROUP BY 1),
     w AS (SELECT DISTINCT ud.d + CAST(r.x AS INTEGER) AS t, user_id
           FROM ud CROSS JOIN range(7) r(x)),
     wau AS (SELECT t, CAST(count(DISTINCT user_id) AS BIGINT) AS wau
             FROM w GROUP BY 1)
SELECT strftime(dau.d, '%Y-%m-%d') AS d, dau, wau,
       round(CAST(dau AS DOUBLE) / CAST(wau AS DOUBLE), 6)
         AS stickiness
FROM dau JOIN wau ON dau.d = wau.t ORDER BY d
""",
    description="DAU/WAU stickiness per day: each user-day fans out "
    "to the 7 trailing window anchors it supports (a bounded 7x "
    "row expansion + distinct — NO per-day rescan and no sliding "
    "distinct window state), so WAU(t) = distinct users with an "
    "active day in [t-6, t].  The product analytics north-star "
    "ratio; exact integers, one division, round(6).",
)
def q_dau_wau_stickiness(spark, sf_dir):
    (events,) = load(spark, sf_dir, "events")
    ud = events.select(
        F.to_date("ts").alias("d"), "user_id"
    ).distinct()
    dau = ud.groupBy("d").agg(
        F.countDistinct("user_id").cast("long").alias("dau")
    )
    w = ud.select(
        F.explode(
            F.sequence(F.col("d"), F.date_add(F.col("d"), 6))
        ).alias("t"),
        "user_id",
    ).distinct()
    wau = w.groupBy("t").agg(
        F.countDistinct("user_id").cast("long").alias("wau")
    )
    return (
        dau.join(wau, dau["d"] == wau["t"])
        .select(
            F.date_format("d", "yyyy-MM-dd").alias("d"),
            "dau", "wau",
            F.round(
                F.col("dau").cast("double") / F.col("wau").cast("double"),
                6,
            ).alias("stickiness"),
        )
        .orderBy("d")
    )


@staged(
    "q_new_vs_returning",
    oracle="""
WITH ud AS (SELECT DISTINCT CAST(ts AS DATE) AS d, user_id
            FROM events),
     firsts AS (SELECT user_id, MIN(d) AS first_d FROM ud GROUP BY 1)
SELECT strftime(ud.d, '%Y-%m-%d') AS d,
       CAST(count(*) AS BIGINT) AS dau,
       CAST(count(*) FILTER (WHERE f.first_d = ud.d) AS BIGINT)
         AS new_users,
       CAST(count(*) FILTER (WHERE f.first_d < ud.d) AS BIGINT)
         AS returning,
       round(CAST(count(*) FILTER (WHERE f.first_d = ud.d) AS DOUBLE)
             / CAST(count(*) AS DOUBLE), 6) AS new_share
FROM ud JOIN firsts f USING (user_id)
GROUP BY ud.d ORDER BY d
""",
    description="New-vs-returning split per day: a user's first "
    "active day tags them 'new' exactly once; the acquisition-vs-"
    "retention decomposition of DAU.  One distinct user-day frame, "
    "one min-per-user aggregate, one equi-join — all linear "
    "hash-shuffles on user_id.  Exact counts, one division.",
)
def q_new_vs_returning(spark, sf_dir):
    (events,) = load(spark, sf_dir, "events")
    ud = events.select(
        F.to_date("ts").alias("d"), "user_id"
    ).distinct()
    firsts = ud.groupBy("user_id").agg(F.min("d").alias("first_d"))
    j = ud.join(firsts, "user_id")
    return (
        j.groupBy("d")
        .agg(
            F.count(F.lit(1)).cast("long").alias("dau"),
            F.count_if(F.col("first_d") == F.col("d"))
            .cast("long").alias("new_users"),
            F.count_if(F.col("first_d") < F.col("d"))
            .cast("long").alias("returning"),
            F.round(
                F.count_if(F.col("first_d") == F.col("d")).cast("double")
                / F.count(F.lit(1)).cast("double"),
                6,
            ).alias("new_share"),
        )
        .select(
            F.date_format("d", "yyyy-MM-dd").alias("d"),
            "dau", "new_users", "returning", "new_share",
        )
        .orderBy("d")
    )


@staged(
    "q_event_type_cooccurrence",
    oracle="""
WITH s AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d, event_type
           FROM events)
SELECT a.event_type AS t1, b.event_type AS t2,
       CAST(count(*) AS BIGINT) AS n_user_days
FROM s a JOIN s b
  ON a.user_id = b.user_id AND a.d = b.d
 AND a.event_type < b.event_type
GROUP BY 1, 2 ORDER BY 1, 2
""",
    description="Event-type co-occurrence within a user-day: for "
    "every unordered type pair, the number of (user, day) cells "
    "where both fired.  The self-join is on the (user_id, d) "
    "composite key — per-cell fan-out is bounded by the event-type "
    "vocabulary (small and fixed), never by event volume, so the "
    "join output is at most C(|types|, 2) rows per active user-day.  "
    "The basket-analysis primitive behind funnel hypotheses.",
)
def q_event_type_cooccurrence(spark, sf_dir):
    (events,) = load(spark, sf_dir, "events")
    s = events.select(
        "user_id", F.to_date("ts").alias("d"), "event_type"
    ).distinct()
    a = s.alias("a")
    b = s.alias("b")
    return (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.d") == F.col("b.d"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("t1"),
            F.col("b.event_type").alias("t2"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_user_days"))
        .orderBy("t1", "t2")
    )


@staged(
    "q_sessions_per_user_dist",
    oracle="""
WITH o AS (
  SELECT user_id,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER (
                PARTITION BY user_id ORDER BY ts, event_id)
              > 1800000000 THEN 1 ELSE 0 END AS brk
  FROM events),
     per_user AS (
  SELECT user_id, CAST(1 + SUM(brk) AS BIGINT) AS n_sessions
  FROM o GROUP BY 1)
SELECT n_sessions, CAST(count(*) AS BIGINT) AS n_users
FROM per_user GROUP BY 1 ORDER BY 1
""",
    description="Sessions-per-user distribution under the 30-minute "
    "inactivity rule: a session break is a gap > 1800 s between "
    "consecutive events of one user (lag window over the "
    "deterministic (ts, event_id) total order), sessions = 1 + "
    "breaks.  The per-user window partitions by user_id — "
    "parallelism scales with users, no global sort.  Exact integer "
    "histogram of engagement depth.",
)
def q_sessions_per_user_dist(spark, sf_dir):
    from clickbom_spark.queries import epoch_us

    (events,) = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    o = events.select(
        "user_id",
        F.when(
            epoch_us("ts") - F.lag(epoch_us("ts")).over(w) > 1800000000,
            1,
        ).otherwise(0).alias("brk"),
    )
    per_user = o.groupBy("user_id").agg(
        (F.lit(1) + F.sum("brk")).cast("long").alias("n_sessions")
    )
    return (
        per_user.groupBy("n_sessions")
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
        .orderBy("n_sessions")
    )


@staged(
    "q_hourly_load_factor",
    oracle="""
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS h,
         CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS active_hours,
       CAST(SUM(c) AS BIGINT) AS total_events,
       CAST(MAX(c) AS BIGINT) AS peak_hour_events,
       round(CAST(MAX(c) * count(*) AS DOUBLE) /
             CAST(SUM(c) AS DOUBLE), 6) AS load_factor
FROM hourly GROUP BY event_type ORDER BY event_type
""",
    description="Hourly peak-to-mean load factor per event type: "
    "peak hourly count over the mean across ACTIVE hours "
    "(peak·hours/total — capacity planning's burstiness headline).  "
    "Two hash aggregates (hour grain, then type), integer until the "
    "single surfaced division.",
)
def q_hourly_load_factor(spark, sf_dir):
    (events,) = load(spark, sf_dir, "events")
    hourly = events.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("h")
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    return (
        hourly.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("active_hours"),
            F.sum("c").cast("long").alias("total_events"),
            F.max("c").cast("long").alias("peak_hour_events"),
            F.round(
                (F.max("c") * F.count(F.lit(1))).cast("double")
                / F.sum("c").cast("double"),
                6,
            ).alias("load_factor"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Exact order-statistic inference and revenue-shape profiles.
# ---------------------------------------------------------------------------


@staged(
    "q_median_ci_orderstat",
    oracle="""
WITH c AS (
  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY CAST(round(value * 100) AS BIGINT))
           AS rn
  FROM events),
     k AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         greatest(1, CAST(floor((count(*) - 1.959964 * sqrt(count(*)))
                                / 2) AS BIGINT)) AS lo_k,
         least(CAST(count(*) AS BIGINT),
               CAST(ceil(1 + (count(*) + 1.959964 * sqrt(count(*)))
                         / 2) AS BIGINT)) AS hi_k,
         CAST((count(*) + 1) // 2 AS BIGINT) AS m1,
         CAST((count(*) + 2) // 2 AS BIGINT) AS m2
  FROM c GROUP BY 1)
SELECT c.event_type, CAST(MAX(k.n) AS BIGINT) AS n,
       (MAX(CASE WHEN rn = m1 THEN cents END)
        + MAX(CASE WHEN rn = m2 THEN cents END)) / 2.0 AS median_cents,
       MAX(CASE WHEN rn = lo_k THEN cents END) AS ci_lo_cents,
       MAX(CASE WHEN rn = hi_k THEN cents END) AS ci_hi_cents
FROM c JOIN k USING (event_type)
GROUP BY c.event_type ORDER BY c.event_type
""",
    description="Distribution-free 95% confidence interval for the "
    "median via binomial order statistics: the interval "
    "[X(lo_k), X(hi_k)] with lo_k = floor((n - 1.959964*sqrt(n))/2), "
    "hi_k = ceil(1 + (n + 1.959964*sqrt(n))/2) covers the true "
    "median with >= 95% probability for ANY distribution (normal "
    "approximation to Binomial(n, 1/2) ranks).  Selection is pure "
    "integer rank arithmetic over the DISTINCT-VALUE cumulative "
    "frame (bounded by the cents domain, never by event volume — "
    "the ext/ranks weighted-quantile shape); sqrt is IEEE "
    "correctly-rounded so both engines compute identical indices; "
    "the only fractional value is the exact half-sum median.",
)
def q_median_ci_orderstat(spark, sf_dir):
    # Scale shape: rank selection runs over the DISTINCT-VALUE frame
    # (one row per (event_type, cents) — bounded by the value domain,
    # not by event volume; the ext/ranks weighted-quantile pattern),
    # so the per-type cumulative window never sees raw rows.
    (events,) = load(spark, sf_dir, "events")
    vc = (
        events.select(
            "event_type",
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
        .groupBy("event_type", "cents")
        .agg(F.count(F.lit(1)).cast("long").alias("m"))
    )
    wcum = (
        W.partitionBy("event_type")
        .orderBy("cents")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    cum = vc.withColumn(
        "cum", F.sum("m").over(wcum).cast("long")
    )
    k = vc.groupBy("event_type").agg(
        F.sum("m").cast("long").alias("n")
    ).select(
        "event_type", "n",
        F.greatest(
            F.lit(1).cast("long"),
            F.floor(
                (F.col("n") - 1.959964 * F.sqrt(F.col("n"))) / 2
            ).cast("long"),
        ).alias("lo_k"),
        F.least(
            F.col("n"),
            F.ceil(
                1 + (F.col("n") + 1.959964 * F.sqrt(F.col("n"))) / 2
            ).cast("long"),
        ).alias("hi_k"),
        ((F.col("n") + 1) / 2).cast("long").alias("m1"),
        ((F.col("n") + 2) / 2).cast("long").alias("m2"),
    )
    j = cum.join(F.broadcast(k), "event_type")
    return (
        j.groupBy("event_type")
        .agg(
            F.max("n").cast("long").alias("n"),
            (
                (
                    F.min(F.when(F.col("cum") >= F.col("m1"),
                                 F.col("cents")))
                    + F.min(F.when(F.col("cum") >= F.col("m2"),
                                   F.col("cents")))
                ) / 2.0
            ).alias("median_cents"),
            F.min(F.when(F.col("cum") >= F.col("lo_k"), F.col("cents")))
            .alias("ci_lo_cents"),
            F.min(F.when(F.col("cum") >= F.col("hi_k"), F.col("cents")))
            .alias("ci_hi_cents"),
        )
        .orderBy("event_type")
    )


@staged(
    "q_user_spend_quartiles",
    oracle="""
WITH per_user AS (
  SELECT user_id, CAST(SUM(CAST(round(value * 100) AS BIGINT))
                       AS BIGINT) AS cents
  FROM events GROUP BY 1),
     ranked AS (
  SELECT cents,
         row_number() OVER (ORDER BY cents, user_id) AS rn,
         (SELECT CAST(count(*) AS BIGINT) FROM per_user) AS n
  FROM per_user)
SELECT CAST(((rn - 1) * 4) // n + 1 AS BIGINT) AS quartile,
       CAST(count(*) AS BIGINT) AS n_users,
       CAST(SUM(cents) AS BIGINT) AS total_cents,
       MIN(cents) AS min_cents, MAX(cents) AS max_cents
FROM ranked GROUP BY 1 ORDER BY 1
""",
    description="Exact user-spend quartiles: users ranked by "
    "lifetime event value (deterministic (cents, user_id) total "
    "order via ext/ranks with_global_rank — the value-bucketed "
    "two-pass rank, no total-order window), quartile = "
    "((rn-1)*4) div n + 1 — pure integer arithmetic, no ntile "
    "nondeterminism, boundary users assigned identically on both "
    "engines.  Per-quartile population, total and range of spend: "
    "the whale-curve summary.",
)
def q_user_spend_quartiles(spark, sf_dir):
    # Scale shape: the global rank comes from ext/ranks
    # with_global_rank (value-bucketed two-pass plan) — never a
    # total-order window over the user population.
    from clickbom_spark.ext.ranks import with_global_rank

    (events,) = load(spark, sf_dir, "events")
    per_user = events.groupBy("user_id").agg(
        F.sum(F.round(F.col("value") * 100).cast("long"))
        .cast("long").alias("cents")
    )
    ranked = with_global_rank(
        per_user, ["cents", "user_id"], rank_col="rn", total_col="n"
    )
    return (
        ranked.select(
            (((F.col("rn") - 1) * 4)
             .cast("long") / F.col("n")).cast("long")
            .alias("q0"),
            "cents",
        )
        .select((F.col("q0") + 1).cast("long").alias("quartile"), "cents")
        .groupBy("quartile")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_users"),
            F.sum("cents").cast("long").alias("total_cents"),
            F.min("cents").alias("min_cents"),
            F.max("cents").alias("max_cents"),
        )
        .orderBy("quartile")
    )


@staged(
    "q_lorenz_deciles",
    oracle="""
WITH ranked AS (
  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
         row_number() OVER (
           ORDER BY CAST(round(o_totalprice * 100) AS BIGINT),
                    o_orderkey) AS rn,
         (SELECT CAST(count(*) AS BIGINT) FROM orders) AS n
  FROM orders),
     dec AS (
  SELECT CAST(((rn - 1) * 10) // n + 1 AS BIGINT) AS decile,
         CAST(count(*) AS BIGINT) AS n_orders,
         CAST(SUM(cents) AS BIGINT) AS cents
  FROM ranked GROUP BY 1)
SELECT decile, n_orders, cents,
       round(CAST(SUM(cents) OVER (ORDER BY decile) AS DOUBLE) /
             CAST((SELECT SUM(cents) FROM dec) AS DOUBLE), 6)
         AS cum_share
FROM dec ORDER BY decile
""",
    description="Lorenz curve over order revenue: orders ranked "
    "ascending by value (deterministic (cents, o_orderkey) order), "
    "split into exact integer-arithmetic deciles, cumulative revenue "
    "share per decile — the inequality profile behind the Gini "
    "twin (q_gini_concentration).  The rank is ext/ranks' "
    "value-bucketed two-pass plan; the only unpartitioned window "
    "runs on the 10-row decile aggregate, never on the base table.",
)
def q_lorenz_deciles(spark, sf_dir):
    # Scale shape: the global revenue rank is the ext/ranks
    # value-bucketed two-pass rank — no total-order window over the
    # order population; the only unpartitioned window below runs on
    # the 10-row decile aggregate.
    from clickbom_spark.ext.ranks import with_global_rank

    (orders,) = load(spark, sf_dir, "orders")
    ranked = with_global_rank(
        orders.select(
            F.round(F.col("o_totalprice") * 100).cast("long")
            .alias("cents"),
            "o_orderkey",
        ),
        ["cents", "o_orderkey"],
        rank_col="rn",
        total_col="n",
    )
    dec = (
        ranked.select(
            ((((F.col("rn") - 1) * 10).cast("long") / F.col("n"))
             .cast("long") + 1).alias("decile"),
            "cents",
        )
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum("cents").cast("long").alias("cents"),
        )
    )
    total = dec.agg(F.sum("cents").cast("long").alias("total"))
    wc = W.orderBy("decile").rowsBetween(W.unboundedPreceding, 0)
    return (
        dec.crossJoin(F.broadcast(total))
        .select(
            "decile", "n_orders", "cents",
            F.round(
                F.sum("cents").over(wc).cast("double")
                / F.col("total").cast("double"),
                6,
            ).alias("cum_share"),
        )
        .orderBy("decile")
    )


@staged(
    "q_priority_status_matrix",
    oracle=f"""
SELECT o_orderpriority, o_orderstatus,
       CAST(count(*) AS BIGINT) AS n,
       CAST(SUM({_OCENTS_DUCK}) AS BIGINT) AS cents,
       round(CAST(SUM({_OCENTS_DUCK}) AS DOUBLE) /
             CAST(SUM(SUM({_OCENTS_DUCK}))
                  OVER (PARTITION BY o_orderpriority) AS DOUBLE), 6)
         AS share_in_priority
FROM orders GROUP BY 1, 2 ORDER BY 1, 2
""",
    description="Priority x status revenue matrix with within-"
    "priority shares: one hash aggregate on the composite key, then "
    "a window over the <=15-cell aggregate frame (bounded by the "
    "two small vocabularies, never by row count) normalizes each "
    "priority's row.  The order-book health heatmap.",
)
def q_priority_status_matrix(spark, sf_dir):
    (orders,) = load(spark, sf_dir, "orders")
    g = orders.groupBy("o_orderpriority", "o_orderstatus").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        .cast("long").alias("cents"),
    )
    wp = W.partitionBy("o_orderpriority")
    return g.select(
        "o_orderpriority", "o_orderstatus", "n", "cents",
        F.round(
            F.col("cents").cast("double")
            / F.sum("cents").over(wp).cast("double"),
            6,
        ).alias("share_in_priority"),
    ).orderBy("o_orderpriority", "o_orderstatus")


@staged(
    "q_customer_order_recency",
    oracle="""
WITH lasts AS (
  SELECT o_custkey, MAX(CAST(o_orderdate AS DATE)) AS last_d
  FROM orders GROUP BY 1),
     ref AS (SELECT MAX(last_d) AS ref_d FROM lasts)
SELECT c.c_mktsegment,
       CAST(date_diff('day', l.last_d, r.ref_d) // 30 AS BIGINT)
         AS recency_band,
       CAST(count(*) AS BIGINT) AS n_customers,
       CAST(MIN(date_diff('day', l.last_d, r.ref_d)) AS BIGINT)
         AS min_days,
       CAST(MAX(date_diff('day', l.last_d, r.ref_d)) AS BIGINT)
         AS max_days
FROM lasts l CROSS JOIN ref r
JOIN customer c ON c.c_custkey = l.o_custkey
GROUP BY 1, 2 ORDER BY 1, 2
""",
    description="Order-recency bands per market segment: days since "
    "each customer's last order, measured against the corpus-max "
    "order date (injected-clock-free), bucketed in 30-day bands.  "
    "The R of RFM isolated with exact date arithmetic; the 1-row "
    "reference date broadcasts, the customer dim joins by key.",
)
def q_customer_order_recency(spark, sf_dir):
    orders, customer = load(spark, sf_dir, "orders", "customer")
    lasts = orders.groupBy("o_custkey").agg(
        F.max(F.to_date("o_orderdate")).alias("last_d")
    )
    ref = lasts.agg(F.max("last_d").alias("ref_d"))
    j = (
        lasts.crossJoin(F.broadcast(ref))
        .join(customer, customer["c_custkey"] == lasts["o_custkey"])
        .select(
            "c_mktsegment",
            F.datediff(F.col("ref_d"), F.col("last_d")).alias("days"),
        )
    )
    return (
        j.select(
            "c_mktsegment",
            (F.col("days").cast("long") / 30).cast("long")
            .alias("recency_band"),
            "days",
        )
        .groupBy("c_mktsegment", "recency_band")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_customers"),
            F.min("days").cast("long").alias("min_days"),
            F.max("days").cast("long").alias("max_days"),
        )
        .orderBy("c_mktsegment", "recency_band")
    )


@staged(
    "q_brand_supplier_affinity",
    oracle="""
WITH bs AS (
  SELECT DISTINCT p.p_brand AS brand, l.l_suppkey AS s
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey),
     cnt AS (SELECT brand, CAST(count(*) AS BIGINT) AS ns
             FROM bs GROUP BY 1)
SELECT a.brand AS brand_a, b.brand AS brand_b,
       CAST(count(*) AS BIGINT) AS shared,
       round(CAST(count(*) AS DOUBLE) /
             CAST(MAX(ca.ns) + MAX(cb.ns) - count(*) AS DOUBLE), 6)
         AS jaccard
FROM bs a JOIN bs b ON a.s = b.s AND a.brand < b.brand
JOIN cnt ca ON ca.brand = a.brand
JOIN cnt cb ON cb.brand = b.brand
GROUP BY 1, 2 ORDER BY 1, 2
""",
    description="Brand-pair supplier affinity: for each unordered "
    "brand pair, suppliers shipping both, with Jaccard overlap of "
    "their supplier sets.  The pair join is an equi-join on the "
    "shared supplier key (per-supplier fan-out bounded by the fixed "
    "25-brand vocabulary, never all-pairs over suppliers); counts "
    "exact, one division.  The supply-chain redundancy map.",
)
def q_brand_supplier_affinity(spark, sf_dir):
    lineitem, part = load(spark, sf_dir, "lineitem", "part")
    bs = (
        lineitem.join(part, part["p_partkey"] == lineitem["l_partkey"])
        .select(F.col("p_brand").alias("brand"),
                F.col("l_suppkey").alias("s"))
        .distinct()
    )
    cnt = bs.groupBy("brand").agg(
        F.count(F.lit(1)).cast("long").alias("ns")
    )
    a = bs.alias("a")
    b = bs.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.s") == F.col("b.s"))
            & (F.col("a.brand") < F.col("b.brand")),
        )
        .groupBy(
            F.col("a.brand").alias("brand_a"),
            F.col("b.brand").alias("brand_b"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("shared"))
    )
    ca = cnt.select(F.col("brand").alias("brand_a"),
                    F.col("ns").alias("na"))
    cb = cnt.select(F.col("brand").alias("brand_b"),
                    F.col("ns").alias("nb"))
    return (
        pairs.join(F.broadcast(ca), "brand_a")
        .join(F.broadcast(cb), "brand_b")
        .select(
            "brand_a", "brand_b", "shared",
            F.round(
                F.col("shared").cast("double")
                / (F.col("na") + F.col("nb") - F.col("shared"))
                .cast("double"),
                6,
            ).alias("jaccard"),
        )
        .orderBy("brand_a", "brand_b")
    )


@staged(
    "q_quartile_dispersion",
    oracle=f"""
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
       quantile_cont({_OCENTS_DUCK}, 0.25) AS q1_cents,
       quantile_cont({_OCENTS_DUCK}, 0.75) AS q3_cents,
       round((quantile_cont({_OCENTS_DUCK}, 0.75)
              - quantile_cont({_OCENTS_DUCK}, 0.25)) /
             (quantile_cont({_OCENTS_DUCK}, 0.75)
              + quantile_cont({_OCENTS_DUCK}, 0.25)), 6) AS qcd
FROM orders GROUP BY 1 ORDER BY 1
""",
    description="Quartile coefficient of dispersion of order value "
    "per priority: (Q3-Q1)/(Q3+Q1) over exact integer cents — the "
    "robust, scale-free spread measure (the outlier-immune cousin "
    "of the coefficient of variation).  Both engines interpolate "
    "type-7 quantiles from identical integer multisets at identical "
    "h = p*(n-1), so the doubles agree bit-for-bit before round(6).",
)
def q_quartile_dispersion(spark, sf_dir):
    (orders,) = load(spark, sf_dir, "orders")
    c = orders.select(
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    return (
        c.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.expr("percentile(cents, 0.25)").alias("q1_cents"),
            F.expr("percentile(cents, 0.75)").alias("q3_cents"),
            F.round(
                (F.expr("percentile(cents, 0.75)")
                 - F.expr("percentile(cents, 0.25)"))
                / (F.expr("percentile(cents, 0.75)")
                   + F.expr("percentile(cents, 0.25)")),
                6,
            ).alias("qcd"),
        )
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# Corpus statistics: hapax share, arithmetic readability, token
# coverage thresholds, stopword-density bands.
# ---------------------------------------------------------------------------


@staged(
    "q_hapax_share",
    oracle="""
WITH w AS (
  SELECT source, unnest(string_split(text, ' ')) AS w
  FROM documents WHERE text IS NOT NULL),
     f AS (SELECT source, w, CAST(count(*) AS BIGINT) AS c
           FROM w GROUP BY 1, 2)
SELECT source,
       CAST(SUM(c) AS BIGINT) AS tokens,
       CAST(count(*) AS BIGINT) AS vocab,
       CAST(count(*) FILTER (WHERE c = 1) AS BIGINT) AS hapax,
       round(CAST(count(*) FILTER (WHERE c = 1) AS DOUBLE) /
             CAST(count(*) AS DOUBLE), 6) AS hapax_vocab_share,
       round(CAST(count(*) FILTER (WHERE c = 1) AS DOUBLE) /
             CAST(SUM(c) AS DOUBLE), 6) AS hapax_token_share
FROM f GROUP BY source ORDER BY source
""",
    description="Hapax legomena share per source: tokens seen "
    "exactly once as a fraction of vocabulary and of token mass — "
    "the productivity end of the frequency spectrum (complements "
    "Good-Turing's singleton mass estimate, r11, and Heaps' curve, "
    "r9).  One posting aggregate; exact counts, two divisions.",
)
def q_hapax_share(spark, sf_dir):
    (docs,) = load(spark, sf_dir, "documents")
    f = (
        docs.where(F.col("text").isNotNull())
        .select("source", F.explode(F.split("text", " ")).alias("w"))
        .groupBy("source", "w")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    return (
        f.groupBy("source")
        .agg(
            F.sum("c").cast("long").alias("tokens"),
            F.count(F.lit(1)).cast("long").alias("vocab"),
            F.count_if(F.col("c") == 1).cast("long").alias("hapax"),
            F.round(
                F.count_if(F.col("c") == 1).cast("double")
                / F.count(F.lit(1)).cast("double"),
                6,
            ).alias("hapax_vocab_share"),
            F.round(
                F.count_if(F.col("c") == 1).cast("double")
                / F.sum("c").cast("double"),
                6,
            ).alias("hapax_token_share"),
        )
        .orderBy("source")
    )


@staged(
    "q_readability_arith",
    oracle="""
WITH d AS (
  SELECT lang,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS words,
         CAST(n_chars AS BIGINT) AS chars,
         CAST(length(text) - length(replace(text, '.', '')) + 1
              AS BIGINT) AS sents
  FROM documents WHERE text IS NOT NULL)
SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(SUM(words) AS BIGINT) AS words,
       CAST(SUM(chars) AS BIGINT) AS chars,
       CAST(SUM(sents) AS BIGINT) AS sents,
       round(0.0588 * (100.0 * CAST(SUM(chars) AS DOUBLE)
                       / CAST(SUM(words) AS DOUBLE))
             - 0.296 * (100.0 * CAST(SUM(sents) AS DOUBLE)
                        / CAST(SUM(words) AS DOUBLE))
             - 15.8, 6) AS coleman_liau
FROM d GROUP BY lang ORDER BY lang
""",
    description="Coleman-Liau readability per language: "
    "0.0588*L - 0.296*S - 15.8 where L = chars per 100 words and "
    "S = sentences per 100 words — the readability index designed "
    "for machine scoring (character counts only, no syllable "
    "heuristics).  Sentences proxy as period count + 1 per doc; "
    "all counts exact integers aggregated corpus-wide, one fixed "
    "IEEE expression per language, round(6).",
)
def q_readability_arith(spark, sf_dir):
    (docs,) = load(spark, sf_dir, "documents")
    d = docs.where(F.col("text").isNotNull()).select(
        "lang",
        F.size(F.split("text", " ")).cast("long").alias("words"),
        F.col("n_chars").cast("long").alias("chars"),
        (
            F.length("text")
            - F.length(F.regexp_replace("text", r"\.", ""))
            + 1
        ).cast("long").alias("sents"),
    )
    g = d.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("words").cast("long").alias("words"),
        F.sum("chars").cast("long").alias("chars"),
        F.sum("sents").cast("long").alias("sents"),
    )
    return g.select(
        "lang", "n_docs", "words", "chars", "sents",
        F.round(
            0.0588
            * (100.0 * F.col("chars").cast("double")
               / F.col("words").cast("double"))
            - 0.296
            * (100.0 * F.col("sents").cast("double")
               / F.col("words").cast("double"))
            - 15.8,
            6,
        ).alias("coleman_liau"),
    ).orderBy("lang")


@staged(
    "q_token_coverage_thresholds",
    oracle="""
WITH f AS (
  SELECT w, CAST(count(*) AS BIGINT) AS c
  FROM (SELECT unnest(string_split(text, ' ')) AS w
        FROM documents WHERE text IS NOT NULL) GROUP BY 1),
     spec AS (
  SELECT c, CAST(count(*) AS BIGINT) AS m FROM f GROUP BY 1),
     cum AS (
  SELECT c, m,
         CAST(SUM(c * m) OVER (ORDER BY c DESC) AS BIGINT) AS cum_occ,
         CAST(SUM(m) OVER (ORDER BY c DESC) AS BIGINT) AS cum_tok
  FROM spec),
     tot AS (
  SELECT CAST(SUM(c * m) AS BIGINT) AS n,
         CAST(SUM(m) AS BIGINT) AS vocab FROM spec),
     t AS (SELECT unnest([50, 90, 99]) AS pct),
     hit AS (
  SELECT t.pct,
         (tot.n * t.pct + 99) // 100 AS target,
         MIN(cum.cum_occ) AS first_cum
  FROM t CROSS JOIN tot
  JOIN cum ON cum.cum_occ >= (tot.n * t.pct + 99) // 100
  GROUP BY 1, 2)
SELECT CAST(hit.pct AS BIGINT) AS pct,
       CAST(hit.target AS BIGINT) AS target_occurrences,
       CAST(cum.cum_tok - cum.m
            + (hit.target - (cum.cum_occ - cum.c * cum.m)
               + cum.c - 1) // cum.c AS BIGINT) AS tokens_needed,
       round(CAST(cum.cum_tok - cum.m
                  + (hit.target - (cum.cum_occ - cum.c * cum.m)
                     + cum.c - 1) // cum.c AS DOUBLE) /
             CAST((SELECT vocab FROM tot) AS DOUBLE), 6)
         AS vocab_share
FROM hit JOIN cum ON cum.cum_occ = hit.first_cum
ORDER BY pct
""",
    description="Token coverage thresholds off the frequency "
    "SPECTRUM: how many top-frequency tokens cover 50/90/99% of all "
    "occurrences.  The cumulative walk runs over the spectrum "
    "(distinct count values, O(sqrt(total tokens)) rows — the "
    "frequency-of-frequencies trick from Good-Turing, r11), never "
    "over the vocabulary, so the unpartitioned window is bounded; "
    "partial classes resolve with exact integer ceil division.  "
    "The vocabulary-truncation planning curve for tokenizers.",
)
def q_token_coverage_thresholds(spark, sf_dir):
    (docs,) = load(spark, sf_dir, "documents")
    f = (
        docs.where(F.col("text").isNotNull())
        .select(F.explode(F.split("text", " ")).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    spec = f.groupBy("c").agg(F.count(F.lit(1)).cast("long").alias("m"))
    wd = W.orderBy(F.col("c").desc()).rowsBetween(
        W.unboundedPreceding, 0
    )
    cum = spec.select(
        "c", "m",
        F.sum(F.col("c") * F.col("m")).over(wd).cast("long")
        .alias("cum_occ"),
        F.sum("m").over(wd).cast("long").alias("cum_tok"),
    )
    tot = spec.agg(
        F.sum(F.col("c") * F.col("m")).cast("long").alias("n"),
        F.sum("m").cast("long").alias("vocab"),
    )
    t = spark.createDataFrame([(50,), (90,), (99,)], "pct int")
    hit = (
        t.crossJoin(F.broadcast(tot))
        .join(
            cum,
            F.col("cum_occ")
            >= ((F.col("n") * F.col("pct") + 99) / 100).cast("long"),
        )
        .groupBy(
            F.col("pct").cast("long").alias("pct"),
            ((F.col("n") * F.col("pct") + 99) / 100).cast("long")
            .alias("target"),
            F.col("vocab"),
        )
        .agg(F.min("cum_occ").alias("first_cum"))
    )
    j = hit.join(cum, F.col("cum_occ") == F.col("first_cum"))
    needed = (
        F.col("cum_tok") - F.col("m")
        + (
            (
                F.col("target")
                - (F.col("cum_occ") - F.col("c") * F.col("m"))
                + F.col("c")
                - 1
            ) / F.col("c")
        ).cast("long")
    ).cast("long")
    return j.select(
        "pct",
        F.col("target").alias("target_occurrences"),
        needed.alias("tokens_needed"),
        F.round(
            needed.cast("double") / F.col("vocab").cast("double"), 6
        ).alias("vocab_share"),
    ).orderBy("pct")


_STOPWORDS = "('the','of','and','to','a','in','is','for','on','with')"


@staged(
    "q_stopword_density_bands",
    oracle=f"""
WITH d AS (
  SELECT source,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS tok_n,
         CAST(len(list_filter(string_split(text, ' '),
                              w -> w IN {_STOPWORDS})) AS BIGINT)
           AS stop_n
  FROM documents WHERE text IS NOT NULL
    AND len(string_split(text, ' ')) > 0)
SELECT source, CAST((stop_n * 10) // tok_n AS BIGINT) AS band,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(SUM(stop_n) AS BIGINT) AS stop_tokens,
       CAST(SUM(tok_n) AS BIGINT) AS tokens
FROM d GROUP BY 1, 2 ORDER BY 1, 2
""",
    description="Stopword-density bands per source: per-doc density "
    "of a fixed 10-word English function-word list, banded in exact "
    "integer tenths ((stop*10) div tokens).  High-density bands "
    "indicate natural prose, zero bands indicate code/tables — the "
    "cheap single-scan quality signal used alongside the Gopher "
    "ratios (r7) in filter cascades.",
)
def q_stopword_density_bands(spark, sf_dir):
    (docs,) = load(spark, sf_dir, "documents")
    d = (
        docs.where(F.col("text").isNotNull())
        .select(
            "source",
            F.size(F.split("text", " ")).cast("long").alias("tok_n"),
            F.expr(
                "cast(size(filter(split(text, ' '), "
                f"w -> w IN {_STOPWORDS})) as bigint)"
            ).alias("stop_n"),
        )
        .where(F.col("tok_n") > 0)
    )
    return (
        d.select(
            "source",
            ((F.col("stop_n") * 10) / F.col("tok_n")).cast("long")
            .alias("band"),
            "stop_n", "tok_n",
        )
        .groupBy("source", "band")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("stop_n").cast("long").alias("stop_tokens"),
            F.sum("tok_n").cast("long").alias("tokens"),
        )
        .orderBy("source", "band")
    )


# ---------------------------------------------------------------------------
# Embedding statistics: per-dimension sign concordance and the
# label-centroid cosine matrix.  Quantization keeps every aggregate
# exact; one IEEE expression per surfaced double.
# ---------------------------------------------------------------------------


@staged(
    "q_emb_dim_sign_concordance",
    oracle="""
WITH q AS (
  SELECT vec_id, u.pos AS pos,
         CASE WHEN CAST(u.x AS DOUBLE) > 0 THEN 1 ELSE 0 END AS sgn
  FROM embeddings,
       LATERAL (SELECT generate_subscripts(embedding, 1) AS pos,
                       unnest(embedding) AS x) u
  WHERE u.pos <= 8),
     pairs AS (
  SELECT a.pos AS d1, b.pos AS d2,
         CAST(count(*) FILTER (WHERE a.sgn = 1 AND b.sgn = 1)
              AS BIGINT) AS n11,
         CAST(count(*) FILTER (WHERE a.sgn = 1 AND b.sgn = 0)
              AS BIGINT) AS n10,
         CAST(count(*) FILTER (WHERE a.sgn = 0 AND b.sgn = 1)
              AS BIGINT) AS n01,
         CAST(count(*) FILTER (WHERE a.sgn = 0 AND b.sgn = 0)
              AS BIGINT) AS n00
  FROM q a JOIN q b ON a.vec_id = b.vec_id AND a.pos < b.pos
  GROUP BY 1, 2)
SELECT CAST(d1 AS BIGINT) AS d1, CAST(d2 AS BIGINT) AS d2,
       n11, n10, n01, n00,
       round(CAST(n11 * n00 - n10 * n01 AS DOUBLE) /
             sqrt(CAST(n11 + n10 AS DOUBLE)
                  * CAST(n01 + n00 AS DOUBLE)
                  * CAST(n11 + n01 AS DOUBLE)
                  * CAST(n10 + n00 AS DOUBLE)), 6) AS phi
FROM pairs ORDER BY d1, d2
""",
    description="Per-dimension sign concordance over the first 8 "
    "embedding dimensions: the 2x2 sign contingency table per "
    "unordered dim pair and its phi coefficient — the cheapest "
    "dimension-redundancy detector (|phi| near 1 means the two "
    "coordinates carry the same bit of information).  The pair join "
    "is per-vector with a FIXED 8-dim fan-out (28 pairs/vector); "
    "counts are exact integers, phi is one expression with the "
    "factors cast to double BEFORE multiplying (the BIGINT-overflow "
    "guard), round(6).",
)
def q_emb_dim_sign_concordance(spark, sf_dir):
    (emb,) = load(spark, sf_dir, "embeddings")
    q = (
        emb.select(
            "vec_id", F.posexplode("embedding").alias("pos0", "x")
        )
        .where(F.col("pos0") < 8)
        .select(
            "vec_id",
            (F.col("pos0") + 1).alias("pos"),
            F.when(F.col("x").cast("double") > 0, 1).otherwise(0)
            .alias("sgn"),
        )
    )
    a = q.alias("a")
    b = q.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.vec_id") == F.col("b.vec_id"))
            & (F.col("a.pos") < F.col("b.pos")),
        )
        .groupBy(
            F.col("a.pos").cast("long").alias("d1"),
            F.col("b.pos").cast("long").alias("d2"),
        )
        .agg(
            F.count_if((F.col("a.sgn") == 1) & (F.col("b.sgn") == 1))
            .cast("long").alias("n11"),
            F.count_if((F.col("a.sgn") == 1) & (F.col("b.sgn") == 0))
            .cast("long").alias("n10"),
            F.count_if((F.col("a.sgn") == 0) & (F.col("b.sgn") == 1))
            .cast("long").alias("n01"),
            F.count_if((F.col("a.sgn") == 0) & (F.col("b.sgn") == 0))
            .cast("long").alias("n00"),
        )
    )
    return pairs.select(
        "d1", "d2", "n11", "n10", "n01", "n00",
        F.round(
            (F.col("n11") * F.col("n00") - F.col("n10") * F.col("n01"))
            .cast("double")
            / F.sqrt(
                (F.col("n11") + F.col("n10")).cast("double")
                * (F.col("n01") + F.col("n00")).cast("double")
                * (F.col("n11") + F.col("n01")).cast("double")
                * (F.col("n10") + F.col("n00")).cast("double")
            ),
            6,
        ).alias("phi"),
    ).orderBy("d1", "d2")


@staged(
    "q_emb_centroid_cosine_matrix",
    oracle="""
WITH q AS (
  SELECT label, u.pos AS pos,
         CAST(floor(CAST(u.x AS DOUBLE) * 1000000) AS BIGINT) AS qv
  FROM embeddings,
       LATERAL (SELECT generate_subscripts(embedding, 1) AS pos,
                       unnest(embedding) AS x) u),
     s AS (
  SELECT label, pos, CAST(SUM(qv) AS DECIMAL(38,0)) AS sl
  FROM q GROUP BY 1, 2),
     pairs AS (
  SELECT a.label AS label_a, b.label AS label_b,
         CAST(SUM(a.sl * b.sl) AS DECIMAL(38,0)) AS dot,
         CAST(SUM(a.sl * a.sl) AS DECIMAL(38,0)) AS na2,
         CAST(SUM(b.sl * b.sl) AS DECIMAL(38,0)) AS nb2
  FROM s a JOIN s b ON a.pos = b.pos AND a.label < b.label
  GROUP BY 1, 2)
SELECT CAST(label_a AS BIGINT) AS label_a,
       CAST(label_b AS BIGINT) AS label_b,
       round(CAST(dot AS DOUBLE) /
             (sqrt(CAST(na2 AS DOUBLE)) * sqrt(CAST(nb2 AS DOUBLE))),
             6) AS centroid_cosine
FROM pairs ORDER BY label_a, label_b
""",
    description="Label-centroid cosine matrix: cosine similarity "
    "between every pair of label centroids.  The count denominators "
    "cancel algebraically (cos(sa/na, sb/nb) = cos(sa, sb)), so the "
    "per-dimension quantized sums (floor(double(x)*1e6), the r14 "
    "idiom) feed decimal-exact dot products directly; sqrt/divide "
    "is the single IEEE step, round(6).  The join is on the "
    "64-dimension axis of a label-count-sized frame — the "
    "label-confusability map that flags collapsing classes.",
)
def q_emb_centroid_cosine_matrix(spark, sf_dir):
    (emb,) = load(spark, sf_dir, "embeddings")
    q = emb.select(
        "label", F.posexplode("embedding").alias("pos0", "x")
    ).select(
        "label",
        (F.col("pos0") + 1).alias("pos"),
        F.floor(F.col("x").cast("double") * 1000000).cast("long")
        .alias("qv"),
    )
    s = q.groupBy("label", "pos").agg(
        F.sum("qv").cast("decimal(38,0)").alias("sl")
    )
    a = s.alias("a")
    b = s.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.pos") == F.col("b.pos"))
            & (F.col("a.label") < F.col("b.label")),
        )
        .groupBy(
            F.col("a.label").cast("long").alias("label_a"),
            F.col("b.label").cast("long").alias("label_b"),
        )
        .agg(
            F.sum(F.col("a.sl") * F.col("b.sl"))
            .cast("decimal(38,0)").alias("dot"),
            F.sum(F.col("a.sl") * F.col("a.sl"))
            .cast("decimal(38,0)").alias("na2"),
            F.sum(F.col("b.sl") * F.col("b.sl"))
            .cast("decimal(38,0)").alias("nb2"),
        )
    )
    return pairs.select(
        "label_a", "label_b",
        F.round(
            F.col("dot").cast("double")
            / (
                F.sqrt(F.col("na2").cast("double"))
                * F.sqrt(F.col("nb2").cast("double"))
            ),
            6,
        ).alias("centroid_cosine"),
    ).orderBy("label_a", "label_b")
