"""Staged registry wave for round 19 — new operator surface (built
during round 12; the staging pipeline runs waves ahead so every
activation is a zero-risk REGISTRY.update of parity-proven queries).

Same staging workflow as the round-6..18 waves: every query here is
oracle-parity-verified NOW (bit-exact vs DuckDB at sf0.001 and sf0.01
via ``tests/test_staged_r19_parity.py``; ``scripts/strict_parity.py
--staged`` widens the sweep to sf0.1) but held OUT of
:data:`clickbom_spark.queries.REGISTRY` until round-19 activation::

    from clickbom_spark.queries import staged_r19  # noqa: F401
    REGISTRY.update(staged_r19.STAGED_R19)

in ``queries/__init__.py``.

Round-19 themes:

* **Dialect round-trips** — the ``arrayJoin()`` function form (the
  row-multiplying spelling, distinct from the ARRAY JOIN clause),
  the round-12 ``toISOWeek/toISOYear`` calendar mappings, ``ANY
  INNER JOIN``, Sunday-start ``toStartOfWeek`` weekly rollups, and
  ``INTERSECT DISTINCT`` / ``EXCEPT DISTINCT`` set operations.
* **Behavioral analytics** — consecutive-day activity streaks
  (gaps-and-islands), session bounce rates by entry event, D1/D7
  cohort retention, inter-purchase gap quartiles, value by
  in-session depth, peak day-hour cells per event type.
* **Relational profiles** — cheapest-line supplier wins, balance ×
  activity matrices on the distributed rank, return rates by ship
  month, part-type price ladders, nation × quarter order mixes.
* **Corpus statistics** — sentence-length bands, numeric-token
  share, token case profiles, corpus-hapax document scoring.
* **Embedding geometry** — cosine-to-own-centroid bands and
  centroid-purity (nearest-centroid == own label) per label.
* **Lake lifecycle** — projection refresh: a stored projection
  rolled forward through base-table mutations, re-based, and read
  back exactly.

Float determinism policy (same as the registry): exact integer /
decimal aggregates first, then ONE fixed IEEE expression per surfaced
double — identical text on both engines — and ``round(x, 6)`` on
surfaced statistics.  Embedding elements quantize as
``floor(double(x)·10⁶)`` so every sum is exact; cosine comparisons
happen on bit-identical doubles (same integer inputs, same
expression text) so argmax picks agree cross-engine.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from clickbom_spark.queries import QuerySpec, load

STAGED_R19: dict[str, QuerySpec] = {}


def staged(name: str, oracle: str | None = None, description: str = "",
           bench: bool = False):
    def deco(fn):
        STAGED_R19[name] = QuerySpec(name, fn, oracle, description, bench)
        return fn

    return deco


_CENTS_DUCK = "CAST(round(value * 100) AS BIGINT)"
_OCENTS_DUCK = "CAST(round(o_totalprice * 100) AS BIGINT)"
_LCENTS_DUCK = "CAST(round(l_extendedprice * 100) AS BIGINT)"


# ---------------------------------------------------------------------------
# Dialect round-trips.
# ---------------------------------------------------------------------------

_CH_ARRAYJOIN_FN = """
SELECT source, w, count() AS n
FROM (SELECT source, arrayJoin(splitByChar(' ', text)) AS w
      FROM documents WHERE text IS NOT NULL)
WHERE length(w) >= 7
GROUP BY source, w
HAVING count() >= 3
ORDER BY source, w
"""


@staged(
    "q_dialect_arrayjoin_fn",
    oracle="""
SELECT source, w, CAST(count(*) AS BIGINT) AS n
FROM (SELECT source, unnest(string_split(text, ' ')) AS w
      FROM documents WHERE text IS NOT NULL)
WHERE length(w) >= 7
GROUP BY source, w
HAVING count(*) >= 3
ORDER BY source, w
""",
    description="The `arrayJoin()` FUNCTION form (ClickHouse's "
    "row-multiplying expression, distinct from the ARRAY JOIN "
    "clause) compiled to explode(): long-token frequencies per "
    "source with a HAVING floor.  splitByChar's separator arrives "
    "regex-escaped so Spark's split sees a literal space.",
)
def q_dialect_arrayjoin_fn(spark, sf_dir):
    from clickbom_spark.dialect import run_clickhouse_sql

    out = run_clickhouse_sql(spark, _CH_ARRAYJOIN_FN, sf_dir)
    return out.select(
        "source", "w", F.col("n").cast("long").alias("n")
    ).orderBy("source", "w")


_CH_ISO_CALENDAR = """
SELECT toISOYear(o_orderdate) AS iso_year,
       toISOWeek(o_orderdate) AS iso_week,
       count() AS n,
       sum(toInt64(round(o_totalprice * 100))) AS cents
FROM orders
WHERE o_orderdate < toDate('1995-03-01')
GROUP BY iso_year, iso_week
ORDER BY iso_year, iso_week
"""


@staged(
    "q_dialect_iso_calendar",
    oracle=f"""
SELECT CAST(isoyear(CAST(o_orderdate AS DATE)) AS BIGINT) AS iso_year,
       CAST(weekofyear(CAST(o_orderdate AS DATE)) AS BIGINT) AS iso_week,
       CAST(count(*) AS BIGINT) AS n,
       CAST(SUM({_OCENTS_DUCK}) AS BIGINT) AS cents
FROM orders
WHERE CAST(o_orderdate AS DATE) < DATE '1995-03-01'
GROUP BY 1, 2 ORDER BY 1, 2
""",
    description="toISOYear/toISOWeek (round-12 mappings → "
    "extract(YEAROFWEEK)/weekofyear) rolling order revenue into the "
    "ISO-8601 week calendar across a year boundary — the window "
    "where ISO year != calendar year (1995-01-01 was a Sunday, so "
    "it belongs to ISO week 52 of ISO year 1994); DuckDB's "
    "isoyear/weekofyear are the same ISO calendar.",
)
def q_dialect_iso_calendar(spark, sf_dir):
    from clickbom_spark.dialect import run_clickhouse_sql

    out = run_clickhouse_sql(spark, _CH_ISO_CALENDAR, sf_dir)
    return out.select(
        F.col("iso_year").cast("long").alias("iso_year"),
        F.col("iso_week").cast("long").alias("iso_week"),
        F.col("n").cast("long").alias("n"),
        F.col("cents").cast("long").alias("cents"),
    ).orderBy("iso_year", "iso_week")


_CH_ANY_INNER = """
SELECT o.o_orderpriority, count() AS n_orders_with_returns
FROM orders AS o
ANY INNER JOIN (SELECT l_orderkey, l_returnflag FROM lineitem
                WHERE l_returnflag = 'R') AS r
ON o.o_orderkey = r.l_orderkey
GROUP BY o.o_orderpriority ORDER BY o.o_orderpriority
"""


@staged(
    "q_dialect_any_inner",
    oracle="""
SELECT o_orderpriority, CAST(count(*) AS BIGINT)
         AS n_orders_with_returns
FROM orders
WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                     WHERE l_returnflag = 'R')
GROUP BY 1 ORDER BY 1
""",
    description="ANY INNER JOIN as the ClickHouse semi-join idiom: "
    "the right side dedups to at most one row per key "
    "(max_by(struct(*), 1) subquery — the dialect's ANY compile), "
    "making the join equivalent to an IN-subquery count.  The "
    "surviving duplicate is value-deterministic here because every "
    "right row of a key carries the identical ('R') payload — the "
    "same determinism contract the ANY JOIN unit law pins.",
)
def q_dialect_any_inner(spark, sf_dir):
    from clickbom_spark.dialect import run_clickhouse_sql

    out = run_clickhouse_sql(spark, _CH_ANY_INNER, sf_dir)
    return out.select(
        "o_orderpriority",
        F.col("n_orders_with_returns").cast("long")
        .alias("n_orders_with_returns"),
    ).orderBy("o_orderpriority")


_CH_WEEK_GRAIN = """
SELECT toStartOfWeek(toDate(ts)) AS wk,
       count() AS n,
       uniqExact(user_id) AS users,
       sum(toInt64(round(value * 100))) AS cents
FROM events GROUP BY wk ORDER BY wk
"""


@staged(
    "q_dialect_week_grain",
    oracle=f"""
SELECT strftime(CAST(date_trunc('week', CAST(ts AS DATE) + 1)
                     - INTERVAL 1 DAY AS DATE), '%Y-%m-%d') AS wk,
       CAST(count(*) AS BIGINT) AS n,
       CAST(count(DISTINCT user_id) AS BIGINT) AS users,
       CAST(SUM({_CENTS_DUCK}) AS BIGINT) AS cents
FROM events GROUP BY 1 ORDER BY 1
""",
    description="Sunday-start weekly rollup: ClickHouse "
    "toStartOfWeek default mode 0 starts weeks on SUNDAY, so the "
    "dialect shifts Spark's Monday-truncating date_trunc('WEEK') by "
    "one day each way; the DuckDB oracle replays the same shift on "
    "its Monday-start date_trunc('week').  Weekly actives and "
    "revenue on the shifted grain.",
)
def q_dialect_week_grain(spark, sf_dir):
    from clickbom_spark.dialect import run_clickhouse_sql

    out = run_clickhouse_sql(spark, _CH_WEEK_GRAIN, sf_dir)
    return out.select(
        F.date_format("wk", "yyyy-MM-dd").alias("wk"),
        F.col("n").cast("long").alias("n"),
        F.col("users").cast("long").alias("users"),
        F.col("cents").cast("long").alias("cents"),
    ).orderBy("wk")


_CH_SET_OPS = """
SELECT count() AS n_active_no_urgent FROM (
  SELECT c_custkey FROM customer WHERE c_acctbal > 0
  INTERSECT DISTINCT
  SELECT o_custkey FROM orders
  EXCEPT DISTINCT
  SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
)
"""


@staged(
    "q_dialect_set_ops",
    oracle="""
SELECT CAST(count(*) AS BIGINT) AS n_active_no_urgent FROM (
  SELECT c_custkey FROM customer WHERE c_acctbal > 0
  INTERSECT
  SELECT o_custkey FROM orders
  EXCEPT
  SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
)
""",
    description="INTERSECT DISTINCT / EXCEPT DISTINCT chain through "
    "the shim: positive-balance customers with at least one order "
    "and no urgent order.  The DISTINCT spellings are explicit "
    "because ClickHouse's bare INTERSECT/EXCEPT keep duplicates "
    "(ALL semantics) while Spark's default is DISTINCT — writing "
    "the modifier makes the two engines' semantics coincide; "
    "DuckDB's bare set ops are already DISTINCT.",
)
def q_dialect_set_ops(spark, sf_dir):
    from clickbom_spark.dialect import run_clickhouse_sql

    out = run_clickhouse_sql(spark, _CH_SET_OPS, sf_dir)
    return out.select(
        F.col("n_active_no_urgent").cast("long")
        .alias("n_active_no_urgent")
    )


# ---------------------------------------------------------------------------
# Behavioral analytics.
# ---------------------------------------------------------------------------


@staged(
    "q_activity_streaks",
    oracle="""
WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d
            FROM events),
     isl AS (
  SELECT user_id,
         d - CAST(row_number() OVER (PARTITION BY user_id ORDER BY d)
                  AS INTEGER) AS anchor
  FROM ud),
     runs AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS len
  FROM isl GROUP BY user_id, anchor),
     best AS (
  SELECT user_id, CAST(MAX(len) AS BIGINT) AS streak
  FROM runs GROUP BY 1)
SELECT streak, CAST(count(*) AS BIGINT) AS n_users
FROM best GROUP BY 1 ORDER BY 1
""",
    description="Longest consecutive-day activity streak per user, "
    "as a population histogram: the gaps-and-islands identity "
    "(day - per-user day rank is constant exactly on consecutive "
    "runs) turns streak detection into two hash aggregates after "
    "one per-user window over distinct days — bounded by each "
    "user's active-day count, no global sort.  The habit-formation "
    "metric behind DAU forecasting.",
)
def q_activity_streaks(spark, sf_dir):
    (events,) = load(spark, sf_dir, "events")
    ud = events.select(
        "user_id", F.to_date("ts").alias("d")
    ).distinct()
    wu = W.partitionBy("user_id").orderBy("d")
    isl = ud.select(
        "user_id",
        F.date_sub(
            F.col("d"), F.row_number().over(wu)
        ).alias("anchor"),
    )
    runs = isl.groupBy("user_id", "anchor").agg(
        F.count(F.lit(1)).cast("long").alias("len")
    )
    best = runs.groupBy("user_id").agg(
        F.max("len").cast("long").alias("streak")
    )
    return (
        best.groupBy("streak")
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
        .orderBy("streak")
    )


@staged(
    "q_session_bounce_rate",
    oracle="""
WITH o AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER (
                PARTITION BY user_id ORDER BY ts, event_id)
              > 1800000000 THEN 1 ELSE 0 END AS brk
  FROM events),
     s AS (
  SELECT user_id, ts, event_id, event_type,
         SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS sess
  FROM o),
     s2 AS (
  SELECT user_id, sess, event_type,
         first_value(event_type) OVER (
           PARTITION BY user_id, sess ORDER BY ts, event_id)
           AS entry_type
  FROM s),
     per_sess AS (
  SELECT user_id, sess,
         CAST(count(*) AS BIGINT) AS n_events,
         MIN(entry_type) AS entry_type
  FROM s2 GROUP BY 1, 2)
SELECT entry_type, CAST(count(*) AS BIGINT) AS n_sessions,
       CAST(count(*) FILTER (WHERE n_events = 1) AS BIGINT)
         AS bounces,
       round(CAST(count(*) FILTER (WHERE n_events = 1) AS DOUBLE) /
             CAST(count(*) AS DOUBLE), 6) AS bounce_rate
FROM per_sess GROUP BY 1 ORDER BY 1
""",
    description="Session bounce rate by entry event type: sessions "
    "are 30-minute-gap islands (running sum of break flags over the "
    "deterministic (ts, event_id) per-user order), a bounce is a "
    "single-event session, and the entry type is the session's "
    "first event (min_by on the same total order).  Landing-page "
    "quality, re-expressed on the event stream.",
)
def q_session_bounce_rate(spark, sf_dir):
    from clickbom_spark.queries import epoch_us

    (events,) = load(spark, sf_dir, "events")
    wu = W.partitionBy("user_id").orderBy("ts", "event_id")
    o = events.select(
        "user_id", "ts", "event_id", "event_type",
        F.when(
            epoch_us("ts") - F.lag(epoch_us("ts")).over(wu) > 1800000000,
            1,
        ).otherwise(0).alias("brk"),
    )
    s = o.select(
        "user_id", "ts", "event_id", "event_type",
        F.sum("brk").over(
            wu.rowsBetween(W.unboundedPreceding, 0)
        ).alias("sess"),
    )
    per_sess = s.groupBy("user_id", "sess").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.min_by(
            "event_type", F.struct("ts", "event_id")
        ).alias("entry_type"),
    )
    return (
        per_sess.groupBy("entry_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_sessions"),
            F.count_if(F.col("n_events") == 1).cast("long")
            .alias("bounces"),
            F.round(
                F.count_if(F.col("n_events") == 1).cast("double")
                / F.count(F.lit(1)).cast("double"),
                6,
            ).alias("bounce_rate"),
        )
        .orderBy("entry_type")
    )


@staged(
    "q_retention_d1_d7",
    oracle="""
WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d
            FROM events),
     firsts AS (SELECT user_id, MIN(d) AS d0 FROM ud GROUP BY 1)
SELECT strftime(f.d0, '%Y-%m-%d') AS cohort_day,
       CAST(count(*) AS BIGINT) AS cohort_users,
       CAST(count(*) FILTER (WHERE EXISTS (
         SELECT 1 FROM ud u WHERE u.user_id = f.user_id
           AND u.d = f.d0 + 1)) AS BIGINT) AS d1_retained,
       CAST(count(*) FILTER (WHERE EXISTS (
         SELECT 1 FROM ud u WHERE u.user_id = f.user_id
           AND u.d = f.d0 + 7)) AS BIGINT) AS d7_retained,
       round(CAST(count(*) FILTER (WHERE EXISTS (
         SELECT 1 FROM ud u WHERE u.user_id = f.user_id
           AND u.d = f.d0 + 1)) AS DOUBLE)
             / CAST(count(*) AS DOUBLE), 6) AS d1_rate,
       round(CAST(count(*) FILTER (WHERE EXISTS (
         SELECT 1 FROM ud u WHERE u.user_id = f.user_id
           AND u.d = f.d0 + 7)) AS DOUBLE)
             / CAST(count(*) AS DOUBLE), 6) AS d7_rate
FROM firsts f GROUP BY f.d0 ORDER BY cohort_day
""",
    description="Classic D1/D7 retention by acquisition cohort: for "
    "each first-active day, the share of users active again exactly "
    "one and exactly seven days later.  Spark side is two LEFT "
    "SEMI-shaped joins of the firsts frame back to user-days on "
    "(user, d0+k) — linear equi-joins on the user key, the "
    "growth-accounting standard.",
)
def q_retention_d1_d7(spark, sf_dir):
    (events,) = load(spark, sf_dir, "events")
    ud = events.select(
        "user_id", F.to_date("ts").alias("d")
    ).distinct()
    firsts = ud.groupBy("user_id").agg(F.min("d").alias("d0"))
    d1 = ud.select(
        "user_id", F.date_sub("d", 1).alias("d0")
    ).distinct().withColumn("r1", F.lit(1))
    d7 = ud.select(
        "user_id", F.date_sub("d", 7).alias("d0")
    ).distinct().withColumn("r7", F.lit(1))
    j = (
        firsts.join(d1, ["user_id", "d0"], "left")
        .join(d7, ["user_id", "d0"], "left")
    )
    return (
        j.groupBy("d0")
        .agg(
            F.count(F.lit(1)).cast("long").alias("cohort_users"),
            F.sum(F.coalesce(F.col("r1"), F.lit(0))).cast("long")
            .alias("d1_retained"),
            F.sum(F.coalesce(F.col("r7"), F.lit(0))).cast("long")
            .alias("d7_retained"),
            F.round(
                F.sum(F.coalesce(F.col("r1"), F.lit(0))).cast("double")
                / F.count(F.lit(1)).cast("double"),
                6,
            ).alias("d1_rate"),
            F.round(
                F.sum(F.coalesce(F.col("r7"), F.lit(0))).cast("double")
                / F.count(F.lit(1)).cast("double"),
                6,
            ).alias("d7_rate"),
        )
        .select(
            F.date_format("d0", "yyyy-MM-dd").alias("cohort_day"),
            "cohort_users", "d1_retained", "d7_retained",
            "d1_rate", "d7_rate",
        )
        .orderBy("cohort_day")
    )


@staged(
    "q_interpurchase_gap_quartiles",
    oracle="""
WITH p AS (
  SELECT user_id, ts, event_id,
         lag(ts) OVER (PARTITION BY user_id
                       ORDER BY ts, event_id) AS prev_ts
  FROM events WHERE event_type = 'purchase'),
     g AS (
  SELECT (epoch_us(ts) - epoch_us(prev_ts)) // 60000000 AS gap_min
  FROM p WHERE prev_ts IS NOT NULL)
SELECT CAST(count(*) AS BIGINT) AS n_gaps,
       quantile_cont(gap_min, 0.25) AS q1_min,
       quantile_cont(gap_min, 0.50) AS med_min,
       quantile_cont(gap_min, 0.75) AS q3_min,
       CAST(MAX(gap_min) AS BIGINT) AS max_min
FROM g
""",
    description="Inter-purchase gap quartiles: minutes between "
    "consecutive purchases of the same user (per-user lag window on "
    "the deterministic total order), summarized with exact type-7 "
    "quartiles over integer minutes — the repeat-purchase cadence "
    "that sets reorder-reminder timing.  Minute truncation keeps "
    "every surfaced quantile a dyadic rational, bit-equal across "
    "engines.",
)
def q_interpurchase_gap_quartiles(spark, sf_dir):
    from clickbom_spark.queries import epoch_us

    (events,) = load(spark, sf_dir, "events")
    wu = W.partitionBy("user_id").orderBy("ts", "event_id")
    p = events.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id",
        F.lag("ts").over(wu).alias("prev_ts"),
    )
    g = p.where(F.col("prev_ts").isNotNull()).select(
        F.floor(
            (epoch_us("ts") - epoch_us("prev_ts")) / 60000000
        ).cast("long").alias("gap_min")
    )
    return g.agg(
        F.count(F.lit(1)).cast("long").alias("n_gaps"),
        F.expr("percentile(gap_min, 0.25)").alias("q1_min"),
        F.expr("percentile(gap_min, 0.50)").alias("med_min"),
        F.expr("percentile(gap_min, 0.75)").alias("q3_min"),
        F.max("gap_min").cast("long").alias("max_min"),
    )


@staged(
    "q_event_value_by_session_depth",
    oracle="""
WITH o AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER (
                PARTITION BY user_id ORDER BY ts, event_id)
              > 1800000000 THEN 1 ELSE 0 END AS brk
  FROM events),
     s AS (
  SELECT user_id, ts, event_id, value,
         SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS sess
  FROM o),
     s2 AS (
  SELECT value,
         row_number() OVER (PARTITION BY user_id, sess
                            ORDER BY ts, event_id) AS idx
  FROM s),
     banded AS (
  SELECT CASE WHEN idx = 1 THEN '1' WHEN idx = 2 THEN '2'
              WHEN idx <= 5 THEN '3-5' WHEN idx <= 10 THEN '6-10'
              ELSE '11+' END AS depth_band,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM s2)
SELECT depth_band, CAST(count(*) AS BIGINT) AS n_events,
       CAST(SUM(cents) AS BIGINT) AS cents,
       round(CAST(SUM(cents) AS DOUBLE) / count(*), 6) AS avg_cents
FROM banded GROUP BY 1 ORDER BY 1
""",
    description="Event value by in-session depth: events indexed "
    "inside their 30-minute-gap session (running-sum sessionization "
    "+ per-session row_number, both on the per-user deterministic "
    "order), banded 1/2/3-5/6-10/11+ — does value concentrate at "
    "session entry or deep in the visit?  All windows partition by "
    "user (then session): parallelism follows the user key.",
)
def q_event_value_by_session_depth(spark, sf_dir):
    from clickbom_spark.queries import epoch_us

    (events,) = load(spark, sf_dir, "events")
    wu = W.partitionBy("user_id").orderBy("ts", "event_id")
    o = events.select(
        "user_id", "ts", "event_id", "value",
        F.when(
            epoch_us("ts") - F.lag(epoch_us("ts")).over(wu) > 1800000000,
            1,
        ).otherwise(0).alias("brk"),
    )
    s = o.select(
        "user_id", "ts", "event_id", "value",
        F.sum("brk").over(
            wu.rowsBetween(W.unboundedPreceding, 0)
        ).alias("sess"),
    )
    ws = W.partitionBy("user_id", "sess").orderBy("ts", "event_id")
    banded = s.select(
        F.when(F.row_number().over(ws) == 1, "1")
        .when(F.row_number().over(ws) == 2, "2")
        .when(F.row_number().over(ws) <= 5, "3-5")
        .when(F.row_number().over(ws) <= 10, "6-10")
        .otherwise("11+").alias("depth_band"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    return (
        banded.groupBy("depth_band")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum("cents").cast("long").alias("cents"),
            F.round(
                F.sum("cents").cast("double")
                / F.count(F.lit(1)).cast("double"),
                6,
            ).alias("avg_cents"),
        )
        .orderBy("depth_band")
    )


@staged(
    "q_event_dow_hour_peak",
    oracle="""
WITH cells AS (
  SELECT event_type,
         CAST(isodow(ts) AS BIGINT) AS dow,
         CAST(hour(ts) AS BIGINT) AS hr,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2, 3),
     tot AS (SELECT event_type, CAST(SUM(n) AS BIGINT) AS total
             FROM cells GROUP BY 1),
     ranked AS (
  SELECT event_type, dow, hr, n,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY n DESC, dow, hr) AS rk
  FROM cells)
SELECT r.event_type, r.dow AS peak_dow, r.hr AS peak_hour, r.n
         AS peak_events,
       round(CAST(r.n AS DOUBLE) / CAST(t.total AS DOUBLE), 6)
         AS peak_share
FROM ranked r JOIN tot t USING (event_type)
WHERE r.rk = 1 ORDER BY r.event_type
""",
    description="Peak day-of-week x hour cell per event type with "
    "its share of type volume: the 168-cell heat grid per type is a "
    "bounded aggregate frame, the peak pick a row_number over that "
    "frame with (count DESC, dow, hr) deterministic tie-break.  ISO "
    "day-of-week on both engines (Monday=1).",
)
def q_event_dow_hour_peak(spark, sf_dir):
    (events,) = load(spark, sf_dir, "events")
    cells = events.groupBy(
        "event_type",
        F.dayofweek(F.col("ts")).alias("dow_sun"),
        F.hour(F.col("ts")).cast("long").alias("hr"),
    ).agg(F.count(F.lit(1)).cast("long").alias("n")).select(
        "event_type",
        # Spark dayofweek: Sunday=1..Saturday=7 -> ISO Monday=1
        ((F.col("dow_sun") + 5) % 7 + 1).cast("long").alias("dow"),
        "hr", "n",
    )
    tot = cells.groupBy("event_type").agg(
        F.sum("n").cast("long").alias("total")
    )
    wr = W.partitionBy("event_type").orderBy(
        F.col("n").desc(), "dow", "hr"
    )
    ranked = cells.withColumn("rk", F.row_number().over(wr))
    return (
        ranked.where(F.col("rk") == 1)
        .join(F.broadcast(tot), "event_type")
        .select(
            "event_type",
            F.col("dow").alias("peak_dow"),
            F.col("hr").alias("peak_hour"),
            F.col("n").alias("peak_events"),
            F.round(
                F.col("n").cast("double") / F.col("total").cast("double"),
                6,
            ).alias("peak_share"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Relational profiles.
# ---------------------------------------------------------------------------


@staged(
    "q_min_price_supplier_wins",
    oracle=f"""
WITH lines AS (
  SELECT l_partkey, l_suppkey, {_LCENTS_DUCK} AS cents
  FROM lineitem),
     ranked AS (
  SELECT l_partkey, l_suppkey, cents,
         row_number() OVER (PARTITION BY l_partkey
                            ORDER BY cents, l_suppkey) AS rk
  FROM lines),
     wins AS (
  SELECT l_partkey, l_suppkey AS win_supp, cents AS win_cents
  FROM ranked WHERE rk = 1)
SELECT n.n_name,
       CAST(count(*) AS BIGINT) AS parts_won,
       CAST(SUM(win_cents) AS BIGINT) AS cents
FROM wins w
JOIN supplier s ON s.s_suppkey = w.win_supp
JOIN nation n ON n.n_nationkey = s.s_nationkey
GROUP BY 1 ORDER BY 1
""",
    description="Cheapest-line supplier wins by nation (the TPC-H "
    "Q2 idea re-expressed on lineitem, this corpus having no "
    "partsupp): per part, the supplier of the cheapest line "
    "(deterministic (cents, suppkey) tie-break via min_by on a "
    "struct), rolled up to the winner's nation.  One hash aggregate "
    "per part, two bounded dim joins — no window at all.",
)
def q_min_price_supplier_wins(spark, sf_dir):
    lineitem, supplier, nation = load(
        spark, sf_dir, "lineitem", "supplier", "nation"
    )
    lines = lineitem.select(
        "l_partkey", "l_suppkey",
        F.round(F.col("l_extendedprice") * 100).cast("long")
        .alias("cents"),
    )
    wins = lines.groupBy("l_partkey").agg(
        F.min_by(
            "l_suppkey", F.struct("cents", "l_suppkey")
        ).alias("win_supp"),
        F.min("cents").alias("win_cents"),
    )
    return (
        wins.join(supplier, supplier["s_suppkey"] == wins["win_supp"])
        .join(F.broadcast(nation),
              nation["n_nationkey"] == supplier["s_nationkey"])
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).cast("long").alias("parts_won"),
            F.sum("win_cents").cast("long").alias("cents"),
        )
        .orderBy("n_name")
    )


@staged(
    "q_balance_activity_matrix",
    oracle="""
WITH bal AS (
  SELECT c_custkey,
         CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents
  FROM customer),
     ranked AS (
  SELECT c_custkey, bal_cents,
         row_number() OVER (ORDER BY bal_cents, c_custkey) AS rn,
         (SELECT CAST(count(*) AS BIGINT) FROM bal) AS n
  FROM bal),
     q AS (
  SELECT c_custkey,
         CAST(((rn - 1) * 4) // n + 1 AS BIGINT) AS bal_quartile
  FROM ranked),
     act AS (
  SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders
  FROM orders GROUP BY 1)
SELECT q.bal_quartile,
       CASE WHEN a.n_orders IS NULL THEN '0'
            WHEN a.n_orders <= 5 THEN '1-5'
            WHEN a.n_orders <= 15 THEN '6-15'
            ELSE '16+' END AS order_band,
       CAST(count(*) AS BIGINT) AS n_customers
FROM q LEFT JOIN act a ON a.o_custkey = q.c_custkey
GROUP BY 1, 2 ORDER BY 1, 2
""",
    description="Account-balance quartile x order-activity band "
    "matrix: quartiles come from the ext/ranks value-bucketed "
    "distributed rank (exact integer assignment, no total-order "
    "window), activity from a per-customer order count LEFT-joined "
    "so inactive customers land in band '0'.  Does money predict "
    "engagement?  The CRM segmentation cross-tab.",
)
def q_balance_activity_matrix(spark, sf_dir):
    from clickbom_spark.ext.ranks import with_global_rank

    orders, customer = load(spark, sf_dir, "orders", "customer")
    bal = customer.select(
        "c_custkey",
        F.round(F.col("c_acctbal") * 100).cast("long")
        .alias("bal_cents"),
    )
    ranked = with_global_rank(
        bal, ["bal_cents", "c_custkey"], rank_col="rn", total_col="n"
    )
    q = ranked.select(
        "c_custkey",
        ((((F.col("rn") - 1) * 4).cast("long") / F.col("n"))
         .cast("long") + 1).alias("bal_quartile"),
    )
    act = orders.groupBy("o_custkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders")
    )
    j = q.join(act, act["o_custkey"] == q["c_custkey"], "left")
    return (
        j.select(
            "bal_quartile",
            F.when(F.col("n_orders").isNull(), "0")
            .when(F.col("n_orders") <= 5, "1-5")
            .when(F.col("n_orders") <= 15, "6-15")
            .otherwise("16+").alias("order_band"),
        )
        .groupBy("bal_quartile", "order_band")
        .agg(F.count(F.lit(1)).cast("long").alias("n_customers"))
        .orderBy("bal_quartile", "order_band")
    )


@staged(
    "q_returns_rate_by_ship_month",
    oracle=f"""
SELECT strftime(CAST(l_shipdate AS DATE), '%Y-%m') AS ship_month,
       CAST(count(*) AS BIGINT) AS n_lines,
       CAST(count(*) FILTER (WHERE l_returnflag = 'R') AS BIGINT)
         AS returned,
       round(CAST(count(*) FILTER (WHERE l_returnflag = 'R')
                  AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
         AS return_rate,
       CAST(SUM({_LCENTS_DUCK})
            FILTER (WHERE l_returnflag = 'R') AS BIGINT)
         AS returned_cents
FROM lineitem GROUP BY 1 ORDER BY 1
""",
    description="Return rate by ship month: line-level return "
    "share and returned revenue on the monthly grain — the "
    "quality-regression time series (a rising curve flags a "
    "fulfillment cohort to investigate).  Single hash aggregate "
    "with conditional counts; NULL returned_cents on months with "
    "no returns on both engines.",
)
def q_returns_rate_by_ship_month(spark, sf_dir):
    (lineitem,) = load(spark, sf_dir, "lineitem")
    return (
        lineitem.groupBy(
            F.date_format("l_shipdate", "yyyy-MM").alias("ship_month")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            F.count_if(F.col("l_returnflag") == "R").cast("long")
            .alias("returned"),
            F.round(
                F.count_if(F.col("l_returnflag") == "R").cast("double")
                / F.count(F.lit(1)).cast("double"),
                6,
            ).alias("return_rate"),
            F.sum(
                F.when(
                    F.col("l_returnflag") == "R",
                    F.round(F.col("l_extendedprice") * 100)
                    .cast("long"),
                )
            ).cast("long").alias("returned_cents"),
        )
        .orderBy("ship_month")
    )


@staged(
    "q_part_type_price_ladder",
    oracle="""
WITH p AS (
  SELECT p_type,
         CAST(round(p_retailprice * 100) AS BIGINT) AS cents
  FROM part)
SELECT p_type, CAST(count(*) AS BIGINT) AS n_parts,
       CAST(MIN(cents) AS BIGINT) AS min_cents,
       quantile_cont(cents, 0.5) AS median_cents,
       CAST(MAX(cents) AS BIGINT) AS max_cents
FROM p GROUP BY 1 ORDER BY 1
""",
    description="Retail price ladder per part type: min / exact "
    "interpolated median / max over integer cents — the catalog "
    "pricing-spread profile per product family.  One hash "
    "aggregate over the bounded type vocabulary.",
)
def q_part_type_price_ladder(spark, sf_dir):
    (part,) = load(spark, sf_dir, "part")
    p = part.select(
        "p_type",
        F.round(F.col("p_retailprice") * 100).cast("long")
        .alias("cents"),
    )
    return (
        p.groupBy("p_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_parts"),
            F.min("cents").alias("min_cents"),
            F.expr("percentile(cents, 0.5)").alias("median_cents"),
            F.max("cents").alias("max_cents"),
        )
        .orderBy("p_type")
    )


@staged(
    "q_nation_quarter_order_mix",
    oracle=f"""
SELECT n.n_name, CAST(quarter(o.o_orderdate) AS BIGINT) AS q,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(SUM({_OCENTS_DUCK}) AS BIGINT) AS cents,
       round(CAST(count(*) AS DOUBLE) /
             CAST(SUM(count(*)) OVER (PARTITION BY n.n_name)
                  AS DOUBLE), 6) AS share_in_nation
FROM orders o
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
GROUP BY 1, 2 ORDER BY 1, 2
""",
    description="Nation x quarter order mix: order counts and "
    "revenue per calendar quarter, with each nation's quarterly "
    "share normalized by a window over its own 4-row aggregate "
    "frame.  The within-nation seasonality fingerprint (the r17 "
    "global q_quarter_seasonality, decomposed by geography).",
)
def q_nation_quarter_order_mix(spark, sf_dir):
    orders, customer, nation = load(
        spark, sf_dir, "orders", "customer", "nation"
    )
    g = (
        orders.join(customer,
                    customer["c_custkey"] == orders["o_custkey"])
        .join(F.broadcast(nation),
              nation["n_nationkey"] == customer["c_nationkey"])
        .groupBy(
            "n_name",
            F.quarter("o_orderdate").cast("long").alias("q"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            .cast("long").alias("cents"),
        )
    )
    wn = W.partitionBy("n_name")
    return g.select(
        "n_name", "q", "n_orders", "cents",
        F.round(
            F.col("n_orders").cast("double")
            / F.sum("n_orders").over(wn).cast("double"),
            6,
        ).alias("share_in_nation"),
    ).orderBy("n_name", "q")


# ---------------------------------------------------------------------------
# Corpus statistics.
# ---------------------------------------------------------------------------


@staged(
    "q_sentence_length_bands",
    oracle="""
WITH s AS (
  SELECT lang, trim(unnest(string_split(text, '.'))) AS sent
  FROM documents WHERE text IS NOT NULL),
     t AS (
  SELECT lang,
         CAST(len(string_split(sent, ' ')) AS BIGINT) AS n_tok
  FROM s WHERE sent <> ''),
     banded AS (
  SELECT lang, CASE WHEN n_tok <= 5 THEN '01-05'
                    WHEN n_tok <= 10 THEN '06-10'
                    WHEN n_tok <= 20 THEN '11-20'
                    ELSE '21+' END AS band,
         n_tok
  FROM t)
SELECT lang, band, CAST(count(*) AS BIGINT) AS n_sentences,
       CAST(SUM(n_tok) AS BIGINT) AS tokens
FROM banded GROUP BY 1, 2 ORDER BY 1, 2
""",
    description="Sentence-length bands per language: period-split "
    "sentences, whitespace token counts, fixed bands — the prose-"
    "rhythm histogram that separates telegraphic from discursive "
    "sources (and the sentence-level companion of the doc-level "
    "TTR bands).  Two generators and a hash aggregate, all linear.",
)
def q_sentence_length_bands(spark, sf_dir):
    (docs,) = load(spark, sf_dir, "documents")
    s = docs.where(F.col("text").isNotNull()).select(
        "lang",
        F.explode(F.split("text", r"\.")).alias("sent0"),
    ).select("lang", F.trim(F.col("sent0")).alias("sent"))
    t = s.where(F.col("sent") != "").select(
        "lang",
        F.size(F.split("sent", " ")).cast("long").alias("n_tok"),
    )
    banded = t.select(
        "lang",
        F.when(F.col("n_tok") <= 5, "01-05")
        .when(F.col("n_tok") <= 10, "06-10")
        .when(F.col("n_tok") <= 20, "11-20")
        .otherwise("21+").alias("band"),
        "n_tok",
    )
    return (
        banded.groupBy("lang", "band")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_sentences"),
            F.sum("n_tok").cast("long").alias("tokens"),
        )
        .orderBy("lang", "band")
    )


@staged(
    "q_numeric_token_share",
    oracle="""
WITH w AS (
  SELECT source, unnest(string_split(text, ' ')) AS w
  FROM documents WHERE text IS NOT NULL)
SELECT source, CAST(count(*) AS BIGINT) AS tokens,
       CAST(count(*) FILTER (WHERE regexp_matches(w, '^[0-9]+$'))
            AS BIGINT) AS numeric_tokens,
       CAST(count(DISTINCT w)
            FILTER (WHERE regexp_matches(w, '^[0-9]+$')) AS BIGINT)
         AS distinct_numerics,
       round(CAST(count(*) FILTER (WHERE regexp_matches(w,
                    '^[0-9]+$')) AS DOUBLE)
             / CAST(count(*) AS DOUBLE), 6) AS numeric_share
FROM w GROUP BY source ORDER BY source
""",
    description="Numeric-token share per source: pure-digit tokens "
    "as a fraction of token mass plus their distinct count — high "
    "shares flag tables/logs masquerading as prose, a standard "
    "pretraining quality gate next to the stopword and Gopher "
    "signals.  One scan, one regex per token, exact counts.",
)
def q_numeric_token_share(spark, sf_dir):
    (docs,) = load(spark, sf_dir, "documents")
    w = docs.where(F.col("text").isNotNull()).select(
        "source", F.explode(F.split("text", " ")).alias("w")
    ).withColumn("is_num", F.col("w").rlike("^[0-9]+$"))
    return (
        w.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("tokens"),
            F.count_if(F.col("is_num")).cast("long")
            .alias("numeric_tokens"),
            F.countDistinct(
                F.when(F.col("is_num"), F.col("w"))
            ).cast("long").alias("distinct_numerics"),
            F.round(
                F.count_if(F.col("is_num")).cast("double")
                / F.count(F.lit(1)).cast("double"),
                6,
            ).alias("numeric_share"),
        )
        .orderBy("source")
    )


@staged(
    "q_token_case_profile",
    oracle="""
WITH w AS (
  SELECT source, unnest(string_split(text, ' ')) AS w
  FROM documents WHERE text IS NOT NULL)
SELECT source,
       CAST(count(*) FILTER (WHERE regexp_matches(w, '^[a-z]+$'))
            AS BIGINT) AS lower_tokens,
       CAST(count(*) FILTER (WHERE regexp_matches(w, '^[A-Z]+$'))
            AS BIGINT) AS upper_tokens,
       CAST(count(*) FILTER (WHERE regexp_matches(w,
              '^[A-Z][a-z]+$')) AS BIGINT) AS title_tokens,
       CAST(count(*) AS BIGINT) AS tokens,
       round(CAST(count(*) FILTER (WHERE regexp_matches(w,
                    '^[A-Z][a-z]+$')) AS DOUBLE)
             / CAST(count(*) AS DOUBLE), 6) AS title_share
FROM w GROUP BY source ORDER BY source
""",
    description="Token case profile per source: all-lower, "
    "all-upper (acronym/shouting), and TitleCase token counts with "
    "the TitleCase share — case distributions separate prose from "
    "headers/code and power cheap NER-ish priors.  Character-class "
    "regexes on the token stream, exact counts, one division.",
)
def q_token_case_profile(spark, sf_dir):
    (docs,) = load(spark, sf_dir, "documents")
    w = docs.where(F.col("text").isNotNull()).select(
        "source", F.explode(F.split("text", " ")).alias("w")
    )
    return (
        w.groupBy("source")
        .agg(
            F.count_if(F.col("w").rlike("^[a-z]+$")).cast("long")
            .alias("lower_tokens"),
            F.count_if(F.col("w").rlike("^[A-Z]+$")).cast("long")
            .alias("upper_tokens"),
            F.count_if(F.col("w").rlike("^[A-Z][a-z]+$")).cast("long")
            .alias("title_tokens"),
            F.count(F.lit(1)).cast("long").alias("tokens"),
            F.round(
                F.count_if(F.col("w").rlike("^[A-Z][a-z]+$"))
                .cast("double")
                / F.count(F.lit(1)).cast("double"),
                6,
            ).alias("title_share"),
        )
        .orderBy("source")
    )


@staged(
    "q_rare_token_doc_bands",
    oracle="""
WITH w AS (
  SELECT doc_id, source, unnest(string_split(text, ' ')) AS w
  FROM documents WHERE text IS NOT NULL),
     hapax AS (
  SELECT w FROM w GROUP BY w HAVING count(*) = 1),
     per_doc AS (
  SELECT w.doc_id, w.source,
         CAST(count(*) AS BIGINT) AS n_tok,
         CAST(count(*) FILTER (WHERE h.w IS NOT NULL) AS BIGINT)
           AS n_hapax
  FROM w LEFT JOIN hapax h ON h.w = w.w
  GROUP BY 1, 2)
SELECT source,
       CAST((n_hapax * 10) // n_tok AS BIGINT) AS band,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_hapax) AS BIGINT) AS hapax_tokens,
       CAST(SUM(n_tok) AS BIGINT) AS tokens
FROM per_doc WHERE n_tok > 0 GROUP BY 1, 2 ORDER BY 1, 2
""",
    description="Corpus-hapax density bands per document: the share "
    "of each doc's tokens that occur exactly once in the WHOLE "
    "corpus, banded in integer tenths per source — outlier-novelty "
    "scoring (high bands are unique content or noise; zero bands "
    "are pure boilerplate).  The hapax set is a posting aggregate "
    "joined back by token — a linear equi-join, never a per-doc "
    "vocabulary scan.",
)
def q_rare_token_doc_bands(spark, sf_dir):
    (docs,) = load(spark, sf_dir, "documents")
    w = docs.where(F.col("text").isNotNull()).select(
        "doc_id", "source", F.explode(F.split("text", " ")).alias("w")
    )
    hapax = (
        w.groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .where(F.col("c") == 1)
        .select("w")
        .withColumn("is_hapax", F.lit(1))
    )
    per_doc = (
        w.join(hapax, "w", "left")
        .groupBy("doc_id", "source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tok"),
            F.sum(F.coalesce(F.col("is_hapax"), F.lit(0)))
            .cast("long").alias("n_hapax"),
        )
    )
    return (
        per_doc.where(F.col("n_tok") > 0)
        .select(
            "source",
            ((F.col("n_hapax") * 10) / F.col("n_tok")).cast("long")
            .alias("band"),
            "n_hapax", "n_tok",
        )
        .groupBy("source", "band")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_hapax").cast("long").alias("hapax_tokens"),
            F.sum("n_tok").cast("long").alias("tokens"),
        )
        .orderBy("source", "band")
    )


# ---------------------------------------------------------------------------
# Embedding geometry.
# ---------------------------------------------------------------------------


@staged(
    "q_emb_cosine_to_centroid_bands",
    oracle="""
WITH q AS (
  SELECT vec_id, label, u.pos AS pos,
         CAST(floor(CAST(u.x AS DOUBLE) * 1000000) AS BIGINT) AS qv
  FROM embeddings,
       LATERAL (SELECT generate_subscripts(embedding, 1) AS pos,
                       unnest(embedding) AS x) u),
     cent AS (
  SELECT label, pos, CAST(SUM(qv) AS DECIMAL(38,0)) AS sl
  FROM q GROUP BY 1, 2),
     per_vec AS (
  SELECT q.vec_id, q.label,
         CAST(SUM(CAST(q.qv AS DECIMAL(38,0)) * c.sl)
              AS DECIMAL(38,0)) AS dot,
         CAST(SUM(CAST(q.qv AS DECIMAL(38,0))
                  * CAST(q.qv AS DECIMAL(38,0)))
              AS DECIMAL(38,0)) AS nv2,
         CAST(MAX(0) AS BIGINT) AS z
  FROM q JOIN cent c ON c.label = q.label AND c.pos = q.pos
  GROUP BY 1, 2),
     nc AS (
  SELECT label, CAST(SUM(sl * sl) AS DECIMAL(38,0)) AS nc2
  FROM cent GROUP BY 1),
     cosv AS (
  SELECT p.label,
         CAST(floor(CAST(p.dot AS DOUBLE) /
              (sqrt(CAST(p.nv2 AS DOUBLE))
               * sqrt(CAST(n.nc2 AS DOUBLE))) * 10) AS BIGINT)
           AS band
  FROM per_vec p JOIN nc n USING (label))
SELECT CAST(label AS BIGINT) AS label, band,
       CAST(count(*) AS BIGINT) AS n_vectors
FROM cosv GROUP BY 1, 2 ORDER BY 1, 2
""",
    description="Cosine-to-own-centroid bands per label: every "
    "vector's cosine against its label centroid (count "
    "denominators cancel, so quantized integer sums feed "
    "decimal-exact dot products; one sqrt/divide per vector, then "
    "floor(cos*10) integer bands — identical doubles from identical "
    "integers on both engines).  Tight high bands mean coherent "
    "classes; mass in low bands flags mislabeled or multi-modal "
    "labels.  The centroid frame is label-count-sized and joins on "
    "the dimension axis.",
)
def q_emb_cosine_to_centroid_bands(spark, sf_dir):
    (emb,) = load(spark, sf_dir, "embeddings")
    q = emb.select(
        "vec_id", "label",
        F.posexplode("embedding").alias("pos0", "x"),
    ).select(
        "vec_id", "label",
        (F.col("pos0") + 1).alias("pos"),
        F.floor(F.col("x").cast("double") * 1000000).cast("long")
        .alias("qv"),
    )
    cent = q.groupBy("label", "pos").agg(
        F.sum("qv").cast("decimal(38,0)").alias("sl")
    )
    per_vec = (
        q.join(cent.withColumnRenamed("label", "clabel"),
               (F.col("clabel") == F.col("label"))
               & (cent["pos"] == q["pos"]))
        .groupBy("vec_id", "label")
        .agg(
            F.sum(F.col("qv").cast("decimal(38,0)") * F.col("sl"))
            .cast("decimal(38,0)").alias("dot"),
            F.sum(
                F.col("qv").cast("decimal(38,0)")
                * F.col("qv").cast("decimal(38,0)")
            ).cast("decimal(38,0)").alias("nv2"),
        )
    )
    nc = cent.groupBy("label").agg(
        F.sum(F.col("sl") * F.col("sl")).cast("decimal(38,0)")
        .alias("nc2")
    )
    cosv = per_vec.join(nc, "label").select(
        "label",
        F.floor(
            F.col("dot").cast("double")
            / (
                F.sqrt(F.col("nv2").cast("double"))
                * F.sqrt(F.col("nc2").cast("double"))
            )
            * 10
        ).cast("long").alias("band"),
    )
    return (
        cosv.groupBy(F.col("label").cast("long").alias("label"), "band")
        .agg(F.count(F.lit(1)).cast("long").alias("n_vectors"))
        .orderBy("label", "band")
    )


@staged(
    "q_emb_centroid_purity",
    oracle="""
WITH q AS (
  SELECT vec_id, label, u.pos AS pos,
         CAST(floor(CAST(u.x AS DOUBLE) * 1000000) AS BIGINT) AS qv
  FROM embeddings,
       LATERAL (SELECT generate_subscripts(embedding, 1) AS pos,
                       unnest(embedding) AS x) u),
     cent AS (
  SELECT label AS clabel, pos, CAST(SUM(qv) AS DECIMAL(38,0)) AS sl
  FROM q GROUP BY 1, 2),
     nc AS (
  SELECT clabel, CAST(SUM(sl * sl) AS DECIMAL(38,0)) AS nc2
  FROM cent GROUP BY 1),
     dots AS (
  SELECT q.vec_id, q.label, c.clabel,
         CAST(SUM(CAST(q.qv AS DECIMAL(38,0)) * c.sl)
              AS DECIMAL(38,0)) AS dot
  FROM q JOIN cent c ON c.pos = q.pos
  GROUP BY 1, 2, 3),
     scored AS (
  SELECT d.vec_id, d.label, d.clabel,
         CAST(d.dot AS DOUBLE) / sqrt(CAST(n.nc2 AS DOUBLE)) AS score,
         row_number() OVER (PARTITION BY d.vec_id
                            ORDER BY CAST(d.dot AS DOUBLE)
                              / sqrt(CAST(n.nc2 AS DOUBLE)) DESC,
                              d.clabel) AS rk
  FROM dots d JOIN nc n USING (clabel))
SELECT CAST(label AS BIGINT) AS label,
       CAST(count(*) AS BIGINT) AS n_vectors,
       CAST(count(*) FILTER (WHERE clabel = label) AS BIGINT)
         AS own_nearest,
       round(CAST(count(*) FILTER (WHERE clabel = label) AS DOUBLE)
             / CAST(count(*) AS DOUBLE), 6) AS purity
FROM scored WHERE rk = 1
GROUP BY 1 ORDER BY 1
""",
    description="Centroid purity per label: is each vector's "
    "NEAREST label centroid (by cosine — the per-vector norm is "
    "constant across candidates, so ranking by dot/|centroid| "
    "suffices) its own label's?  The 1-NN-to-centroids classifier "
    "accuracy, the embedding-quality headline.  Per-vector "
    "candidate frames are label-count-sized (bounded), the argmax a "
    "row_number with a deterministic (score DESC, label) tie-break "
    "on bit-identical doubles.",
)
def q_emb_centroid_purity(spark, sf_dir):
    (emb,) = load(spark, sf_dir, "embeddings")
    q = emb.select(
        "vec_id", "label",
        F.posexplode("embedding").alias("pos0", "x"),
    ).select(
        "vec_id", "label",
        (F.col("pos0") + 1).alias("pos"),
        F.floor(F.col("x").cast("double") * 1000000).cast("long")
        .alias("qv"),
    )
    cent = q.groupBy(F.col("label").alias("clabel"), "pos").agg(
        F.sum("qv").cast("decimal(38,0)").alias("sl")
    )
    nc = cent.groupBy("clabel").agg(
        F.sum(F.col("sl") * F.col("sl")).cast("decimal(38,0)")
        .alias("nc2")
    )
    dots = (
        q.join(cent, cent["pos"] == q["pos"])
        .groupBy("vec_id", "label", "clabel")
        .agg(
            F.sum(F.col("qv").cast("decimal(38,0)") * F.col("sl"))
            .cast("decimal(38,0)").alias("dot")
        )
    )
    scored = dots.join(F.broadcast(nc), "clabel").select(
        "vec_id", "label", "clabel",
        (
            F.col("dot").cast("double")
            / F.sqrt(F.col("nc2").cast("double"))
        ).alias("score"),
    )
    wv = W.partitionBy("vec_id").orderBy(
        F.col("score").desc(), "clabel"
    )
    top = scored.withColumn("rk", F.row_number().over(wv)).where(
        F.col("rk") == 1
    )
    return (
        top.groupBy(F.col("label").cast("long").alias("label"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_vectors"),
            F.count_if(F.col("clabel") == F.col("label")).cast("long")
            .alias("own_nearest"),
            F.round(
                F.count_if(F.col("clabel") == F.col("label"))
                .cast("double")
                / F.count(F.lit(1)).cast("double"),
                6,
            ).alias("purity"),
        )
        .orderBy("label")
    )


# ---------------------------------------------------------------------------
# Lake lifecycle: projection refresh.
# ---------------------------------------------------------------------------


@staged(
    "q_lake_projection_refresh",
    oracle=f"""
SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
       CAST(SUM({_OCENTS_DUCK}) AS BIGINT) AS cents
FROM orders GROUP BY 1 ORDER BY 1
""",
    description="Projection refresh lifecycle (ext/manifest.py "
    "add_projection / read_projection / refresh_projection): a "
    "stored per-status rollup projection built at v0, the base "
    "table mutated by two upserts, the projection read back (it "
    "rolls forward via the change feed, never a base rescan), then "
    "re-based with refresh_projection and read again — both reads "
    "must equal the full-table DuckDB aggregate, proving the "
    "roll-forward and the re-base agree.",
)
def q_lake_projection_refresh(spark, sf_dir):
    import uuid as _uuid

    from clickbom_spark.ext.manifest import (
        VersionedLake,
        add_projection,
        read_projection,
        refresh_projection,
    )
    from clickbom_spark.queries.staged import _TMP

    (orders,) = load(spark, sf_dir, "orders")
    base = orders.select(
        "o_orderkey", "o_orderstatus",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    tag = _uuid.uuid4().hex[:8]
    path = os.path.join(_TMP, f"proj_refresh_{tag}")
    shutil.rmtree(path, ignore_errors=True)
    try:
        lake = VersionedLake.create(
            spark, path, base.where(F.col("o_orderkey") % 3 == 0),
            n_files=2,
        )
        add_projection(
            lake, "by_status", ["o_orderkey"], ["o_orderstatus"],
            ["cents"],
        )
        for rem in (1, 2):
            lake.upsert(base.where(F.col("o_orderkey") % 3 == rem),
                        ["o_orderkey"])
        rolled = read_projection(lake, "by_status")
        rolled_rows = sorted(
            (r["o_orderstatus"], r["n_rows"], r["sum_cents"])
            for r in rolled.collect()
        )
        refresh_projection(lake, "by_status")
        rebased = read_projection(lake, "by_status")
        rebased_rows = sorted(
            (r["o_orderstatus"], r["n_rows"], r["sum_cents"])
            for r in rebased.collect()
        )
        assert rolled_rows == rebased_rows, (
            "projection roll-forward != re-based projection"
        )
    finally:
        shutil.rmtree(path, ignore_errors=True)
    return spark.createDataFrame(
        [(s, int(n), int(c)) for s, n, c in rebased_rows],
        "o_orderstatus string, n bigint, cents bigint",
    ).orderBy("o_orderstatus")
