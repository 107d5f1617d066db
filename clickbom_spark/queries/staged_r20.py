"""Staged registry wave for round 20 — new operator surface (built
during round 12; the staging pipeline runs waves ahead so every
activation is a zero-risk REGISTRY.update of parity-proven queries).

Same staging workflow as the round-6..19 waves: every query here is
oracle-parity-verified NOW (bit-exact vs DuckDB at sf0.001 and sf0.01
via ``tests/test_staged_r20_parity.py``; ``scripts/strict_parity.py
--staged`` widens the sweep to sf0.1) but held OUT of
:data:`clickbom_spark.queries.REGISTRY` until round-20 activation::

    from clickbom_spark.queries import staged_r20  # noqa: F401
    REGISTRY.update(staged_r20.STAGED_R20)

in ``queries/__init__.py``.

Round-20 themes:

* **Dialect round-trips** — named ``WINDOW`` clauses, chained CTEs,
  the NULL-handling family (``ifNull/nullIf/assumeNotNull``), string
  predicates (``position/startsWith/endsWith/replaceAll``), and
  character trigrams via ``arrayMap`` over ``range`` + ``arrayJoin``
  composed with ``LIMIT n BY``.
* **Behavioral analytics** — hourly error rates, signup→purchase
  latency bands, day-over-week revenue ratios, first→last event-type
  transition matrices, daily whale shares.
* **Relational profiles** — within-nation supplier revenue shares,
  order-intake day-of-week profiles, lines-per-order trends, return
  rates by quantity band, nation balance reconciliation, supplier
  balance deciles on the distributed rank.
* **Corpus statistics** — document start-token boilerplate profiles,
  word length by frequency class, alphabetic-ratio quality bands.
* **Embedding geometry** — exact mean within-label vs cross-label
  pairwise dot products (the |Σv|² − Σ|v|² identity: NO pair
  materialization), per-dimension sign entropy.
* **Lake metadata pruning** — Bloom-filter point reads and
  multi-column conjunctive zone-map pruning, both with file-skip
  assertions and full value parity.

Float determinism policy (same as the registry): exact integer /
decimal aggregates first, then ONE fixed IEEE expression per surfaced
double — identical text on both engines — and ``round(x, 6)`` on
surfaced statistics.  Embedding elements quantize as
``floor(double(x)·10⁶)``; sign entropies use log2 on identical
ratios with round(6) absorbing any last-ulp libm drift (the
cross-entropy precedent).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from clickbom_spark.queries import QuerySpec, load

STAGED_R20: dict[str, QuerySpec] = {}


def staged(name: str, oracle: str | None = None, description: str = "",
           bench: bool = False):
    def deco(fn):
        STAGED_R20[name] = QuerySpec(name, fn, oracle, description, bench)
        return fn

    return deco


_CENTS_DUCK = "CAST(round(value * 100) AS BIGINT)"
_OCENTS_DUCK = "CAST(round(o_totalprice * 100) AS BIGINT)"
_LCENTS_DUCK = "CAST(round(l_extendedprice * 100) AS BIGINT)"


# ---------------------------------------------------------------------------
# Dialect round-trips.
# ---------------------------------------------------------------------------

_CH_WINDOW_NAMED = """
SELECT user_id, event_id,
       sum(toInt64(round(value * 100))) OVER w AS run_cents,
       row_number() OVER w AS idx
FROM events
WHERE event_type = 'purchase' AND user_id % 100 = 7
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
ORDER BY user_id, idx
"""


@staged(
    "q_dialect_window_named",
    oracle=f"""
SELECT user_id, event_id,
       CAST(SUM({_CENTS_DUCK}) OVER w AS BIGINT) AS run_cents,
       CAST(row_number() OVER w AS BIGINT) AS idx
FROM events
WHERE event_type = 'purchase' AND user_id % 100 = 7
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
ORDER BY user_id, idx
""",
    description="Named WINDOW clause through the shim: one window "
    "definition shared by a running revenue sum and a row index — "
    "the clause passes through verbatim (Spark and ClickHouse share "
    "the WINDOW w AS (...) grammar).  Per-user partitions on the "
    "deterministic (ts, event_id) order; the user_id filter keeps "
    "the surfaced frame small while every partition stays intact.",
)
def q_dialect_window_named(spark, sf_dir):
    from clickbom_spark.dialect import run_clickhouse_sql

    out = run_clickhouse_sql(spark, _CH_WINDOW_NAMED, sf_dir)
    return out.select(
        "user_id", "event_id",
        F.col("run_cents").cast("long").alias("run_cents"),
        F.col("idx").cast("long").alias("idx"),
    ).orderBy("user_id", "idx")


_CH_CTE_CHAIN = """
WITH big AS (
  SELECT o_custkey, count() AS n,
         sum(toInt64(round(o_totalprice * 100))) AS cents
  FROM orders GROUP BY o_custkey HAVING count() >= 10
),
tagged AS (
  SELECT c.c_mktsegment AS seg, big.n, big.cents
  FROM big INNER JOIN customer AS c ON c.c_custkey = big.o_custkey
)
SELECT seg, count() AS heavy_customers,
       sum(cents) AS cents, max(n) AS max_orders
FROM tagged GROUP BY seg ORDER BY seg
"""


@staged(
    "q_dialect_cte_chain",
    oracle="""
WITH big AS (
  SELECT o_custkey, CAST(count(*) AS BIGINT) AS n,
         CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
              AS BIGINT) AS cents
  FROM orders GROUP BY o_custkey HAVING count(*) >= 10
),
tagged AS (
  SELECT c.c_mktsegment AS seg, big.n, big.cents
  FROM big JOIN customer c ON c.c_custkey = big.o_custkey
)
SELECT seg, CAST(count(*) AS BIGINT) AS heavy_customers,
       CAST(SUM(cents) AS BIGINT) AS cents,
       CAST(MAX(n) AS BIGINT) AS max_orders
FROM tagged GROUP BY seg ORDER BY seg
""",
    description="Chained CTEs through the shim: an aggregate-with-"
    "HAVING CTE feeding a join CTE feeding the final rollup — the "
    "multi-statement analyst pattern; WITH bodies pass through with "
    "their inner function calls translated recursively.",
)
def q_dialect_cte_chain(spark, sf_dir):
    from clickbom_spark.dialect import run_clickhouse_sql

    out = run_clickhouse_sql(spark, _CH_CTE_CHAIN, sf_dir)
    return out.select(
        "seg",
        F.col("heavy_customers").cast("long").alias("heavy_customers"),
        F.col("cents").cast("long").alias("cents"),
        F.col("max_orders").cast("long").alias("max_orders"),
    ).orderBy("seg")


_CH_NULL_FUNCS = """
SELECT event_type,
       sum(ifNull(toInt64(round(value * 100)), 0)) AS cents,
       count(nullIf(event_type, 'error')) AS non_error_tags,
       count(assumeNotNull(user_id)) AS users_counted,
       sum(coalesce(toInt64(round(value * 100)), 0)) AS cents2
FROM events GROUP BY event_type ORDER BY event_type
"""


@staged(
    "q_dialect_null_funcs",
    oracle=f"""
SELECT event_type,
       CAST(SUM(coalesce({_CENTS_DUCK}, 0)) AS BIGINT) AS cents,
       CAST(count(nullif(event_type, 'error')) AS BIGINT)
         AS non_error_tags,
       CAST(count(user_id) AS BIGINT) AS users_counted,
       CAST(SUM(coalesce({_CENTS_DUCK}, 0)) AS BIGINT) AS cents2
FROM events GROUP BY event_type ORDER BY event_type
""",
    description="The NULL-handling family: ifNull→coalesce, "
    "nullIf→nullif, assumeNotNull→identity (the annotation only "
    "unwraps ClickHouse's Nullable type; Spark columns are nullable "
    "by default so the value passes through), plus coalesce "
    "untouched.  count(nullif(...)) pins the NULL-skipping "
    "aggregate contract on both engines.",
)
def q_dialect_null_funcs(spark, sf_dir):
    from clickbom_spark.dialect import run_clickhouse_sql

    out = run_clickhouse_sql(spark, _CH_NULL_FUNCS, sf_dir)
    return out.select(
        "event_type",
        F.col("cents").cast("long").alias("cents"),
        F.col("non_error_tags").cast("long").alias("non_error_tags"),
        F.col("users_counted").cast("long").alias("users_counted"),
        F.col("cents2").cast("long").alias("cents2"),
    ).orderBy("event_type")


_CH_STRING_PREDS = """
SELECT p_brand,
       countIf(startsWith(p_name, 'a')) AS starts_a,
       countIf(endsWith(p_name, 'e')) AS ends_e,
       countIf(position(p_name, 'ol') > 0) AS has_ol,
       uniqExact(replaceAll(p_type, ' ', '_')) AS norm_types
FROM part GROUP BY p_brand ORDER BY p_brand
"""


@staged(
    "q_dialect_string_preds",
    oracle="""
SELECT p_brand,
       CAST(count(*) FILTER (WHERE p_name LIKE 'a%') AS BIGINT)
         AS starts_a,
       CAST(count(*) FILTER (WHERE p_name LIKE '%e') AS BIGINT)
         AS ends_e,
       CAST(count(*) FILTER (WHERE position('ol' IN p_name) > 0)
            AS BIGINT) AS has_ol,
       CAST(count(DISTINCT replace(p_type, ' ', '_')) AS BIGINT)
         AS norm_types
FROM part GROUP BY p_brand ORDER BY p_brand
""",
    description="String-predicate family: startsWith/endsWith → "
    "Spark's native predicates, position(haystack, needle) → locate "
    "with the argument order swapped (1-based, 0 on miss — the same "
    "contract), replaceAll → replace (both literal, non-regex).  "
    "Counted per brand under the -If combinator.",
)
def q_dialect_string_preds(spark, sf_dir):
    from clickbom_spark.dialect import run_clickhouse_sql

    out = run_clickhouse_sql(spark, _CH_STRING_PREDS, sf_dir)
    return out.select(
        "p_brand",
        F.col("starts_a").cast("long").alias("starts_a"),
        F.col("ends_e").cast("long").alias("ends_e"),
        F.col("has_ol").cast("long").alias("has_ol"),
        F.col("norm_types").cast("long").alias("norm_types"),
    ).orderBy("p_brand")


_CH_CHAR_NGRAMS = """
SELECT lang, tri, count() AS n
FROM (SELECT lang,
             arrayJoin(arrayMap(i -> substring(lower(text), i, 3),
                                range(1, length(text) - 1))) AS tri
      FROM documents WHERE text IS NOT NULL)
WHERE length(tri) = 3
GROUP BY lang, tri
ORDER BY lang, n DESC, tri
LIMIT 5 BY lang
"""


@staged(
    "q_dialect_char_ngrams",
    oracle="""
WITH tri AS (
  SELECT lang, substr(t, CAST(u.i AS INTEGER), 3) AS tri
  FROM (SELECT lang, lower(text) AS t FROM documents
        WHERE text IS NOT NULL),
       LATERAL (SELECT unnest(range(1, greatest(length(t) - 1, 1)))
                AS i) u),
     counted AS (
  SELECT lang, tri, CAST(count(*) AS BIGINT) AS n
  FROM tri WHERE length(tri) = 3 GROUP BY 1, 2),
     ranked AS (
  SELECT lang, tri, n,
         row_number() OVER (PARTITION BY lang
                            ORDER BY n DESC, tri) AS rk
  FROM counted)
SELECT lang, tri, n FROM ranked WHERE rk <= 5
ORDER BY lang, n DESC, tri
""",
    description="Top-5 character trigrams per language: "
    "arrayMap(i -> substring(...), range(...)) + the arrayJoin "
    "function form + `LIMIT 5 BY lang` composed in one statement — "
    "three dialect features driving the classic language-ID "
    "fingerprint (trigram profiles are the n-gram heuristic behind "
    "the engine's lang_id operator).  Per-language top-k runs over "
    "the bounded trigram-vocabulary aggregate, never raw text.",
)
def q_dialect_char_ngrams(spark, sf_dir):
    from clickbom_spark.dialect import run_clickhouse_sql

    out = run_clickhouse_sql(spark, _CH_CHAR_NGRAMS, sf_dir)
    return out.select(
        "lang", "tri", F.col("n").cast("long").alias("n")
    ).orderBy("lang", F.col("n").desc(), "tri")


# ---------------------------------------------------------------------------
# Behavioral analytics.
# ---------------------------------------------------------------------------


@staged(
    "q_error_rate_by_hour",
    oracle="""
SELECT CAST(hour(ts) AS BIGINT) AS hr,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(count(*) FILTER (WHERE event_type = 'error') AS BIGINT)
         AS errors,
       round(CAST(count(*) FILTER (WHERE event_type = 'error')
                  AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
         AS error_rate
FROM events GROUP BY 1 ORDER BY 1
""",
    description="Error rate by hour of day: the 24-row operational "
    "heat strip (a diurnal error-rate bulge is the classic "
    "peak-load regression signal).  One conditional hash aggregate, "
    "exact counts, one division.",
)
def q_error_rate_by_hour(spark, sf_dir):
    (events,) = load(spark, sf_dir, "events")
    return (
        events.groupBy(F.hour("ts").cast("long").alias("hr"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.count_if(F.col("event_type") == "error").cast("long")
            .alias("errors"),
            F.round(
                F.count_if(F.col("event_type") == "error")
                .cast("double")
                / F.count(F.lit(1)).cast("double"),
                6,
            ).alias("error_rate"),
        )
        .orderBy("hr")
    )


@staged(
    "q_signup_to_purchase_latency",
    oracle="""
WITH su AS (
  SELECT user_id, MIN(ts) AS su_ts FROM events
  WHERE event_type = 'signup' GROUP BY 1),
     fp AS (
  SELECT e.user_id, MIN(e.ts) AS p_ts
  FROM events e JOIN su ON su.user_id = e.user_id
  WHERE e.event_type = 'purchase' AND e.ts >= su.su_ts
  GROUP BY 1),
     lat AS (
  SELECT (epoch_us(fp.p_ts) - epoch_us(su.su_ts))
           // 86400000000 AS days
  FROM su JOIN fp USING (user_id))
SELECT CAST(days AS BIGINT) AS days_band,
       CAST(count(*) AS BIGINT) AS n_users
FROM lat GROUP BY 1 ORDER BY 1
""",
    description="Signup-to-first-purchase latency in whole days: "
    "per user, the first purchase at-or-after the first signup, "
    "differenced in elapsed microseconds and floor-divided to days "
    "(boundary-free, unlike calendar date_diff).  The activation "
    "funnel's time axis; two min-aggregates and one equi-join.",
)
def q_signup_to_purchase_latency(spark, sf_dir):
    from clickbom_spark.queries import epoch_us

    (events,) = load(spark, sf_dir, "events")
    su = events.where(F.col("event_type") == "signup").groupBy(
        "user_id"
    ).agg(F.min("ts").alias("su_ts"))
    fp = (
        events.where(F.col("event_type") == "purchase")
        .join(su, "user_id")
        .where(F.col("ts") >= F.col("su_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("p_ts"))
    )
    lat = su.join(fp, "user_id").select(
        F.floor(
            (epoch_us("p_ts") - epoch_us("su_ts")) / 86400000000
        ).cast("long").alias("days_band")
    )
    return (
        lat.groupBy("days_band")
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
        .orderBy("days_band")
    )


@staged(
    "q_daily_revenue_wow",
    oracle=f"""
WITH d AS (
  SELECT CAST(ts AS DATE) AS d,
         CAST(SUM({_CENTS_DUCK}) AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase' GROUP BY 1)
SELECT strftime(a.d, '%Y-%m-%d') AS d, a.cents,
       b.cents AS cents_prev_week,
       round(CAST(a.cents AS DOUBLE) / CAST(b.cents AS DOUBLE), 6)
         AS wow_ratio
FROM d a JOIN d b ON b.d = a.d - 7
ORDER BY d
""",
    description="Day-over-week revenue ratio: each day's purchase "
    "revenue against the same weekday one week earlier (a self "
    "equi-join on d-7 — seasonality-free growth, unlike "
    "day-over-day).  Exact cents, one division; days without a "
    "week-old twin drop out (inner join) on both engines.",
)
def q_daily_revenue_wow(spark, sf_dir):
    (events,) = load(spark, sf_dir, "events")
    d = (
        events.where(F.col("event_type") == "purchase")
        .groupBy(F.to_date("ts").alias("d"))
        .agg(
            F.sum(F.round(F.col("value") * 100).cast("long"))
            .cast("long").alias("cents")
        )
    )
    b = d.select(
        F.date_add("d", 7).alias("d"),
        F.col("cents").alias("cents_prev_week"),
    )
    return (
        d.join(b, "d")
        .select(
            F.date_format("d", "yyyy-MM-dd").alias("d"),
            "cents", "cents_prev_week",
            F.round(
                F.col("cents").cast("double")
                / F.col("cents_prev_week").cast("double"),
                6,
            ).alias("wow_ratio"),
        )
        .orderBy("d")
    )


@staged(
    "q_user_first_last_type",
    oracle="""
WITH o AS (
  SELECT user_id, event_type, ts, event_id,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rk_first,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC)
           AS rk_last
  FROM events),
     fl AS (
  SELECT user_id,
         MIN(CASE WHEN rk_first = 1 THEN event_type END)
           AS first_type,
         MIN(CASE WHEN rk_last = 1 THEN event_type END) AS last_type
  FROM o GROUP BY 1)
SELECT first_type, last_type, CAST(count(*) AS BIGINT) AS n_users
FROM fl GROUP BY 1, 2 ORDER BY 1, 2
""",
    description="First→last event-type transition matrix: each "
    "user's journey endpoints on the deterministic (ts, event_id) "
    "total order, counted into a |types|² matrix — where journeys "
    "start vs where they end (signup→purchase mass is the healthy "
    "diagonal).  Per-user windows, bounded output.",
)
def q_user_first_last_type(spark, sf_dir):
    (events,) = load(spark, sf_dir, "events")
    fl = events.groupBy("user_id").agg(
        F.min_by("event_type", F.struct("ts", "event_id"))
        .alias("first_type"),
        F.max_by("event_type", F.struct("ts", "event_id"))
        .alias("last_type"),
    )
    return (
        fl.groupBy("first_type", "last_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
        .orderBy("first_type", "last_type")
    )


@staged(
    "q_daily_whale_share",
    oracle=f"""
SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS d,
       CAST(count(*) AS BIGINT) AS purchases,
       CAST(SUM({_CENTS_DUCK}) AS BIGINT) AS cents,
       CAST(MAX({_CENTS_DUCK}) AS BIGINT) AS top_cents,
       round(CAST(MAX({_CENTS_DUCK}) AS DOUBLE) /
             CAST(SUM({_CENTS_DUCK}) AS DOUBLE), 6) AS whale_share
FROM events WHERE event_type = 'purchase'
GROUP BY 1 ORDER BY 1
""",
    description="Daily whale share: the single largest purchase as "
    "a fraction of the day's revenue — a high share means the "
    "topline is one-customer fragile (the revenue-concentration "
    "alarm at day grain).  One hash aggregate, exact cents.",
)
def q_daily_whale_share(spark, sf_dir):
    (events,) = load(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    return (
        events.where(F.col("event_type") == "purchase")
        .groupBy(
            F.date_format(F.to_date("ts"), "yyyy-MM-dd").alias("d")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("purchases"),
            F.sum(cents).cast("long").alias("cents"),
            F.max(cents).cast("long").alias("top_cents"),
            F.round(
                F.max(cents).cast("double")
                / F.sum(cents).cast("double"),
                6,
            ).alias("whale_share"),
        )
        .orderBy("d")
    )


# ---------------------------------------------------------------------------
# Relational profiles.
# ---------------------------------------------------------------------------


@staged(
    "q_supplier_share_within_nation",
    oracle=f"""
WITH rev AS (
  SELECT s.s_nationkey, l.l_suppkey,
         CAST(SUM({_LCENTS_DUCK}) AS BIGINT) AS cents
  FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey
  GROUP BY 1, 2),
     ranked AS (
  SELECT r.s_nationkey, r.l_suppkey, r.cents,
         CAST(SUM(cents) OVER (PARTITION BY s_nationkey) AS BIGINT)
           AS nation_cents,
         row_number() OVER (PARTITION BY s_nationkey
                            ORDER BY cents DESC, l_suppkey) AS rk
  FROM rev r)
SELECT n.n_name, CAST(rk AS BIGINT) AS rk,
       CAST(l_suppkey AS BIGINT) AS s_suppkey, cents,
       round(CAST(cents AS DOUBLE) / CAST(nation_cents AS DOUBLE), 6)
         AS share_in_nation
FROM ranked JOIN nation n ON n.n_nationkey = ranked.s_nationkey
WHERE rk <= 3 ORDER BY n.n_name, rk
""",
    description="Top-3 suppliers by revenue within each nation, "
    "with their national share: the concentration-of-supply view "
    "(one supplier owning a nation's flow is a resilience risk).  "
    "The rank and share windows run over the per-nation SUPPLIER "
    "AGGREGATE frame (bounded by suppliers-per-nation, never line "
    "items); the nation dim broadcasts.",
)
def q_supplier_share_within_nation(spark, sf_dir):
    lineitem, supplier, nation = load(
        spark, sf_dir, "lineitem", "supplier", "nation"
    )
    rev = (
        lineitem.join(supplier,
                      supplier["s_suppkey"] == lineitem["l_suppkey"])
        .groupBy("s_nationkey", "l_suppkey")
        .agg(
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long"))
            .cast("long").alias("cents")
        )
    )
    wn = W.partitionBy("s_nationkey")
    wr = W.partitionBy("s_nationkey").orderBy(
        F.col("cents").desc(), "l_suppkey"
    )
    ranked = rev.select(
        "s_nationkey", "l_suppkey", "cents",
        F.sum("cents").over(wn).cast("long").alias("nation_cents"),
        F.row_number().over(wr).alias("rk"),
    ).where(F.col("rk") <= 3)
    return (
        ranked.join(F.broadcast(nation),
                    nation["n_nationkey"] == ranked["s_nationkey"])
        .select(
            "n_name",
            F.col("rk").cast("long").alias("rk"),
            F.col("l_suppkey").cast("long").alias("s_suppkey"),
            "cents",
            F.round(
                F.col("cents").cast("double")
                / F.col("nation_cents").cast("double"),
                6,
            ).alias("share_in_nation"),
        )
        .orderBy("n_name", "rk")
    )


@staged(
    "q_order_intake_dow",
    oracle=f"""
SELECT CAST(isodow(o_orderdate) AS BIGINT) AS dow,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(SUM({_OCENTS_DUCK}) AS BIGINT) AS cents,
       round(CAST(count(*) AS DOUBLE) /
             CAST((SELECT count(*) FROM orders) AS DOUBLE), 6)
         AS share
FROM orders GROUP BY 1 ORDER BY 1
""",
    description="Order intake by ISO day-of-week (Monday=1): "
    "counts, revenue, and share of total — the operations staffing "
    "profile.  Spark's Sunday-first dayofweek shifts to the ISO "
    "numbering with pure modular arithmetic.",
)
def q_order_intake_dow(spark, sf_dir):
    (orders,) = load(spark, sf_dir, "orders")
    tot = orders.agg(F.count(F.lit(1)).cast("long").alias("total"))
    return (
        orders.groupBy(
            ((F.dayofweek("o_orderdate") + 5) % 7 + 1).cast("long")
            .alias("dow")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            .cast("long").alias("cents"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "dow", "n_orders", "cents",
            F.round(
                F.col("n_orders").cast("double")
                / F.col("total").cast("double"),
                6,
            ).alias("share"),
        )
        .orderBy("dow")
    )


@staged(
    "q_avg_items_per_order_by_month",
    oracle="""
WITH per_order AS (
  SELECT l_orderkey, CAST(count(*) AS BIGINT) AS n_lines,
         CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
  FROM lineitem GROUP BY 1),
     dated AS (
  SELECT strftime(CAST(o.o_orderdate AS DATE), '%Y-%m') AS mon,
         p.n_lines, p.qty
  FROM per_order p JOIN orders o ON o.o_orderkey = p.l_orderkey)
SELECT mon, CAST(count(*) AS BIGINT) AS n_orders,
       CAST(SUM(n_lines) AS BIGINT) AS lines,
       round(CAST(SUM(n_lines) AS DOUBLE) / count(*), 6)
         AS avg_lines,
       round(CAST(SUM(qty) AS DOUBLE) / count(*), 6) AS avg_qty
FROM dated GROUP BY 1 ORDER BY 1
""",
    description="Basket width trend: lines and quantity per order "
    "by order month — shrinking baskets with stable order counts "
    "is a different revenue problem than shrinking traffic.  "
    "Per-order rollup then a month rollup, both hash aggregates.",
)
def q_avg_items_per_order_by_month(spark, sf_dir):
    lineitem, orders = load(spark, sf_dir, "lineitem", "orders")
    per_order = lineitem.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_lines"),
        F.sum(F.col("l_quantity").cast("long")).cast("long")
        .alias("qty"),
    )
    dated = per_order.join(
        orders, orders["o_orderkey"] == per_order["l_orderkey"]
    ).select(
        F.date_format("o_orderdate", "yyyy-MM").alias("mon"),
        "n_lines", "qty",
    )
    return (
        dated.groupBy("mon")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum("n_lines").cast("long").alias("lines"),
            F.round(
                F.sum("n_lines").cast("double")
                / F.count(F.lit(1)).cast("double"),
                6,
            ).alias("avg_lines"),
            F.round(
                F.sum("qty").cast("double")
                / F.count(F.lit(1)).cast("double"),
                6,
            ).alias("avg_qty"),
        )
        .orderBy("mon")
    )


@staged(
    "q_qty_band_returns",
    oracle=f"""
SELECT CAST(CAST(l_quantity AS BIGINT) // 10 AS BIGINT) AS qty_band,
       CAST(count(*) AS BIGINT) AS n_lines,
       CAST(count(*) FILTER (WHERE l_returnflag = 'R') AS BIGINT)
         AS returned,
       round(CAST(count(*) FILTER (WHERE l_returnflag = 'R')
                  AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
         AS return_rate,
       CAST(SUM({_LCENTS_DUCK}) AS BIGINT) AS cents
FROM lineitem GROUP BY 1 ORDER BY 1
""",
    description="Return rate by quantity band (qty div 10): do "
    "bulk lines come back more often?  The pick-pack-error "
    "hypothesis test; one conditional hash aggregate over integer "
    "bands.",
)
def q_qty_band_returns(spark, sf_dir):
    (lineitem,) = load(spark, sf_dir, "lineitem")
    return (
        lineitem.groupBy(
            (F.col("l_quantity").cast("long") / 10).cast("long")
            .alias("qty_band")
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
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long"))
            .cast("long").alias("cents"),
        )
        .orderBy("qty_band")
    )


@staged(
    "q_nation_balance_reconciliation",
    oracle="""
WITH cb AS (
  SELECT c_nationkey AS nk,
         CAST(SUM(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT)
           AS cust_cents,
         CAST(count(*) AS BIGINT) AS n_cust
  FROM customer GROUP BY 1),
     sb AS (
  SELECT s_nationkey AS nk,
         CAST(SUM(CAST(round(s_acctbal * 100) AS BIGINT)) AS BIGINT)
           AS supp_cents,
         CAST(count(*) AS BIGINT) AS n_supp
  FROM supplier GROUP BY 1)
SELECT n.n_name,
       coalesce(cb.n_cust, 0) AS n_cust,
       coalesce(cb.cust_cents, 0) AS cust_cents,
       coalesce(sb.n_supp, 0) AS n_supp,
       coalesce(sb.supp_cents, 0) AS supp_cents,
       CAST(coalesce(cb.cust_cents, 0) - coalesce(sb.supp_cents, 0)
            AS BIGINT) AS net_cents
FROM nation n
LEFT JOIN cb ON cb.nk = n.n_nationkey
LEFT JOIN sb ON sb.nk = n.n_nationkey
ORDER BY n.n_name
""",
    description="Nation balance reconciliation: customer-side vs "
    "supplier-side account balances per nation with the net "
    "position — the two dimension tables FULL-profiled against the "
    "nation spine (LEFT joins so nations missing either side still "
    "report zeros).  Exact cents end-to-end.",
)
def q_nation_balance_reconciliation(spark, sf_dir):
    customer, supplier, nation = load(
        spark, sf_dir, "customer", "supplier", "nation"
    )
    cb = customer.groupBy(
        F.col("c_nationkey").alias("nk")
    ).agg(
        F.sum(F.round(F.col("c_acctbal") * 100).cast("long"))
        .cast("long").alias("cust_cents"),
        F.count(F.lit(1)).cast("long").alias("n_cust"),
    )
    sb = supplier.groupBy(
        F.col("s_nationkey").alias("nk")
    ).agg(
        F.sum(F.round(F.col("s_acctbal") * 100).cast("long"))
        .cast("long").alias("supp_cents"),
        F.count(F.lit(1)).cast("long").alias("n_supp"),
    )
    return (
        nation.join(cb, cb["nk"] == nation["n_nationkey"], "left")
        .join(sb, sb["nk"] == nation["n_nationkey"], "left")
        .select(
            "n_name",
            F.coalesce(F.col("n_cust"), F.lit(0)).cast("long")
            .alias("n_cust"),
            F.coalesce(F.col("cust_cents"), F.lit(0)).cast("long")
            .alias("cust_cents"),
            F.coalesce(F.col("n_supp"), F.lit(0)).cast("long")
            .alias("n_supp"),
            F.coalesce(F.col("supp_cents"), F.lit(0)).cast("long")
            .alias("supp_cents"),
            (
                F.coalesce(F.col("cust_cents"), F.lit(0))
                - F.coalesce(F.col("supp_cents"), F.lit(0))
            ).cast("long").alias("net_cents"),
        )
        .orderBy("n_name")
    )


@staged(
    "q_supplier_balance_deciles",
    oracle="""
WITH bal AS (
  SELECT s_suppkey,
         CAST(round(s_acctbal * 100) AS BIGINT) AS cents
  FROM supplier),
     ranked AS (
  SELECT cents,
         row_number() OVER (ORDER BY cents, s_suppkey) AS rn,
         (SELECT CAST(count(*) AS BIGINT) FROM bal) AS n
  FROM bal)
SELECT CAST(((rn - 1) * 10) // n + 1 AS BIGINT) AS decile,
       CAST(count(*) AS BIGINT) AS n_suppliers,
       CAST(SUM(cents) AS BIGINT) AS cents,
       MIN(cents) AS min_cents, MAX(cents) AS max_cents
FROM ranked GROUP BY 1 ORDER BY 1
""",
    description="Supplier account-balance deciles on the ext/ranks "
    "value-bucketed distributed rank (exact integer decile "
    "assignment under the deterministic (cents, suppkey) order, no "
    "total-order window): population, total, and range per decile "
    "— the credit-exposure profile of the supply base.",
)
def q_supplier_balance_deciles(spark, sf_dir):
    from clickbom_spark.ext.ranks import with_global_rank

    (supplier,) = load(spark, sf_dir, "supplier")
    bal = supplier.select(
        "s_suppkey",
        F.round(F.col("s_acctbal") * 100).cast("long").alias("cents"),
    )
    ranked = with_global_rank(
        bal, ["cents", "s_suppkey"], rank_col="rn", total_col="n"
    )
    return (
        ranked.select(
            ((((F.col("rn") - 1) * 10).cast("long") / F.col("n"))
             .cast("long") + 1).alias("decile"),
            "cents",
        )
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_suppliers"),
            F.sum("cents").cast("long").alias("cents"),
            F.min("cents").alias("min_cents"),
            F.max("cents").alias("max_cents"),
        )
        .orderBy("decile")
    )


# ---------------------------------------------------------------------------
# Corpus statistics.
# ---------------------------------------------------------------------------


@staged(
    "q_doc_start_token_profile",
    oracle="""
WITH firsts AS (
  SELECT source, string_split(text, ' ')[1] AS w
  FROM documents WHERE text IS NOT NULL AND text <> '')
SELECT source, w AS start_token,
       CAST(count(*) AS BIGINT) AS n_docs
FROM firsts GROUP BY 1, 2 HAVING count(*) >= 3
ORDER BY 1, 2
""",
    description="Document start-token profile per source: the "
    "distribution of FIRST tokens (floored at 3 docs) — repeated "
    "openings are the cheapest boilerplate/template detector "
    "(complementing the winnowing fingerprints with an O(1)-per-doc "
    "signal).  element_at 1 on the split, one hash aggregate.",
)
def q_doc_start_token_profile(spark, sf_dir):
    (docs,) = load(spark, sf_dir, "documents")
    firsts = docs.where(
        F.col("text").isNotNull() & (F.col("text") != "")
    ).select(
        "source",
        F.element_at(F.split("text", " "), 1).alias("start_token"),
    )
    return (
        firsts.groupBy("source", "start_token")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
        .where(F.col("n_docs") >= 3)
        .orderBy("source", "start_token")
    )


@staged(
    "q_word_len_vs_freq",
    oracle="""
WITH f AS (
  SELECT w, CAST(count(*) AS BIGINT) AS c,
         CAST(length(w) AS BIGINT) AS wl
  FROM (SELECT unnest(string_split(text, ' ')) AS w
        FROM documents WHERE text IS NOT NULL) GROUP BY 1),
     classed AS (
  SELECT CAST(length(bin(c)) - 1 AS BIGINT) AS freq_band, wl
  FROM f)
SELECT freq_band, CAST(count(*) AS BIGINT) AS vocab,
       CAST(SUM(wl) AS BIGINT) AS total_len,
       round(CAST(SUM(wl) AS DOUBLE) / count(*), 6) AS avg_len
FROM classed GROUP BY 1 ORDER BY 1
""",
    description="Word length by log2 frequency band: Zipf's "
    "brevity-law companion — frequent words are short, and the "
    "average token length per band quantifies it exactly.  The band "
    "is floor(log2(count)) computed libm-free as the binary-string "
    "length minus one (the house log2-band trick), so the banding "
    "stays populated at every scale factor.  One posting aggregate "
    "then a band rollup.",
)
def q_word_len_vs_freq(spark, sf_dir):
    (docs,) = load(spark, sf_dir, "documents")
    f = (
        docs.where(F.col("text").isNotNull())
        .select(F.explode(F.split("text", " ")).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .select(
            "c", F.length("w").cast("long").alias("wl")
        )
    )
    classed = f.select(
        (F.length(F.bin(F.col("c"))) - 1).cast("long")
        .alias("freq_band"),
        "wl",
    )
    return (
        classed.groupBy("freq_band")
        .agg(
            F.count(F.lit(1)).cast("long").alias("vocab"),
            F.sum("wl").cast("long").alias("total_len"),
            F.round(
                F.sum("wl").cast("double")
                / F.count(F.lit(1)).cast("double"),
                6,
            ).alias("avg_len"),
        )
        .orderBy("freq_band")
    )


@staged(
    "q_alpha_ratio_bands",
    oracle="""
WITH d AS (
  SELECT source,
         CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))
              AS BIGINT) AS alpha,
         CAST(length(text) AS BIGINT) AS chars
  FROM documents WHERE text IS NOT NULL AND length(text) > 0)
SELECT source, CAST((alpha * 10) // chars AS BIGINT) AS band,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(SUM(alpha) AS BIGINT) AS alpha_chars,
       CAST(SUM(chars) AS BIGINT) AS chars
FROM d GROUP BY 1, 2 ORDER BY 1, 2
""",
    description="Alphabetic-character ratio bands per source "
    "(integer tenths): low-alpha documents are tables, logs, or "
    "markup — the char-level quality gate that catches what "
    "token-level filters miss.  One regex strip per doc, exact "
    "integer bands.",
)
def q_alpha_ratio_bands(spark, sf_dir):
    (docs,) = load(spark, sf_dir, "documents")
    d = docs.where(
        F.col("text").isNotNull() & (F.length("text") > 0)
    ).select(
        "source",
        F.length(F.regexp_replace("text", "[^a-zA-Z]", ""))
        .cast("long").alias("alpha"),
        F.length("text").cast("long").alias("chars"),
    )
    return (
        d.select(
            "source",
            ((F.col("alpha") * 10) / F.col("chars")).cast("long")
            .alias("band"),
            "alpha", "chars",
        )
        .groupBy("source", "band")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("alpha").cast("long").alias("alpha_chars"),
            F.sum("chars").cast("long").alias("chars"),
        )
        .orderBy("source", "band")
    )


# ---------------------------------------------------------------------------
# Embedding geometry.
# ---------------------------------------------------------------------------


@staged(
    "q_emb_intra_inter_dot",
    oracle="""
WITH q AS (
  SELECT vec_id, label, u.pos AS pos,
         CAST(floor(CAST(u.x AS DOUBLE) * 1000000) AS BIGINT) AS qv
  FROM embeddings,
       LATERAL (SELECT generate_subscripts(embedding, 1) AS pos,
                       unnest(embedding) AS x) u),
     s AS (
  SELECT label, pos, CAST(SUM(qv) AS DECIMAL(38,0)) AS sl
  FROM q GROUP BY 1, 2),
     norms AS (
  SELECT label,
         CAST(SUM(CAST(qv AS DECIMAL(38,0))
                  * CAST(qv AS DECIMAL(38,0))) AS DECIMAL(38,0))
           AS q2,
         CAST(count(DISTINCT vec_id) AS BIGINT) AS n
  FROM q GROUP BY 1),
     w_in AS (
  SELECT s.label,
         CAST(SUM(s.sl * s.sl) AS DECIMAL(38,0)) AS s2
  FROM s GROUP BY 1),
     total AS (
  SELECT pos, CAST(SUM(sl) AS DECIMAL(38,0)) AS st FROM s
  GROUP BY 1),
     cross_d AS (
  SELECT s.label,
         CAST(SUM(s.sl * (t.st - s.sl)) AS DECIMAL(38,0)) AS sx
  FROM s JOIN total t USING (pos) GROUP BY 1),
     nn AS (SELECT CAST(SUM(n) AS BIGINT) AS n_all FROM norms)
SELECT CAST(w.label AS BIGINT) AS label, norms.n AS n_vecs,
       round((CAST(w.s2 AS DOUBLE) - CAST(norms.q2 AS DOUBLE))
             / (CAST(norms.n AS DOUBLE) * (norms.n - 1))
             / 1000000000000.0, 6) AS mean_within_dot,
       round(CAST(c.sx AS DOUBLE)
             / (CAST(norms.n AS DOUBLE)
                * (SELECT n_all FROM nn) - CAST(norms.n AS DOUBLE)
                  * norms.n)
             / 1000000000000.0, 6) AS mean_cross_dot
FROM w_in w
JOIN norms ON norms.label = w.label
JOIN cross_d c ON c.label = w.label
ORDER BY label
""",
    description="Mean pairwise dot products within vs across "
    "labels, WITHOUT materializing any pair: the algebraic identity "
    "sum_{i!=j} vi.vj = |S|^2 - sum|vi|^2 turns O(n^2) pair sums "
    "into per-dimension sum-vector arithmetic (S_l = per-label "
    "quantized dim sums; cross terms via S_l . (S_total - S_l)).  "
    "Everything decimal-exact until the two surfaced divisions "
    "(de-quantized by 1e12); labels whose within-mean dwarfs their "
    "cross-mean are well-separated clusters.  O(vectors x dims) "
    "total work — the pair-free contrast to the SemDeDup family.",
)
def q_emb_intra_inter_dot(spark, sf_dir):
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
    s = q.groupBy("label", "pos").agg(
        F.sum("qv").cast("decimal(38,0)").alias("sl")
    )
    norms = q.groupBy("label").agg(
        F.sum(
            F.col("qv").cast("decimal(38,0)")
            * F.col("qv").cast("decimal(38,0)")
        ).cast("decimal(38,0)").alias("q2"),
        F.countDistinct("vec_id").cast("long").alias("n"),
    )
    within = s.groupBy("label").agg(
        F.sum(F.col("sl") * F.col("sl")).cast("decimal(38,0)")
        .alias("s2")
    )
    total = s.groupBy("pos").agg(
        F.sum("sl").cast("decimal(38,0)").alias("st")
    )
    cross_d = (
        s.join(total, "pos")
        .groupBy("label")
        .agg(
            F.sum(F.col("sl") * (F.col("st") - F.col("sl")))
            .cast("decimal(38,0)").alias("sx")
        )
    )
    nn = norms.agg(F.sum("n").cast("long").alias("n_all"))
    j = (
        within.join(norms, "label")
        .join(cross_d, "label")
        .crossJoin(F.broadcast(nn))
    )
    return j.select(
        F.col("label").cast("long").alias("label"),
        F.col("n").alias("n_vecs"),
        F.round(
            (F.col("s2").cast("double") - F.col("q2").cast("double"))
            / (F.col("n").cast("double") * (F.col("n") - 1))
            / 1000000000000.0,
            6,
        ).alias("mean_within_dot"),
        F.round(
            F.col("sx").cast("double")
            / (
                F.col("n").cast("double") * F.col("n_all")
                - F.col("n").cast("double") * F.col("n")
            )
            / 1000000000000.0,
            6,
        ).alias("mean_cross_dot"),
    ).orderBy("label")


@staged(
    "q_emb_sign_entropy",
    oracle="""
WITH q AS (
  SELECT u.pos AS pos,
         CASE WHEN CAST(u.x AS DOUBLE) > 0 THEN 1 ELSE 0 END AS sgn
  FROM embeddings,
       LATERAL (SELECT generate_subscripts(embedding, 1) AS pos,
                       unnest(embedding) AS x) u),
     c AS (
  SELECT pos, CAST(SUM(sgn) AS BIGINT) AS pos_n,
         CAST(count(*) AS BIGINT) AS n
  FROM q GROUP BY 1)
SELECT CAST(pos AS BIGINT) AS dim, pos_n, n,
       round(CASE WHEN pos_n = 0 OR pos_n = n THEN 0.0
             ELSE -(CAST(pos_n AS DOUBLE) / n)
                    * log2(CAST(pos_n AS DOUBLE) / n)
                  - (CAST(n - pos_n AS DOUBLE) / n)
                    * log2(CAST(n - pos_n AS DOUBLE) / n) END, 6)
         AS sign_entropy
FROM c ORDER BY dim
""",
    description="Per-dimension sign entropy: H(sign bit) per "
    "coordinate — a dimension whose sign is near-deterministic "
    "(entropy near 0) carries almost no binary information and is "
    "a dead axis; healthy random-projection-like embeddings sit "
    "near 1.  Exact sign counts; one fixed log2 expression per "
    "dimension with round(6) absorbing last-ulp libm drift (the "
    "cross-entropy precedent).",
)
def q_emb_sign_entropy(spark, sf_dir):
    (emb,) = load(spark, sf_dir, "embeddings")
    q = emb.select(
        F.posexplode("embedding").alias("pos0", "x")
    ).select(
        (F.col("pos0") + 1).alias("pos"),
        F.when(F.col("x").cast("double") > 0, 1).otherwise(0)
        .alias("sgn"),
    )
    c = q.groupBy("pos").agg(
        F.sum("sgn").cast("long").alias("pos_n"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    p = F.col("pos_n").cast("double") / F.col("n")
    pq = (F.col("n") - F.col("pos_n")).cast("double") / F.col("n")
    return c.select(
        F.col("pos").cast("long").alias("dim"),
        "pos_n", "n",
        F.round(
            F.when(
                (F.col("pos_n") == 0) | (F.col("pos_n") == F.col("n")),
                F.lit(0.0),
            ).otherwise(-(p * F.log2(p)) - pq * F.log2(pq)),
            6,
        ).alias("sign_entropy"),
    ).orderBy("dim")


# ---------------------------------------------------------------------------
# Lake metadata pruning.
# ---------------------------------------------------------------------------


@staged(
    "q_lake_bloom_point",
    oracle="""
SELECT p_partkey,
       CAST(count(*) AS BIGINT) AS n,
       CAST(SUM(CAST(round(p_retailprice * 100) AS BIGINT))
            AS BIGINT) AS cents
FROM part
WHERE p_partkey IN (11, 23, 47, 101, 157)
GROUP BY 1 ORDER BY 1
""",
    description="Bloom-filter point reads (ext/manifest.py "
    "commit_with_blooms / read_pruned_point): per-file Bloom words "
    "in the MANIFEST let a point lookup skip files from metadata "
    "alone — the complement of min/max zone maps for uniformly "
    "scattered keys.  The function asserts at least one probed key "
    "skipped files (n_read < n_total) and unions the five pruned "
    "point frames; values must equal the plain IN-filter oracle "
    "(pruning may only skip, never lose).",
)
def q_lake_bloom_point(spark, sf_dir):
    import uuid as _uuid

    from clickbom_spark.ext.manifest import (
        VersionedLake,
        commit_with_blooms,
        read_pruned_point,
    )
    from clickbom_spark.queries.staged import _TMP

    (part,) = load(spark, sf_dir, "part")
    # hash-scatter into 6 real partitions: VersionedLake.create
    # coalesces DOWN to n_files, so a single-partition source would
    # otherwise land as one file and leave the blooms nothing to skip
    base = part.select(
        "p_partkey",
        F.round(F.col("p_retailprice") * 100).cast("long")
        .alias("cents"),
    ).repartition(6, "p_partkey")
    tag = _uuid.uuid4().hex[:8]
    path = os.path.join(_TMP, f"bloom_{tag}")
    shutil.rmtree(path, ignore_errors=True)
    keys = [11, 23, 47, 101, 157]
    try:
        lake = VersionedLake.create(spark, path, base, n_files=6)
        commit_with_blooms(lake, "p_partkey")
        skipped_somewhere = False
        rows = []
        for k in keys:
            frame, n_total, n_read = read_pruned_point(lake, k)
            skipped_somewhere = skipped_somewhere or n_read < n_total
            got = (
                frame.where(F.col("p_partkey") == k)
                .groupBy("p_partkey")
                .agg(
                    F.count(F.lit(1)).cast("long").alias("n"),
                    F.sum("cents").cast("long").alias("cents"),
                )
                .collect()
            )
            rows.extend(
                (r["p_partkey"], r["n"], r["cents"]) for r in got
            )
        assert skipped_somewhere, "bloom pruning never skipped a file"
    finally:
        shutil.rmtree(path, ignore_errors=True)
    return spark.createDataFrame(
        rows, "p_partkey bigint, n bigint, cents bigint"
    ).orderBy("p_partkey")


@staged(
    "q_lake_multi_range_prune",
    oracle=f"""
SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
       CAST(SUM({_LCENTS_DUCK}) AS BIGINT) AS cents
FROM lineitem
WHERE l_partkey BETWEEN 100 AND 500
  AND l_suppkey BETWEEN 2 AND 60
GROUP BY 1 ORDER BY 1
""",
    description="Multi-column conjunctive zone-map pruning "
    "(ext/manifest.py read_pruned_multi): the lake clusters files "
    "by partkey ranges, the manifest carries min/max stats for BOTH "
    "predicate columns, and the conjunctive read keeps only files "
    "whose stats intersect EVERY range — asserted to skip files.  "
    "The residual in-file predicate still applies, so the aggregate "
    "equals the plain BETWEEN oracle (superset guarantee).",
)
def q_lake_multi_range_prune(spark, sf_dir):
    import uuid as _uuid

    from clickbom_spark.ext.manifest import (
        VersionedLake,
        commit_with_stats,
        read_pruned_multi,
    )
    from clickbom_spark.queries.staged import _TMP

    (lineitem,) = load(spark, sf_dir, "lineitem")
    # range-cluster on partkey into 8 real partitions so the per-file
    # zone maps are tight on the leading predicate column (create
    # coalesces DOWN, so the partition count must be explicit)
    base = lineitem.select(
        "l_partkey", "l_suppkey", "l_returnflag",
        F.round(F.col("l_extendedprice") * 100).cast("long")
        .alias("cents"),
    ).repartitionByRange(8, "l_partkey")
    tag = _uuid.uuid4().hex[:8]
    path = os.path.join(_TMP, f"mrp_{tag}")
    shutil.rmtree(path, ignore_errors=True)
    try:
        lake = VersionedLake.create(spark, path, base, n_files=8)
        commit_with_stats(lake, ["l_partkey", "l_suppkey"])
        frame, n_total, n_read = read_pruned_multi(
            lake, {"l_partkey": (100, 500), "l_suppkey": (2, 60)}
        )
        assert n_read < n_total, (
            f"zone maps pruned nothing: {n_read}/{n_total}"
        )
        rows = (
            frame.where(
                F.col("l_partkey").between(100, 500)
                & F.col("l_suppkey").between(2, 60)
            )
            .groupBy("l_returnflag")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n"),
                F.sum("cents").cast("long").alias("cents"),
            )
            .orderBy("l_returnflag")
            .collect()
        )
    finally:
        shutil.rmtree(path, ignore_errors=True)
    return spark.createDataFrame(
        rows, "l_returnflag string, n bigint, cents bigint"
    ).orderBy("l_returnflag")


# ---------------------------------------------------------------------------
# Round-14 swap arrivals (VERDICT r13 #8): these two moved here from
# the staged_r15 wave 1-for-1 with the new dialect round-trips for
# the round-14 suffix-variant closure compiles
# (q_dialect_quantile_low_high / q_dialect_variant_spellings) —
# keeping r15 at its pinned 23; this terminal wave absorbs the
# displaced pair (23 -> 25).
# ---------------------------------------------------------------------------


@staged(
    "q_part_name_tokens",
    oracle="""
WITH w AS (
  SELECT unnest(string_split(p_name, ' ')) AS w FROM part)
SELECT w AS token, CAST(count(*) AS BIGINT) AS n
FROM w GROUP BY w ORDER BY n DESC, token LIMIT 10
""",
    description="Top-10 tokens of the part-name vocabulary: "
    "single-space tokenization, one hash aggregate, top-k with a "
    "(count DESC, token) total tie-break — the catalog-vocabulary "
    "profile product-search indexing starts from, and the "
    "dimension-table twin of the documents-table word counts.",
)
def q_part_name_tokens(spark, sf_dir):
    (part,) = load(spark, sf_dir, "part")
    w = part.select(F.explode(F.split("p_name", " ")).alias("token"))
    return (
        w.groupBy("token")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .orderBy(F.col("n").desc(), "token")
        .limit(10)
    )


@staged(
    "q_weekend_share",
    oracle=f"""
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(count(*) FILTER (WHERE isodow(ts) >= 6) AS BIGINT)
         AS n_weekend,
       round(CAST(count(*) FILTER (WHERE isodow(ts) >= 6) AS DOUBLE)
             / count(*), 6) AS weekend_share,
       CAST(coalesce(sum({_CENTS_DUCK})
            FILTER (WHERE isodow(ts) >= 6), 0) AS BIGINT)
         AS weekend_cents
FROM events GROUP BY event_type ORDER BY event_type
""",
    description="Weekend share per event type (ISO Saturday/Sunday "
    "= dow 6/7, via the Sunday-first-shifted Spark dayofweek): "
    "conditional counts and exact weekend cents ride ONE aggregate "
    "over ONE scan, one division round(6).  Weekend skew separates "
    "consumer from workday traffic in load planning.",
)
def q_weekend_share(spark, sf_dir):
    (events,) = load(spark, sf_dir, "events")
    isodow = ((F.dayofweek("ts") + 5) % 7) + 1
    wk = F.sum(F.when(isodow >= 6, 1).otherwise(0)).cast("long")
    return (
        events.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            wk.alias("n_weekend"),
            F.round(
                wk.cast("double") / F.count(F.lit(1)), 6
            ).alias("weekend_share"),
            F.sum(
                F.when(
                    isodow >= 6,
                    F.round(F.col("value") * 100).cast("long"),
                ).otherwise(0)
            )
            .cast("long")
            .alias("weekend_cents"),
        )
        .orderBy("event_type")
    )


# (round-14 swap arrival #3: displaced from the r15 wave by
# q_dialect_ipv4_forms.)
@staged(
    "q_event_hour_peak",
    oracle="""
WITH h AS (
  SELECT event_type, CAST(hour(ts) AS BIGINT) AS hr,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2),
     tot AS (
  SELECT event_type, CAST(sum(n) AS BIGINT) AS t FROM h GROUP BY 1),
     ranked AS (
  SELECT event_type, hr, n,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY n DESC, hr) AS rk
  FROM h)
SELECT r.event_type AS event_type, hr AS peak_hour, n AS n_peak,
       round(CAST(n AS DOUBLE) / t, 6) AS peak_share
FROM ranked r JOIN tot USING (event_type)
WHERE rk = 1 ORDER BY event_type
""",
    description="Peak activity hour per event type: hourly counts, "
    "a row_number window PARTITIONED by type with a (count DESC, "
    "hour) total tie-break, and the peak's share of the type's "
    "traffic (one division round(6)).  The peak-hour drift per type "
    "is the alerting baseline scheduling reads.",
)
def q_event_hour_peak(spark, sf_dir):
    from pyspark.sql import Window

    (events,) = load(spark, sf_dir, "events")
    h = events.groupBy(
        "event_type", F.hour("ts").cast("long").alias("hr")
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    tot = h.groupBy("event_type").agg(
        F.sum("n").cast("long").alias("t")
    )
    w = Window.partitionBy("event_type").orderBy(F.col("n").desc(), "hr")
    return (
        h.select(
            "event_type", "hr", "n", F.row_number().over(w).alias("rk")
        )
        .where(F.col("rk") == 1)
        .join(tot, "event_type")
        .select(
            "event_type",
            F.col("hr").alias("peak_hour"),
            F.col("n").alias("n_peak"),
            F.round(F.col("n").cast("double") / F.col("t"), 6)
            .alias("peak_share"),
        )
        .orderBy("event_type")
    )


# (round-14 swap arrival #4: displaced from the r15 wave by
# q_dialect_conversion_forms.)
@staged(
    "q_source_vocab",
    oracle="""
WITH w AS (
  SELECT source, unnest(string_split(text, ' ')) AS w
  FROM documents WHERE text IS NOT NULL)
SELECT source,
       CAST(count(*) AS BIGINT) AS tokens,
       CAST(count(DISTINCT w) AS BIGINT) AS vocab,
       round(CAST(count(DISTINCT w) AS DOUBLE) / count(*), 6)
         AS type_token_ratio
FROM w GROUP BY source ORDER BY source
""",
    description="Vocabulary profile per source: token and distinct-"
    "type counts off one tokenization, per-source type-token ratio "
    "as one division round(6) — the per-source slice of the corpus "
    "TTR (q_ttr_stats is the global view); low-TTR sources are the "
    "templated/boilerplate suspects.",
)
def q_source_vocab(spark, sf_dir):
    (docs,) = load(spark, sf_dir, "documents")
    w = docs.where(F.col("text").isNotNull()).select(
        "source", F.explode(F.split("text", " ")).alias("w")
    )
    return (
        w.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("tokens"),
            F.countDistinct("w").cast("long").alias("vocab"),
            F.round(
                F.countDistinct("w").cast("double") / F.count(F.lit(1)),
                6,
            ).alias("type_token_ratio"),
        )
        .orderBy("source")
    )
