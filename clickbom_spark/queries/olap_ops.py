"""ClickHouse-semantics OLAP operators re-expressed Spark-first.

The reference targets a ClickHouse warehouse (entrypoint.sh insert
path); these queries cover the warehouse-side operator surface a
ClickHouse user leans on daily, each as a declarative DataFrame plan
with a DuckDB oracle:

- ``argMax`` (latest value per key) as ``max_by`` — a *scalar
  aggregate* with map-side partial aggregation, deliberately NOT a
  row_number window: at 100 TB "latest per key" via window sort
  shuffles and sorts every row, while max_by combines per-partition
  maxima and shuffles only one row per (partition, key).
- CollapsingMergeTree sign-collapse: ``SUM(sign)`` visibility +
  ``SUM(sign*x)`` net aggregates — the ClickHouse mutable-state
  idiom expressed as a plain aggregation, one shuffle.
- ``ORDER BY ... WITH FILL`` gap-fill: a generated calendar spine
  (tiny, broadcast) left-joined against pre-aggregated counts, so
  the big side is aggregated BEFORE the join and the spine never
  shuffles the fact table.
- ``sequenceMatch``: ordered event-pattern regex per user over a
  deterministic (ts, event_id)-sorted type fingerprint.
- Window distribution functions (``ntile`` / ``percent_rank`` /
  ``cume_dist``) with a total deterministic ordering.
- Hypertable-style time-hierarchy ROLLUP (type → month → day) in a
  single pass — partial aggregation handles all grouping sets in
  one shuffle.
- Higher-order array functions (``filter`` / ``transform`` /
  ``aggregate``) over embedding vectors, all JVM-side codegen — the
  arrayMap/arrayFilter/arrayFold surface.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from clickbom_spark.queries import dec, dsum, load, query


@query(
    "q_argmax_latest",
    oracle="""
SELECT user_id,
       MAX(ts) AS last_ts,
       MAX_BY(event_type, ts) AS last_type,
       MAX_BY(value, ts) AS last_value,
       COUNT(*) AS n_events
FROM events
GROUP BY user_id
ORDER BY user_id
""",
    description="argMax semantics (latest value per key) as the max_by "
    "scalar aggregate: map-side combinable, one shuffled row per key — "
    "the 100 TB-safe alternative to a row_number window for "
    "keep-latest.",
)
def q_argmax_latest(spark, sf_dir):
    (events,) = load(spark, sf_dir, "events")
    return (
        events.groupBy("user_id")
        .agg(
            F.max("ts").alias("last_ts"),
            F.max_by("event_type", "ts").alias("last_type"),
            F.max_by("value", "ts").alias("last_value"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("user_id")
    )


@query(
    "q_collapsing_merge",
    oracle="""
SELECT user_id,
       CAST(SUM(sign) AS BIGINT) AS net_rows,
       CAST(SUM(sign * CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS net_value
FROM (
  SELECT user_id, value,
         CASE WHEN event_id % 10 = 9 THEN -1 ELSE 1 END AS sign
  FROM events
)
GROUP BY user_id
HAVING SUM(sign) > 0
ORDER BY user_id
""",
    description="CollapsingMergeTree collapse: +1/-1 sign rows net out "
    "via SUM(sign) visibility and SUM(sign*value) aggregates in one "
    "plain aggregation — ClickHouse's mutable-state idiom as a "
    "single-shuffle groupBy.",
)
def q_collapsing_merge(spark, sf_dir):
    (events,) = load(spark, sf_dir, "events")
    sign = F.when(F.col("event_id") % 10 == 9, F.lit(-1)).otherwise(F.lit(1))
    return (
        events.select("user_id", sign.alias("sign"), dec("value").alias("v"))
        .groupBy("user_id")
        .agg(
            F.sum("sign").cast("long").alias("net_rows"),
            F.sum(F.col("sign") * F.col("v")).cast("double").alias("net_value"),
        )
        .where(F.col("net_rows") > 0)
        .orderBy("user_id")
    )


@query(
    "q_gapfill_daily",
    oracle="""
WITH span AS (
  SELECT DATE_TRUNC('day', MIN(ts)) AS d0, DATE_TRUNC('day', MAX(ts)) AS d1
  FROM events
),
days AS (
  SELECT UNNEST(generate_series(d0, d1, INTERVAL 1 DAY)) AS day FROM span
),
types AS (SELECT DISTINCT event_type FROM events),
daily AS (
  SELECT event_type, DATE_TRUNC('day', ts) AS day, COUNT(*) AS n
  FROM events GROUP BY 1, 2
)
SELECT t.event_type, d.day, CAST(COALESCE(daily.n, 0) AS BIGINT) AS n_events
FROM days d
CROSS JOIN types t
LEFT JOIN daily ON daily.event_type = t.event_type AND daily.day = d.day
ORDER BY t.event_type, d.day
""",
    description="ORDER BY ... WITH FILL gap-fill: calendar spine "
    "(sequence + explode, tiny → broadcast) × type dimension, left-"
    "joined against PRE-AGGREGATED daily counts so the fact table is "
    "reduced before the join and missing days appear as zeros.",
)
def q_gapfill_daily(spark, sf_dir):
    (events,) = load(spark, sf_dir, "events")
    daily = (
        events.groupBy(F.date_trunc("day", "ts").alias("day"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    days = (
        events.agg(
            F.date_trunc("day", F.min("ts")).alias("d0"),
            F.date_trunc("day", F.max("ts")).alias("d1"),
        )
        .select(F.explode(F.expr("sequence(d0, d1, interval 1 day)")).alias("day"))
    )
    types = events.select("event_type").distinct()
    spine = days.crossJoin(types)
    # left-preserved side can't be the broadcast build side; the daily
    # aggregate is the same tiny cardinality as the spine (days × types)
    # even at 100 TB, since it's post-aggregation — broadcast it.
    return (
        spine.join(F.broadcast(daily), ["event_type", "day"], "left")
        .select(
            "event_type",
            "day",
            F.coalesce("n", F.lit(0)).cast("long").alias("n_events"),
        )
        .orderBy("event_type", "day")
    )


@query(
    "q_sequence_match",
    oracle="""
SELECT user_id,
       STRING_AGG(SUBSTR(event_type, 1, 1), '' ORDER BY ts, event_id) AS seq,
       COUNT(*) AS n_events,
       REGEXP_MATCHES(
         STRING_AGG(SUBSTR(event_type, 1, 1), '' ORDER BY ts, event_id),
         'v.*c.*p') AS matched_funnel,
       REGEXP_MATCHES(
         STRING_AGG(SUBSTR(event_type, 1, 1), '' ORDER BY ts, event_id),
         's.*v.*c.*p') AS matched_onboarding
FROM events
GROUP BY user_id
ORDER BY user_id
""",
    description="sequenceMatch: per-user event-type fingerprint in "
    "deterministic (ts, event_id) order, regex-matched for ordered "
    "patterns (view→click→purchase; signup-led variant) — arbitrary "
    "sequence patterns beyond the fixed min-ts cascade of the funnel "
    "query.",
)
def q_sequence_match(spark, sf_dir):
    (events,) = load(spark, sf_dir, "events")
    seq = F.array_join(
        F.transform(
            F.array_sort(F.collect_list(F.struct("ts", "event_id", "event_type"))),
            lambda x: x["event_type"].substr(1, 1),
        ),
        "",
    )
    return (
        events.groupBy("user_id")
        .agg(
            seq.alias("seq"),
            F.count(F.lit(1)).alias("n_events"),
            seq.rlike("v.*c.*p").alias("matched_funnel"),
            seq.rlike("s.*v.*c.*p").alias("matched_onboarding"),
        )
        .orderBy("user_id")
    )


@query(
    "q_window_distribution",
    oracle="""
SELECT c_custkey, c_mktsegment,
       CAST(NTILE(4) OVER w AS BIGINT) AS quartile,
       PERCENT_RANK() OVER w AS pct_rank,
       CUME_DIST() OVER w AS cume
FROM customer
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
ORDER BY c_mktsegment, c_acctbal, c_custkey
""",
    description="Window distribution functions (ntile / percent_rank / "
    "cume_dist) over a total deterministic ordering — partitioned "
    "window, no global sort.",
)
def q_window_distribution(spark, sf_dir):
    from pyspark.sql.window import Window

    (cust,) = load(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return (
        cust.select(
            "c_custkey",
            "c_mktsegment",
            F.ntile(4).over(w).cast("long").alias("quartile"),
            F.percent_rank().over(w).alias("pct_rank"),
            F.cume_dist().over(w).alias("cume"),
        )
        .orderBy("c_mktsegment", "pct_rank", "c_custkey")
    )


@query(
    "q_time_rollup_hierarchy",
    oracle="""
SELECT event_type, month, day,
       GROUPING(event_type, month, day) AS grp_id,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM (
  SELECT event_type,
         DATE_TRUNC('month', ts) AS month,
         DATE_TRUNC('day', ts) AS day,
         value
  FROM events
)
GROUP BY ROLLUP(event_type, month, day)
ORDER BY grp_id, event_type, month, day
""",
    description="Hypertable-style time-hierarchy rollup: type → month "
    "→ day materialized in ONE pass via ROLLUP — partial aggregation "
    "computes every granularity in a single shuffle instead of one "
    "scan per level.",
)
def q_time_rollup_hierarchy(spark, sf_dir):
    (events,) = load(spark, sf_dir, "events")
    return (
        events.select(
            "event_type",
            F.date_trunc("month", "ts").alias("month"),
            F.date_trunc("day", "ts").alias("day"),
            dec("value").alias("v"),
        )
        .rollup("event_type", "month", "day")
        .agg(
            F.grouping_id().alias("grp_id"),
            F.count(F.lit(1)).alias("n_events"),
            dsum(F.col("v"), "total_value"),
        )
        .orderBy("grp_id", "event_type", "month", "day")
    )


@query(
    "q_array_hof",
    oracle="""
SELECT vec_id,
       CAST(LEN(LIST_FILTER(embedding, x -> x > 0)) AS BIGINT) AS n_pos,
       CAST(LIST_MAX(LIST_TRANSFORM(embedding, x -> ABS(x))) AS DOUBLE)
         AS max_abs,
       ROUND(LIST_SUM(LIST_TRANSFORM(embedding,
                                     x -> ABS(CAST(x AS DOUBLE)))), 6) AS l1
FROM embeddings
ORDER BY vec_id
""",
    description="Higher-order array functions (filter / transform / "
    "fold) over embedding vectors — the arrayMap/arrayFilter/"
    "arrayReduce surface, entirely JVM-side codegen, no UDFs.",
)
def q_array_hof(spark, sf_dir):
    (emb,) = load(spark, sf_dir, "embeddings")
    return (
        emb.select(
            "vec_id",
            F.size(F.filter("embedding", lambda x: x > 0)).cast("long").alias(
                "n_pos"
            ),
            F.array_max(F.transform("embedding", lambda x: F.abs(x)))
            .cast("double")
            .alias("max_abs"),
            F.round(
                F.aggregate(
                    "embedding",
                    F.lit(0.0).cast("double"),
                    lambda acc, x: acc + F.abs(x.cast("double")),
                ),
                6,
            ).alias("l1"),
        )
        .orderBy("vec_id")
    )


@query(
    "q_unpivot_metrics",
    # The oracle spells unpivot as its UNION ALL definition — the
    # semantics, independent of either engine's UNPIVOT sugar.
    oracle="""
WITH agg AS (
  SELECT l_returnflag,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS price,
         CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS discount
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, metric, value FROM (
  SELECT l_returnflag, 'qty' AS metric, qty AS value FROM agg
  UNION ALL
  SELECT l_returnflag, 'price' AS metric, price AS value FROM agg
  UNION ALL
  SELECT l_returnflag, 'discount' AS metric, discount AS value FROM agg
)
ORDER BY l_returnflag, metric
""",
    description="Wide-to-long UNPIVOT (melt) of per-flag metric columns "
    "— DataFrame.unpivot compiles to a single Expand over the "
    "aggregated (tiny) side, never re-scanning the fact table per "
    "metric.",
)
def q_unpivot_metrics(spark, sf_dir):
    (li,) = load(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        dsum(dec("l_quantity"), "qty"),
        dsum(dec("l_extendedprice"), "price"),
        dsum(dec("l_discount"), "discount"),
    )
    return (
        agg.unpivot(
            ids=["l_returnflag"],
            values=["qty", "price", "discount"],
            variableColumnName="metric",
            valueColumnName="value",
        )
        .orderBy("l_returnflag", "metric")
    )


@query(
    "q_conditional_aggs",
    oracle="""
SELECT user_id,
       COUNT(*) FILTER (WHERE event_type = 'purchase') AS n_purchases,
       CAST(COALESCE(SUM(CAST(value AS DECIMAL(18,2)))
                       FILTER (WHERE event_type = 'purchase'), 0) AS DOUBLE)
         AS purchase_value,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) FILTER (WHERE event_type = 'click')
              AS DOUBLE)
         / COUNT(*) FILTER (WHERE event_type = 'click') AS avg_click_value
FROM events
GROUP BY user_id
ORDER BY user_id
""",
    description="ClickHouse -If combinators (countIf / sumIf / avgIf) "
    "as conditional aggregates in ONE pass over the fact table — no "
    "per-condition scans, all map-side combinable.",
)
def q_conditional_aggs(spark, sf_dir):
    (events,) = load(spark, sf_dir, "events")
    is_p = F.col("event_type") == "purchase"
    is_c = F.col("event_type") == "click"
    return (
        events.groupBy("user_id")
        .agg(
            F.count_if(is_p).alias("n_purchases"),
            F.coalesce(F.sum(F.when(is_p, dec("value"))), F.lit(0))
            .cast("double")
            .alias("purchase_value"),
            (
                F.sum(F.when(is_c, dec("value"))).cast("double")
                / F.count_if(is_c)
            ).alias("avg_click_value"),
        )
        .orderBy("user_id")
    )


@query(
    "q_full_outer_reconcile",
    oracle="""
WITH o AS (
  SELECT o_custkey AS k, COUNT(*) AS n_orders FROM orders GROUP BY 1
),
e AS (
  SELECT user_id AS k, COUNT(*) AS n_events FROM events GROUP BY 1
)
SELECT COALESCE(o.k, e.k) AS key,
       CAST(COALESCE(n_orders, 0) AS BIGINT) AS n_orders,
       CAST(COALESCE(n_events, 0) AS BIGINT) AS n_events,
       CASE WHEN o.k IS NULL THEN 'events_only'
            WHEN e.k IS NULL THEN 'orders_only'
            ELSE 'both' END AS presence
FROM o FULL OUTER JOIN e ON o.k = e.k
ORDER BY key
""",
    description="FULL OUTER reconciliation of two aggregated activity "
    "ledgers — both sides reduced before the join so the full-outer "
    "shuffle moves one row per key, not raw facts.",
)
def q_full_outer_reconcile(spark, sf_dir):
    orders, events = load(spark, sf_dir, "orders", "events")
    o = orders.groupBy(F.col("o_custkey").alias("k")).agg(
        F.count(F.lit(1)).alias("n_orders")
    )
    e = events.groupBy(F.col("user_id").alias("k")).agg(
        F.count(F.lit(1)).alias("n_events")
    )
    return (
        o.join(e, "k", "full")
        .select(
            F.col("k").alias("key"),
            F.coalesce("n_orders", F.lit(0)).cast("long").alias("n_orders"),
            F.coalesce("n_events", F.lit(0)).cast("long").alias("n_events"),
            F.when(F.col("n_orders").isNull(), F.lit("events_only"))
            .when(F.col("n_events").isNull(), F.lit("orders_only"))
            .otherwise(F.lit("both"))
            .alias("presence"),
        )
        .orderBy("key")
    )


@query(
    "q_click_attribution",
    oracle="""
SELECT user_id,
       COUNT(*) FILTER (WHERE event_type = 'view') AS n_views,
       COUNT(*) FILTER (WHERE event_type = 'click') AS n_clicks,
       COUNT(*) FILTER (
         WHERE event_type = 'click'
           AND prev_view_ts >= ts - INTERVAL 10 MINUTE) AS n_attributed
FROM (
  SELECT user_id, event_type, ts,
         LAST_VALUE(CASE WHEN event_type = 'view' THEN ts END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS prev_view_ts
  FROM events
  WHERE event_type IN ('view', 'click')
)
GROUP BY user_id
ORDER BY user_id
""",
    description="Last-touch click attribution (clicks within 10 min of "
    "the user's most recent view) via ONE ignore-nulls window pass over "
    "the unioned stream — join-free, so a hot user costs O(events), "
    "never the O(views×clicks) of an interval join; the streaming twin "
    "(streaming/joins.py attribution_join) emits the pair-level form "
    "with watermark-bounded state.",
)
def q_click_attribution(spark, sf_dir):
    from pyspark.sql.window import Window

    (events,) = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    vc = events.where(F.col("event_type").isin("view", "click")).select(
        "user_id",
        "event_type",
        "ts",
        "event_id",
    )
    scanned = vc.withColumn(
        "prev_view_ts",
        F.last(F.when(F.col("event_type") == "view", F.col("ts")), True).over(w),
    )
    is_v = F.col("event_type") == "view"
    is_c = F.col("event_type") == "click"
    attributed = is_c & (
        F.col("prev_view_ts") >= F.col("ts") - F.expr("interval 10 minutes")
    )
    return (
        scanned.groupBy("user_id")
        .agg(
            F.count_if(is_v).alias("n_views"),
            F.count_if(is_c).alias("n_clicks"),
            F.count_if(attributed).alias("n_attributed"),
        )
        .orderBy("user_id")
    )


# Exact-sufficient-statistics helpers: every cross-row sum is an exact
# DECIMAL, so Pearson/OLS are pure double arithmetic over a handful of
# scalars with one fixed IEEE op order — engine-portable to the bit.
_D2 = "DECIMAL(18,2)"
_D4 = "DECIMAL(38,4)"


@query(
    "q_corr_pairs",
    oracle=f"""
WITH s AS (
  SELECT COUNT(*) AS n,
         SUM(CAST(l_quantity AS {_D2})) AS sq,
         SUM(CAST(l_extendedprice AS {_D2})) AS sp,
         SUM(CAST(l_discount AS {_D2})) AS sd,
         SUM(CAST(CAST(l_quantity AS {_D2}) * CAST(l_quantity AS {_D2})
                  AS {_D4})) AS sqq,
         SUM(CAST(CAST(l_extendedprice AS {_D2}) * CAST(l_extendedprice AS {_D2})
                  AS {_D4})) AS spp,
         SUM(CAST(CAST(l_discount AS {_D2}) * CAST(l_discount AS {_D2})
                  AS {_D4})) AS sdd,
         SUM(CAST(CAST(l_quantity AS {_D2}) * CAST(l_extendedprice AS {_D2})
                  AS {_D4})) AS sqp,
         SUM(CAST(CAST(l_quantity AS {_D2}) * CAST(l_discount AS {_D2})
                  AS {_D4})) AS sqd,
         SUM(CAST(CAST(l_extendedprice AS {_D2}) * CAST(l_discount AS {_D2})
                  AS {_D4})) AS spd
  FROM lineitem
)
SELECT pair, round(r, 9) AS r FROM (
  SELECT 'qty_price' AS pair,
         (CAST(n AS DOUBLE) * CAST(sqp AS DOUBLE)
          - CAST(sq AS DOUBLE) * CAST(sp AS DOUBLE))
         / (sqrt(CAST(n AS DOUBLE) * CAST(sqq AS DOUBLE)
                 - CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE))
            * sqrt(CAST(n AS DOUBLE) * CAST(spp AS DOUBLE)
                   - CAST(sp AS DOUBLE) * CAST(sp AS DOUBLE))) AS r
  FROM s
  UNION ALL
  SELECT 'qty_discount',
         (CAST(n AS DOUBLE) * CAST(sqd AS DOUBLE)
          - CAST(sq AS DOUBLE) * CAST(sd AS DOUBLE))
         / (sqrt(CAST(n AS DOUBLE) * CAST(sqq AS DOUBLE)
                 - CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE))
            * sqrt(CAST(n AS DOUBLE) * CAST(sdd AS DOUBLE)
                   - CAST(sd AS DOUBLE) * CAST(sd AS DOUBLE)))
  FROM s
  UNION ALL
  SELECT 'price_discount',
         (CAST(n AS DOUBLE) * CAST(spd AS DOUBLE)
          - CAST(sp AS DOUBLE) * CAST(sd AS DOUBLE))
         / (sqrt(CAST(n AS DOUBLE) * CAST(spp AS DOUBLE)
                 - CAST(sp AS DOUBLE) * CAST(sp AS DOUBLE))
            * sqrt(CAST(n AS DOUBLE) * CAST(sdd AS DOUBLE)
                   - CAST(sd AS DOUBLE) * CAST(sd AS DOUBLE)))
  FROM s
)
ORDER BY pair
""",
    description="Pearson correlation matrix (ClickHouse corr analog) "
    "over (quantity, price, discount): ONE scan accumulates exact "
    "decimal sufficient statistics (sums, squares, cross-products), "
    "then r is scalar double arithmetic — no second pass, no "
    "per-row doubles, bit-identical across engines.",
)
def q_corr_pairs(spark, sf_dir):
    (li,) = load(spark, sf_dir, "lineitem")
    d2 = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    d4 = lambda a, b: (d2(a) * d2(b)).cast("decimal(38,4)")  # noqa: E731
    s = li.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(d2("l_quantity")).alias("sq"),
        F.sum(d2("l_extendedprice")).alias("sp"),
        F.sum(d2("l_discount")).alias("sd"),
        F.sum(d4("l_quantity", "l_quantity")).alias("sqq"),
        F.sum(d4("l_extendedprice", "l_extendedprice")).alias("spp"),
        F.sum(d4("l_discount", "l_discount")).alias("sdd"),
        F.sum(d4("l_quantity", "l_extendedprice")).alias("sqp"),
        F.sum(d4("l_quantity", "l_discount")).alias("sqd"),
        F.sum(d4("l_extendedprice", "l_discount")).alias("spd"),
    )

    def corr(sxy, sx, sy, sxx, syy):
        n = F.col("n").cast("double")
        num = n * F.col(sxy).cast("double") - F.col(sx).cast("double") * F.col(
            sy
        ).cast("double")
        dx = F.sqrt(
            n * F.col(sxx).cast("double")
            - F.col(sx).cast("double") * F.col(sx).cast("double")
        )
        dy = F.sqrt(
            n * F.col(syy).cast("double")
            - F.col(sy).cast("double") * F.col(sy).cast("double")
        )
        return num / (dx * dy)

    rows = [
        ("qty_price", corr("sqp", "sq", "sp", "sqq", "spp")),
        ("qty_discount", corr("sqd", "sq", "sd", "sqq", "sdd")),
        ("price_discount", corr("spd", "sp", "sd", "spp", "sdd")),
    ]
    out = None
    for name, expr in rows:
        part = s.select(F.lit(name).alias("pair"), F.round(expr, 9).alias("r"))
        out = part if out is None else out.unionAll(part)
    return out.orderBy("pair")


@query(
    "q_linear_fit",
    # Closed-form OLS (price ~ quantity) from the same exact decimal
    # sufficient statistics — aggregate-only model fitting, no
    # iterative solver, one scan.
    oracle=f"""
WITH s AS (
  SELECT COUNT(*) AS n,
         SUM(CAST(l_quantity AS {_D2})) AS sx,
         SUM(CAST(l_extendedprice AS {_D2})) AS sy,
         SUM(CAST(CAST(l_quantity AS {_D2}) * CAST(l_quantity AS {_D2})
                  AS {_D4})) AS sxx,
         SUM(CAST(CAST(l_quantity AS {_D2}) * CAST(l_extendedprice AS {_D2})
                  AS {_D4})) AS sxy
  FROM lineitem
)
SELECT CAST(n AS BIGINT) AS n,
       round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 9) AS beta,
       round((CAST(sy AS DOUBLE)
              - ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
                * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE), 9) AS alpha
FROM s
""",
    description="Closed-form OLS (extendedprice ~ quantity): slope and "
    "intercept from exact decimal sufficient statistics in ONE scan — "
    "aggregate-based model fitting with no iterative solver; the "
    "pattern scales to any normal-equations regression.",
)
def q_linear_fit(spark, sf_dir):
    (li,) = load(spark, sf_dir, "lineitem")
    d2 = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    d4 = lambda a, b: (d2(a) * d2(b)).cast("decimal(38,4)")  # noqa: E731
    s = li.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(d2("l_quantity")).alias("sx"),
        F.sum(d2("l_extendedprice")).alias("sy"),
        F.sum(d4("l_quantity", "l_quantity")).alias("sxx"),
        F.sum(d4("l_quantity", "l_extendedprice")).alias("sxy"),
    )
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxx = F.col("sxx").cast("double")
    sxy = F.col("sxy").cast("double")
    beta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    alpha = (sy - beta * sx) / n
    return s.select(
        F.col("n").cast("long").alias("n"),
        F.round(beta, 9).alias("beta"),
        F.round(alpha, 9).alias("alpha"),
    )


@query(
    "q_histogram_equi_height",
    # Equi-HEIGHT histogram (each bucket holds ~the same row count) via
    # NTILE over a TOTAL deterministic order — the complement of the
    # equi-width q_price_histogram; bucket boundaries are data-driven.
    oracle="""
WITH ranked AS (
  SELECT o_totalprice,
         NTILE(10) OVER (ORDER BY o_totalprice, o_orderkey) AS decile
  FROM orders
)
SELECT CAST(decile AS BIGINT) AS decile,
       COUNT(*) AS n_orders,
       CAST(MIN(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS lo,
       CAST(MAX(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS hi
FROM ranked
GROUP BY decile
ORDER BY decile
""",
    description="Equi-height histogram: exact NTILE(10) semantics over a "
    "total deterministic order, computed scale-safe — a distributed "
    "bucketed rank (ext.ranks.with_global_rank: value-bucket offsets + "
    "partition-local row_number, no single-partition window) feeds the "
    "closed-form NTILE expression; each decile ≈ equal count — the "
    "optimizer-statistics histogram shape, complementing the equi-width "
    "price histogram.",
)
def q_histogram_equi_height(spark, sf_dir):
    from clickbom_spark.ext.ranks import ntile_expr, with_global_rank

    (orders,) = load(spark, sf_dir, "orders")
    ranked = with_global_rank(
        orders.select("o_totalprice", "o_orderkey"),
        ["o_totalprice", "o_orderkey"],
        rank_col="_i",
        total_col="_n",
    ).select(
        "o_totalprice",
        ntile_expr(F.col("_i"), F.col("_n"), 10).alias("decile"),
    )
    return (
        ranked.groupBy(F.col("decile").cast("long").alias("decile"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min(dec("o_totalprice")).cast("double").alias("lo"),
            F.max(dec("o_totalprice")).cast("double").alias("hi"),
        )
        .orderBy("decile")
    )


@query(
    "q_gini_concentration",
    # Gini coefficient of supplier revenue: with revenues sorted
    # ascending and 1-indexed, G = (2*Σ(i·x_i) − (n+1)·Σx_i)/(n·Σx_i).
    # Exact decimal sums; the final expression is scalar double math
    # with one fixed op order.
    oracle="""
WITH rev AS (
  SELECT l_suppkey,
         SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS r
  FROM lineitem GROUP BY l_suppkey
), ranked AS (
  SELECT r, ROW_NUMBER() OVER (ORDER BY r, l_suppkey) AS i FROM rev
), s AS (
  SELECT COUNT(*) AS n,
         SUM(r) AS sr,
         SUM(CAST(i AS DECIMAL(18,0)) * r) AS sir
  FROM ranked
)
SELECT CAST(n AS BIGINT) AS n_suppliers,
       CAST(sr AS DOUBLE) AS total_revenue,
       round((CAST(2 AS DOUBLE) * CAST(sir AS DOUBLE)
              - (CAST(n AS DOUBLE) + CAST(1 AS DOUBLE)) * CAST(sr AS DOUBLE))
             / (CAST(n AS DOUBLE) * CAST(sr AS DOUBLE)), 9) AS gini
FROM s
""",
    description="Gini concentration of supplier revenue: rank-weighted "
    "exact decimal sums reduce the inequality coefficient to scalar "
    "double arithmetic — the balance/concentration audit used on "
    "revenue, partition sizes, and training-data domain mixes alike. "
    "The global revenue rank comes from the distributed bucketed rank "
    "(ext.ranks.with_global_rank), not a single-partition window.",
)
def q_gini_concentration(spark, sf_dir):
    from clickbom_spark.ext.ranks import with_global_rank

    (li,) = load(spark, sf_dir, "lineitem")
    rev = li.groupBy("l_suppkey").agg(
        F.sum(dec("l_extendedprice")).alias("r")
    )
    ranked = with_global_rank(rev, ["r", "l_suppkey"], rank_col="_i").select(
        "r", F.col("_i").cast("decimal(18,0)").alias("i")
    )
    s = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("r").alias("sr"),
        F.sum(F.col("i") * F.col("r")).alias("sir"),
    )
    n = F.col("n").cast("double")
    sr = F.col("sr").cast("double")
    sir = F.col("sir").cast("double")
    gini = (F.lit(2.0) * sir - (n + F.lit(1.0)) * sr) / (n * sr)
    return s.select(
        F.col("n").cast("long").alias("n_suppliers"),
        sr.alias("total_revenue"),
        F.round(gini, 9).alias("gini"),
    )
