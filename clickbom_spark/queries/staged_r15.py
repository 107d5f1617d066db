"""Staged registry wave for round 15 — new operator surface (started
during round 11; the staging pipeline runs waves ahead so every
activation is a zero-risk REGISTRY.update of parity-proven queries).

Same staging workflow as the round-6..14 waves: every query here is
oracle-parity-verified NOW (bit-exact vs DuckDB at sf0.001 and sf0.01
via ``tests/test_staged_r15_parity.py``; ``scripts/strict_parity.py
--staged`` widens the sweep to sf0.1) but held OUT of
:data:`clickbom_spark.queries.REGISTRY` until round-15 activation::

    from clickbom_spark.queries import staged_r15  # noqa: F401
    REGISTRY.update(staged_r15.STAGED_R15)

in ``queries/__init__.py``.

Round-15 themes:

* **Dialect round-trips for the round-11 late fill forms** — ``ORDER
  BY … DESC WITH FILL`` (downward spine walk with carry) and the
  bare all-columns ``INTERPOLATE``.
* **Distribution statistics** — exact interquartile ranges per
  group (quarter-exact interpolation on integer cents), modal
  values with total tie-breaks, signed balance bands, order aging.
* **Relational profiles** — market-segment rollups, monthly status
  mix, the tax×discount grid, and a quantity×price-band heatmap.

Float determinism policy (same as the registry): exact integer /
decimal aggregates first; quartile interpolation is exact on integer
cents (products with 0.25/0.75 and quarter-valued sums are all
representable doubles); one division per surfaced ratio, round(6).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from clickbom_spark.queries import QuerySpec, load

STAGED_R15: dict[str, QuerySpec] = {}


def staged(name: str, oracle: str | None = None, description: str = "",
           bench: bool = False):
    def deco(fn):
        STAGED_R15[name] = QuerySpec(name, fn, oracle, description, bench)
        return fn

    return deco


_CENTS = "toInt64(round(value * 100))"
_CENTS_DUCK = "CAST(round(value * 100) AS BIGINT)"


# ---------------------------------------------------------------------------
# Dialect round-trip: DESC WITH FILL.  The spine walks DOWNWARD
# (FROM 30 inclusive, TO 0 exclusive), base rows keep their values,
# filled days take n = 0 and carry cents from the last LARGER real
# day — the descending stair-step.
# ---------------------------------------------------------------------------

_CH_FILL_DESC = f"""
SELECT d, n, cents FROM (
  SELECT toInt64(toDayOfMonth(ts)) AS d, count() AS n,
         sum({_CENTS}) AS cents
  FROM events WHERE event_type = 'error' AND value > 93
  GROUP BY d)
ORDER BY d DESC WITH FILL FROM 30 TO 0 INTERPOLATE (cents)
"""


@staged(
    "q_dialect_fill_desc",
    oracle=f"""
WITH base AS (
  SELECT CAST(day(ts) AS BIGINT) AS d, CAST(count(*) AS BIGINT) AS n,
         CAST(sum({_CENTS_DUCK}) AS BIGINT) AS cents
  FROM events WHERE event_type = 'error' AND value > 93
  GROUP BY 1),
     spine AS (SELECT CAST(x AS BIGINT) AS d
               FROM range(30, 0, -1) t(x)),
     fills AS (
  SELECT s.d, CAST(0 AS BIGINT) AS n,
         CAST(coalesce((SELECT b.cents FROM base b WHERE b.d >= s.d
                        ORDER BY b.d ASC LIMIT 1), 0) AS BIGINT)
           AS cents
  FROM spine s WHERE s.d NOT IN (SELECT d FROM base))
SELECT d, n, cents FROM base
UNION ALL
SELECT d, n, cents FROM fills
ORDER BY d DESC
""",
    description="ClickHouse `ORDER BY d DESC WITH FILL FROM 30 TO 0 "
    "INTERPOLATE (cents)` run verbatim through the dialect shim "
    "(round-11 late compilation): the spine walks downward with a "
    "negative step (TO exclusive at the BOTTOM), filled days take "
    "n = 0 while cents carries the last larger-day real value — the "
    "descending stair-step the carry window expresses by ordering "
    "the output key DESC.  The DuckDB oracle replays the carry as a "
    "first-at-or-after lookup per missing grid point.",
)
def q_dialect_fill_desc(spark, sf_dir):
    from clickbom_spark.dialect import run_clickhouse_sql

    out = run_clickhouse_sql(spark, _CH_FILL_DESC, sf_dir)
    return out.select(
        F.col("d").cast("long").alias("d"),
        F.col("n").cast("long").alias("n"),
        F.col("cents").cast("long").alias("cents"),
    )


# ---------------------------------------------------------------------------
# Dialect round-trip: bare INTERPOLATE — every non-key column
# carries.  A sparse two-measure daily aggregate over an implicit-
# bounds spine: gaps repeat BOTH the count and the sum of the last
# real day (no type-default zeros anywhere inside the data range).
# ---------------------------------------------------------------------------

_CH_BARE_INTERP = f"""
SELECT d, n, cents FROM (
  SELECT toInt64(toDayOfMonth(ts)) AS d, count() AS n,
         sum({_CENTS}) AS cents
  FROM events WHERE event_type = 'click' AND value > 96
  GROUP BY d)
ORDER BY d WITH FILL INTERPOLATE
"""


@staged(
    "q_dialect_bare_interpolate",
    oracle=f"""
WITH base AS (
  SELECT CAST(day(ts) AS BIGINT) AS d, CAST(count(*) AS BIGINT) AS n,
         CAST(sum({_CENTS_DUCK}) AS BIGINT) AS cents
  FROM events WHERE event_type = 'click' AND value > 96
  GROUP BY 1),
     bounds AS (SELECT min(d) AS lo, max(d) AS hi FROM base),
     spine AS (
  SELECT CAST(unnest(range(lo, hi + 1)) AS BIGINT) AS d FROM bounds),
     fills AS (
  SELECT s.d,
         CAST((SELECT b.n FROM base b WHERE b.d <= s.d
               ORDER BY b.d DESC LIMIT 1) AS BIGINT) AS n,
         CAST((SELECT b.cents FROM base b WHERE b.d <= s.d
               ORDER BY b.d DESC LIMIT 1) AS BIGINT) AS cents
  FROM spine s WHERE s.d NOT IN (SELECT d FROM base))
SELECT d, n, cents FROM base
UNION ALL
SELECT d, n, cents FROM fills
ORDER BY d
""",
    description="ClickHouse bare `INTERPOLATE` (no column list) run "
    "verbatim through the dialect shim: the run path resolves the "
    "output schema and carries EVERY non-key column — both the "
    "count and the sum repeat the last real day's values across "
    "gaps on the implicit min..max spine (implicit bounds mean no "
    "before-first-row defaults appear).  One spine join, one carry "
    "window per column.",
)
def q_dialect_bare_interpolate(spark, sf_dir):
    from clickbom_spark.dialect import run_clickhouse_sql

    out = run_clickhouse_sql(spark, _CH_BARE_INTERP, sf_dir)
    return out.select(
        F.col("d").cast("long").alias("d"),
        F.col("n").cast("long").alias("n"),
        F.col("cents").cast("long").alias("cents"),
    )


# ---------------------------------------------------------------------------
# Distribution statistics.
# ---------------------------------------------------------------------------


@staged(
    "q_iqr_by_type",
    oracle=f"""
WITH c AS (
  SELECT event_type, {_CENTS_DUCK} AS cents FROM events)
SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       quantile_cont(cents, 0.25) AS p25,
       quantile_cont(cents, 0.5) AS p50,
       quantile_cont(cents, 0.75) AS p75,
       quantile_cont(cents, 0.75) - quantile_cont(cents, 0.25) AS iqr
FROM c GROUP BY event_type ORDER BY event_type
""",
    description="Exact interquartile spread per event type: "
    "interpolated quartiles over integer cents are EXACT doubles in "
    "both engines (position fractions are quarters, so every "
    "product 0.25·int / 0.75·int and their sums are representable), "
    "making p25/p50/p75 and the IQR bit-stable without any rounding "
    "— the robust spread statistic quality gates prefer over "
    "variance.",
)
def q_iqr_by_type(spark, sf_dir):
    (events,) = load(spark, sf_dir, "events")
    c = events.select(
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    return (
        c.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.expr("percentile(cents, 0.25)").alias("p25"),
            F.expr("percentile(cents, 0.5)").alias("p50"),
            F.expr("percentile(cents, 0.75)").alias("p75"),
            (
                F.expr("percentile(cents, 0.75)")
                - F.expr("percentile(cents, 0.25)")
            ).alias("iqr"),
        )
        .orderBy("event_type")
    )


@staged(
    "q_modal_value",
    oracle="""
WITH c AS (
  SELECT event_type, CAST(round(value) AS BIGINT) AS v,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2),
     ranked AS (
  SELECT event_type, v, n,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY n DESC, v) AS rk
  FROM c)
SELECT event_type, v AS modal_value, n AS n_modal
FROM ranked WHERE rk = 1 ORDER BY event_type
""",
    description="Modal (most frequent) rounded value per event "
    "type: value-frequency aggregate, then a row_number window "
    "PARTITIONED by type with the (count DESC, value) total order — "
    "ties resolve to the SMALLEST value deterministically on both "
    "engines (an argmax over counts would leave the surviving value "
    "engine-dependent).  The mode is the robust location statistic "
    "for integer-valued distributions.",
)
def q_modal_value(spark, sf_dir):
    from pyspark.sql import Window

    (events,) = load(spark, sf_dir, "events")
    c = events.groupBy(
        "event_type",
        F.round("value").cast("long").alias("v"),
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    w = Window.partitionBy("event_type").orderBy(F.col("n").desc(), "v")
    return (
        c.select(
            "event_type", "v", "n", F.row_number().over(w).alias("rk")
        )
        .where(F.col("rk") == 1)
        .select(
            "event_type",
            F.col("v").alias("modal_value"),
            F.col("n").alias("n_modal"),
        )
        .orderBy("event_type")
    )


@staged(
    "q_acctbal_bands",
    oracle="""
WITH b AS (
  SELECT CAST(floor(CAST(round(s_acctbal * 100) AS BIGINT)
              / 20000.0) AS BIGINT) AS band,
         CAST(round(s_acctbal * 100) AS BIGINT) AS cents
  FROM supplier)
SELECT band, CAST(count(*) AS BIGINT) AS n_suppliers,
       CAST(sum(cents) AS BIGINT) AS total_cents,
       round(CAST(sum(cents) AS DOUBLE) / count(*), 6) AS avg_cents
FROM b GROUP BY band ORDER BY band
""",
    description="Supplier account-balance bands of 200 currency "
    "units INCLUDING negative balances: the band is "
    "floor(cents / 20000.0) — floor of the same double quotient on "
    "both engines, chosen over integer division because Spark's DIV "
    "truncates toward zero while DuckDB's // floors, and they "
    "DISAGREE on negatives (the signed twin of the a323ad0 dtype "
    "lesson).  Counts, exact totals, one division round(6).",
)
def q_acctbal_bands(spark, sf_dir):
    (supplier,) = load(spark, sf_dir, "supplier")
    cents = F.round(F.col("s_acctbal") * 100).cast("long")
    b = supplier.select(
        F.floor(cents / 20000.0).cast("long").alias("band"),
        cents.alias("cents"),
    )
    return (
        b.groupBy("band")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_suppliers"),
            F.sum("cents").cast("long").alias("total_cents"),
            F.round(
                F.sum("cents").cast("double") / F.count(F.lit(1)), 6
            ).alias("avg_cents"),
        )
        .orderBy("band")
    )


@staged(
    "q_order_aging_buckets",
    oracle="""
WITH mx AS (SELECT max(o_orderdate) AS maxd FROM orders),
     a AS (
  SELECT o_orderstatus,
         CAST(date_diff('day', o_orderdate, maxd) // 30 AS BIGINT)
           AS age_bucket
  FROM orders, mx)
SELECT o_orderstatus, age_bucket,
       CAST(count(*) AS BIGINT) AS n
FROM a GROUP BY 1, 2 ORDER BY o_orderstatus, age_bucket
""",
    description="Order aging profile: days from order date to the "
    "corpus horizon (max order date — a 1-row broadcast) in 30-day "
    "buckets per order status — exact integer day arithmetic and "
    "integer floor division on NON-NEGATIVE ages (where Spark DIV "
    "and DuckDB // agree).  The aging mix per status is the "
    "receivables/backlog health readout.",
)
def q_order_aging_buckets(spark, sf_dir):
    (orders,) = load(spark, sf_dir, "orders")
    mx = orders.agg(F.max("o_orderdate").alias("maxd"))
    a = orders.crossJoin(F.broadcast(mx)).select(
        "o_orderstatus",
        F.expr("datediff(maxd, o_orderdate) DIV 30")
        .cast("long")
        .alias("age_bucket"),
    )
    return (
        a.groupBy("o_orderstatus", "age_bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .orderBy("o_orderstatus", "age_bucket")
    )


# ---------------------------------------------------------------------------
# Relational profiles.  Pure scan + hash-aggregate shapes; joins are
# key equi-joins; shares are single exact divisions.
# ---------------------------------------------------------------------------


@staged(
    "q_mktsegment_profile",
    oracle="""
SELECT c_mktsegment,
       CAST(count(DISTINCT c_custkey) AS BIGINT) AS n_customers,
       CAST(count(o_orderkey) AS BIGINT) AS n_orders,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS cents,
       round(CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                  AS DOUBLE) / count(o_orderkey), 6) AS avg_order
FROM customer LEFT JOIN orders ON o_custkey = c_custkey
GROUP BY c_mktsegment ORDER BY c_mktsegment
""",
    description="Market-segment rollup: customers, orders, exact "
    "revenue cents, and average order value per segment off the "
    "customer-orders equi-join (LEFT, so orderless customers still "
    "count).  One division per surfaced average, round(6) — the "
    "segment mix is the demand-planning cut of the TPC-H star.",
)
def q_mktsegment_profile(spark, sf_dir):
    customer, orders = load(spark, sf_dir, "customer", "orders")
    j = customer.join(
        orders, orders["o_custkey"] == customer["c_custkey"], "left"
    )
    cents = F.sum(
        F.round(F.col("o_totalprice") * 100).cast("long")
    ).cast("long")
    return (
        j.groupBy("c_mktsegment")
        .agg(
            F.countDistinct("c_custkey").cast("long").alias("n_customers"),
            F.count("o_orderkey").cast("long").alias("n_orders"),
            cents.alias("cents"),
            F.round(
                cents.cast("double") / F.count("o_orderkey"), 6
            ).alias("avg_order"),
        )
        .orderBy("c_mktsegment")
    )


@staged(
    "q_orders_per_status_month",
    oracle="""
WITH m AS (
  SELECT CAST(month(o_orderdate) AS BIGINT) AS mth, o_orderstatus,
         CAST(count(*) AS BIGINT) AS n
  FROM orders GROUP BY 1, 2),
     tot AS (
  SELECT mth, CAST(sum(n) AS BIGINT) AS mn FROM m GROUP BY mth)
SELECT m.mth AS mth, o_orderstatus, n,
       round(CAST(n AS DOUBLE) / mn, 6) AS month_share
FROM m JOIN tot USING (mth)
ORDER BY mth, o_orderstatus
""",
    description="Monthly order-status mix: per-(month, status) "
    "counts and each status's share of its month (one exact "
    "division round(6)).  A shifting F/O/P mix across months is the "
    "fulfillment-backlog trend line.",
)
def q_orders_per_status_month(spark, sf_dir):
    (orders,) = load(spark, sf_dir, "orders")
    m = orders.groupBy(
        F.month("o_orderdate").cast("long").alias("mth"),
        "o_orderstatus",
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    tot = m.groupBy("mth").agg(F.sum("n").cast("long").alias("mn"))
    return (
        m.join(tot, "mth")
        .select(
            "mth", "o_orderstatus", "n",
            F.round(F.col("n").cast("double") / F.col("mn"), 6)
            .alias("month_share"),
        )
        .orderBy("mth", "o_orderstatus")
    )


@staged(
    "q_tax_discount_grid",
    oracle="""
SELECT CAST(round(l_tax * 100) AS BIGINT) AS tax_pct,
       CAST(round(l_discount * 100) AS BIGINT) AS disc_pct,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
            AS BIGINT) AS cents
FROM lineitem GROUP BY 1, 2 ORDER BY tax_pct, disc_pct
""",
    description="The tax×discount pricing grid: both rates quantize "
    "to exact integer percent points, so the two-dimensional "
    "histogram (row counts and revenue cents per cell) is pure "
    "integer aggregation off one scan — the pricing-policy surface "
    "auditors cross-check against contract terms.",
)
def q_tax_discount_grid(spark, sf_dir):
    (lineitem,) = load(spark, sf_dir, "lineitem")
    return (
        lineitem.groupBy(
            F.round(F.col("l_tax") * 100).cast("long").alias("tax_pct"),
            F.round(F.col("l_discount") * 100).cast("long")
            .alias("disc_pct"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(
                F.round(F.col("l_extendedprice") * 100).cast("long")
            )
            .cast("long")
            .alias("cents"),
        )
        .orderBy("tax_pct", "disc_pct")
    )


@staged(
    "q_qty_price_heatmap",
    oracle="""
SELECT CAST(CAST(l_quantity AS BIGINT) // 10 AS BIGINT) AS qty_band,
       CAST(length(bin(CAST(round(l_extendedprice * 100) AS BIGINT)))
            - 1 AS BIGINT) AS price_log2,
       CAST(count(*) AS BIGINT) AS n
FROM lineitem WHERE round(l_extendedprice * 100) >= 1
GROUP BY 1, 2 ORDER BY qty_band, price_log2
""",
    description="Quantity-band × price-magnitude heatmap: quantity "
    "in integer bands of 10, price in libm-free log2 bands (binary-"
    "string length minus one — the same integer-msb trick as "
    "q_price_log2_histogram).  The 2-D cell counts expose the "
    "volume/value correlation structure in one integer-only scan.",
)
def q_qty_price_heatmap(spark, sf_dir):
    (lineitem,) = load(spark, sf_dir, "lineitem")
    return (
        lineitem.where(F.round(F.col("l_extendedprice") * 100) >= 1)
        .groupBy(
            F.expr("CAST(l_quantity AS BIGINT) DIV 10")
            .cast("long")
            .alias("qty_band"),
            (
                F.length(
                    F.conv(
                        F.round(F.col("l_extendedprice") * 100)
                        .cast("long")
                        .cast("string"),
                        10, 2,
                    )
                )
                - 1
            )
            .cast("long")
            .alias("price_log2"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .orderBy("qty_band", "price_log2")
    )


@staged(
    "q_revenue_per_active_day",
    oracle=f"""
SELECT event_type,
       CAST(sum({_CENTS_DUCK}) AS BIGINT) AS cents,
       CAST(count(DISTINCT day(ts)) AS BIGINT) AS active_days,
       round(CAST(sum({_CENTS_DUCK}) AS DOUBLE)
             / count(DISTINCT day(ts)), 6) AS cents_per_day
FROM events GROUP BY event_type ORDER BY event_type
""",
    description="Revenue intensity per event type: exact cents "
    "normalized by DISTINCT active days (not the calendar span — "
    "dark days don't dilute), one division round(6).  Separates "
    "types that earn steadily from ones that earn in bursts, "
    "complementing the Fano burstiness view.",
)
def q_revenue_per_active_day(spark, sf_dir):
    (events,) = load(spark, sf_dir, "events")
    cents = F.sum(
        F.round(F.col("value") * 100).cast("long")
    ).cast("long")
    act = F.countDistinct(F.dayofmonth("ts")).cast("long")
    return (
        events.groupBy("event_type")
        .agg(
            cents.alias("cents"),
            act.alias("active_days"),
            F.round(cents.cast("double") / act, 6)
            .alias("cents_per_day"),
        )
        .orderBy("event_type")
    )


# NOTE (round-14 swap, VERDICT r13 #8): q_part_name_tokens and
# q_weekend_share moved to the staged_r20 wave 1-for-1 with the two
# NEW dialect round-trips below for the round-14 suffix-variant
# closure compiles (quantileExactLow/High + the registered same-name
# passthrough family) — new compiles earn oracle round-trips in the
# NEXT wave, keeping this wave at its pinned 23.

# ---------------------------------------------------------------------------
# Dialect round-trip: the round-14 non-parametric quantile closure.
# quantileExactLow/High select the lower/upper middle element with
# NO interpolation; quantileExact and quantileExactExclusive both
# interpolate and COINCIDE at the (non-parametric) median level 0.5.
# ---------------------------------------------------------------------------

_CH_QUANTILE_LOW_HIGH = """
SELECT l_returnflag,
       count() AS n,
       quantileExactLow(cents) AS q_low,
       quantileExactHigh(cents) AS q_high,
       quantileExact(cents) AS q_mid,
       quantileExactExclusive(cents) AS q_exc
FROM (SELECT l_returnflag,
             toInt64(round(l_extendedprice * 100)) AS cents
      FROM lineitem)
GROUP BY l_returnflag ORDER BY l_returnflag
"""


@staged(
    "q_dialect_quantile_low_high",
    oracle="""
WITH c AS (
  SELECT l_returnflag,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
  FROM lineitem)
SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
       CAST(quantile_disc(cents, 0.5) AS BIGINT) AS q_low,
       CAST(-quantile_disc(-cents, 0.5) AS BIGINT) AS q_high,
       quantile_cont(cents, 0.5) AS q_mid,
       quantile_cont(cents, 0.5) AS q_exc
FROM c GROUP BY l_returnflag ORDER BY l_returnflag
""",
    description="ClickHouse's NON-parametric quantileExact family "
    "run verbatim through the dialect shim (round-14 suffix-variant "
    "closure): the bare spelling is the median; Low/High pick the "
    "lower/upper middle element without interpolation (compiled as "
    "a sorted-group selection, DuckDB replays via quantile_disc and "
    "its negated twin), while quantileExact and quantileExact"
    "Exclusive both interpolate and coincide at level 0.5 — exact "
    "on integer cents (midpoints are .5-representable).",
)
def q_dialect_quantile_low_high(spark, sf_dir):
    from clickbom_spark.dialect import run_clickhouse_sql

    out = run_clickhouse_sql(spark, _CH_QUANTILE_LOW_HIGH, sf_dir)
    return out.select(
        "l_returnflag",
        F.col("n").cast("long").alias("n"),
        F.col("q_low").cast("long").alias("q_low"),
        F.col("q_high").cast("long").alias("q_high"),
        F.col("q_mid").cast("double").alias("q_mid"),
        F.col("q_exc").cast("double").alias("q_exc"),
    )


# ---------------------------------------------------------------------------
# Dialect round-trip: the round-14 registered same-name passthroughs
# (printf / overlay / substring) + toUUIDOrDefault, in one
# reference-shaped aggregate.
# ---------------------------------------------------------------------------

_CH_VARIANT_SPELLINGS = """
SELECT o_orderpriority,
       count() AS n,
       printf('%s#%d', min(o_orderstatus), count()) AS tag,
       min(overlay(o_orderpriority, 'XX', 3)) AS pri_masked,
       max(substring(o_orderpriority, 2, 6)) AS frag,
       min(toUUIDOrDefault(lower(o_orderstatus))) AS uid
FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


@staged(
    "q_dialect_variant_spellings",
    oracle="""
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
       printf('%s#%d', min(o_orderstatus), count(*)) AS tag,
       min(concat(substring(o_orderpriority, 1, 2), 'XX',
                  substring(o_orderpriority, 5))) AS pri_masked,
       max(substring(o_orderpriority, 2, 6)) AS frag,
       min('00000000-0000-0000-0000-000000000000') AS uid
FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
""",
    description="The round-14 registered same-name passthroughs run "
    "verbatim through the dialect shim: printf (C-style formatting, "
    "identical in Spark), overlay (1-based replace-at-offset — the "
    "DuckDB oracle replays it with substring surgery), substring "
    "(shared 1-based contract), and toUUIDOrDefault falling back to "
    "the zero UUID on non-UUID input.  Pins that deliberate "
    "passthroughs stay value-correct end-to-end, not merely "
    "registered.",
)
def q_dialect_variant_spellings(spark, sf_dir):
    from clickbom_spark.dialect import run_clickhouse_sql

    out = run_clickhouse_sql(spark, _CH_VARIANT_SPELLINGS, sf_dir)
    return out.select(
        "o_orderpriority",
        F.col("n").cast("long").alias("n"),
        "tag", "pri_masked", "frag", "uid",
    )


# ---------------------------------------------------------------------------
# Dialect round-trip: the round-14 IPv4 Or-variant compiles.  IP
# strings are synthesized from part keys so roughly 1 in 6 carries an
# out-of-range last octet (d = pk % 300 > 255) — exercising the
# valid, NULL, zero, and default paths of every spelling.
# ---------------------------------------------------------------------------

_CH_IPV4_FORMS = """
SELECT grp,
       count() AS n,
       countIf(isIPv4String(ip)) AS n_valid,
       sum(toIPv4OrZero(ip)) AS sum_ip,
       min(toIPv4OrNull(ip)) AS min_ip,
       max(IPv4StringToNumOrDefault(ip, 7)) AS max_ip
FROM (SELECT toString(p_partkey % 5) AS grp,
             concat(toString(p_partkey % 256), '.',
                    toString((p_partkey * 7) % 256), '.0.',
                    toString(p_partkey % 300)) AS ip
      FROM part)
GROUP BY grp ORDER BY grp
"""


@staged(
    "q_dialect_ipv4_forms",
    oracle="""
WITH base AS (
  SELECT CAST(p_partkey % 5 AS VARCHAR) AS grp,
         (p_partkey % 300) <= 255 AS ok,
         (p_partkey % 256) * 16777216
           + ((p_partkey * 7) % 256) * 65536
           + (p_partkey % 300) AS num
  FROM part)
SELECT grp, CAST(count(*) AS BIGINT) AS n,
       CAST(count(*) FILTER (WHERE ok) AS BIGINT) AS n_valid,
       CAST(coalesce(sum(CASE WHEN ok THEN num ELSE 0 END), 0)
            AS BIGINT) AS sum_ip,
       CAST(min(CASE WHEN ok THEN num END) AS BIGINT) AS min_ip,
       CAST(max(CASE WHEN ok THEN num ELSE 7 END) AS BIGINT) AS max_ip
FROM base GROUP BY grp ORDER BY grp
""",
    description="The round-14 IPv4 spelling family run verbatim "
    "through the dialect shim: isIPv4String (octet-range regex), "
    "toIPv4OrZero/OrNull and IPv4StringToNumOrDefault all compile to "
    "the numeric big-endian form behind the compiled validity guard "
    "— the DuckDB oracle replays the octet arithmetic and the "
    "validity predicate directly.  Mixed valid/invalid inputs pin "
    "all four fallback paths (value, NULL, zero, caller default).",
)
def q_dialect_ipv4_forms(spark, sf_dir):
    from clickbom_spark.dialect import run_clickhouse_sql

    out = run_clickhouse_sql(spark, _CH_IPV4_FORMS, sf_dir)
    return out.select(
        "grp",
        F.col("n").cast("long").alias("n"),
        F.col("n_valid").cast("long").alias("n_valid"),
        F.col("sum_ip").cast("long").alias("sum_ip"),
        F.col("min_ip").cast("long").alias("min_ip"),
        F.col("max_ip").cast("long").alias("max_ip"),
    )


# ---------------------------------------------------------------------------
# Dialect round-trip: the round-14 conversion/JSON Or-variant
# compiles.  Inputs are synthesized from order keys with KNOWN
# unparseable fractions (1-in-4 integers, 1-in-5 dates, odd rows'
# JSON), so every fallback path is exercised and the DuckDB oracle
# replays the outcomes arithmetically — no parsing on the oracle
# side at all.
# ---------------------------------------------------------------------------

_CH_CONVERSION_FORMS = """
SELECT grp,
       count() AS n,
       sum(toInt64OrZero(tail)) AS sum_ok,
       countIf(toInt64OrNull(tail) IS NULL) AS n_bad,
       toString(min(toDate32OrDefault(iso, toDate('1999-12-31'))))
         AS d_min,
       sum(toInt64(toDecimal64OrZero(decstr, 2) * 100)) AS cents,
       countIf(isValidJSON(jdoc)) AS n_json,
       sum(toInt64OrZero(simpleJSONExtractRaw(jdoc, 'k'))) AS kraw
FROM (SELECT toString(o_orderkey % 3) AS grp,
             concat(toString(o_orderkey % 100),
                    if(o_orderkey % 4 = 0, 'x', '')) AS tail,
             if(o_orderkey % 5 = 0, 'not-a-date',
                toString(o_orderdate)) AS iso,
             concat(toString(o_orderkey % 90), '.',
                    toString(o_orderkey % 10)) AS decstr,
             if(o_orderkey % 2 = 0,
                concat('{"k":', toString(o_orderkey % 9), '}'),
                'nope') AS jdoc
      FROM orders)
GROUP BY grp ORDER BY grp
"""


@staged(
    "q_dialect_conversion_forms",
    oracle="""
WITH base AS (
  SELECT CAST(o_orderkey % 3 AS VARCHAR) AS grp,
         o_orderkey % 4 = 0 AS bad_int,
         o_orderkey % 100 AS intval,
         o_orderkey % 5 = 0 AS bad_date,
         o_orderdate,
         (o_orderkey % 90) * 100 + (o_orderkey % 10) * 10 AS cents1,
         o_orderkey % 2 = 0 AS is_json,
         o_orderkey % 9 AS kv
  FROM orders)
SELECT grp, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CASE WHEN bad_int THEN 0 ELSE intval END) AS BIGINT)
         AS sum_ok,
       CAST(count(*) FILTER (WHERE bad_int) AS BIGINT) AS n_bad,
       CAST(CAST(min(CASE WHEN bad_date THEN DATE '1999-12-31'
                          ELSE o_orderdate END) AS DATE) AS VARCHAR)
         AS d_min,
       CAST(sum(cents1) AS BIGINT) AS cents,
       CAST(count(*) FILTER (WHERE is_json) AS BIGINT) AS n_json,
       CAST(sum(CASE WHEN is_json THEN kv ELSE 0 END) AS BIGINT)
         AS kraw
FROM base GROUP BY grp ORDER BY grp
""",
    description="The round-14 conversion/JSON Or-variant compiles "
    "run verbatim through the dialect shim: toInt64OrZero/OrNull "
    "(try_cast fallbacks), toDate32OrDefault with a caller default, "
    "toDecimal64OrZero at the width's precision (integer-cents "
    "exact), isValidJSON (get_json_object validity probe), and "
    "simpleJSONExtractRaw through the family's path builder.  "
    "Inputs carry KNOWN unparseable fractions, so the DuckDB oracle "
    "replays every fallback arithmetically without parsing.",
)
def q_dialect_conversion_forms(spark, sf_dir):
    from clickbom_spark.dialect import run_clickhouse_sql

    out = run_clickhouse_sql(spark, _CH_CONVERSION_FORMS, sf_dir)
    return out.select(
        "grp",
        F.col("n").cast("long").alias("n"),
        F.col("sum_ok").cast("long").alias("sum_ok"),
        F.col("n_bad").cast("long").alias("n_bad"),
        F.col("d_min"),
        F.col("cents").cast("long").alias("cents"),
        F.col("n_json").cast("long").alias("n_json"),
        F.col("kraw").cast("long").alias("kraw"),
    )


# ---------------------------------------------------------------------------
# Corpus / customer / catalog profiles — single-scan integer
# aggregates with one exact division per surfaced ratio.
# ---------------------------------------------------------------------------


@staged(
    "q_doc_length_by_lang",
    oracle="""
SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CAST(n_chars AS BIGINT)) AS BIGINT) AS chars_total,
       round(CAST(sum(CAST(n_chars AS BIGINT)) AS DOUBLE) / count(*),
             6) AS avg_chars,
       round(CAST(sum(CAST(len(string_split(text, ' ')) AS BIGINT))
                  AS DOUBLE) / count(*), 6) AS avg_words
FROM documents WHERE text IS NOT NULL
GROUP BY lang ORDER BY lang
""",
    description="Document length profile per language tag: doc "
    "counts, exact char totals, and average chars/words (single-"
    "space tokenization) as exact-integer sums with one division "
    "each, round(6).  Length-by-language asymmetries drive per-"
    "language quality thresholds in multilingual curation.",
)
def q_doc_length_by_lang(spark, sf_dir):
    (docs,) = load(spark, sf_dir, "documents")
    return (
        docs.where(F.col("text").isNotNull())
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(F.col("n_chars").cast("long")).cast("long")
            .alias("chars_total"),
            F.round(
                F.sum(F.col("n_chars").cast("long")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("avg_chars"),
            F.round(
                F.sum(F.size(F.split("text", " ")).cast("long"))
                .cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("avg_words"),
        )
        .orderBy("lang")
    )


@staged(
    "q_customer_value_bands",
    oracle="""
WITH cv AS (
  SELECT o_custkey,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
              AS BIGINT) AS cents
  FROM orders GROUP BY o_custkey),
     b AS (
  SELECT CAST(length(bin(cents)) - 1 AS BIGINT) AS band, cents
  FROM cv WHERE cents >= 1)
SELECT band, CAST(count(*) AS BIGINT) AS n_customers,
       CAST(sum(cents) AS BIGINT) AS cents
FROM b GROUP BY band ORDER BY band
""",
    description="Customer lifetime-value bands: per-customer exact "
    "revenue cents binned into libm-free log2 magnitude bands "
    "(binary-string length), with counts and band revenue — the "
    "customer-value pyramid loyalty programs segment against, "
    "computed as two hash aggregates and zero float ops.",
)
def q_customer_value_bands(spark, sf_dir):
    (orders,) = load(spark, sf_dir, "orders")
    cv = orders.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("cents")
    )
    b = cv.where(F.col("cents") >= 1).select(
        (F.length(F.conv(F.col("cents").cast("string"), 10, 2)) - 1)
        .cast("long")
        .alias("band"),
        "cents",
    )
    return (
        b.groupBy("band")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_customers"),
            F.sum("cents").cast("long").alias("cents"),
        )
        .orderBy("band")
    )


@staged(
    "q_order_linecount_dist",
    oracle="""
WITH lc AS (
  SELECT l_orderkey, CAST(count(*) AS BIGINT) AS n_lines
  FROM lineitem GROUP BY l_orderkey),
     tot AS (SELECT CAST(count(*) AS BIGINT) AS n_orders FROM lc)
SELECT n_lines, CAST(count(*) AS BIGINT) AS n,
       round(CAST(count(*) AS DOUBLE) / n_orders, 6) AS share
FROM lc, tot GROUP BY n_lines, n_orders ORDER BY n_lines
""",
    description="Lines-per-order distribution: per-order line "
    "counts, then a count-of-counts histogram with shares (1-row "
    "total broadcast, one division round(6)).  The basket-size "
    "distribution shapes picking/packing capacity and is the "
    "order-level twin of the duplicate-cluster-size histogram.",
)
def q_order_linecount_dist(spark, sf_dir):
    (lineitem,) = load(spark, sf_dir, "lineitem")
    lc = lineitem.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_lines")
    )
    tot = lc.agg(F.count(F.lit(1)).cast("long").alias("n_orders"))
    return (
        lc.groupBy("n_lines")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .crossJoin(F.broadcast(tot))
        .select(
            "n_lines", "n",
            F.round(
                F.col("n").cast("double") / F.col("n_orders"), 6
            ).alias("share"),
        )
        .orderBy("n_lines")
    )


# (q_weekend_share moved to staged_r20 in the round-14 swap — see
# the note above q_dialect_quantile_low_high.)


@staged(
    "q_supplier_nation_mix",
    oracle="""
WITH s AS (
  SELECT n_name, CAST(count(*) AS BIGINT) AS n_suppliers,
         CAST(sum(CAST(round(s_acctbal * 100) AS BIGINT)) AS BIGINT)
           AS balance_cents
  FROM supplier JOIN nation ON n_nationkey = s_nationkey
  GROUP BY n_name),
     tot AS (SELECT CAST(sum(n_suppliers) AS BIGINT) AS total FROM s)
SELECT n_name, n_suppliers, balance_cents,
       round(CAST(n_suppliers AS DOUBLE) / total, 6) AS share
FROM s, tot ORDER BY n_name
""",
    description="Supplier geography mix: suppliers and exact "
    "balance cents per nation (the bounded nation dim broadcasts), "
    "each nation's share of the supplier base as one division "
    "round(6) — the sourcing-concentration readout that pairs with "
    "q_supplier_coverage's part-side view.",
)
def q_supplier_nation_mix(spark, sf_dir):
    supplier, nation = load(spark, sf_dir, "supplier", "nation")
    s = (
        supplier.join(
            nation, nation["n_nationkey"] == supplier["s_nationkey"]
        )
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_suppliers"),
            F.sum(
                F.round(F.col("s_acctbal") * 100).cast("long")
            )
            .cast("long")
            .alias("balance_cents"),
        )
    )
    tot = s.agg(F.sum("n_suppliers").cast("long").alias("total"))
    return (
        s.crossJoin(F.broadcast(tot))
        .select(
            "n_name", "n_suppliers", "balance_cents",
            F.round(
                F.col("n_suppliers").cast("double") / F.col("total"), 6
            ).alias("share"),
        )
        .orderBy("n_name")
    )


@staged(
    "q_brand_discount_profile",
    oracle="""
SELECT p_brand,
       CAST(count(*) AS BIGINT) AS n_lines,
       CAST(sum(CAST(round(l_discount * 100) AS BIGINT)) AS BIGINT)
         AS disc_points,
       round(CAST(sum(CAST(round(l_discount * 100) AS BIGINT))
                  AS DOUBLE) / count(*), 6) AS avg_disc_pct,
       CAST(sum(CAST(round(l_extendedprice * l_discount) AS BIGINT))
            AS BIGINT) AS discount_given
FROM lineitem JOIN part ON p_partkey = l_partkey
GROUP BY p_brand ORDER BY p_brand
""",
    description="Discount posture per brand: line counts, exact "
    "discount percentage points, the average rate (one division "
    "round(6)), and the absolute discount given — "
    "round(price·discount) is computed per ROW then summed as exact "
    "integers, so the money column is order-independent.  Brands "
    "discounting above the fleet rate are the margin-leak suspects.",
)
def q_brand_discount_profile(spark, sf_dir):
    lineitem, part = load(spark, sf_dir, "lineitem", "part")
    disc_pts = F.sum(
        F.round(F.col("l_discount") * 100).cast("long")
    ).cast("long")
    return (
        lineitem.join(part, part["p_partkey"] == lineitem["l_partkey"])
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            disc_pts.alias("disc_points"),
            F.round(
                disc_pts.cast("double") / F.count(F.lit(1)), 6
            ).alias("avg_disc_pct"),
            F.sum(
                F.round(
                    F.col("l_extendedprice") * F.col("l_discount")
                ).cast("long")
            )
            .cast("long")
            .alias("discount_given"),
        )
        .orderBy("p_brand")
    )


# ---------------------------------------------------------------------------
# Completing profiles: per-size catalog stats, peak hours, source
# vocabulary, priority value mix, and the status-flag flow grid.
# ---------------------------------------------------------------------------


@staged(
    "q_part_size_profile",
    oracle="""
SELECT CAST(CAST(p_size AS BIGINT) // 10 AS BIGINT) AS size_band,
       CAST(count(*) AS BIGINT) AS n_parts,
       CAST(sum(CAST(round(p_retailprice * 100) AS BIGINT))
            AS BIGINT) AS retail_cents,
       round(CAST(sum(CAST(round(p_retailprice * 100) AS BIGINT))
                  AS DOUBLE) / count(*), 6) AS avg_retail
FROM part GROUP BY 1 ORDER BY size_band
""",
    description="Catalog profile by part-size band (integer DIV "
    "10): part counts, exact retail cents, and the average as one "
    "division round(6) — the size/price curve assortment planning "
    "reads off the part dimension in one scan.",
)
def q_part_size_profile(spark, sf_dir):
    (part,) = load(spark, sf_dir, "part")
    cents = F.sum(
        F.round(F.col("p_retailprice") * 100).cast("long")
    ).cast("long")
    return (
        part.groupBy(
            F.expr("CAST(p_size AS BIGINT) DIV 10")
            .cast("long")
            .alias("size_band")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_parts"),
            cents.alias("retail_cents"),
            F.round(
                cents.cast("double") / F.count(F.lit(1)), 6
            ).alias("avg_retail"),
        )
        .orderBy("size_band")
    )


# (q_event_hour_peak moved to staged_r20 in the round-14 swap —
# displaced by q_dialect_ipv4_forms, the third suffix-variant-
# closure round-trip.)


# (q_source_vocab moved to staged_r20 in the round-14 swap —
# displaced by q_dialect_conversion_forms, the fourth suffix-
# variant-closure round-trip.)


@staged(
    "q_order_priority_value",
    oracle="""
WITH p AS (
  SELECT o_orderpriority,
         CAST(count(*) AS BIGINT) AS n_orders,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
              AS BIGINT) AS cents
  FROM orders GROUP BY 1),
     tot AS (SELECT CAST(sum(cents) AS BIGINT) AS total FROM p)
SELECT o_orderpriority, n_orders, cents,
       round(CAST(cents AS DOUBLE) / n_orders, 6) AS avg_cents,
       round(CAST(cents AS DOUBLE) / total, 6) AS revenue_share
FROM p, tot ORDER BY o_orderpriority
""",
    description="Order value by priority class: counts, exact "
    "cents, average order value, and each class's revenue share "
    "(1-row total broadcast; one division per ratio, round(6)) — "
    "whether urgent classes actually carry premium value is the "
    "SLA-pricing sanity check.",
)
def q_order_priority_value(spark, sf_dir):
    (orders,) = load(spark, sf_dir, "orders")
    p = orders.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("cents"),
    )
    tot = p.agg(F.sum("cents").cast("long").alias("total"))
    return (
        p.crossJoin(F.broadcast(tot))
        .select(
            "o_orderpriority", "n_orders", "cents",
            F.round(
                F.col("cents").cast("double") / F.col("n_orders"), 6
            ).alias("avg_cents"),
            F.round(
                F.col("cents").cast("double") / F.col("total"), 6
            ).alias("revenue_share"),
        )
        .orderBy("o_orderpriority")
    )


@staged(
    "q_lineitem_status_flow",
    oracle="""
WITH g AS (
  SELECT l_linestatus, l_returnflag,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
              AS BIGINT) AS cents
  FROM lineitem GROUP BY 1, 2),
     tot AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM g)
SELECT l_linestatus, l_returnflag, n, cents,
       round(CAST(n AS DOUBLE) / total, 6) AS flow_share
FROM g, tot ORDER BY l_linestatus, l_returnflag
""",
    description="The linestatus × returnflag flow grid: counts and "
    "exact revenue per cell with each cell's share of all lines "
    "(1-row broadcast, one division round(6)) — the fulfillment "
    "state machine's occupancy matrix, the quick visual for stuck "
    "or anomalous flag combinations.",
)
def q_lineitem_status_flow(spark, sf_dir):
    (lineitem,) = load(spark, sf_dir, "lineitem")
    g = lineitem.groupBy("l_linestatus", "l_returnflag").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("long"))
        .cast("long")
        .alias("cents"),
    )
    tot = g.agg(F.sum("n").cast("long").alias("total"))
    return (
        g.crossJoin(F.broadcast(tot))
        .select(
            "l_linestatus", "l_returnflag", "n", "cents",
            F.round(F.col("n").cast("double") / F.col("total"), 6)
            .alias("flow_share"),
        )
        .orderBy("l_linestatus", "l_returnflag")
    )
