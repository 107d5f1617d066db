"""Core relational query surface: scans, filters, joins, aggregations.

TPC-H-shaped queries over the synthetic star schema.  Each one maps to
reference operators per SURVEY.md §2: projections/filters (P-series),
the broadcast lookup join (J1), aggregation (§2.5), and the general
engine surface (§2.9, §7.2 step 7).

Scale notes (100 TB design point):
- ``lineitem``/``orders`` are the fact tables: joins between them shuffle
  on the join key; all dimension joins (region/nation/customer/supplier/
  part) are explicitly ``F.broadcast`` so no shuffle of the fact side is
  ever needed for them.
- Aggregations are partial (map-side combine) automatically via
  HashAggregate; group-by keys are low-cardinality so the reduce side is
  tiny.
- Filters are plain column predicates → pushed into the parquet scan
  (verify with .explain: PushedFilters).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from clickbom_spark.queries import davg, dec, dsum, load, query


@query(
    "q1_pricing_summary",
    oracle="""
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_price,
       CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
""",
    description="TPC-H Q1 pricing summary: filtered scan + hash aggregate "
    "with exact decimal arithmetic (SURVEY §2.5).",
    bench=True,
)
def q1_pricing_summary(spark, sf_dir):
    (li,) = load(spark, sf_dir, "lineitem")
    disc_price = dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))
    charge = disc_price * (F.lit(1) + dec("l_tax"))
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(dec("l_quantity"), "sum_qty"),
            dsum(dec("l_extendedprice"), "sum_base_price"),
            dsum(disc_price, "sum_disc_price"),
            dsum(charge, "sum_charge"),
            davg(dec("l_quantity"), "avg_qty"),
            davg(dec("l_extendedprice"), "avg_price"),
            davg(dec("l_discount"), "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "q3_shipping_priority",
    oracle="""
SELECT l_orderkey,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
       o_orderdate, o_orderpriority
FROM customer JOIN orders ON c_custkey = o_custkey
              JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1997-06-15'
  AND l_shipdate > TIMESTAMP '1997-06-15'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderdate, l_orderkey
LIMIT 10
""",
    description="TPC-H Q3: filtered customer join (AQE-sized — customer grows "
    "with SF, so no hard broadcast hint) + fact-fact join + top-k "
    "(TakeOrderedAndProject).",
    bench=True,
)
def q3_shipping_priority(spark, sf_dir):
    cust, orders, li = load(spark, sf_dir, "customer", "orders", "lineitem")
    revenue = dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))
    return (
        li.where(F.col("l_shipdate") > F.lit("1997-06-15").cast("timestamp"))
        .join(
            orders.where(F.col("o_orderdate") < F.lit("1997-06-15").cast("timestamp")),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            cust.where(F.col("c_mktsegment") == "BUILDING"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(revenue, "revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


@query(
    "q5_region_revenue",
    oracle="""
SELECT n_name,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
FROM customer
  JOIN orders   ON c_custkey = o_custkey
  JOIN lineitem ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
  JOIN nation   ON s_nationkey = n_nationkey
  JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1998-01-01'
GROUP BY n_name
ORDER BY revenue DESC, n_name
""",
    description="TPC-H Q5: multi-way join — facts shuffle-join on orderkey, "
    "bounded dims (nation/region) broadcast; customer/supplier AQE-sized "
    "(SURVEY §2.6).",
    bench=True,
)
def q5_region_revenue(spark, sf_dir):
    cust, orders, li, supp, nation, region = load(
        spark, sf_dir, "customer", "orders", "lineitem", "supplier", "nation", "region"
    )
    revenue = dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))
    return (
        li.join(
            orders.where(
                (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            supp,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(
            F.broadcast(region.where(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .groupBy("n_name")
        .agg(dsum(revenue, "revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


@query(
    "q6_forecast_revenue",
    oracle="""
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.03 AND 0.07
  AND l_quantity < 24
""",
    description="TPC-H Q6: pure pushed-down predicate scan + global agg "
    "(no shuffle beyond final single-row combine).",
    bench=True,
)
def q6_forecast_revenue(spark, sf_dir):
    (li,) = load(spark, sf_dir, "lineitem")
    return li.where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.03)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        dsum(dec("l_extendedprice") * dec("l_discount"), "revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


@query(
    "q_top_parts_revenue",
    oracle="""
SELECT p_partkey, p_name, p_brand,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS part_revenue,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_partkey, p_name, p_brand
ORDER BY part_revenue DESC, p_partkey
LIMIT 25
""",
    description="Top-k by aggregate: AQE-sized part join + agg + "
    "TakeOrderedAndProject (SURVEY §2.9).",
)
def q_top_parts_revenue(spark, sf_dir):
    li, part = load(spark, sf_dir, "lineitem", "part")
    revenue = dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_partkey", "p_name", "p_brand")
        .agg(dsum(revenue, "part_revenue"), dsum(dec("l_quantity"), "total_qty"))
        .orderBy(F.desc("part_revenue"), "p_partkey")
        .limit(25)
    )


@query(
    "q_semi_join_active_customers",
    oracle="""
SELECT c_custkey, c_name, c_mktsegment
FROM customer
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_totalprice > 200000)
ORDER BY c_custkey
""",
    description="Left-semi join (EXISTS): customers having a big order "
    "(SURVEY §2.6 general surface).",
)
def q_semi_join_active_customers(spark, sf_dir):
    cust, orders = load(spark, sf_dir, "customer", "orders")
    return (
        cust.join(
            orders.where(F.col("o_totalprice") > 200000),
            F.col("c_custkey") == F.col("o_custkey"),
            "left_semi",
        )
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    )


@query(
    "q_anti_join_idle_customers",
    oracle="""
SELECT c_custkey, c_name
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 300000)
ORDER BY c_custkey
""",
    description="Left-anti join (NOT EXISTS): customers with no large order — "
    "the reference's output-key self-exclusion pattern (U3) generalized.",
)
def q_anti_join_idle_customers(spark, sf_dir):
    cust, orders = load(spark, sf_dir, "customer", "orders")
    return (
        cust.join(
            orders.where(F.col("o_totalprice") > 300000),
            F.col("c_custkey") == F.col("o_custkey"),
            "left_anti",
        )
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@query(
    "q_distinct_agg_segments",
    oracle="""
SELECT c_mktsegment,
       COUNT(DISTINCT c_nationkey) AS n_nations,
       COUNT(*) AS n_customers,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_balance
FROM customer
GROUP BY c_mktsegment
ORDER BY c_mktsegment
""",
    description="Distinct aggregation (expand + two-phase HashAggregate) "
    "alongside plain aggregates (SURVEY §2.5).",
)
def q_distinct_agg_segments(spark, sf_dir):
    (cust,) = load(spark, sf_dir, "customer")
    return (
        cust.groupBy("c_mktsegment")
        .agg(
            F.countDistinct("c_nationkey").alias("n_nations"),
            F.count(F.lit(1)).alias("n_customers"),
            dsum(dec("c_acctbal"), "total_balance"),
        )
        .orderBy("c_mktsegment")
    )


@query(
    "q4_order_priority",
    oracle="""
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-07-01' AND o_orderdate < TIMESTAMP '1996-10-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate > TIMESTAMP '1996-07-01')
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
    description="TPC-H Q4: semi-join of facts + aggregate over priority.",
)
def q4_order_priority(spark, sf_dir):
    orders, li = load(spark, sf_dir, "orders", "lineitem")
    return (
        orders.where(
            (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
        )
        .join(
            li.where(F.col("l_shipdate") > F.lit("1996-07-01").cast("timestamp")),
            F.col("l_orderkey") == F.col("o_orderkey"),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )
