"""Third relational wave: the remaining TPC-H query patterns (Q7, Q8,
Q11, Q13, Q16, Q18, Q19, Q20, Q21) adapted to the synthetic corpus.

The corpus has no ``partsupp`` table and no commit/receipt dates, so
Q11/Q16/Q20/Q21 are re-expressed over ``lineitem`` while preserving
the operator shape that makes each query interesting:

* Q7  — two-sided dimension filter with a symmetric OR over nation pairs
* Q8  — market-share ratio (conditional revenue / total revenue per year)
* Q11 — group-by + HAVING against a global scalar subquery threshold
* Q13 — left outer join + two-level aggregation (distribution of counts)
* Q16 — count-distinct per attribute triple with NOT-IN (anti-join) gate
* Q18 — HAVING-filtered semi-join back to the fact (large-order scan)
* Q19 — disjunctive multi-attribute predicate pushed into one join
* Q20 — nested IN subqueries collapsed to semi-joins
* Q21 — multi-correlated EXISTS/NOT-EXISTS decorrelated into window-free
  aggregate joins (sole-latest-shipper per multi-supplier order)

All joins on dimension tables are explicitly broadcast; fact-fact joins
shuffle on their keys and survive a 100× scale-up (the grouped
intermediates are strictly smaller than the fact table).  Scale note at
100 TB: Q18/Q21's per-order aggregates are map-side-combinable and AQE
coalesces their post-shuffle partitions; nothing here collects to the
driver.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from clickbom_spark.queries import dec, dsum, load, query


@query(
    "q7_nation_volume",
    oracle="""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       EXTRACT(YEAR FROM l.l_shipdate) AS l_year,
       CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4)))
            AS DOUBLE) AS revenue
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
   OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
""",
    description="TPC-H Q7 pattern: bilateral trade volume — symmetric OR "
    "over a nation pair, revenue by (supp_nation, cust_nation, year).",
)
def q7_nation_volume(spark, sf_dir):
    lineitem, orders, customer, supplier, nation = load(
        spark, sf_dir, "lineitem", "orders", "customer", "supplier", "nation"
    )
    n1 = nation.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)")
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        lineitem.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(customer, F.col("c_custkey") == F.col("o_custkey"))
        .join(supplier, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n1), F.col("s_nk") == F.col("s_nationkey"))
        .join(F.broadcast(n2), F.col("c_nk") == F.col("c_nationkey"))
        .where(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("bigint").alias("l_year"),
        )
        .agg(dsum(rev, "revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@query(
    "q8_market_share",
    oracle="""
SELECT EXTRACT(YEAR FROM o.o_orderdate) AS o_year,
       round(CAST(SUM(CASE WHEN n1.n_name = 'NATION_2'
                  THEN CAST(l.l_extendedprice * (1 - l.l_discount)
                       AS DECIMAL(18,4))
                  ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
             / CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                       AS DECIMAL(18,4))) AS DOUBLE), 6) AS mkt_share
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
JOIN region r ON r.r_regionkey = n2.n_regionkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
WHERE r.r_name = 'ASIA'
GROUP BY o_year
ORDER BY o_year
""",
    description="TPC-H Q8 pattern: national market share — conditional "
    "revenue over total revenue per year within one region's customers.",
)
def q8_market_share(spark, sf_dir):
    lineitem, orders, customer, supplier, nation, region = load(
        spark, sf_dir, "lineitem", "orders", "customer", "supplier", "nation", "region"
    )
    n_cust = nation.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk")
    )
    n_supp = nation.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)")
    target = F.when(F.col("supp_nation") == "NATION_2", rev).otherwise(
        F.lit(0).cast("decimal(18,4)")
    )
    return (
        lineitem.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(customer, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n_cust), F.col("c_nk") == F.col("c_nationkey"))
        .join(
            F.broadcast(region.where(F.col("r_name") == "ASIA")),
            F.col("r_regionkey") == F.col("c_rk"),
        )
        .join(supplier, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n_supp), F.col("s_nk") == F.col("s_nationkey"))
        .groupBy(F.year("o_orderdate").cast("bigint").alias("o_year"))
        .agg(
            F.round(
                F.sum(target).cast("double") / F.sum(rev).cast("double"), 6
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@query(
    "q11_supplier_concentration",
    oracle="""
WITH value_per_supp AS (
  SELECT l_suppkey,
         SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS val
  FROM lineitem GROUP BY l_suppkey
), total AS (
  SELECT SUM(val) AS tot, COUNT(*) AS ns FROM value_per_supp
)
SELECT v.l_suppkey, CAST(v.val AS DOUBLE) AS supp_value
FROM value_per_supp v, total t
WHERE CAST(v.val AS DOUBLE) > 1.05 * CAST(t.tot AS DOUBLE) / t.ns
ORDER BY supp_value DESC, v.l_suppkey
""",
    description="TPC-H Q11 pattern: per-supplier value with HAVING "
    "against a global scalar threshold (1.05x the mean share) — "
    "scalar-subquery broadcast, no second fact scan.",
)
def q11_supplier_concentration(spark, sf_dir):
    (lineitem,) = load(spark, sf_dir, "lineitem")
    per_supp = lineitem.groupBy("l_suppkey").agg(
        F.sum(dec("l_extendedprice")).alias("val")
    )
    total = per_supp.agg(
        F.sum("val").alias("tot"), F.count(F.lit(1)).alias("ns")
    )
    return (
        per_supp.join(F.broadcast(total))
        .where(
            F.col("val").cast("double")
            > F.lit(1.05) * F.col("tot").cast("double") / F.col("ns")
        )
        .select("l_suppkey", F.col("val").cast("double").alias("supp_value"))
        .orderBy(F.desc("supp_value"), "l_suppkey")
    )


@query(
    "q13_customer_order_distribution",
    oracle="""
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
  FROM customer c
  LEFT JOIN orders o
    ON o.o_custkey = c.c_custkey AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey
)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
""",
    description="TPC-H Q13 pattern: left outer join with a join-side "
    "predicate, then a two-level aggregation (distribution of per-"
    "customer order counts, zeros preserved by the outer join).",
)
def q13_customer_order_distribution(spark, sf_dir):
    customer, orders = load(spark, sf_dir, "customer", "orders")
    per_cust = (
        customer.join(
            orders.where(F.col("o_orderpriority") != "1-URGENT"),
            F.col("o_custkey") == F.col("c_custkey"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@query(
    "q15_top_supplier_revenue",
    oracle="""
WITH rev AS (
  SELECT l_suppkey AS supplier_no,
         SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
           AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY supplier_no
)
SELECT s.s_suppkey, s.s_name,
       CAST(r.total_revenue AS DOUBLE) AS total_revenue
FROM supplier s
JOIN rev r ON r.supplier_no = s.s_suppkey
WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM rev)
ORDER BY s.s_suppkey
""",
    description="TPC-H Q15 pattern: quarterly revenue view, top supplier "
    "selected by an uncorrelated scalar-max subquery over the same view "
    "(the view is computed once; the max is a broadcast one-row join).",
)
def q15_top_supplier_revenue(spark, sf_dir):
    lineitem, supplier = load(spark, sf_dir, "lineitem", "supplier")
    rev_expr = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,4)"
    )
    rev = (
        lineitem.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(rev_expr).alias("total_revenue"))
    )
    top = rev.agg(F.max("total_revenue").alias("max_rev"))
    return (
        rev.join(F.broadcast(top))
        .where(F.col("total_revenue") == F.col("max_rev"))
        .join(supplier, F.col("s_suppkey") == F.col("supplier_no"))
        .select(
            "s_suppkey",
            "s_name",
            F.col("total_revenue").cast("double").alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


@query(
    "q16_supplier_part_counts",
    oracle="""
SELECT p.p_brand, p.p_type, p.p_size,
       COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand <> 'Brand#1' AND p.p_size <= 10
  AND l.l_suppkey NOT IN
      (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p.p_brand, p.p_type, p.p_size
ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
""",
    description="TPC-H Q16 pattern: distinct-supplier counts per part "
    "attribute triple with a NOT-IN exclusion (left anti-join against "
    "an AQE-sized blacklist — part/supplier grow with SF, no hard hint).",
)
def q16_supplier_part_counts(spark, sf_dir):
    lineitem, part, supplier = load(spark, sf_dir, "lineitem", "part", "supplier")
    bad = supplier.where(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        lineitem.join(
            part.where((F.col("p_brand") != "Brand#1") & (F.col("p_size") <= 10)),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .join(bad, F.col("s_suppkey") == F.col("l_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


@query(
    "q18_large_orders",
    oracle="""
SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice,
       CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderkey IN (
  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
  HAVING SUM(l_quantity) > 300
)
GROUP BY c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice
ORDER BY o.o_totalprice DESC, o.o_orderkey
LIMIT 100
""",
    description="TPC-H Q18 pattern: large-quantity orders — HAVING-"
    "filtered aggregate semi-joined back to the fact, top-100 by price.",
    bench=True,
)
def q18_large_orders(spark, sf_dir):
    customer, orders, lineitem = load(spark, sf_dir, "customer", "orders", "lineitem")
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sq"))
        .where(F.col("sq") > 300)
        .select("l_orderkey")
    )
    return (
        lineitem.join(big.withColumnRenamed("l_orderkey", "b_orderkey"),
                      F.col("b_orderkey") == F.col("l_orderkey"), "left_semi")
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(customer, F.col("c_custkey") == F.col("o_custkey"))
        .groupBy("c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(dsum(dec("l_quantity"), "total_qty"))
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(100)
    )


@query(
    "q19_disjunctive_revenue",
    oracle="""
SELECT CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4)))
            AS DOUBLE) AS revenue
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#1' AND l.l_quantity BETWEEN 1 AND 15
       AND p.p_size <= 20)
   OR (p.p_brand = 'Brand#2' AND l.l_quantity BETWEEN 10 AND 25
       AND p.p_size <= 30)
   OR (p.p_brand = 'Brand#3' AND l.l_quantity BETWEEN 20 AND 35
       AND p.p_size <= 40)
""",
    description="TPC-H Q19 pattern: disjunctive multi-attribute predicate "
    "evaluated inside a single AQE-sized join (no union of three scans).",
)
def q19_disjunctive_revenue(spark, sf_dir):
    lineitem, part = load(spark, sf_dir, "lineitem", "part")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)")
    cond = (
        (F.col("p_brand") == "Brand#1")
        & F.col("l_quantity").between(1, 15)
        & (F.col("p_size") <= 20)
    ) | (
        (F.col("p_brand") == "Brand#2")
        & F.col("l_quantity").between(10, 25)
        & (F.col("p_size") <= 30)
    ) | (
        (F.col("p_brand") == "Brand#3")
        & F.col("l_quantity").between(20, 35)
        & (F.col("p_size") <= 40)
    )
    return (
        lineitem.join(part, F.col("p_partkey") == F.col("l_partkey"))
        .where(cond)
        .agg(dsum(rev, "revenue"))
    )


@query(
    "q20_red_part_suppliers",
    oracle="""
SELECT s.s_suppkey, s.s_name
FROM supplier s
WHERE s.s_suppkey IN (
  SELECT l.l_suppkey
  FROM lineitem l
  WHERE l.l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE '%red%')
  GROUP BY l.l_suppkey
  HAVING SUM(l.l_quantity) > 1900
)
ORDER BY s.s_suppkey
""",
    description="TPC-H Q20 pattern: nested IN subqueries (parts by name, "
    "suppliers by shipped quantity) collapsed into semi-joins.",
)
def q20_red_part_suppliers(spark, sf_dir):
    supplier, lineitem, part = load(spark, sf_dir, "supplier", "lineitem", "part")
    red = part.where(F.col("p_name").like("%red%")).select("p_partkey")
    heavy = (
        lineitem.join(red, F.col("p_partkey") == F.col("l_partkey"), "left_semi")
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("sq"))
        .where(F.col("sq") > 1900)
        .select("l_suppkey")
    )
    return (
        supplier.join(
            heavy, F.col("l_suppkey") == F.col("s_suppkey"), "left_semi"
        )
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


@query(
    "q21_sole_latest_shipper",
    oracle="""
WITH per_os AS (
  SELECT l_orderkey, l_suppkey, MAX(l_shipdate) AS supp_maxship
  FROM lineitem GROUP BY l_orderkey, l_suppkey
), per_o AS (
  SELECT l_orderkey, COUNT(*) AS nsupp, MAX(supp_maxship) AS ordmax
  FROM per_os GROUP BY l_orderkey
)
SELECT s.s_name, COUNT(*) AS numwait
FROM per_os p
JOIN per_o o ON o.l_orderkey = p.l_orderkey
JOIN supplier s ON s.s_suppkey = p.l_suppkey
WHERE o.nsupp > 1 AND p.supp_maxship = o.ordmax
GROUP BY s.s_name
ORDER BY numwait DESC, s.s_name
LIMIT 20
""",
    description="TPC-H Q21 pattern: multi-correlated EXISTS/NOT-EXISTS "
    "(supplier who shipped last in multi-supplier orders) decorrelated "
    "into two aggregate joins — no correlated per-row subplans.",
)
def q21_sole_latest_shipper(spark, sf_dir):
    lineitem, supplier = load(spark, sf_dir, "lineitem", "supplier")
    per_os = lineitem.groupBy("l_orderkey", "l_suppkey").agg(
        F.max("l_shipdate").alias("supp_maxship")
    )
    per_o = per_os.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("nsupp"), F.max("supp_maxship").alias("ordmax")
    )
    return (
        per_os.join(per_o, "l_orderkey")
        .where((F.col("nsupp") > 1) & (F.col("supp_maxship") == F.col("ordmax")))
        .join(supplier, F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )


@query(
    "q_exists_subqueries",
    oracle="""
SELECT c.c_custkey, c.c_acctbal
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
  AND c.c_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey = 2)
ORDER BY c.c_custkey
""",
    description="Correlated EXISTS + uncorrelated IN through the SQL "
    "surface — Catalyst decorrelates both into semi-joins (no per-row "
    "subplan execution).",
)
def q_exists_subqueries(spark, sf_dir):
    customer, orders, nation = load(spark, sf_dir, "customer", "orders", "nation")
    customer.createOrReplaceTempView("customer")
    orders.createOrReplaceTempView("orders")
    nation.createOrReplaceTempView("nation")
    return spark.sql(
        """
        SELECT c.c_custkey, c.c_acctbal
        FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > 400000)
          AND c.c_nationkey IN (SELECT n_nationkey FROM nation
                                WHERE n_regionkey = 2)
        ORDER BY c.c_custkey
        """
    )


@query(
    "q_rolling_time_window",
    oracle="""
SELECT user_id, event_id,
       CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER (
         PARTITION BY user_id ORDER BY ts
         RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW
       ) AS DOUBLE) AS rolling_7d
FROM events
WHERE event_type = 'purchase'
ORDER BY user_id, event_id
""",
    description="Time-based RANGE window frame: per-user 7-day rolling "
    "purchase value — the frame is bounded by event time, not row "
    "count (exact decimal accumulation for cross-engine parity).",
)
def q_rolling_time_window(spark, sf_dir):
    (events,) = load(spark, sf_dir, "events")
    events.createOrReplaceTempView("events")
    return spark.sql(
        """
        SELECT user_id, event_id,
               CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER (
                 PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL 6 DAYS PRECEDING AND CURRENT ROW
               ) AS DOUBLE) AS rolling_7d
        FROM events
        WHERE event_type = 'purchase'
        ORDER BY user_id, event_id
        """
    )


@query(
    "q_fk_integrity_audit",
    oracle="""
SELECT 'lineitem.l_orderkey' AS fk, COUNT(*) AS n_rows,
       CAST(SUM(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS orphans
FROM lineitem l LEFT JOIN orders o ON o.o_orderkey = l.l_orderkey
UNION ALL
SELECT 'lineitem.l_partkey', COUNT(*),
       CAST(SUM(CASE WHEN p.p_partkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
FROM lineitem l LEFT JOIN part p ON p.p_partkey = l.l_partkey
UNION ALL
SELECT 'lineitem.l_suppkey', COUNT(*),
       CAST(SUM(CASE WHEN s.s_suppkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
FROM lineitem l LEFT JOIN supplier s ON s.s_suppkey = l.l_suppkey
UNION ALL
SELECT 'orders.o_custkey', COUNT(*),
       CAST(SUM(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
FROM orders o LEFT JOIN customer c ON c.c_custkey = o.o_custkey
ORDER BY fk
""",
    description="Referential-integrity audit: orphan counts per FK edge "
    "in ONE pass per edge (left join + conditional count — no separate "
    "anti-join scan), unioned into a QA report.  The probe side is the "
    "PK column only; join strategy is left to AQE (broadcast when the "
    "key set is small, shuffle join when the referenced table is itself "
    "fact-sized — a forced broadcast would not survive 100 TB).",
)
def q_fk_integrity_audit(spark, sf_dir):
    lineitem, orders, part, supplier, customer = load(
        spark, sf_dir, "lineitem", "orders", "part", "supplier", "customer"
    )

    def edge(label, fact, fk, dim, pk):
        probe = dim.select(F.col(pk))
        return (
            fact.join(probe, F.col(pk) == F.col(fk), "left")
            .agg(
                F.lit(label).alias("fk"),
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(F.when(F.col(pk).isNull(), 1).otherwise(0))
                .cast("long")
                .alias("orphans"),
            )
        )

    report = (
        edge("lineitem.l_orderkey", lineitem, "l_orderkey", orders, "o_orderkey")
        .unionByName(edge("lineitem.l_partkey", lineitem, "l_partkey", part, "p_partkey"))
        .unionByName(
            edge("lineitem.l_suppkey", lineitem, "l_suppkey", supplier, "s_suppkey")
        )
        .unionByName(edge("orders.o_custkey", orders, "o_custkey", customer, "c_custkey"))
    )
    return report.orderBy("fk")
