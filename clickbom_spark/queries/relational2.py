"""Second wave of relational coverage: correlated-subquery patterns,
conditional aggregation, pivot, grouping sets, exact percentiles, and
SQL-surface queries (spark.sql over temp views).

The reference has no query language (SURVEY.md §3) — this is the
general OLAP surface the engine adds, expressed Spark-first and
oracle-checked value-for-value against DuckDB.  Decimal-cast sums per
clickbom_spark.queries for cross-engine float stability.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from clickbom_spark.queries import DEC, dec, dsum, load, query


@query(
    "q17_small_quantity_revenue",
    oracle="""
WITH avg_qty AS (
  SELECT l_partkey, AVG(l_quantity) AS aq
  FROM lineitem GROUP BY l_partkey
)
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) / 7.0 AS DOUBLE)
         AS avg_yearly
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN avg_qty a ON a.l_partkey = l.l_partkey
WHERE p.p_brand = 'BRAND#1' AND l.l_quantity < 0.5 * a.aq
""",
    description="TPC-H Q17 pattern: correlated scalar subquery "
    "(per-part average) decorrelated into an aggregate+join.",
)
def q17_small_quantity_revenue(spark, sf_dir):
    lineitem, part = load(spark, sf_dir, "lineitem", "part")
    avg_qty = lineitem.groupBy("l_partkey").agg(F.avg("l_quantity").alias("aq"))
    return (
        lineitem.join(part, F.col("p_partkey") == F.col("l_partkey"))
        .join(avg_qty, "l_partkey")
        .where((F.col("p_brand") == "BRAND#1") & (F.col("l_quantity") < 0.5 * F.col("aq")))
        .agg(
            (F.sum(dec("l_extendedprice")) / F.lit(7.0))
            .cast("double")
            .alias("avg_yearly")
        )
    )


@query(
    "q12_priority_shipping",
    oracle="""
SELECT l_returnflag,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT)
         AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT)
         AS low_line_count
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate > o_orderdate
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
    description="TPC-H Q12 pattern: join + conditional (CASE-guarded) "
    "counting per group.",
)
def q12_priority_shipping(spark, sf_dir):
    orders, lineitem = load(spark, sf_dir, "orders", "lineitem")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        orders.join(lineitem, F.col("o_orderkey") == F.col("l_orderkey"))
        .where(F.col("l_shipdate") > F.col("o_orderdate"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "q14_promo_revenue_pct",
    oracle="""
SELECT CAST(100.0 * SUM(CASE WHEN p_type = 'PROMO'
             THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))
             ELSE CAST(0 AS DECIMAL(18,4)) END)
       / SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
       AS DOUBLE) AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
""",
    description="TPC-H Q14 pattern: conditional-revenue ratio over a "
    "join (exact decimal numerator/denominator).",
)
def q14_promo_revenue_pct(spark, sf_dir):
    lineitem, part = load(spark, sf_dir, "lineitem", "part")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)")
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(
        F.lit(0).cast("decimal(18,4)")
    )
    return (
        lineitem.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            (F.lit(100.0) * F.sum(promo) / F.sum(rev))
            .cast("double")
            .alias("promo_revenue_pct")
        )
    )


@query(
    "q10_returned_item_customers",
    oracle="""
SELECT c.c_custkey, c.c_name, n.n_name,
       CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4)))
            AS DOUBLE) AS revenue
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
WHERE l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, n.n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
    description="TPC-H Q10 pattern: 4-way join, revenue aggregation, "
    "top-20 (TakeOrderedAndProject).",
    bench=True,
)
def q10_returned_item_customers(spark, sf_dir):
    customer, orders, lineitem, nation = load(
        spark, sf_dir, "customer", "orders", "lineitem", "nation"
    )
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)")
    return (
        customer.join(orders, F.col("o_custkey") == F.col("c_custkey"))
        .join(lineitem, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(nation), F.col("n_nationkey") == F.col("c_nationkey"))
        .where(F.col("l_returnflag") == "R")
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(dsum(rev, "revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@query(
    "q2_min_cost_supplier",
    oracle="""
WITH unit AS (
  SELECT l_partkey, l_suppkey,
         MIN(l_extendedprice / l_quantity) AS min_unit
  FROM lineitem WHERE l_quantity > 0
  GROUP BY l_partkey, l_suppkey
), ranked AS (
  SELECT l_partkey, l_suppkey, min_unit,
         ROW_NUMBER() OVER (PARTITION BY l_partkey
                            ORDER BY min_unit, l_suppkey) AS rn
  FROM unit
)
SELECT r.l_partkey AS partkey, s.s_name, round(r.min_unit, 4) AS unit_price_r
FROM ranked r JOIN supplier s ON s.s_suppkey = r.l_suppkey
WHERE r.rn = 1 AND r.l_partkey < 100
ORDER BY partkey
""",
    description="TPC-H Q2 pattern: cheapest supplier per part — "
    "correlated-min decorrelated into a window rank.",
)
def q2_min_cost_supplier(spark, sf_dir):
    lineitem, supplier = load(spark, sf_dir, "lineitem", "supplier")
    unit = (
        lineitem.where(F.col("l_quantity") > 0)
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("min_unit"))
    )
    w = Window.partitionBy("l_partkey").orderBy("min_unit", "l_suppkey")
    return (
        unit.withColumn("rn", F.row_number().over(w))
        .where((F.col("rn") == 1) & (F.col("l_partkey") < 100))
        .join(supplier, F.col("s_suppkey") == F.col("l_suppkey"))
        .select(
            F.col("l_partkey").alias("partkey"),
            "s_name",
            F.round("min_unit", 4).alias("unit_price_r"),
        )
        .orderBy("partkey")
    )


@query(
    "q22_idle_rich_customers",
    oracle="""
WITH threshold AS (
  SELECT AVG(c_acctbal) AS t FROM customer WHERE c_acctbal > 0
)
SELECT c.c_nationkey,
       COUNT(*) AS numcust,
       CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
FROM customer c, threshold
WHERE c.c_acctbal > threshold.t
  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
GROUP BY c.c_nationkey
ORDER BY c.c_nationkey
""",
    description="TPC-H Q22 pattern: global scalar subquery threshold + "
    "NOT EXISTS anti-join.",
)
def q22_idle_rich_customers(spark, sf_dir):
    customer, orders = load(spark, sf_dir, "customer", "orders")
    threshold = (
        customer.where(F.col("c_acctbal") > 0)
        .agg(F.avg("c_acctbal").alias("t"))
    )
    return (
        customer.join(F.broadcast(threshold))
        .where(F.col("c_acctbal") > F.col("t"))
        .join(orders, F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dsum(dec("c_acctbal"), "totacctbal"),
        )
        .orderBy("c_nationkey")
    )


@query(
    "q9_nation_year_profit",
    oracle="""
SELECT n.n_name AS nation,
       EXTRACT(YEAR FROM o.o_orderdate) AS o_year,
       CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4)))
            AS DOUBLE) AS profit
FROM lineitem l
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
GROUP BY nation, o_year
ORDER BY nation, o_year
""",
    description="TPC-H Q9 pattern: fact-to-fact + dimension joins, "
    "profit rolled up by (nation, year).",
    bench=True,
)
def q9_nation_year_profit(spark, sf_dir):
    lineitem, supplier, orders, nation = load(
        spark, sf_dir, "lineitem", "supplier", "orders", "nation"
    )
    profit = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,4)"
    )
    return (
        lineitem.join(supplier, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(nation), F.col("n_nationkey") == F.col("s_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("o_year"),
        )
        .agg(dsum(profit, "profit"))
        .orderBy("nation", "o_year")
    )


@query(
    "q_hash_sample",
    oracle="""
SELECT source, COUNT(*) AS n_sampled,
       CAST(SUM(n_chars) AS BIGINT) AS sampled_chars
FROM documents
WHERE CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS INT) % 10 = 0
GROUP BY source
ORDER BY source
""",
    description="Deterministic hash sampling (stable ~10% of documents "
    "by md5 of id) — the reproducible subset primitive for training "
    "pipelines; identical membership in any engine.",
)
def q_hash_sample(spark, sf_dir):
    (docs,) = load(spark, sf_dir, "documents")
    bucket = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10
    ).cast("long")
    return (
        docs.where(bucket % 10 == 0)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.sum("n_chars").cast("long").alias("sampled_chars"),
        )
        .orderBy("source")
    )


@query(
    "q_grouping_sets",
    oracle="""
SELECT c_mktsegment, c_nationkey, COUNT(*) AS n,
       GROUPING(c_mktsegment) AS g_seg, GROUPING(c_nationkey) AS g_nat
FROM customer
GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey), ())
ORDER BY g_seg, g_nat, c_mktsegment, c_nationkey
""",
    description="GROUPING SETS beyond rollup/cube, with GROUPING() "
    "markers — via the SQL surface (spark.sql over temp views).",
)
def q_grouping_sets(spark, sf_dir):
    (customer,) = load(spark, sf_dir, "customer")
    customer.createOrReplaceTempView("customer")
    return spark.sql(
        """
        SELECT c_mktsegment, c_nationkey, COUNT(*) AS n,
               CAST(GROUPING(c_mktsegment) AS BIGINT) AS g_seg,
               CAST(GROUPING(c_nationkey) AS BIGINT) AS g_nat
        FROM customer
        GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey), ())
        ORDER BY g_seg, g_nat, c_mktsegment, c_nationkey
        """
    )


@query(
    "q_percentiles",
    oracle="""
SELECT l_returnflag,
       round(quantile_cont(l_extendedprice, 0.5), 4) AS median_price,
       round(quantile_cont(l_extendedprice, 0.9), 4) AS p90_price,
       round(quantile_cont(l_discount, 0.25), 4) AS p25_discount
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
    description="Exact interpolated percentiles per group (Spark "
    "percentile == DuckDB quantile_cont).",
)
def q_percentiles(spark, sf_dir):
    (lineitem,) = load(spark, sf_dir, "lineitem")
    return (
        lineitem.groupBy("l_returnflag")
        .agg(
            F.round(F.expr("percentile(l_extendedprice, 0.5)"), 4).alias(
                "median_price"
            ),
            F.round(F.expr("percentile(l_extendedprice, 0.9)"), 4).alias("p90_price"),
            F.round(F.expr("percentile(l_discount, 0.25)"), 4).alias("p25_discount"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "q_pivot_returnflag",
    oracle="""
SELECT o_orderpriority,
       CAST(SUM(CASE WHEN l_returnflag = 'A'
            THEN CAST(l_extendedprice AS DECIMAL(18,2)) END) AS DOUBLE) AS rev_A,
       CAST(SUM(CASE WHEN l_returnflag = 'N'
            THEN CAST(l_extendedprice AS DECIMAL(18,2)) END) AS DOUBLE) AS rev_N,
       CAST(SUM(CASE WHEN l_returnflag = 'R'
            THEN CAST(l_extendedprice AS DECIMAL(18,2)) END) AS DOUBLE) AS rev_R
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
    description="Pivot (wide conditional aggregation) on return flag "
    "with explicit value list — no extra pass for value discovery.",
)
def q_pivot_returnflag(spark, sf_dir):
    orders, lineitem = load(spark, sf_dir, "orders", "lineitem")
    pivoted = (
        orders.join(lineitem, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_orderpriority")
        .pivot("l_returnflag", ["A", "N", "R"])
        .agg(F.sum(dec("l_extendedprice")).cast("double"))
    )
    return pivoted.select(
        "o_orderpriority",
        F.col("A").alias("rev_A"),
        F.col("N").alias("rev_N"),
        F.col("R").alias("rev_R"),
    ).orderBy("o_orderpriority")


@query(
    "q_stats_aggregates",
    oracle="""
SELECT l_returnflag,
       round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
       round(covar_samp(l_quantity, l_extendedprice), 2) AS covar_qp,
       round(stddev_samp(l_extendedprice), 3) AS sd_price,
       round(var_samp(l_discount), 6) AS var_disc
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
    description="Statistical aggregates (corr/covar/stddev/variance) per "
    "group — rounded past the accumulation-order noise floor.",
)
def q_stats_aggregates(spark, sf_dir):
    (lineitem,) = load(spark, sf_dir, "lineitem")
    return (
        lineitem.groupBy("l_returnflag")
        .agg(
            F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias(
                "corr_qty_price"
            ),
            F.round(F.covar_samp("l_quantity", "l_extendedprice"), 2).alias(
                "covar_qp"
            ),
            F.round(F.stddev_samp("l_extendedprice"), 3).alias("sd_price"),
            F.round(F.var_samp("l_discount"), 6).alias("var_disc"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "q_price_histogram",
    oracle="""
SELECT CASE WHEN o_totalprice < 0 THEN 0
            WHEN o_totalprice >= 600000 THEN 13
            ELSE CAST(FLOOR(o_totalprice / 50000) + 1 AS BIGINT) END AS bucket,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS bucket_total
FROM orders
GROUP BY bucket
ORDER BY bucket
""",
    description="Fixed-width histogram via width_bucket (oracle uses the "
    "equivalent floor arithmetic) — distribution profiling without a sort.",
)
def q_price_histogram(spark, sf_dir):
    (orders,) = load(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            F.width_bucket("o_totalprice", F.lit(0), F.lit(600000), F.lit(12)).alias(
                "bucket"
            )
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum(dec("o_totalprice"), "bucket_total"),
        )
        .orderBy("bucket")
    )


@query(
    "q_array_agg_stats",
    oracle="""
SELECT c_nationkey,
       array_to_string(list_sort(list(DISTINCT c_mktsegment)), ',') AS segments,
       COUNT(DISTINCT c_mktsegment) AS n_segments
FROM customer
GROUP BY c_nationkey
ORDER BY c_nationkey
""",
    description="Array aggregation: collect_set -> sort_array -> join "
    "(deterministic canonical form of a set-valued aggregate).",
)
def q_array_agg_stats(spark, sf_dir):
    (customer,) = load(spark, sf_dir, "customer")
    return (
        customer.groupBy("c_nationkey")
        .agg(
            F.array_join(F.sort_array(F.collect_set("c_mktsegment")), ",").alias(
                "segments"
            ),
            F.countDistinct("c_mktsegment").alias("n_segments"),
        )
        .orderBy("c_nationkey")
    )


@query(
    "q_stratified_sample",
    oracle="""
SELECT source, COUNT(*) AS n_sampled,
       CAST(SUM(n_chars) AS BIGINT) AS sampled_chars
FROM documents
WHERE CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS INT)
        % 100
      < CASE WHEN source IN ('src0','src1','src2','src3','src4')
             THEN 50 ELSE 10 END
GROUP BY source
ORDER BY source
""",
    description="Stratified deterministic sampling: per-source rates "
    "(50% for the head sources, 10% for the tail) via md5 hash buckets "
    "— reproducible downsampling with per-stratum quotas, membership "
    "identical in any engine; a pure scan-side filter, no shuffle "
    "before the final rollup.",
)
def q_stratified_sample(spark, sf_dir):
    (docs,) = load(spark, sf_dir, "documents")
    bucket = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10
    ).cast("long")
    rate = F.when(
        F.col("source").isin("src0", "src1", "src2", "src3", "src4"), 50
    ).otherwise(10)
    return (
        docs.where(bucket % 100 < rate)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.sum("n_chars").cast("long").alias("sampled_chars"),
        )
        .orderBy("source")
    )


@query(
    "q_higher_moments",
    oracle="""
WITH c AS (
  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS c
  FROM events WHERE value IS NOT NULL
), s AS (
  SELECT event_type,
         CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(c) AS DOUBLE) AS s1,
         CAST(SUM(c * c) AS DOUBLE) AS s2,
         CAST(SUM(c * c * c) AS DOUBLE) AS s3,
         CAST(SUM(c * c * c * c) AS DOUBLE) AS s4
  FROM c GROUP BY event_type
), m AS (
  SELECT event_type, n, s1 / n AS mu,
         s2 / n - (s1 / n) * (s1 / n) AS m2,
         s3 / n - 3 * (s1 / n) * (s2 / n)
               + 2 * (s1 / n) * (s1 / n) * (s1 / n) AS m3,
         s4 / n - 4 * (s1 / n) * (s3 / n)
               + 6 * (s1 / n) * (s1 / n) * (s2 / n)
               - 3 * (s1 / n) * (s1 / n) * (s1 / n) * (s1 / n) AS m4
  FROM s
)
SELECT event_type,
       round(m3 / pow(m2, 1.5), 6) AS skew_pop,
       round(m4 / (m2 * m2) - 3, 6) AS kurt_pop
FROM m ORDER BY event_type
""",
    description="Population skewness and excess kurtosis per event "
    "type (ClickHouse skewPop/kurtPop): central moments derived from "
    "EXACT integer power sums (value in cents; S4 accumulated as "
    "decimal/hugeint so no overflow, no accumulation-order noise) and "
    "one identical double formula on both engines, rounded past the "
    "conversion noise floor — the moment-sketch shape that needs one "
    "scan and map-side combine at any scale.",
)
def q_higher_moments(spark, sf_dir):
    (events,) = load(spark, sf_dir, "events")
    c = F.round(F.col("value") * 100).cast("long")
    src = events.where(F.col("value").isNotNull()).select(
        "event_type",
        c.alias("c1"),
        (c * c).alias("c2"),
        (c * c * c).alias("c3"),
        (c * c * c * c).alias("c4"),
    )
    s = src.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(F.col("c1").cast("decimal(38,0)")).cast("double").alias("s1"),
        F.sum(F.col("c2").cast("decimal(38,0)")).cast("double").alias("s2"),
        F.sum(F.col("c3").cast("decimal(38,0)")).cast("double").alias("s3"),
        F.sum(F.col("c4").cast("decimal(38,0)")).cast("double").alias("s4"),
    )
    n, s1, s2, s3, s4 = (F.col(x) for x in ("n", "s1", "s2", "s3", "s4"))
    mu = s1 / n
    m2 = s2 / n - mu * mu
    m3 = s3 / n - 3 * mu * (s2 / n) + 2 * mu * mu * mu
    m4 = (
        s4 / n
        - 4 * mu * (s3 / n)
        + 6 * mu * mu * (s2 / n)
        - 3 * mu * mu * mu * mu
    )
    return s.select(
        "event_type",
        F.round(m3 / F.pow(m2, F.lit(1.5)), 6).alias("skew_pop"),
        F.round(m4 / (m2 * m2) - 3, 6).alias("kurt_pop"),
    ).orderBy("event_type")


@query(
    "q_mad_outliers",
    oracle="""
WITH c AS (
  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents
  FROM events WHERE value IS NOT NULL
), med AS (
  SELECT event_type, quantile_cont(cents, 0.5) AS med_cents
  FROM c GROUP BY event_type
), dev AS (
  SELECT c.event_type, c.cents, m.med_cents,
         abs(c.cents - m.med_cents) AS adev
  FROM c JOIN med m USING (event_type)
), mad AS (
  SELECT event_type, quantile_cont(adev, 0.5) AS mad_cents
  FROM dev GROUP BY event_type
)
SELECT d.event_type,
       ANY_VALUE(d.med_cents) AS med_cents,
       ANY_VALUE(m.mad_cents) AS mad_cents,
       CAST(SUM(CASE WHEN d.adev > 3 * m.mad_cents THEN 1 ELSE 0 END)
            AS BIGINT) AS n_outliers,
       CAST(COUNT(*) AS BIGINT) AS n_total
FROM dev d JOIN mad m USING (event_type)
GROUP BY d.event_type ORDER BY d.event_type
""",
    description="Robust outlier detection per event type: median "
    "absolute deviation with the 3-MAD rule.  Everything runs in "
    "integer-cents space, where interpolated medians of integers are "
    "DYADIC rationals (halves/quarters) — exactly representable "
    "doubles — so the boundary comparison |x-med| > 3*MAD can never "
    "split between engines; two grouped exact percentiles plus one "
    "broadcast-back join, no window over the corpus.",
)
def q_mad_outliers(spark, sf_dir):
    (events,) = load(spark, sf_dir, "events")
    c = events.where(F.col("value").isNotNull()).select(
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    med = c.groupBy("event_type").agg(
        F.expr("percentile(cents, 0.5)").alias("med_cents")
    )
    dev = c.join(F.broadcast(med), "event_type").select(
        "event_type",
        "med_cents",
        F.abs(F.col("cents") - F.col("med_cents")).alias("adev"),
    )
    mad = dev.groupBy("event_type").agg(
        F.expr("percentile(adev, 0.5)").alias("mad_cents")
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.first("med_cents").alias("med_cents"),
            F.first("mad_cents").alias("mad_cents"),
            F.sum(
                F.when(F.col("adev") > 3 * F.col("mad_cents"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_outliers"),
            F.count(F.lit(1)).alias("n_total"),
        )
        .orderBy("event_type")
    )
