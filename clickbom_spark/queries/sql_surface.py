"""SQL front-end surface: ANSI SQL text executed directly by Spark SQL.

The reference's warehouse users speak SQL, not DataFrames; the engine
exposes that via :func:`clickbom_spark.session.load_tables` (registers
every corpus table as a temp view) + ``spark.sql``.  The registry
queries here run ONE shared ANSI SQL string through both engines —
Spark executes it verbatim as the implementation and DuckDB executes
it verbatim as the oracle — proving dialect-portable SQL is a
first-class way in, with Catalyst still providing pushdown/pruning/
broadcast exactly as for DataFrame plans (same optimizer, same
physical operators).
"""

from __future__ import annotations

from clickbom_spark.queries import query
from clickbom_spark.session import load_tables

# One string, two engines: ANSI subset only (CTEs, window functions,
# decimal casts, date_trunc) — no dialect-specific functions.
_SQL_TOP_ORDERS_PER_MONTH = """
WITH monthly AS (
  SELECT DATE_TRUNC('month', o_orderdate) AS month,
         o_orderkey,
         CAST(o_totalprice AS DECIMAL(18,2)) AS price,
         ROW_NUMBER() OVER (
           PARTITION BY DATE_TRUNC('month', o_orderdate)
           ORDER BY CAST(o_totalprice AS DECIMAL(18,2)) DESC, o_orderkey
         ) AS rn
  FROM orders
  WHERE o_orderdate >= TIMESTAMP '1996-01-01'
    AND o_orderdate <  TIMESTAMP '1997-01-01'
)
SELECT month, o_orderkey, CAST(price AS DOUBLE) AS price, CAST(rn AS BIGINT) AS rn
FROM monthly
WHERE rn <= 3
ORDER BY month, rn
"""

_SQL_SEGMENT_LEDGER = """
WITH per_cust AS (
  SELECT c_custkey, c_mktsegment,
         CAST(c_acctbal AS DECIMAL(18,2)) AS bal
  FROM customer
),
orders_per_cust AS (
  SELECT o_custkey, COUNT(*) AS n_orders,
         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS spend
  FROM orders GROUP BY o_custkey
)
SELECT c_mktsegment,
       COUNT(*) AS n_customers,
       CAST(SUM(bal) AS DOUBLE) AS total_balance,
       CAST(SUM(COALESCE(n_orders, 0)) AS BIGINT) AS total_orders,
       CAST(SUM(COALESCE(spend, CAST(0 AS DECIMAL(18,2)))) AS DOUBLE)
         AS total_spend
FROM per_cust LEFT JOIN orders_per_cust ON c_custkey = o_custkey
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


def _run_sql(spark, sf_dir: str, sql: str):
    load_tables(spark, sf_dir)
    return spark.sql(sql)


@query(
    "q_sql_top_orders_month",
    oracle=_SQL_TOP_ORDERS_PER_MONTH,
    description="SQL front-end: the SAME ANSI SQL string (CTE + window "
    "top-3 per month) is the Spark implementation AND the oracle — "
    "dialect-portable SQL as a first-class entry point.",
)
def q_sql_top_orders_month(spark, sf_dir):
    return _run_sql(spark, sf_dir, _SQL_TOP_ORDERS_PER_MONTH)


@query(
    "q_sql_segment_ledger",
    oracle=_SQL_SEGMENT_LEDGER,
    description="SQL front-end: shared ANSI text with CTEs, a left "
    "join against a pre-aggregated ledger, and decimal-exact sums, "
    "executed verbatim by Spark SQL and the oracle engine.",
)
def q_sql_segment_ledger(spark, sf_dir):
    return _run_sql(spark, sf_dir, _SQL_SEGMENT_LEDGER)


# Recursive CTE executed VERBATIM by both engines (Spark 4 WITH
# RECURSIVE + DuckDB): an integer month spine — timezone-free by
# construction — left-joined to per-month order aggregates, so months
# with no orders still appear with zero counts (gap detection).
_SQL_RECURSIVE_MONTHS = """
WITH RECURSIVE spine AS (
  SELECT 1995 AS y, 1 AS m
  UNION ALL
  SELECT CASE WHEN m = 12 THEN y + 1 ELSE y END,
         CASE WHEN m = 12 THEN 1 ELSE m + 1 END
  FROM spine
  WHERE y * 12 + m < 1997 * 12 + 12
), per_month AS (
  SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS y,
         CAST(EXTRACT(MONTH FROM o_orderdate) AS BIGINT) AS m,
         COUNT(*) AS n_orders,
         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS spend
  FROM orders
  GROUP BY 1, 2
)
SELECT CAST(s.y * 100 + s.m AS BIGINT) AS month_key,
       CAST(COALESCE(p.n_orders, 0) AS BIGINT) AS n_orders,
       CAST(COALESCE(p.spend, CAST(0 AS DECIMAL(18,2))) AS DOUBLE)
         AS total_spend
FROM spine s LEFT JOIN per_month p ON p.y = s.y AND p.m = s.m
ORDER BY month_key
"""


@query(
    "q_sql_recursive_months",
    oracle=_SQL_RECURSIVE_MONTHS,
    description="SQL front-end, recursive: the SAME WITH RECURSIVE "
    "string builds a 36-month integer spine (timezone-free) and "
    "left-joins per-month order aggregates — Spark 4 recursive CTEs "
    "and the oracle engine execute the identical text; missing months "
    "surface as zero rows (calendar gap detection).",
)
def q_sql_recursive_months(spark, sf_dir):
    return _run_sql(spark, sf_dir, _SQL_RECURSIVE_MONTHS)


# Correlated LATERAL subquery — per-nation top-2 customers without a
# window function: the subquery re-executes (logically) per outer row
# and both engines support the identical syntax.
_SQL_LATERAL_TOPK = """
SELECT n.n_name, t.c_name, t.c_acctbal
FROM nation n, LATERAL (
  SELECT c_name, c_acctbal FROM customer
  WHERE c_nationkey = n.n_nationkey
  ORDER BY c_acctbal DESC, c_name LIMIT 2
) t
ORDER BY n.n_name, t.c_acctbal DESC, t.c_name
"""


@query(
    "q_sql_lateral_topk",
    oracle=_SQL_LATERAL_TOPK,
    description="SQL front-end, LATERAL: the SAME correlated-lateral "
    "string (per-nation top-2 customers, no window function) runs on "
    "both engines — Catalyst decorrelates it to a ranked join rather "
    "than executing per-row.",
)
def q_sql_lateral_topk(spark, sf_dir):
    return _run_sql(spark, sf_dir, _SQL_LATERAL_TOPK)
