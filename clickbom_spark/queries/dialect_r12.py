"""Round-12 clause-sweep round-trips: ClickHouse SQL that previously
FAILED AT SPARK'S PARSER (scalar WITH) or leaked unmapped vocabulary
(``::Type`` casts), run verbatim through the dialect shim and graded
against DuckDB oracles.

Reference basis: the public ClickHouse SELECT syntax (WITH clause,
scalar aliases; the ``::`` cast operator; the ``view()`` table
function; INTERSECT/EXCEPT DISTINCT).  Float discipline: floor/round
before any double→int cast (Spark truncates, DuckDB rounds), counts
and sums surfaced as BIGINT.
"""

from __future__ import annotations

from clickbom_spark.queries import query

_CH_SCALAR_WITH = """
WITH (SELECT max(o_totalprice) FROM orders) AS mx,
     100 AS scale
SELECT o_orderpriority,
       count() AS n,
       max(toInt64(floor(o_totalprice / mx * scale))) AS max_pct,
       min(toInt64(floor(o_totalprice / mx * scale))) AS min_pct
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@query(
    "q_dialect_scalar_with",
    oracle="""
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n,
       CAST(max(CAST(floor(o_totalprice /
             (SELECT max(o_totalprice) FROM orders) * 100) AS BIGINT))
         AS BIGINT) AS max_pct,
       CAST(min(CAST(floor(o_totalprice /
             (SELECT max(o_totalprice) FROM orders) * 100) AS BIGINT))
         AS BIGINT) AS min_pct
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
    description="ClickHouse scalar WITH (both the scalar-subquery "
    "form `WITH (SELECT max(...)) AS mx` and the literal form "
    "`100 AS scale`) run verbatim through the shim — Spark's WITH "
    "only accepts CTEs, so the dialect expands the aliases by "
    "quote-aware substitution (dialect._expand_scalar_with); the "
    "scalar subquery lands as a Catalyst scalar subquery "
    "(one-row broadcast, not a rescan per row).",
)
def q_dialect_scalar_with(spark, sf_dir):
    from clickbom_spark.dialect import run_clickhouse_sql

    return run_clickhouse_sql(spark, _CH_SCALAR_WITH, sf_dir)


_CH_COLON_CAST = """
SELECT l_returnflag,
       sum(l_quantity::Int64) AS qty,
       max((round(l_extendedprice * 100))::Int64) AS max_cents,
       count() AS n
FROM lineitem
WHERE (l_orderkey % 7) = 0::Int64
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


@query(
    "q_dialect_colon_cast",
    oracle="""
SELECT l_returnflag,
       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty,
       CAST(max(CAST(round(l_extendedprice * 100) AS BIGINT))
         AS BIGINT) AS max_cents,
       CAST(count(*) AS BIGINT) AS n
FROM lineitem
WHERE (l_orderkey % 7) = 0
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
    description="ClickHouse ::Type cast operator with ClickHouse "
    "type names (x::Int64) through the shim — Spark has the :: "
    "operator, the dialect maps only the type vocabulary "
    "(dialect._map_colon_casts, same table as CAST(x AS Int64) and "
    "the cast(x, 'Int64') function form).",
)
def q_dialect_colon_cast(spark, sf_dir):
    from clickbom_spark.dialect import run_clickhouse_sql

    return run_clickhouse_sql(spark, _CH_COLON_CAST, sf_dir)


_CH_VIEW_SETOP = """
SELECT count() AS n_both FROM view(
  SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
  INTERSECT DISTINCT
  SELECT o_custkey FROM orders WHERE o_orderpriority = '5-LOW'
)
"""


@query(
    "q_dialect_view_setop",
    oracle="""
SELECT CAST(count(*) AS BIGINT) AS n_both FROM (
  SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
  INTERSECT
  SELECT o_custkey FROM orders WHERE o_orderpriority = '5-LOW'
)
""",
    description="The view(q) table function (transparent subquery "
    "wrapper) around an INTERSECT DISTINCT chain through the shim. "
    "The DISTINCT spelling is mandatory: the clause sweep fails fast "
    "on bare INTERSECT/EXCEPT because ClickHouse keeps duplicates "
    "(filtering semantics) where Spark's default deduplicates — the "
    "DISTINCT forms coincide on both engines (DuckDB's bare "
    "INTERSECT is already DISTINCT).",
)
def q_dialect_view_setop(spark, sf_dir):
    from clickbom_spark.dialect import run_clickhouse_sql

    return run_clickhouse_sql(spark, _CH_VIEW_SETOP, sf_dir)
