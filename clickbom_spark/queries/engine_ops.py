"""Engine-operations queries: re-aggregatable partial states
(ClickHouse -State/-Merge combinator semantics), iterative PageRank,
and order-independent table checksums (CHECK TABLE analog).

These are warehouse-operations primitives: incremental rollup
maintenance (merge partial aggregate states instead of rescanning),
iterative graph analytics as one-shuffle-per-round join relays, and
content checksums for replica/migration verification.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from clickbom_spark.queries import dec, epoch_us, load, query

# DuckDB twin of the portable md5→60-bit-int digest
# (clickbom_spark/ext/dedup.py:312 pattern).
_H15 = "CAST(('0x' || substring(md5({key}), 1, 15)) AS BIGINT)"


@query(
    "q_agg_state_merge",
    # The oracle aggregates directly; the Spark side aggregates each
    # ingest batch into PARTIAL STATES (exact decimal sum + count),
    # merges states, then finalizes — proving state-merge ≡ rescan,
    # which is the contract that makes incremental rollups safe.
    oracle="""
SELECT l_suppkey,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       COUNT(*) AS n_items,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE) AS avg_qty
FROM lineitem
GROUP BY l_suppkey
ORDER BY l_suppkey
""",
    description="Partial-aggregate state merge (ClickHouse "
    "sumState/countState → -Merge): lineitem split into ingest batches, "
    "each reduced to exact decimal (sum, count) states, states merged "
    "and finalized — bit-identical to a direct rescan, the invariant "
    "behind incremental materialized rollups (map-side partial agg is "
    "the same algebra, so the merge tree is arbitrarily deep).",
)
def q_agg_state_merge(spark, sf_dir):
    (li,) = load(spark, sf_dir, "lineitem")
    # Ingest batches: any disjoint split works; use orderkey parity.
    batched = li.withColumn("batch", F.pmod(F.col("l_orderkey"), F.lit(4)))
    states = batched.groupBy("l_suppkey", "batch").agg(
        F.sum(dec("l_quantity")).alias("state_sum"),
        F.count(F.lit(1)).alias("state_cnt"),
    )
    merged = states.groupBy("l_suppkey").agg(
        F.sum("state_sum").alias("sum_dec"),
        F.sum("state_cnt").alias("n_items"),
    )
    return merged.select(
        "l_suppkey",
        F.col("sum_dec").cast("double").alias("sum_qty"),
        "n_items",
        (F.col("sum_dec").cast("double") / F.col("n_items").cast("double")).alias(
            "avg_qty"
        ),
    ).orderBy("l_suppkey")


_PR_D = 0.85
_PR_ITERS = 3
_PR_SCALE = 6

# One PageRank iteration as SQL, parameterized on the previous-ranks CTE.
# Contributions are rounded to a fixed decimal scale and summed exactly
# (order-independent), matching ext/graph.py's fold bit-for-bit; the
# damping update keeps the identical double operation order, including
# (1.0 - 0.85) computed in IEEE double on both sides.
_PR_STEP = """
{out} AS (
  SELECT n.node,
         (CAST(1.0 AS DOUBLE) - CAST({d} AS DOUBLE))
         + CAST({d} AS DOUBLE) * CAST(COALESCE(s.s, 0) AS DOUBLE) AS rank
  FROM nodes n LEFT JOIN (
    SELECT e.dst AS node,
           SUM(CAST(round(r.rank / o.outdeg, {scale}) AS DECIMAL(28,{scale}))) AS s
    FROM e
    JOIN {prev} r ON e.src = r.node
    JOIN outdeg o ON e.src = o.src
    GROUP BY e.dst
  ) s ON n.node = s.node
)"""


def _pagerank_oracle() -> str:
    steps = ",".join(
        _PR_STEP.format(
            out=f"it{i + 1}",
            prev="r0" if i == 0 else f"it{i}",
            d=_PR_D,
            scale=_PR_SCALE,
        )
        for i in range(_PR_ITERS)
    )
    return f"""
WITH e AS (
  SELECT DISTINCT 'p' || CAST(l_partkey AS VARCHAR) AS src,
                  's' || CAST(l_suppkey AS VARCHAR) AS dst
  FROM lineitem
  UNION
  SELECT DISTINCT 's' || CAST(l_suppkey AS VARCHAR) AS src,
                  'p' || CAST(l_partkey AS VARCHAR) AS dst
  FROM lineitem
), nodes AS (
  SELECT DISTINCT src AS node FROM e UNION SELECT DISTINCT dst FROM e
), outdeg AS (
  SELECT src, COUNT(*) AS outdeg FROM e GROUP BY src
), r0 AS (
  SELECT node, CAST(1.0 AS DOUBLE) AS rank FROM nodes
),{steps}
SELECT node, rank FROM it{_PR_ITERS}
ORDER BY rank DESC, node
LIMIT 20
"""


@query(
    "q_pagerank_parts",
    oracle=_pagerank_oracle(),
    description="PageRank over the bipartite part↔supplier graph "
    f"({_PR_ITERS} iterations, one shuffle each): join-relay Pregel with "
    "decimal-rounded contribution sums so the floating fold is "
    "order-independent and engine-portable; ranks n-normalized, top-20 "
    "hubs. The representative iterative-algorithm surface "
    "(ext/graph.py).",
    bench=True,
)
def q_pagerank_parts(spark, sf_dir):
    from clickbom_spark.ext.graph import pagerank

    (li,) = load(spark, sf_dir, "lineitem")
    p = F.concat(F.lit("p"), F.col("l_partkey").cast("string"))
    s = F.concat(F.lit("s"), F.col("l_suppkey").cast("string"))
    edges = li.select(p.alias("src"), s.alias("dst")).union(
        li.select(s.alias("src"), p.alias("dst"))
    )
    ranks = pagerank(edges, iterations=_PR_ITERS, damping=_PR_D)
    return ranks.orderBy(F.desc("rank"), "node").limit(20)


@query(
    "q_table_checksum",
    oracle=f"""
WITH o AS (
  SELECT {_H15.format(key=(
      "CAST(o_orderkey AS VARCHAR) || '|' || CAST(o_custkey AS VARCHAR)"
      " || '|' || o_orderstatus || '|' || o_orderpriority || '|' ||"
      " CAST(epoch_us(o_orderdate) AS VARCHAR)"
  ))} AS h FROM orders
), c AS (
  SELECT {_H15.format(key=(
      "CAST(c_custkey AS VARCHAR) || '|' || c_name || '|' ||"
      " CAST(c_nationkey AS VARCHAR) || '|' || c_mktsegment"
  ))} AS h FROM customer
)
SELECT 'customer' AS table_name, COUNT(*) AS n_rows,
       CAST(SUM(CAST(h AS DECIMAL(38,0))) AS VARCHAR) AS checksum
FROM c
UNION ALL
SELECT 'orders' AS table_name, COUNT(*) AS n_rows,
       CAST(SUM(CAST(h AS DECIMAL(38,0))) AS VARCHAR) AS checksum
FROM o
ORDER BY table_name
""",
    description="Order-independent content checksum per table (CHECK "
    "TABLE / replica-verification analog): per-row portable md5-derived "
    "60-bit digest over a canonical column encoding, summed exactly as "
    "decimals — commutative, so partition order and parallelism never "
    "change it; any engine can recompute it for cross-system migration "
    "audits.",
)
def q_table_checksum(spark, sf_dir):
    orders, customer = load(spark, sf_dir, "orders", "customer")

    def h15(key):
        return F.conv(F.substring(F.md5(key), 1, 15), 16, 10).cast("long")

    o_key = F.concat_ws(
        "|",
        F.col("o_orderkey").cast("string"),
        F.col("o_custkey").cast("string"),
        F.col("o_orderstatus"),
        F.col("o_orderpriority"),
        epoch_us("o_orderdate").cast("string"),
    )
    c_key = F.concat_ws(
        "|",
        F.col("c_custkey").cast("string"),
        F.col("c_name"),
        F.col("c_nationkey").cast("string"),
        F.col("c_mktsegment"),
    )
    o_sum = orders.select(h15(o_key).alias("h")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("h").cast("decimal(38,0)")).cast("string").alias("checksum"),
    )
    c_sum = customer.select(h15(c_key).alias("h")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("h").cast("decimal(38,0)")).cast("string").alias("checksum"),
    )
    return (
        c_sum.select(F.lit("customer").alias("table_name"), "n_rows", "checksum")
        .unionAll(
            o_sum.select(F.lit("orders").alias("table_name"), "n_rows", "checksum")
        )
        .orderBy("table_name")
    )
