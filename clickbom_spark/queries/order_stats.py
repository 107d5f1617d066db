"""Order-statistic and frontier operators over the distributed rank.

These queries consume :mod:`clickbom_spark.ext.ranks` (value-bucketed
exact global rank — no single-partition window) for the operations a
training-data pipeline runs on whole corpora: deterministic shuffle
order, exact percent_rank/cume_dist, Pareto frontiers, and per-group
modes.  Every shape here stays partition-parallel at 100 TB: the only
unpartitioned windows run over bounded frames (per-bucket counts,
per-day aggregates).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from clickbom_spark.ext.ranks import with_global_rank
from clickbom_spark.queries import dec, load, query

# Odd multiplier => multiplication mod 2^31 is a bijection, so ids
# distinct mod 2^31 keep distinct keys (Knuth's multiplicative constant,
# reduced).  The id is reduced mod 2^31 BEFORE multiplying so the
# product stays < 2^62 — inside int64 for BOTH engines.  Without the
# pre-reduction, huge ids overflow int64, which Spark wraps silently
# while DuckDB promotes to HUGEINT: same SQL text, different answers.
# Ids that collide mod 2^31 are ordered by the doc_id tie-break —
# deterministic, marginally less uniform above 2^31 ids.
_MIX = 2654435761 % 2147483648  # 507452113, odd
_MOD = 2147483648


@query(
    "q_shuffle_order",
    oracle=f"""
SELECT doc_id,
       ROW_NUMBER() OVER (
         ORDER BY ((doc_id % {_MOD}) * {_MIX}) % {_MOD}, doc_id) AS pos
FROM documents
ORDER BY doc_id
""",
    description="Deterministic global training-shuffle order: a "
    "multiplicative-hash key gives every document a pseudo-random but "
    "reproducible position, realized as an EXACT global rank via the "
    "distributed bucketed rank (ext/ranks.py) — the epoch-shuffle a "
    "training pipeline needs, with no single-partition sort and no RNG "
    "state (re-runs and retries produce the identical permutation).",
)
def q_shuffle_order(spark, sf_dir):
    (docs,) = load(spark, sf_dir, "documents")
    keyed = docs.select(
        "doc_id",
        (((F.col("doc_id") % F.lit(_MOD)) * F.lit(_MIX)) % F.lit(_MOD)).alias(
            "_k"
        ),
    )
    return (
        with_global_rank(keyed, ["_k", "doc_id"], rank_col="pos")
        .select("doc_id", "pos")
        .orderBy("doc_id")
    )


@query(
    "q_percent_rank_suppliers",
    oracle="""
SELECT s_suppkey,
       round(PERCENT_RANK() OVER (ORDER BY s_acctbal), 9) AS pr,
       round(CUME_DIST() OVER (ORDER BY s_acctbal), 9) AS cd
FROM supplier
ORDER BY s_suppkey
""",
    description="Exact percent_rank and cume_dist over the whole "
    "relation without a total-order window: unique global positions "
    "from the distributed bucketed rank, then tie-aware rank = "
    "min(pos) and cume_dist = max(pos)/n per value group (the value "
    "window is partitioned, hence parallel).",
)
def q_percent_rank_suppliers(spark, sf_dir):
    (supp,) = load(spark, sf_dir, "supplier")
    pos = with_global_rank(
        supp.select("s_suppkey", "s_acctbal"),
        ["s_acctbal", "s_suppkey"],
        rank_col="_pos",
        total_col="_n",
    )
    wv = Window.partitionBy("s_acctbal")
    n = F.col("_n").cast("double")
    rnk = F.min("_pos").over(wv).cast("double")
    cd = F.max("_pos").over(wv).cast("double")
    # single-row relation: PERCENT_RANK is defined as 0, not 0/0
    pr = F.when(n > 1.0, (rnk - 1.0) / (n - 1.0)).otherwise(F.lit(0.0))
    return pos.select(
        "s_suppkey",
        F.round(pr, 9).alias("pr"),
        F.round(cd / n, 9).alias("cd"),
    ).orderBy("s_suppkey")


@query(
    "q_skyline_orders",
    # Pareto frontier minimizing (day, price): an order day is on the
    # frontier iff its cheapest order is strictly cheaper than every
    # EARLIER day's cheapest.  The scan-sized work is one group-by; the
    # running-min window runs over the per-day aggregate, whose
    # cardinality is the calendar span (bounded), not the table.
    oracle="""
WITH daily AS (
  SELECT DATE_TRUNC('day', o_orderdate) AS day,
         MIN(CAST(o_totalprice AS DECIMAL(18,2))) AS m
  FROM orders GROUP BY day
), sky AS (
  SELECT day, m,
         MIN(m) OVER (ORDER BY day
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
  FROM daily
)
SELECT day, CAST(m AS DOUBLE) AS frontier_price
FROM sky WHERE pm IS NULL OR m < pm
ORDER BY day
""",
    description="Skyline (Pareto frontier) on (order day asc, price "
    "min): dominated days are eliminated by a running min over the "
    "per-day minimum — the skyline operator reduced to one aggregation "
    "over the facts plus a window over the BOUNDED calendar frame.",
)
def q_skyline_orders(spark, sf_dir):
    (orders,) = load(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.date_trunc("day", "o_orderdate").alias("day")
    ).agg(F.min(dec("o_totalprice")).alias("m"))
    # bounded frame: one row per calendar day, not per order
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, -1)
    sky = daily.withColumn("pm", F.min("m").over(w))
    return (
        sky.where(F.col("pm").isNull() | (F.col("m") < F.col("pm")))
        .select("day", F.col("m").cast("double").alias("frontier_price"))
        .orderBy("day")
    )


@query(
    "q_mode_event_type",
    # Mode (most frequent value) per user with a DETERMINISTIC
    # tie-break (count desc, type asc), then the distribution of modal
    # types.  min-of-struct((-count, type)) is the single-shuffle
    # argmin — no per-user sort, no window over raw events.
    oracle="""
WITH c AS (
  SELECT user_id, event_type, COUNT(*) AS cnt
  FROM events GROUP BY user_id, event_type
), r AS (
  SELECT user_id, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY cnt DESC, event_type) AS rn
  FROM c
)
SELECT event_type AS modal_type, COUNT(*) AS n_users
FROM r WHERE rn = 1
GROUP BY modal_type
ORDER BY modal_type
""",
    description="Per-key mode with deterministic tie-break via "
    "min-of-struct argmin (partial-aggregable — two hash shuffles "
    "total, no window over the raw fact), rolled up into the modal-"
    "type distribution.",
)
def q_mode_event_type(spark, sf_dir):
    (events,) = load(spark, sf_dir, "events")
    counts = events.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    modal = counts.groupBy("user_id").agg(
        F.min(
            F.struct((-F.col("cnt")).alias("nc"), F.col("event_type").alias("t"))
        )["t"].alias("modal_type")
    )
    return (
        modal.groupBy("modal_type")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("modal_type")
    )
