"""Scale-technique queries: skew-safe aggregation and sketch aggregates.

The salted aggregation is oracle-checked against the PLAIN group-by SQL
— salting is a physical-distribution technique and must be value-
invisible.  The HLL sketch is approximate by construction (rows-only
driver check; accuracy bounded in tests/test_scale.py).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from clickbom_spark.ext.scale import salted_agg
from clickbom_spark.queries import dec, load, query


@query(
    "q_salted_agg_events",
    oracle="""
SELECT event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events
GROUP BY event_type
ORDER BY event_type
""",
    description="Two-phase salted aggregation for skewed keys — value-"
    "identical to the plain group-by (the oracle IS the plain form).",
)
def q_salted_agg_events(spark, sf_dir):
    (events,) = load(spark, sf_dir, "events")
    out = salted_agg(
        events,
        ["event_type"],
        {"n": ("count", F.lit(1)), "total_value": ("sum", dec("value"))},
        salt_buckets=16,
    )
    return out.select(
        "event_type", "n", F.col("total_value").cast("double").alias("total_value")
    ).orderBy("event_type")


@query(
    "q_approx_distinct",
    oracle=None,  # HLL sketch: engine-specific; accuracy bounded in pytest
    description="approx_count_distinct (HyperLogLog++) — the sketch "
    "aggregate for cardinality at 100 TB; rsd 0.01.",
)
def q_approx_distinct(spark, sf_dir):
    (events,) = load(spark, sf_dir, "events")
    return (
        events.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=0.01).alias("approx_users"),
        )
        .orderBy("event_type")
    )
