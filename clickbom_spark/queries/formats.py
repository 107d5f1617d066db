"""Source-format round-trip queries: parquet → CSV/JSON-lines → read
back with explicit schema → aggregate.

The oracle aggregates the ORIGINAL parquet table, so a green row
proves the text serialization is lossless for every column type that
reaches the aggregate (long, string, double, timestamp) — doubles via
shortest-round-trip text, timestamps at microsecond precision (see
io/formats.py).  This is the engine's CSV/JSON connector contract, the
Spark-side analog of the reference's JSON-in / TSV-out surface
(entrypoint.sh jq ingestion and @tsv insert paths).
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from clickbom_spark.io import formats as FMT
from clickbom_spark.queries import dec, epoch_us, load, query

_TMP = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".fmt_roundtrip",
)


@query(
    "q_csv_roundtrip",
    oracle="""
SELECT o_orderstatus,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price,
       CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers
FROM orders
GROUP BY o_orderstatus
ORDER BY o_orderstatus
""",
    description="CSV connector round-trip: orders → RFC-4180-quoted "
    "CSV (explicit schema, no inference) → read → aggregate; equals "
    "the same aggregate on the original parquet, proving lossless "
    "text serialization of longs, doubles, strings and timestamps.",
)
def q_csv_roundtrip(spark, sf_dir):
    (orders,) = load(spark, sf_dir, "orders")
    path = os.path.join(_TMP, "orders_csv")
    FMT.write_csv(orders, path, n_files=4)
    back = FMT.read_csv(spark, path, orders.schema)
    return (
        back.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(dec("o_totalprice")).cast("double").alias("total_price"),
            F.countDistinct("o_custkey").alias("n_customers"),
        )
        .orderBy("o_orderstatus")
    )


@query(
    "q_json_roundtrip",
    # max(epoch_us(ts)) in the output pins MICROSECOND timestamp
    # fidelity through the text format, not just the numeric columns.
    oracle="""
SELECT event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
       MAX(epoch_us(ts)) AS max_ts_us
FROM events
GROUP BY event_type
ORDER BY event_type
""",
    description="JSON-lines connector round-trip: events → JSONL "
    "(ISO-8601 microsecond timestamps, explicit schema on read) → "
    "aggregate; equals the same aggregate on the original parquet.",
)
def q_json_roundtrip(spark, sf_dir):
    (events,) = load(spark, sf_dir, "events")
    path = os.path.join(_TMP, "events_jsonl")
    FMT.write_jsonl(events, path, n_files=4)
    back = FMT.read_jsonl(spark, path, events.schema)
    return (
        back.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(dec("value")).cast("double").alias("total_value"),
            F.max(epoch_us("ts")).alias("max_ts_us"),
        )
        .orderBy("event_type")
    )


@query(
    "q_orc_roundtrip",
    oracle="""
SELECT event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
       MAX(epoch_us(ts)) AS max_ts_us,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM events
GROUP BY event_type
ORDER BY event_type
""",
    description="ORC connector round-trip: events → ORC stripes → read "
    "back (self-describing schema, TIMESTAMP_NTZ at µs fidelity) → "
    "aggregate; equals the same aggregate on the original parquet — the "
    "warehouse-interchange binary format next to the CSV/JSONL text "
    "connectors.",
)
def q_orc_roundtrip(spark, sf_dir):
    (events,) = load(spark, sf_dir, "events")
    path = os.path.join(_TMP, "events_orc")
    FMT.write_orc(events, path, n_files=4)
    back = FMT.read_orc(spark, path)
    return (
        back.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(dec("value")).cast("double").alias("total_value"),
            F.max(epoch_us("ts")).alias("max_ts_us"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy("event_type")
    )
