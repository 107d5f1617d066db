"""Staged registry wave for round 17 — new operator surface (built
during round 12; the staging pipeline runs waves ahead so every
activation is a zero-risk REGISTRY.update of parity-proven queries).

Same staging workflow as the round-6..16 waves: every query here is
oracle-parity-verified NOW (bit-exact vs DuckDB at sf0.001 and sf0.01
via ``tests/test_staged_r17_parity.py``; ``scripts/strict_parity.py
--staged`` widens the sweep to sf0.1) but held OUT of
:data:`clickbom_spark.queries.REGISTRY` until round-17 activation::

    from clickbom_spark.queries import staged_r17  # noqa: F401
    REGISTRY.update(staged_r17.STAGED_R17)

in ``queries/__init__.py``.

Round-17 themes:

* **Incremental distinct-count matviews** — the round-12 lake IVM
  operators end-to-end: an insert-only HLL code-set matview rolled
  with the change feed (merge == rescan, DuckDB replays the register
  algebra), the exact support-table IVM under update + delete +
  upsert, and a DDL-driven composition (reference ALTER migration +
  ReplacingMergeTree FINAL registration served from one lake).
* **Dialect round-trips for the round-12 escapes-now-compiled** —
  ``SELECT DISTINCT ON`` (via LIMIT 1 BY), the ``numbers()`` table
  function as a zero-filled spine, ``WITH ROLLUP``, and the
  ``lagInFrame/leadInFrame/nth_value`` window family.
* **Corpus text / embedding statistics** — Simpson diversity,
  TTR-by-length-band curves, the pairwise source vocabulary-overlap
  matrix, head-token coverage, per-dimension sign balance.
* **Event / relational profiles** — activity spans, max-gap bands,
  weekday value lift, exact gap percentiles, order-size value
  profiles, brand share by nation, customer-concentration Gini,
  quarter seasonality, orders-per-customer distribution, returns by
  brand, and region→nation revenue rollup shares.

Float determinism policy (same as the registry): exact integer /
decimal aggregates first, then ONE fixed IEEE expression per surfaced
double — identical text on both engines — and ``round(x, 6)`` on
surfaced statistics.  Medians/percentiles are exact over integer
cents (dyadic rationals, cross-engine identical); the HLL estimate
rounds to an integer (absorbing libm ULP drift in its ln).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from clickbom_spark.queries import QuerySpec, load

STAGED_R17: dict[str, QuerySpec] = {}


def staged(name: str, oracle: str | None = None, description: str = "",
           bench: bool = False):
    def deco(fn):
        STAGED_R17[name] = QuerySpec(name, fn, oracle, description, bench)
        return fn

    return deco


_CENTS = "toInt64(round(value * 100))"
_CENTS_DUCK = "CAST(round(value * 100) AS BIGINT)"
_OCENTS_DUCK = "CAST(round(o_totalprice * 100) AS BIGINT)"


# ---------------------------------------------------------------------------
# Lake IVM: the round-12 distinct-count matview operators end-to-end.
# ---------------------------------------------------------------------------


@staged(
    "q_lake_uniq_matview",
    oracle="""
WITH h AS (
  SELECT o_orderstatus AS grp,
         CAST(('0x' || substring(md5(CAST(o_custkey AS VARCHAR)),
                                 1, 15)) AS BIGINT) AS h
  FROM orders WHERE o_custkey IS NOT NULL
), """
    + __import__(
        "clickbom_spark.queries.staged_r13", fromlist=["_HLL_MERGE_DUCK"]
    )._HLL_MERGE_DUCK
    + """
SELECT est.grp AS st, est.uniq_est AS uniq_cust, x.exact_cust
FROM est JOIN (SELECT o_orderstatus AS grp,
                      CAST(count(DISTINCT o_custkey) AS BIGINT)
                        AS exact_cust
               FROM orders GROUP BY 1) x USING (grp)
ORDER BY st
""",
    description="Incremental distinct-count matview end-to-end "
    "(ext/manifest.py maintain_uniq_state, round 12): a lake created "
    "from one third of orders, two insert-only commits adding the "
    "rest, and the (status, code) HLL state rolled forward with the "
    "CHANGE FEED only — never a rescan.  Union of register states is "
    "exact, so the rolled matview finalizes (ext/sketches.py "
    "hll_distinct_from_codes) to the same integers a whole-table "
    "replay produces — which is exactly what the DuckDB oracle "
    "computes, next to the exact twin.",
)
def q_lake_uniq_matview(spark, sf_dir):
    import uuid as _uuid

    from clickbom_spark.ext.manifest import (
        VersionedLake,
        maintain_uniq_state,
        uniq_state_of,
    )
    from clickbom_spark.ext.sketches import hll_distinct_from_codes
    from clickbom_spark.queries.staged import _TMP

    (orders,) = load(spark, sf_dir, "orders")
    base = orders.select(
        "o_orderkey",
        F.col("o_orderstatus").alias("st"),
        F.col("o_custkey").alias("u"),
    )
    tag = _uuid.uuid4().hex[:8]
    path = os.path.join(_TMP, f"uniq_mv_{tag}")
    shutil.rmtree(path, ignore_errors=True)
    try:
        lake = VersionedLake.create(
            spark, path, base.where(F.col("o_orderkey") % 3 == 0),
            n_files=2,
        )
        for rem in (1, 2):
            lake.upsert(base.where(F.col("o_orderkey") % 3 == rem),
                        ["o_orderkey"])
        mat = uniq_state_of(lake.read(0), ["st"], "u")
        for v in range(2):
            mat = maintain_uniq_state(
                lake, mat, v, v + 1, ["st"], ["o_orderkey"], "u"
            )
        est = hll_distinct_from_codes(mat, ["st"])
        exact = lake.read().groupBy("st").agg(
            F.countDistinct("u").cast("long").alias("exact_cust")
        )
        rows = (
            est.join(exact, "st")
            .select("st", F.col("uniq_est").alias("uniq_cust"),
                    "exact_cust")
            .orderBy("st")
            .collect()
        )
    finally:
        shutil.rmtree(path, ignore_errors=True)
    return spark.createDataFrame(
        rows, "st string, uniq_cust bigint, exact_cust bigint"
    ).orderBy("st")


@staged(
    "q_lake_uniq_support_ivm",
    oracle="""
WITH final AS (
  SELECT o_orderstatus AS st,
         CASE WHEN o_orderkey % 10 = 0 THEN 1
              ELSE o_custkey END AS u
  FROM orders WHERE o_orderstatus <> 'P'
  UNION ALL SELECT 'F', 999999901
  UNION ALL SELECT 'O', 999999902)
SELECT st, CAST(count(DISTINCT u) AS BIGINT) AS n_distinct
FROM final GROUP BY st ORDER BY st
""",
    description="Exact distinct-count IVM under retractions "
    "(ext/manifest.py maintain_uniq_support, round 12): an "
    "update (collapsing every 10th key's customer to one value), a "
    "whole-status delete, and an upsert roll the (status, value, "
    "multiplicity) support table forward commit by commit; "
    "uniq_exact_of over the rolled table equals count(DISTINCT) "
    "recomputed on the final snapshot — the DuckDB oracle replays "
    "the same mutation history declaratively.",
)
def q_lake_uniq_support_ivm(spark, sf_dir):
    import uuid as _uuid

    from clickbom_spark.ext.manifest import (
        VersionedLake,
        maintain_uniq_support,
        uniq_exact_of,
        uniq_support_of,
    )
    from clickbom_spark.queries.staged import _TMP

    (orders,) = load(spark, sf_dir, "orders")
    base = orders.select(
        "o_orderkey",
        F.col("o_orderstatus").alias("st"),
        F.col("o_custkey").alias("u"),
    )
    tag = _uuid.uuid4().hex[:8]
    path = os.path.join(_TMP, f"uniq_sup_{tag}")
    shutil.rmtree(path, ignore_errors=True)
    try:
        lake = VersionedLake.create(spark, path, base, n_files=2)
        lake.update(F.col("o_orderkey") % 10 == 0,
                    {"u": F.lit(1).cast("long")})
        lake.delete(F.col("st") == "P")
        lake.upsert(
            spark.createDataFrame(
                [(999999901, "F", 999999901),
                 (999999902, "O", 999999902)],
                "o_orderkey long, st string, u long",
            ),
            ["o_orderkey"],
        )
        mat = uniq_support_of(lake.read(0), ["st"], "u")
        for v in range(3):
            mat = maintain_uniq_support(
                lake, mat, v, v + 1, ["st"], ["o_orderkey"], "u"
            )
        rows = uniq_exact_of(mat, ["st"]).orderBy("st").collect()
    finally:
        shutil.rmtree(path, ignore_errors=True)
    return spark.createDataFrame(
        rows, "st string, n_distinct bigint"
    ).orderBy("st")


@staged(
    "q_lake_ddl_final_alter",
    oracle=f"""
SELECT 'unknown' AS source, CAST(count(*) AS BIGINT) AS n,
       CAST(SUM({_OCENTS_DUCK}
                + CASE WHEN o_orderkey % 4 = 0 THEN 10 ELSE 0 END)
            AS BIGINT) AS cents
FROM orders
""",
    description="The reference's two DDL bridges composed on ONE "
    "lake: a table holding unmerged version duplicates (every 4th "
    "key carries a ver-2 row at +10 cents, the ReplacingMergeTree "
    "pre-merge shape), evolved with the reference's exact ALTER "
    "TABLE ADD COLUMN source migration (apply_alter_ddl — "
    "metadata-only), registered through register_table_ddl "
    "(ReplacingMergeTree(ver) ORDER BY k → FINAL keys), and served "
    "through the shim with `FROM … FINAL` — keep-latest per key, "
    "grouped by the evolved column whose default every pre-ALTER "
    "file surfaces.  The oracle replays the keep-latest arithmetic "
    "directly.",
)
def q_lake_ddl_final_alter(spark, sf_dir):
    import uuid as _uuid

    from clickbom_spark.dialect import (
        apply_alter_ddl,
        register_table_ddl,
        run_clickhouse_sql,
    )
    from clickbom_spark.ext.manifest import VersionedLake
    from clickbom_spark.queries.staged import _TMP

    (orders,) = load(spark, sf_dir, "orders")
    v1 = orders.select(
        F.col("o_orderkey").alias("k"),
        F.lit(1).cast("long").alias("ver"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    v2 = v1.where(F.col("k") % 4 == 0).select(
        "k", F.lit(2).cast("long").alias("ver"),
        (F.col("cents") + 10).alias("cents"),
    )
    tag = _uuid.uuid4().hex[:8]
    path = os.path.join(_TMP, f"ddl_final_{tag}")
    shutil.rmtree(path, ignore_errors=True)
    try:
        lake = VersionedLake.create(
            spark, path, v1.unionByName(v2), n_files=2
        )
        apply_alter_ddl(
            lake,
            "ALTER TABLE db.lake_r17_scd ADD COLUMN source "
            "LowCardinality(String) DEFAULT 'unknown'",
        )
        register_table_ddl(
            "CREATE TABLE lake_r17_scd (k Int64, ver Int64, "
            "cents Int64, source String) "
            "ENGINE = ReplacingMergeTree(ver) ORDER BY k"
        )
        lake.read().createOrReplaceTempView("lake_r17_scd")
        out = run_clickhouse_sql(
            spark,
            "SELECT source, count() AS n, sum(cents) AS cents "
            "FROM lake_r17_scd FINAL GROUP BY source ORDER BY source",
            sf_dir,
        )
        rows = out.select(
            "source",
            F.col("n").cast("long").alias("n"),
            F.col("cents").cast("long").alias("cents"),
        ).collect()
    finally:
        shutil.rmtree(path, ignore_errors=True)
    return spark.createDataFrame(
        rows, "source string, n bigint, cents bigint"
    ).orderBy("source")


# ---------------------------------------------------------------------------
# Dialect round-trips: the round-12 escapes-now-compiled.
# ---------------------------------------------------------------------------

_CH_ROLLUP = """
SELECT o_orderpriority AS pri, o_orderstatus AS st, count() AS n,
       sum(toInt64(round(o_totalprice * 100))) AS cents
FROM orders
GROUP BY o_orderpriority, o_orderstatus WITH ROLLUP
ORDER BY pri, st, n
"""


@staged(
    "q_dialect_rollup",
    oracle=f"""
SELECT o_orderpriority AS pri, o_orderstatus AS st,
       CAST(count(*) AS BIGINT) AS n,
       CAST(SUM({_OCENTS_DUCK}) AS BIGINT) AS cents
FROM orders
GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
ORDER BY pri, st, n
""",
    description="`GROUP BY … WITH ROLLUP` run verbatim through the "
    "shim: the (priority, status) lattice plus the per-priority and "
    "grand-total rows, NULL-keyed like ClickHouse's rollup output — "
    "compiled to Spark's native ROLLUP grouping set (one shuffle, "
    "partial-aggregated).  Exact integer cents throughout.",
)
def q_dialect_rollup(spark, sf_dir):
    from clickbom_spark.dialect import run_clickhouse_sql

    out = run_clickhouse_sql(spark, _CH_ROLLUP, sf_dir)
    return out.select(
        "pri", "st",
        F.col("n").cast("long").alias("n"),
        F.col("cents").cast("long").alias("cents"),
    )


_CH_DISTINCT_ON = """
SELECT DISTINCT ON (user_id) user_id, event_id, event_type,
       toInt64(round(value * 100)) AS cents
FROM events
ORDER BY user_id, event_id
"""


@staged(
    "q_dialect_distinct_on",
    oracle=f"""
SELECT user_id, event_id, event_type, {_CENTS_DUCK} AS cents
FROM (SELECT *, row_number() OVER
        (PARTITION BY user_id ORDER BY event_id) AS rk
      FROM events)
WHERE rk = 1 ORDER BY user_id
""",
    description="`SELECT DISTINCT ON (user_id) … ORDER BY user_id, "
    "event_id` — each user's first event by the unique event id "
    "(round-12 compile via the LIMIT 1 BY window; the form used to "
    "slip through as a bogus ON() function call).  The unique "
    "ordering key makes the surviving row deterministic; the oracle "
    "replays it as a row_number filter.",
)
def q_dialect_distinct_on(spark, sf_dir):
    from clickbom_spark.dialect import run_clickhouse_sql

    out = run_clickhouse_sql(spark, _CH_DISTINCT_ON, sf_dir)
    return out.select(
        "user_id", "event_id", "event_type",
        F.col("cents").cast("long").alias("cents"),
    )


_CH_WINDOW_FRAMES = """
SELECT event_id,
       lagInFrame(toInt64(round(value * 100)))
         OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_c,
       leadInFrame(toInt64(round(value * 100)), 2)
         OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next2_c,
       nth_value(toInt64(round(value * 100)), 2)
         OVER (PARTITION BY user_id ORDER BY ts, event_id) AS second_c
FROM events ORDER BY event_id
"""


@staged(
    "q_dialect_window_frames",
    oracle=f"""
SELECT event_id,
       lag({_CENTS_DUCK}) OVER
         (PARTITION BY user_id ORDER BY ts, event_id) AS prev_c,
       lead({_CENTS_DUCK}, 2) OVER
         (PARTITION BY user_id ORDER BY ts, event_id) AS next2_c,
       nth_value({_CENTS_DUCK}, 2) OVER
         (PARTITION BY user_id ORDER BY ts, event_id) AS second_c
FROM events ORDER BY event_id
""",
    description="ClickHouse's frame-aware window navigation — "
    "lagInFrame / leadInFrame(n) / nth_value — over the per-user "
    "(ts, event_id) ordering, run verbatim through the shim and "
    "replayed with the standard SQL window functions (identical "
    "default frames; the unique tie-break makes RANGE == ROWS).  "
    "Windows partition by user, the naturally-sharded key at scale.",
)
def q_dialect_window_frames(spark, sf_dir):
    from clickbom_spark.dialect import run_clickhouse_sql

    out = run_clickhouse_sql(spark, _CH_WINDOW_FRAMES, sf_dir)
    return out.select(
        "event_id",
        F.col("prev_c").cast("long").alias("prev_c"),
        F.col("next2_c").cast("long").alias("next2_c"),
        F.col("second_c").cast("long").alias("second_c"),
    )


_CH_NUMBERS_SPINE = """
SELECT n.number AS d, count(e.event_id) AS n_events,
       sum(e.cents) AS cents
FROM numbers(1, 30) AS n
LEFT JOIN (
  SELECT toInt64(toDayOfMonth(ts)) AS d, event_id,
         toInt64(round(value * 100)) AS cents
  FROM events WHERE event_type = 'purchase' AND value > 150
) AS e ON n.number = e.d
GROUP BY n.number ORDER BY d
"""


@staged(
    "q_dialect_numbers_spine",
    oracle=f"""
WITH e AS (
  SELECT CAST(day(ts) AS BIGINT) AS d, event_id,
         {_CENTS_DUCK} AS cents
  FROM events WHERE event_type = 'purchase' AND value > 150)
SELECT CAST(x AS BIGINT) AS d,
       CAST(count(e.event_id) AS BIGINT) AS n_events,
       CAST(sum(e.cents) AS BIGINT) AS cents
FROM range(1, 31) t(x) LEFT JOIN e ON x = e.d
GROUP BY 1 ORDER BY d
""",
    description="The `numbers(offset, count)` table function as a "
    "dense calendar spine (round-12 compile → a range() subquery "
    "exposing ClickHouse's `number` column; the call used to die as "
    "an unresolved Spark TVF): a LEFT JOIN zero-fills days with no "
    "qualifying purchases — the WITH-FILL-free gap-fill idiom.  "
    "NULL-sum days surface as NULL cents on both engines.",
)
def q_dialect_numbers_spine(spark, sf_dir):
    from clickbom_spark.dialect import run_clickhouse_sql

    out = run_clickhouse_sql(spark, _CH_NUMBERS_SPINE, sf_dir)
    return out.select(
        F.col("d").cast("long").alias("d"),
        F.col("n_events").cast("long").alias("n_events"),
        F.col("cents").cast("long").alias("cents"),
    )


# ---------------------------------------------------------------------------
# Corpus text / embedding statistics.  One space-split tokenization,
# exact integer counts, one IEEE division per surfaced statistic,
# round(6); embedding sign tests are exact float comparisons.
# ---------------------------------------------------------------------------


@staged(
    "q_simpson_diversity",
    oracle="""
WITH w AS (
  SELECT source, unnest(string_split(text, ' ')) AS w
  FROM documents WHERE text IS NOT NULL),
     f AS (SELECT source, w, CAST(count(*) AS BIGINT) AS c
           FROM w GROUP BY 1, 2),
     a AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n,
                  CAST(SUM(c * (c - 1)) AS BIGINT) AS s2,
                  CAST(count(*) AS BIGINT) AS vocab
           FROM f GROUP BY 1)
SELECT source, n, vocab,
       round(CAST(s2 AS DOUBLE) / CAST(n * (n - 1) AS DOUBLE), 6)
         AS simpson_d
FROM a ORDER BY source
""",
    description="Simpson's diversity index per source: D = "
    "sum(c*(c-1)) / (N*(N-1)) over the token frequency spectrum — "
    "the probability two tokens drawn without replacement coincide "
    "(the companion of Yule's K in the r16 wave, and the u-statistic "
    "behind collision-based cardinality tests).  Exact integer power "
    "sums off one posting aggregate; one IEEE division, round(6).",
)
def q_simpson_diversity(spark, sf_dir):
    (docs,) = load(spark, sf_dir, "documents")
    f = (
        docs.where(F.col("text").isNotNull())
        .select("source", F.explode(F.split("text", " ")).alias("w"))
        .groupBy("source", "w")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    a = f.groupBy("source").agg(
        F.sum("c").cast("long").alias("n"),
        F.sum(F.col("c") * (F.col("c") - 1)).cast("long").alias("s2"),
        F.count(F.lit(1)).cast("long").alias("vocab"),
    )
    return a.select(
        "source", "n", "vocab",
        F.round(
            F.col("s2").cast("double")
            / (F.col("n") * (F.col("n") - 1)).cast("double"),
            6,
        ).alias("simpson_d"),
    ).orderBy("source")


@staged(
    "q_doc_vocab_band_ttr",
    oracle="""
WITH d AS (
  SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS n,
         CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
           AS v
  FROM documents WHERE text IS NOT NULL)
SELECT CAST(n // 20 AS BIGINT) AS band,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(SUM(v) AS BIGINT) AS sum_distinct,
       CAST(SUM(n) AS BIGINT) AS sum_tokens,
       round(CAST(SUM(v) AS DOUBLE) / SUM(n), 6) AS band_ttr
FROM d GROUP BY 1 ORDER BY band
""",
    description="Type-token ratio by document-length band: TTR falls "
    "with length (Herdan's law), so corpus-level TTR comparisons "
    "mislead — the 20-token bands give the length-controlled curve "
    "quality filters should threshold against.  Per-doc token and "
    "distinct-token counts are single array ops; the aggregated "
    "band TTR is sum(distinct)/sum(tokens) — exact integers, one "
    "division, round(6).",
)
def q_doc_vocab_band_ttr(spark, sf_dir):
    (docs,) = load(spark, sf_dir, "documents")
    d = docs.where(F.col("text").isNotNull()).select(
        F.size(F.split("text", " ")).cast("long").alias("n"),
        F.size(F.array_distinct(F.split("text", " ")))
        .cast("long")
        .alias("v"),
    )
    return (
        d.groupBy(F.expr("n DIV 20").alias("band"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("v").cast("long").alias("sum_distinct"),
            F.sum("n").cast("long").alias("sum_tokens"),
        )
        .select(
            "band", "n_docs", "sum_distinct", "sum_tokens",
            F.round(
                F.col("sum_distinct").cast("double") / F.col("sum_tokens"),
                6,
            ).alias("band_ttr"),
        )
        .orderBy("band")
    )


@staged(
    "q_source_overlap_matrix",
    oracle="""
WITH v AS (
  SELECT DISTINCT source, unnest(string_split(text, ' ')) AS w
  FROM documents WHERE text IS NOT NULL),
     sz AS (SELECT source, CAST(count(*) AS BIGINT) AS nv
            FROM v GROUP BY 1),
     inter AS (
  SELECT a.source AS s1, b.source AS s2,
         CAST(count(*) AS BIGINT) AS inter
  FROM v a JOIN v b ON a.w = b.w AND a.source < b.source
  GROUP BY 1, 2)
SELECT i.s1, i.s2, i.inter,
       round(CAST(i.inter AS DOUBLE)
             / CAST(z1.nv + z2.nv - i.inter AS DOUBLE), 6) AS jaccard
FROM inter i
JOIN sz z1 ON i.s1 = z1.source
JOIN sz z2 ON i.s2 = z2.source
ORDER BY s1, s2
""",
    description="Pairwise source vocabulary-overlap matrix: Jaccard "
    "similarity of the 20 sources' vocabularies (190 pairs), the "
    "corpus-mixing audit behind dedup-across-sources decisions.  "
    "Candidate generation is a token-keyed posting equi-join over "
    "the deduplicated (source, token) incidences — pair counts fall "
    "out of the postings, never a source×source×vocab product; "
    "marginals broadcast.  Exact counts, one division, round(6).",
)
def q_source_overlap_matrix(spark, sf_dir):
    (docs,) = load(spark, sf_dir, "documents")
    v = (
        docs.where(F.col("text").isNotNull())
        .select("source", F.explode(F.split("text", " ")).alias("w"))
        .distinct()
    )
    sz = v.groupBy("source").agg(F.count(F.lit(1)).cast("long").alias("nv"))
    a = v.alias("a")
    b = v.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.w") == F.col("b.w"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("s1"), F.col("b.source").alias("s2")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("inter"))
    )
    z1 = sz.select(F.col("source").alias("s1"), F.col("nv").alias("nv1"))
    z2 = sz.select(F.col("source").alias("s2"), F.col("nv").alias("nv2"))
    return (
        inter.join(F.broadcast(z1), "s1")
        .join(F.broadcast(z2), "s2")
        .select(
            "s1", "s2", "inter",
            F.round(
                F.col("inter").cast("double")
                / (F.col("nv1") + F.col("nv2") - F.col("inter"))
                .cast("double"),
                6,
            ).alias("jaccard"),
        )
        .orderBy("s1", "s2")
    )


@staged(
    "q_common_token_share",
    oracle="""
WITH w AS (
  SELECT source, unnest(string_split(text, ' ')) AS w
  FROM documents WHERE text IS NOT NULL),
     corpus AS (SELECT w, CAST(count(*) AS BIGINT) AS c
                FROM w GROUP BY 1),
     ctop AS (
  SELECT w FROM (SELECT w, row_number() OVER
                   (ORDER BY c DESC, w ASC) AS rk FROM corpus)
  WHERE rk <= 10)
SELECT source, CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(SUM(CASE WHEN ctop.w IS NOT NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS head_tokens,
       round(CAST(SUM(CASE WHEN ctop.w IS NOT NULL THEN 1 ELSE 0 END)
                  AS DOUBLE) / count(*), 6) AS head_share
FROM w LEFT JOIN ctop ON w.w = ctop.w
GROUP BY source ORDER BY source
""",
    description="Head-token coverage per source: the share of token "
    "occurrences falling in the corpus-wide top-10 vocabulary "
    "(deterministic count-then-name ranking) — low coverage flags "
    "sources whose usage diverges from the corpus head even when "
    "their vocabularies overlap (the occurrence-weighted complement "
    "of q_top_token_agreement's set view).  The 10-row head "
    "broadcast-joins against the token stream; exact counts, one "
    "division, round(6).",
)
def q_common_token_share(spark, sf_dir):
    (docs,) = load(spark, sf_dir, "documents")
    w = docs.where(F.col("text").isNotNull()).select(
        "source", F.explode(F.split("text", " ")).alias("w")
    )
    corpus = w.groupBy("w").agg(F.count(F.lit(1)).cast("long").alias("c"))
    ctop = (
        corpus.withColumn(
            "rk", F.row_number().over(W.orderBy(F.desc("c"), F.asc("w")))
        )
        .where(F.col("rk") <= 10)
        .select("w", F.lit(1).alias("hit"))
    )
    return (
        w.join(F.broadcast(ctop), "w", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.sum(F.coalesce(F.col("hit"), F.lit(0)))
            .cast("long")
            .alias("head_tokens"),
        )
        .select(
            "source", "n_tokens", "head_tokens",
            F.round(
                F.col("head_tokens").cast("double") / F.col("n_tokens"), 6
            ).alias("head_share"),
        )
        .orderBy("source")
    )


@staged(
    "q_emb_dim_sign_balance",
    oracle="""
WITH q AS (
  SELECT u.pos AS dim, CAST(u.x AS DOUBLE) AS x
  FROM embeddings,
       LATERAL (SELECT generate_subscripts(embedding, 1) AS pos,
                       unnest(embedding) AS x) u)
SELECT CAST(dim AS BIGINT) AS dim, CAST(count(*) AS BIGINT) AS n,
       CAST(SUM(CASE WHEN x > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_pos,
       CAST(SUM(CASE WHEN x = 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_zero,
       round(CAST(SUM(CASE WHEN x > 0 THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*), 6) AS pos_share
FROM q GROUP BY 1 ORDER BY dim
""",
    description="Per-dimension sign balance of the embedding space: "
    "positive share and exact-zero count for each of the 64 "
    "dimensions — a skewed dimension degrades sign-bit LSH (the "
    "r16 hypercube audit's per-axis drill-down) and flags dead or "
    "biased units.  Sign tests are exact float comparisons (no "
    "arithmetic); one posexplode feeding a 64-group hash aggregate.",
)
def q_emb_dim_sign_balance(spark, sf_dir):
    (emb,) = load(spark, sf_dir, "embeddings")
    q = emb.select(F.posexplode("embedding").alias("pos", "x")).select(
        (F.col("pos") + 1).cast("long").alias("dim"), "x"
    )
    return (
        q.groupBy("dim")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.when(F.col("x") > 0, 1).otherwise(0))
            .cast("long")
            .alias("n_pos"),
            F.sum(F.when(F.col("x") == 0, 1).otherwise(0))
            .cast("long")
            .alias("n_zero"),
        )
        .select(
            "dim", "n", "n_pos", "n_zero",
            F.round(F.col("n_pos").cast("double") / F.col("n"), 6)
            .alias("pos_share"),
        )
        .orderBy("dim")
    )


# ---------------------------------------------------------------------------
# Event-stream profiles.  Exact integer/dyadic arithmetic end-to-end;
# windows partition by user; percentiles stick to dyadic fractions
# (0.25/0.5/0.75 — cross-engine-exact interpolation weights).
# ---------------------------------------------------------------------------


@staged(
    "q_user_activity_span",
    oracle="""
WITH u AS (
  SELECT user_id, CAST(count(DISTINCT day(ts)) AS BIGINT)
           AS active_days
  FROM events GROUP BY 1)
SELECT active_days, CAST(count(*) AS BIGINT) AS n_users
FROM u GROUP BY 1 ORDER BY active_days
""",
    description="User activity-span distribution: how many of the 30 "
    "corpus days each user was active, histogrammed — the engagement "
    "curve behind retention cohorts.  Two hash aggregates (per-user "
    "distinct days, then the bounded 1..30 histogram), both "
    "map-side combinable.",
)
def q_user_activity_span(spark, sf_dir):
    (events,) = load(spark, sf_dir, "events")
    u = events.groupBy("user_id").agg(
        F.countDistinct(F.dayofmonth("ts")).cast("long").alias("active_days")
    )
    return (
        u.groupBy("active_days")
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
        .orderBy("active_days")
    )


@staged(
    "q_user_inactivity_gaps",
    oracle="""
WITH g AS (
  SELECT user_id,
         (epoch_us(ts) - lag(epoch_us(ts)) OVER
            (PARTITION BY user_id ORDER BY ts, event_id))
           // 1000000 AS gap_s
  FROM events),
     mx AS (
  SELECT user_id, CAST(max(gap_s) AS BIGINT) AS max_gap
  FROM g WHERE gap_s IS NOT NULL GROUP BY 1)
SELECT CAST(CASE WHEN max_gap = 0 THEN 0
            ELSE length(bin(max_gap)) END AS BIGINT) AS band,
       CAST(count(*) AS BIGINT) AS n_users
FROM mx GROUP BY 1 ORDER BY band
""",
    description="Churn-risk bands: each user's LONGEST inactivity "
    "gap (seconds, from the per-user (ts, event_id) lag window) "
    "dropped into floor(log2) bands via binary-string length — the "
    "r16 per-event gap histogram collapsed to the per-user maximum "
    "that drives re-engagement triggers.  Single-event users have "
    "no gap and are excluded (documented).",
)
def q_user_inactivity_gaps(spark, sf_dir):
    from clickbom_spark.queries import epoch_us

    (events,) = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    g = events.select(
        "user_id",
        (epoch_us("ts") - F.lag(epoch_us("ts")).over(w)).alias("gap_us"),
    ).where(F.col("gap_us").isNotNull())
    mx = g.groupBy("user_id").agg(
        F.max(F.expr("gap_us DIV 1000000")).cast("long").alias("max_gap")
    )
    band = F.when(F.col("max_gap") == 0, F.lit(0)).otherwise(
        F.length(F.conv(F.col("max_gap").cast("string"), 10, 2))
    )
    return (
        mx.select(band.cast("long").alias("band"))
        .groupBy("band")
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
        .orderBy("band")
    )


@staged(
    "q_weekday_value_lift",
    oracle=f"""
WITH c AS (
  SELECT event_type,
         CASE WHEN isodow(ts) <= 5 THEN 1 ELSE 0 END AS is_wd,
         {_CENTS_DUCK} AS cents
  FROM events)
SELECT event_type,
       quantile_cont(CASE WHEN is_wd = 1 THEN cents END, 0.5)
         AS wd_median,
       quantile_cont(CASE WHEN is_wd = 0 THEN cents END, 0.5)
         AS we_median,
       round(quantile_cont(CASE WHEN is_wd = 1 THEN cents END, 0.5)
             / quantile_cont(CASE WHEN is_wd = 0 THEN cents END, 0.5),
             6) AS lift
FROM c GROUP BY 1 ORDER BY event_type
""",
    description="Weekday-vs-weekend value lift per event type: exact "
    "medians of integer cents on the two day classes (ISO Monday=1 "
    "weekday convention shared with the r14 heatmap) and their "
    "ratio — the day-mix control for any revenue comparison.  "
    "Medians of integers are dyadic rationals (cross-engine exact); "
    "one division, round(6).",
)
def q_weekday_value_lift(spark, sf_dir):
    (events,) = load(spark, sf_dir, "events")
    c = events.select(
        "event_type",
        F.when(((F.dayofweek("ts") + 5) % 7) + 1 <= 5, 1)
        .otherwise(0)
        .alias("is_wd"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    wd = F.expr("percentile(CASE WHEN is_wd = 1 THEN cents END, 0.5)")
    we = F.expr("percentile(CASE WHEN is_wd = 0 THEN cents END, 0.5)")
    return (
        c.groupBy("event_type")
        .agg(
            wd.alias("wd_median"),
            we.alias("we_median"),
        )
        .select(
            "event_type", "wd_median", "we_median",
            F.round(F.col("wd_median") / F.col("we_median"), 6)
            .alias("lift"),
        )
        .orderBy("event_type")
    )


@staged(
    "q_event_gap_percentiles_by_type",
    oracle="""
WITH g AS (
  SELECT event_type,
         (epoch_us(ts) - lag(epoch_us(ts)) OVER
            (PARTITION BY user_id ORDER BY ts, event_id))
           // 1000000 AS gap_s
  FROM events)
SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       quantile_cont(gap_s, 0.25) AS p25,
       quantile_cont(gap_s, 0.5) AS p50,
       quantile_cont(gap_s, 0.75) AS p75,
       CAST(max(gap_s) AS BIGINT) AS max_gap
FROM g WHERE gap_s IS NOT NULL
GROUP BY 1 ORDER BY event_type
""",
    description="Inter-event gap quartiles per type (the exact "
    "companion of the r16 log2 band histogram): gaps are integer "
    "seconds off the per-user (ts, event_id) lag window, and the "
    "quartiles use DYADIC interpolation weights (0.25/0.5/0.75) so "
    "the interpolated values are exactly representable and "
    "cross-engine identical — p90/p99-style weights would not be.",
)
def q_event_gap_percentiles_by_type(spark, sf_dir):
    from clickbom_spark.queries import epoch_us

    (events,) = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    g = events.select(
        "event_type",
        (epoch_us("ts") - F.lag(epoch_us("ts")).over(w)).alias("gap_us"),
    ).where(F.col("gap_us").isNotNull()).select(
        "event_type", F.expr("gap_us DIV 1000000").alias("gap_s")
    )
    return (
        g.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.expr("percentile(gap_s, 0.25)").alias("p25"),
            F.expr("percentile(gap_s, 0.5)").alias("p50"),
            F.expr("percentile(gap_s, 0.75)").alias("p75"),
            F.max("gap_s").cast("long").alias("max_gap"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Relational profiles.  Revenue in exact integer cents or the
# registry decimal pattern; rank windows only over bounded domains
# (brands per nation, quarters, line-count bands).
# ---------------------------------------------------------------------------


@staged(
    "q_order_size_value_profile",
    oracle=f"""
WITH o AS (
  SELECT l_orderkey, CAST(count(*) AS BIGINT) AS n_lines,
         CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT))
              AS BIGINT) AS cents
  FROM lineitem GROUP BY 1)
SELECT n_lines, CAST(count(*) AS BIGINT) AS n_orders,
       quantile_cont(cents, 0.5) AS median_cents,
       round(CAST(SUM(cents) AS DOUBLE) / count(*), 6) AS mean_cents
FROM o GROUP BY 1 ORDER BY n_lines
""",
    description="Order-size value profile: per line-count (the "
    "1..7 TPC-H basket sizes) the order count, exact median order "
    "value, and mean — the basket-size economics the line-count "
    "distribution alone hides.  Two hash aggregates; medians of "
    "integer cents are engine-exact; one division, round(6).",
)
def q_order_size_value_profile(spark, sf_dir):
    (lineitem,) = load(spark, sf_dir, "lineitem")
    o = lineitem.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_lines"),
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("long"))
        .cast("long")
        .alias("cents"),
    )
    return (
        o.groupBy("n_lines")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.expr("percentile(cents, 0.5)").alias("median_cents"),
            F.sum("cents").cast("long").alias("_sc"),
        )
        .select(
            "n_lines", "n_orders", "median_cents",
            F.round(F.col("_sc").cast("double") / F.col("n_orders"), 6)
            .alias("mean_cents"),
        )
        .orderBy("n_lines")
    )


@staged(
    "q_brand_share_by_nation",
    oracle="""
WITH b AS (
  SELECT n_name AS nation, p_brand AS brand,
         CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT))
              AS BIGINT) AS cents
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  GROUP BY 1, 2),
     tot AS (SELECT nation, CAST(SUM(cents) AS BIGINT) AS total
             FROM b GROUP BY 1),
     rk AS (
  SELECT b.nation, b.brand, b.cents, tot.total,
         row_number() OVER (PARTITION BY b.nation
                            ORDER BY b.cents DESC, b.brand ASC) AS rk
  FROM b JOIN tot USING (nation))
SELECT nation, brand AS top_brand, cents,
       round(CAST(cents AS DOUBLE) / total, 6) AS share
FROM rk WHERE rk = 1 ORDER BY nation
""",
    description="Leading brand per supplier nation with its revenue "
    "share: the (nation, brand) rollup is one fact-scan aggregate "
    "over the 25x25 bounded domain, the per-nation leader a rank "
    "window over at most 25 rows with a total (cents, brand) "
    "tie-break.  Exact integer cents; one division, round(6).",
)
def q_brand_share_by_nation(spark, sf_dir):
    lineitem, part, supplier, nation = load(
        spark, sf_dir, "lineitem", "part", "supplier", "nation"
    )
    b = (
        lineitem.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            F.broadcast(nation),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .groupBy(
            F.col("n_name").alias("nation"), F.col("p_brand").alias("brand")
        )
        .agg(
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long"))
            .cast("long")
            .alias("cents")
        )
    )
    tot = b.groupBy("nation").agg(F.sum("cents").cast("long").alias("total"))
    rk = (
        b.join(F.broadcast(tot), "nation")
        .withColumn(
            "rk",
            F.row_number().over(
                W.partitionBy("nation").orderBy(
                    F.desc("cents"), F.asc("brand")
                )
            ),
        )
        .where(F.col("rk") == 1)
    )
    return rk.select(
        "nation",
        F.col("brand").alias("top_brand"),
        "cents",
        F.round(F.col("cents").cast("double") / F.col("total"), 6)
        .alias("share"),
    ).orderBy("nation")


@staged(
    "q_ltv_log2_bands",
    oracle="""
WITH ltv AS (
  SELECT c_mktsegment AS segment, o_custkey,
         CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
              AS BIGINT) AS cents
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY 1, 2),
     seg AS (SELECT segment, CAST(SUM(cents) AS BIGINT) AS total
             FROM ltv GROUP BY 1)
SELECT ltv.segment,
       CAST(length(bin(ltv.cents)) - 1 AS BIGINT) AS band,
       CAST(count(*) AS BIGINT) AS n_customers,
       CAST(SUM(ltv.cents) AS BIGINT) AS cents,
       round(CAST(SUM(ltv.cents) AS DOUBLE) / max(seg.total), 6)
         AS revenue_share
FROM ltv JOIN seg USING (segment)
GROUP BY 1, 2 ORDER BY segment, band
""",
    description="Customer lifetime-value concentration per segment "
    "WITHOUT a per-customer ranking window: LTV cents drop into "
    "floor(log2) bands (binary-string length — no libm), and each "
    "band reports its customer count and revenue share of the "
    "segment — the scale-safe banded view of the whale curve.  "
    "Exact integers; one division per band, round(6).",
)
def q_ltv_log2_bands(spark, sf_dir):
    orders, customer = load(spark, sf_dir, "orders", "customer")
    ltv = (
        orders.join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(
            F.col("c_mktsegment").alias("segment"), F.col("o_custkey")
        )
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            .cast("long")
            .alias("cents")
        )
    )
    seg = ltv.groupBy("segment").agg(
        F.sum("cents").cast("long").alias("total")
    )
    band = (
        F.length(F.conv(F.col("cents").cast("string"), 10, 2)) - 1
    ).cast("long")
    return (
        ltv.join(F.broadcast(seg), "segment")
        .groupBy("segment", band.alias("band"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_customers"),
            F.sum("cents").cast("long").alias("cents"),
            F.max("total").alias("_tot"),
        )
        .select(
            "segment", "band", "n_customers", "cents",
            F.round(F.col("cents").cast("double") / F.col("_tot"), 6)
            .alias("revenue_share"),
        )
        .orderBy("segment", "band")
    )


@staged(
    "q_quarter_seasonality",
    oracle=f"""
WITH q AS (
  SELECT o_orderpriority AS pri,
         CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
         CAST(SUM({_OCENTS_DUCK}) AS BIGINT) AS cents
  FROM orders GROUP BY 1, 2),
     tot AS (SELECT pri, CAST(SUM(cents) AS BIGINT) AS total
             FROM q GROUP BY 1)
SELECT q.pri, q.qtr, q.cents,
       round(CAST(q.cents AS DOUBLE) / tot.total, 6) AS share
FROM q JOIN tot USING (pri) ORDER BY pri, qtr
""",
    description="Quarter-of-year seasonality per priority: each "
    "quarter's share of the priority's total order value — the "
    "seasonal mix underneath any YoY growth claim.  One hash "
    "aggregate over the bounded 5x4 grid plus a broadcast of the "
    "5-row totals; exact cents, one division, round(6).",
)
def q_quarter_seasonality(spark, sf_dir):
    (orders,) = load(spark, sf_dir, "orders")
    q = orders.groupBy(
        F.col("o_orderpriority").alias("pri"),
        F.quarter("o_orderdate").cast("long").alias("qtr"),
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("cents")
    )
    tot = q.groupBy("pri").agg(F.sum("cents").cast("long").alias("total"))
    return (
        q.join(F.broadcast(tot), "pri")
        .select(
            "pri", "qtr", "cents",
            F.round(F.col("cents").cast("double") / F.col("total"), 6)
            .alias("share"),
        )
        .orderBy("pri", "qtr")
    )


@staged(
    "q_orders_per_customer_distribution",
    oracle="""
WITH c AS (
  SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders
  FROM orders GROUP BY 1),
     tot AS (SELECT CAST(count(*) AS BIGINT) AS n_cust FROM c)
SELECT n_orders, CAST(count(*) AS BIGINT) AS n_customers,
       round(CAST(count(*) AS DOUBLE) / max(tot.n_cust), 6) AS share
FROM c, tot GROUP BY 1 ORDER BY n_orders
""",
    description="Orders-per-customer degree distribution: the "
    "count-of-counts histogram over active customers (the "
    "relational twin of the token frequency-of-frequencies behind "
    "Good-Turing) with each count's share of the active base.  Two "
    "hash aggregates plus a 1-row total broadcast; exact counts, "
    "one division, round(6).",
)
def q_orders_per_customer_distribution(spark, sf_dir):
    (orders,) = load(spark, sf_dir, "orders")
    c = orders.groupBy("o_custkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders")
    )
    tot = c.agg(F.count(F.lit(1)).cast("long").alias("n_cust"))
    return (
        c.groupBy("n_orders")
        .agg(F.count(F.lit(1)).cast("long").alias("n_customers"))
        .crossJoin(F.broadcast(tot))
        .select(
            "n_orders", "n_customers",
            F.round(
                F.col("n_customers").cast("double") / F.col("n_cust"), 6
            ).alias("share"),
        )
        .orderBy("n_orders")
    )


@staged(
    "q_returns_by_brand",
    oracle="""
WITH b AS (
  SELECT p_brand AS brand, CAST(count(*) AS BIGINT) AS n_lines,
         CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_returned,
         CAST(SUM(CASE WHEN l_returnflag = 'R'
                  THEN CAST(round(l_extendedprice * 100) AS BIGINT)
                  ELSE 0 END) AS BIGINT) AS returned_cents
  FROM lineitem JOIN part ON l_partkey = p_partkey
  GROUP BY 1)
SELECT brand, n_lines, n_returned, returned_cents,
       round(CAST(n_returned AS DOUBLE) / n_lines, 6) AS return_rate
FROM b ORDER BY brand
""",
    description="Return rate and returned revenue per brand: the "
    "brand-level quality signal (the r14 monthly returns-impact "
    "view pivoted onto the product axis).  One fact-scan aggregate "
    "over the 25-brand domain with conditional integer sums; one "
    "division, round(6).",
)
def q_returns_by_brand(spark, sf_dir):
    lineitem, part = load(spark, sf_dir, "lineitem", "part")
    b = (
        lineitem.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0))
            .cast("long")
            .alias("n_returned"),
            F.sum(
                F.when(
                    F.col("l_returnflag") == "R",
                    F.round(F.col("l_extendedprice") * 100).cast("long"),
                ).otherwise(0)
            ).cast("long").alias("returned_cents"),
        )
    )
    return b.select(
        "brand", "n_lines", "n_returned", "returned_cents",
        F.round(F.col("n_returned").cast("double") / F.col("n_lines"), 6)
        .alias("return_rate"),
    ).orderBy("brand")


@staged(
    "q_nation_region_rollup_share",
    oracle="""
WITH n AS (
  SELECT r_name AS region, n_name AS nation,
         CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT))
              AS BIGINT) AS cents
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  GROUP BY 1, 2),
     r AS (SELECT region, CAST(SUM(cents) AS BIGINT) AS total
           FROM n GROUP BY 1)
SELECT n.region, n.nation, n.cents,
       round(CAST(n.cents AS DOUBLE) / r.total, 6) AS region_share
FROM n JOIN r USING (region) ORDER BY region, nation
""",
    description="Region→nation revenue rollup with within-region "
    "shares: the hierarchical drill-down view (region totals are "
    "the nations' parent level) computed as one fact-scan aggregate "
    "over the bounded 5x25 geography plus a 5-row total broadcast — "
    "never a rollup re-scan.  Exact cents; one division, round(6).",
)
def q_nation_region_rollup_share(spark, sf_dir):
    lineitem, supplier, nation, region = load(
        spark, sf_dir, "lineitem", "supplier", "nation", "region"
    )
    n = (
        lineitem.join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            F.broadcast(nation),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(region),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .groupBy(
            F.col("r_name").alias("region"), F.col("n_name").alias("nation")
        )
        .agg(
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long"))
            .cast("long")
            .alias("cents")
        )
    )
    r = n.groupBy("region").agg(F.sum("cents").cast("long").alias("total"))
    return (
        n.join(F.broadcast(r), "region")
        .select(
            "region", "nation", "cents",
            F.round(F.col("cents").cast("double") / F.col("total"), 6)
            .alias("region_share"),
        )
        .orderBy("region", "nation")
    )
