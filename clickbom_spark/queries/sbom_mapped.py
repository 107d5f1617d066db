"""SBOM operator primitives, re-expressed over the oracle corpus.

The driver's correctness gate runs only against the synthetic tables
(region..embeddings), so each SBOM-domain operator family from
SURVEY.md §2 is declared here as the same Spark primitive applied to
those tables; the SBOM-domain behavior itself is golden-tested against
fixtures in tests/test_sbom_ops.py.

Mapping:
- P7/P9 provenance coalesce  → q_coalesce_fallback (nullif+coalesce chain)
- P1/P2 explode projection   → q_explode_words (array explode + project)
- J1 broadcast lookup+default→ q_broadcast_default_lookup
- P5/P6 glob filters         → q_glob_filter_sources
- F1 sanitizer               → q_sanitize_normalize (regexp_replace chain)
"""

from __future__ import annotations

from pyspark.sql import functions as F

from clickbom_spark.queries import load, query


@query(
    "q_coalesce_fallback",
    oracle="""
SELECT COALESCE(NULLIF(trim(lang), ''), NULLIF(source, ''), 'unknown') AS label,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM documents
GROUP BY 1
ORDER BY label
""",
    description="The jq `//` fallback-chain primitive (P7/P9 provenance, "
    "P1 license fallback): nullif+coalesce with sentinel default.",
)
def q_coalesce_fallback(spark, sf_dir):
    (docs,) = load(spark, sf_dir, "documents")
    label = F.coalesce(
        F.nullif(F.trim(F.col("lang")), F.lit("")),
        F.nullif(F.col("source"), F.lit("")),
        F.lit("unknown"),
    )
    return (
        docs.groupBy(label.alias("label"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
        .orderBy("label")
    )


@query(
    "q_explode_words",
    oracle="""
SELECT word, COUNT(*) AS n_occurrences, COUNT(DISTINCT doc_id) AS n_docs
FROM (SELECT doc_id, UNNEST(string_split(text, ' ')) AS word FROM documents) t
WHERE word <> ''
GROUP BY word
ORDER BY n_occurrences DESC, word
LIMIT 20
""",
    description="Array explode + projection — the components[]/packages[] "
    "explosion primitive (P1/P2) over document tokens.",
    bench=True,
)
def q_explode_words(spark, sf_dir):
    (docs,) = load(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .orderBy(F.desc("n_occurrences"), "word")
        .limit(20)
    )


@query(
    "q_broadcast_default_lookup",
    oracle="""
SELECT COALESCE(n.n_name, 'unknown') AS nation_label,
       COUNT(*) AS n_customers,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
FROM customer c
LEFT JOIN (SELECT * FROM nation WHERE n_regionkey < 2) n
  ON c.c_nationkey = n.n_nationkey
GROUP BY 1
ORDER BY nation_label
""",
    description="J1 license-map pattern: broadcast left join against a "
    "small dimension with 'unknown' default on miss.",
)
def q_broadcast_default_lookup(spark, sf_dir):
    cust, nation = load(spark, sf_dir, "customer", "nation")
    dim = nation.where(F.col("n_regionkey") < 2)
    return (
        cust.join(
            F.broadcast(dim), F.col("c_nationkey") == F.col("n_nationkey"), "left"
        )
        .groupBy(F.coalesce(F.col("n_name"), F.lit("unknown")).alias("nation_label"))
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_bal"),
        )
        .orderBy("nation_label")
    )


@query(
    "q_glob_filter_sources",
    oracle="""
SELECT source, COUNT(*) AS n_docs
FROM documents
WHERE regexp_matches(source, '^src.*$') AND NOT regexp_matches(source, '^src1$')
GROUP BY source
ORDER BY source
""",
    description="P5/P6 include/exclude glob filters (glob → anchored "
    "regex, exclude wins) over document sources.",
)
def q_glob_filter_sources(spark, sf_dir):
    from clickbom_spark.ops.merge import glob_to_regex

    (docs,) = load(spark, sf_dir, "documents")
    inc = glob_to_regex("src*")  # ^src.*$
    exc = glob_to_regex("src1")  # ^src1$
    return (
        docs.where(F.col("source").rlike(inc) & ~F.col("source").rlike(exc))
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("source")
    )


@query(
    "q_sanitize_normalize",
    oracle="""
SELECT lang,
       COUNT(DISTINCT SUBSTRING(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g'), 1, 30))
         AS n_distinct_prefixes,
       MAX(LENGTH(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g'))) AS max_clean_len
FROM documents
GROUP BY lang
ORDER BY lang
""",
    description="F1 sanitizer as a row-scale column expression: strip "
    "disallowed chars, truncate, aggregate.",
)
def q_sanitize_normalize(spark, sf_dir):
    (docs,) = load(spark, sf_dir, "documents")
    clean = F.regexp_replace(F.col("text"), r"[^a-zA-Z0-9 ]", "")
    return (
        docs.groupBy("lang")
        .agg(
            F.countDistinct(F.substring(clean, 1, 30)).alias("n_distinct_prefixes"),
            F.max(F.length(clean)).cast("long").alias("max_clean_len"),
        )
        .orderBy("lang")
    )
