"""Deduplication queries (north-star ops) over documents/events.

The exact paths are oracle-checked against DuckDB; the LSH paths are
deterministic but use Spark-specific xxhash64, so they get rows-only
driver checks — their *correctness* is pytest-verified against the
exact all-pairs oracle (tests/test_ext_ops.py): at sf0.01 the planted
near-dup pairs are known (25 pairs at Jaccard ≥ 0.8).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from clickbom_spark.ext import dedup as D
from clickbom_spark.queries import load, query

# DuckDB shingle expression matching ext.text.shingles(n=3):
# normalize → tokens → distinct 3-gram strings.
_SHINGLES = (
    "list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]"
    " for i in range(1, len(w) - 1)])"
)
_TOKS = (
    "list_filter(string_split_regex(trim(regexp_replace(regexp_replace("
    "lower(text), '[^a-z0-9\\s]', '', 'g'), '\\s+', ' ', 'g')), '\\s+'),"
    " x -> x <> '')"
)


@query(
    "q_dedup_exact",
    oracle="""
SELECT event_type, COUNT(*) AS n_distinct_users
FROM (SELECT DISTINCT user_id, event_type FROM events) t
GROUP BY event_type
ORDER BY event_type
""",
    description="Exact dedup on a column set (hash-shuffle dropDuplicates) "
    "— U2's machinery on the events stream.",
)
def q_dedup_exact(spark, sf_dir):
    (events,) = load(spark, sf_dir, "events")
    return (
        D.exact_dedup(events.select("user_id", "event_type"), ["user_id", "event_type"])
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_distinct_users"))
        .orderBy("event_type")
    )


@query(
    "q_ngram_jaccard_pairs",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, {_TOKS} AS w FROM documents
), grams AS (
  SELECT doc_id, {_SHINGLES} AS g FROM toks
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(len(list_intersect(a.g, b.g)) AS DOUBLE)
         / CAST(len(list_distinct(list_concat(a.g, b.g))) AS DOUBLE) AS jac
FROM grams a JOIN grams b ON a.doc_id < b.doc_id
WHERE CAST(len(list_intersect(a.g, b.g)) AS DOUBLE)
        / CAST(len(list_distinct(list_concat(a.g, b.g))) AS DOUBLE) >= 0.8
ORDER BY id_a, id_b
""",
    description="Exact all-pairs 3-gram Jaccard near-dup detection (the "
    "O(n²) oracle path; finds the planted duplicate pairs).",
)
def q_ngram_jaccard_pairs(spark, sf_dir):
    (docs,) = load(spark, sf_dir, "documents")
    return D.ngram_jaccard_pairs(docs, threshold=0.8).orderBy("id_a", "id_b")


@query(
    "q_neardup_components",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, {_TOKS} AS w FROM documents
), grams AS (
  SELECT doc_id, {_SHINGLES} AS g FROM toks
), pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM grams a JOIN grams b ON a.doc_id < b.doc_id
  WHERE CAST(len(list_intersect(a.g, b.g)) AS DOUBLE)
          / CAST(len(list_distinct(list_concat(a.g, b.g))) AS DOUBLE) >= 0.8
), edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION SELECT id_b, id_a FROM pairs
), reach AS (
  WITH RECURSIVE r(id, comp) AS (
    SELECT src, src FROM edges
    UNION
    SELECT e.dst, r.comp FROM r JOIN edges e ON e.src = r.id
  ) SELECT id, MIN(comp) AS component FROM r GROUP BY id
)
SELECT component, COUNT(*) AS cluster_size,
       array_to_string(list_sort(list(id)), ',') AS members
FROM reach GROUP BY component ORDER BY component
""",
    description="Near-dup clustering: connected components over the "
    "exact-Jaccard pair graph (iterative min-label propagation vs "
    "DuckDB recursive CTE), the keep-one-representative dedup step.",
)
def q_neardup_components(spark, sf_dir):
    (docs,) = load(spark, sf_dir, "documents")
    pairs = D.ngram_jaccard_pairs(docs, threshold=0.8)
    comps = D.connected_components(pairs)
    return (
        comps.groupBy("component")
        .agg(
            F.count(F.lit(1)).alias("cluster_size"),
            F.array_join(F.sort_array(F.collect_list("id")), ",").alias("members"),
        )
        .orderBy("component")
    )


@query(
    "q_minhash_lsh_dedup",
    oracle=None,  # xxhash64-based — validated against the exact path in pytest
    description="MinHash+LSH banding near-dup detection — the 100 TB scale "
    "path: equi-join on (band, bucket), exact-Jaccard verify.",
    bench=True,
)
def q_minhash_lsh_dedup(spark, sf_dir):
    (docs,) = load(spark, sf_dir, "documents")
    return D.minhash_lsh_pairs(docs, threshold=0.8).orderBy("id_a", "id_b")


@query(
    "q_simhash_pairs",
    oracle=None,  # xxhash64-based — rows-only driver check; pytest-validated
    description="SimHash 64-bit signatures with 16-bit band blocking; "
    "near-dup = Hamming distance <= 8.",
)
def q_simhash_pairs(spark, sf_dir):
    (docs,) = load(spark, sf_dir, "documents")
    return D.simhash_pairs(docs, max_distance=8).orderBy("id_a", "id_b")
