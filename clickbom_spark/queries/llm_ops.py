"""LLM training-data curation queries (round-2 additions): PII
redaction, Gopher-style repetition filtering, benchmark
decontamination, character-entropy scoring.

Each is a thin registry wrapper over clickbom_spark.ext.text operators;
the DuckDB oracles replicate the same formulas (portable regexes,
decimal-summed rounded terms) so value hashes match bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from clickbom_spark.ext import text as X
from clickbom_spark.queries import load, query

_NORM = (
    "trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\\s]', '', 'g'),"
    " '\\s+', ' ', 'g'))"
)
_TOKS = "list_filter(string_split_regex(text, '\\s+'), x -> x <> '')"
_NTOKS = _TOKS.replace("text", _NORM)

# Deterministic PII injection: the corpus has no real PII, so each doc
# gets a synthetic email + IP appended; the op then has non-trivial
# work to find and scrub on every row.
_PII_TEXT_SQL = (
    "text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com"
    " from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.1'"
)
_EMAIL_SQL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
_IP_SQL = "\\b\\d{1,3}(\\.\\d{1,3}){3}\\b"


@query(
    "q_pii_redaction",
    oracle=f"""
WITH pii AS (
  SELECT source, {_PII_TEXT_SQL} AS t FROM documents
), red AS (
  SELECT source,
         len(regexp_extract_all(t, '{_EMAIL_SQL}')) AS n_emails,
         len(regexp_extract_all(t, '{_IP_SQL}')) AS n_ips,
         regexp_replace(regexp_replace(t, '{_EMAIL_SQL}', '<EMAIL>', 'g'),
                        '{_IP_SQL}', '<IP>', 'g') AS redacted
  FROM pii
)
SELECT source,
       COUNT(*) AS n_docs,
       CAST(SUM(n_emails) AS BIGINT) AS total_emails,
       CAST(SUM(n_ips) AS BIGINT) AS total_ips,
       COUNT(DISTINCT md5(redacted)) AS n_distinct_redacted
FROM red
GROUP BY source
ORDER BY source
""",
    description="PII scrubbing: count + redact emails and IPs with "
    "typed placeholders (training-data compliance pass, pure JVM "
    "regex; deterministic synthetic PII injected per doc so the op is "
    "exercised on every row).",
)
def q_pii_redaction(spark, sf_dir):
    (docs,) = load(spark, sf_dir, "documents")
    t = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com from 10.0."),
        F.pmod(F.col("doc_id"), F.lit(256)).cast("string"),
        F.lit(".1"),
    )
    withpii = docs.select("source", t.alias("t"))
    return (
        withpii.select(
            "source",
            F.regexp_count("t", F.lit(X.EMAIL_PATTERN)).alias("n_emails"),
            F.regexp_count("t", F.lit(X.IP_PATTERN)).alias("n_ips"),
            X.redact_pii(F.col("t")).alias("redacted"),
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_emails").cast("long").alias("total_emails"),
            F.sum("n_ips").cast("long").alias("total_ips"),
            F.countDistinct(F.md5("redacted")).alias("n_distinct_redacted"),
        )
        .orderBy("source")
    )


@query(
    "q_repetition_filter",
    oracle=f"""
WITH toks AS (
  SELECT source, {_NTOKS} AS w FROM documents
), grams AS (
  SELECT source,
         greatest(len(w) - 2, 0) AS total,
         CASE WHEN len(w) >= 3
              THEN len(list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                                      for i in range(1, len(w) - 1)]))
              ELSE 0 END AS n_distinct
  FROM toks
), scored AS (
  SELECT source,
         CASE WHEN total >= 1
              THEN CAST(total - n_distinct AS DOUBLE) / CAST(total AS DOUBLE)
              ELSE 0.0 END AS dup_frac
  FROM grams
)
SELECT source,
       COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN dup_frac > 0.05 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_flagged,
       CAST(SUM(CAST(round(dup_frac, 6) AS DECIMAL(12,6))) AS DOUBLE)
         AS total_dup_frac
FROM scored
GROUP BY source
ORDER BY source
""",
    description="Gopher-style repetition filter: duplicate word-3-gram "
    "fraction per doc, flagging docs above 5% — the repetitive-text "
    "quality gate for training corpora.",
)
def q_repetition_filter(spark, sf_dir):
    (docs,) = load(spark, sf_dir, "documents")
    dup = X.repetition_ratio(F.col("text"), n=3)
    return (
        docs.select("source", dup.alias("dup_frac"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(F.col("dup_frac") > 0.05, 1).otherwise(0))
            .cast("long")
            .alias("n_flagged"),
            F.sum(F.round("dup_frac", 6).cast("decimal(12,6)"))
            .cast("double")
            .alias("total_dup_frac"),
        )
        .orderBy("source")
    )


_BENCH_MAX_ID = 25  # docs 0..24 stand in for the benchmark/eval set


@query(
    "q_decontaminate",
    # 8-token shingle overlap against a benchmark set — the
    # test-set-contamination scan.  Shingle fallback for short docs
    # (whole text as one gram) mirrors ext.text.shingles exactly.
    oracle=f"""
WITH toks AS (
  SELECT doc_id, {_NTOKS} AS w FROM documents
), grams AS (
  SELECT doc_id,
         CASE WHEN len(w) >= 8
              THEN list_distinct([array_to_string(w[i:i+7], ' ')
                                  for i in range(1, len(w) - 6)])
              ELSE [array_to_string(w, ' ')] END AS g
  FROM toks
), bench AS (
  SELECT DISTINCT unnest(g) AS gram FROM grams WHERE doc_id < {_BENCH_MAX_ID}
), corpus AS (
  SELECT doc_id, unnest(g) AS gram FROM grams WHERE doc_id >= {_BENCH_MAX_ID}
)
SELECT c.doc_id, COUNT(DISTINCT c.gram) AS n_shared_shingles
FROM corpus c JOIN bench b ON c.gram = b.gram
GROUP BY c.doc_id
ORDER BY doc_id
""",
    description="Benchmark decontamination: find corpus docs sharing "
    "any 8-token shingle with the benchmark set (docs 0..24 as the "
    "stand-in) — distinct-shingle equi-join, no cross product; the "
    "planted near-dups of benchmark docs surface here.",
)
def q_decontaminate(spark, sf_dir):
    (docs,) = load(spark, sf_dir, "documents")
    grams = docs.select(
        "doc_id", F.explode(X.shingles(F.col("text"), n=8)).alias("gram")
    )
    bench = (
        grams.where(F.col("doc_id") < _BENCH_MAX_ID).select("gram").distinct()
    )
    corpus = grams.where(F.col("doc_id") >= _BENCH_MAX_ID)
    return (
        corpus.join(bench, "gram")
        .groupBy("doc_id")
        .agg(F.countDistinct("gram").alias("n_shared_shingles"))
        .orderBy("doc_id")
    )


@query(
    "q_char_entropy",
    # Each -p*log2(p) term is rounded to 6 decimals and cast to decimal
    # BEFORE summation, so per-doc entropy is accumulation-order
    # independent and immune to libm log2 ulp differences between the
    # JVM and DuckDB (9-decimal rounding straddled boundaries at sf0.1).
    oracle=f"""
WITH chars AS (
  SELECT source, string_split({_NORM}, '') AS cs FROM documents
), ent AS (
  SELECT source,
         CASE WHEN len(cs) > 0 THEN
           CAST(list_sum([CAST(round(
               -(CAST(len(list_filter(cs, x -> x = c)) AS DOUBLE) / len(cs))
                 * log2(CAST(len(list_filter(cs, x -> x = c)) AS DOUBLE)
                        / len(cs)), 6) AS DECIMAL(12,6))
             for c in list_distinct(cs)]) AS DOUBLE)
         ELSE 0.0 END AS h
  FROM chars
)
SELECT source,
       COUNT(*) AS n_docs,
       CAST(SUM(CAST(round(h, 6) AS DECIMAL(18,6))) AS DOUBLE) AS total_entropy
FROM ent
GROUP BY source
ORDER BY source
""",
    description="Character-entropy scoring (bits/char over the "
    "normalized distribution) — the gibberish/noise quality signal; "
    "deterministic decimal-summed terms for cross-engine parity.",
)
def q_char_entropy(spark, sf_dir):
    (docs,) = load(spark, sf_dir, "documents")
    h = X.char_entropy(F.col("text"))
    return (
        docs.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.round(h, 6).cast("decimal(18,6)"))
            .cast("double")
            .alias("total_entropy"),
        )
        .orderBy("source")
    )
