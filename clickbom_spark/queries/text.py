"""Text-analysis queries over the documents table (north-star ops).

Thin registry wrappers around clickbom_spark.ext.text; oracle SQL
replicates the exact same formulas so value-hashes match bit-for-bit
(per-row doubles use identical IEEE operation order; cross-row sums go
through rounded decimals).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from clickbom_spark.ext import text as X
from clickbom_spark.queries import load, query

# DuckDB equivalent of normalize_text()
_NORM = (
    "trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\\s]', '', 'g'),"
    " '\\s+', ' ', 'g'))"
)
_TOKENS = "list_filter(string_split_regex(text, '\\s+'), x -> x <> '')"


def _sw_hits(lang: str) -> str:
    words = ", ".join(f"'{w}'" for w in X.LANG_STOPWORDS[lang])
    return (
        f"len(list_filter(list_filter(string_split_regex(lower(text), '\\s+'),"
        f" x -> x <> ''), x -> list_contains([{words}], x)))"
    )


@query(
    "q_token_stats",
    oracle=f"""
SELECT lang,
       COUNT(*) AS n_docs,
       CAST(SUM(len({_TOKENS})) AS BIGINT) AS total_tokens,
       CAST(SUM(len(regexp_extract_all(text, '(\\w+|[^\\w\\s])'))) AS BIGINT)
         AS total_pieces,
       CAST(MIN(len({_TOKENS})) AS BIGINT) AS min_tokens,
       CAST(MAX(len({_TOKENS})) AS BIGINT) AS max_tokens
FROM documents
GROUP BY lang
ORDER BY lang
""",
    description="Token counting (whitespace + word/punct regex pieces) per "
    "language — training-data token accounting.",
)
def q_token_stats(spark, sf_dir):
    (docs,) = load(spark, sf_dir, "documents")
    tc = X.token_count(F.col("text"))
    pieces = F.size(X.word_and_punct_tokens(F.col("text")))
    return (
        docs.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(tc).cast("long").alias("total_tokens"),
            F.sum(pieces).cast("long").alias("total_pieces"),
            F.min(tc).cast("long").alias("min_tokens"),
            F.max(tc).cast("long").alias("max_tokens"),
        )
        .orderBy("lang")
    )


@query(
    "q_quality_scores",
    oracle="""
WITH toks AS (
  SELECT source, text,
         list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS w
  FROM documents
), feats AS (
  SELECT source,
         CAST(len(w) AS DOUBLE) AS n_tokens,
         CAST(length(regexp_replace(text, '[\\w\\s]', '', 'g')) AS DOUBLE)
           / CAST(greatest(length(text), 1) AS DOUBLE) AS pr,
         CAST(length(list_aggregate(w, 'string_agg', '')) AS DOUBLE)
           / CAST(greatest(len(w), 1) AS DOUBLE) AS mwl
  FROM toks
), scored AS (
  SELECT source,
         ( least(n_tokens / 64.0, 1.0)
         + (1.0 - least(pr * 4.0, 1.0))
         + (CASE WHEN mwl >= 3.0 AND mwl <= 10.0 THEN 1.0 ELSE 0.5 END)
         ) / 3.0 AS q
  FROM feats
)
SELECT source,
       CAST(SUM(CAST(round(q, 6) AS DECIMAL(12,6))) AS DOUBLE) AS total_quality,
       COUNT(*) AS n_docs
FROM scored
GROUP BY source
ORDER BY source
""",
    description="Composite quality score (length/punct/word-length terms) "
    "summed per source via rounded decimals for cross-engine stability.",
)
def q_quality_scores(spark, sf_dir):
    (docs,) = load(spark, sf_dir, "documents")
    q = X.quality_score(F.col("text"))
    return (
        docs.groupBy("source")
        .agg(
            F.sum(F.round(q, 6).cast("decimal(12,6)"))
            .cast("double")
            .alias("total_quality"),
            F.count(F.lit(1)).alias("n_docs"),
        )
        .orderBy("source")
    )


@query(
    "q_lang_id",
    oracle=f"""
WITH scores AS (
  SELECT lang AS labeled,
         {_sw_hits("en")} AS s_en, {_sw_hits("de")} AS s_de,
         {_sw_hits("fr")} AS s_fr, {_sw_hits("es")} AS s_es
  FROM documents
)
SELECT labeled,
       CASE WHEN greatest(s_en, s_de, s_fr, s_es) = 0 THEN 'und'
            WHEN s_es = greatest(s_en, s_de, s_fr, s_es) THEN 'es'
            WHEN s_fr = greatest(s_en, s_de, s_fr, s_es) THEN 'fr'
            WHEN s_de = greatest(s_en, s_de, s_fr, s_es) THEN 'de'
            ELSE 'en' END AS predicted,
       COUNT(*) AS n_docs
FROM scores
GROUP BY labeled, predicted
ORDER BY labeled, predicted
""",
    description="Language-ID heuristic (stopword-hit argmax with "
    "deterministic tie-break) vs. the labeled lang.",
)
def q_lang_id(spark, sf_dir):
    (docs,) = load(spark, sf_dir, "documents")
    return (
        docs.select(
            F.col("lang").alias("labeled"),
            X.lang_id(F.col("text")).alias("predicted"),
        )
        .groupBy("labeled", "predicted")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("labeled", "predicted")
    )


@query(
    "q_passage_chunks",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, {_TOKENS.replace("text", _NORM)} AS w FROM documents
  WHERE doc_id < 100
), chunked AS (
  SELECT doc_id,
         [{{'idx': c, 'p': array_to_string(w[CAST(c*48+1 AS INT):CAST(c*48+64 AS INT)], ' ')}}
          for c in range(0, greatest(CAST(ceil((len(w) - 64) / 48.0) AS INT), 0) + 1)]
           AS chunks
  FROM toks
)
SELECT doc_id, u.s.idx AS passage_idx,
       len(string_split(u.s.p, ' ')) AS n_tokens,
       md5(u.s.p) AS passage_md5
FROM chunked, UNNEST(chunks) AS u(s)
ORDER BY doc_id, passage_idx
""",
    description="Context-window chunking: overlapping 64-token passages "
    "every 48 tokens (the LLM training/RAG passage primitive), "
    "passage-exact via md5.",
)
def q_passage_chunks(spark, sf_dir):
    (docs,) = load(spark, sf_dir, "documents")
    return (
        docs.where(F.col("doc_id") < 100)
        .select(
            "doc_id",
            F.posexplode(X.passage_chunks(F.col("text"))).alias("passage_idx", "p"),
        )
        .select(
            "doc_id",
            F.col("passage_idx").cast("bigint").alias("passage_idx"),
            F.size(F.split("p", " ")).cast("long").alias("n_tokens"),
            F.md5("p").alias("passage_md5"),
        )
        .orderBy("doc_id", "passage_idx")
    )


@query(
    "q_tfidf_top_terms",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, UNNEST({_TOKENS.replace("text", _NORM)}) AS term FROM documents
), tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term
), df AS (
  SELECT term, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY term
), n AS (SELECT COUNT(*) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term,
         round(tf.tf * (ln((n.n_docs + 1.0) / (df.df + 1.0)) + 1.0), 4)
           AS tfidf_r
  FROM tf JOIN df USING (term), n
), ranked AS (
  SELECT doc_id, term, tfidf_r,
         ROW_NUMBER() OVER (PARTITION BY doc_id
                            ORDER BY tfidf_r DESC, term) AS rnk
  FROM scored
)
SELECT doc_id, term, tfidf_r, rnk
FROM ranked WHERE rnk <= 3 AND doc_id < 50
ORDER BY doc_id, rnk
""",
    description="TF-IDF with smoothed idf: per-doc term frequency x "
    "corpus document frequency (one broadcastable df table), top-3 "
    "terms per doc by window rank.",
)
def q_tfidf_top_terms(spark, sf_dir):
    from pyspark.sql import Window

    (docs,) = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(X.tokens(X.normalize_text(F.col("text")))).alias("term"),
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tf.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    # Corpus size as an in-plan broadcast scalar (1-row aggregate), not a
    # driver-side .count() — keeps the whole query one job and scales to
    # any corpus without a synchronous pre-pass.
    n_docs = docs.agg(F.count(F.lit(1)).cast("double").alias("n_docs_total"))
    scored = (
        # df_ is vocabulary-sized (grows with the corpus) — no hard
        # broadcast hint; AQE sizes the join. n_docs is a 1-row scalar.
        tf.join(df_, "term")
        .join(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            F.round(
                F.col("tf")
                * (F.log((F.col("n_docs_total") + 1.0) / (F.col("df") + 1.0)) + 1.0),
                4,
            ).alias("tfidf_r"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf_r"), "term")
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .where((F.col("rnk") <= 3) & (F.col("doc_id") < 50))
        .select("doc_id", "term", "tfidf_r", "rnk")
        .orderBy("doc_id", "rnk")
    )


BM25_TERMS = ["join", "hash", "merge"]
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOPK = 20


@query(
    "q_bm25_search",
    # Okapi BM25 ranked retrieval (Robertson & Zaragoza 2009), the
    # Lucene idf variant: score(d,Q) = Σ_t ln(1 + (N-df+0.5)/(df+0.5))
    # · tf·(k1+1)/(tf + k1·(1-b+b·dl/avgdl)).  Per-term scores are
    # rounded to 6 decimals and decimal-summed (the repo's float
    # contract), so the global top-K membership and ranking are
    # bit-stable cross-engine; the decimal is rounded BEFORE the double
    # cast so .xxxx50 boundaries can't split between engines.
    oracle=f"""
WITH dl AS (
  -- per-row token-count over ALL docs (a zero-token doc contributes
  -- dl=0 to avgdl, exactly as the engine's per-row size() does; an
  -- unnest-then-count would silently drop it)
  SELECT doc_id, CAST(len({_TOKENS}) AS DOUBLE) AS dl FROM documents
), stats AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
         CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
  FROM dl
), toks AS (
  SELECT doc_id, unnest({_TOKENS}) AS term FROM documents
), tf AS (
  SELECT doc_id, term, CAST(COUNT(*) AS DOUBLE) AS tf FROM toks
  WHERE term IN ({",".join(f"'{t}'" for t in BM25_TERMS)})
  GROUP BY doc_id, term
), df AS (
  SELECT term, CAST(COUNT(*) AS DOUBLE) AS df FROM tf GROUP BY term
), terms AS (
  SELECT tf.doc_id,
         CAST(round(
           ln(1.0 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))
           * (tf.tf * ({BM25_K1} + 1.0))
           / (tf.tf + {BM25_K1}
              * (1.0 - {BM25_B} + {BM25_B} * dl.dl / s.avgdl)),
           6) AS DECIMAL(18,6)) AS sc
  FROM tf JOIN df USING (term) JOIN dl USING (doc_id), stats s
), scored AS (
  SELECT doc_id, COUNT(*) AS n_terms_hit, SUM(sc) AS score
  FROM terms GROUP BY doc_id
)
SELECT doc_id, n_terms_hit, CAST(round(score, 4) AS DOUBLE) AS bm25_r
FROM scored
ORDER BY score DESC, doc_id
LIMIT {BM25_TOPK}
""",
    description="Okapi BM25 ranked retrieval over posting lists: doc "
    "length is a per-row size() (no corpus-token shuffle), the token "
    "array is filtered to the query terms BEFORE explode so the tf "
    "aggregate shuffles O(hits) rows, df and the avgdl scalar are "
    "broadcast post-agg frames, and the global top-K compiles to "
    "TakeOrderedAndProject — no global sort, no window.",
)
def q_bm25_search(spark, sf_dir):
    from clickbom_spark.ext.text import let

    (docs,) = load(spark, sf_dir, "documents")
    lits = F.array(*[F.lit(t) for t in BM25_TERMS])
    # One tokenization per row (let-bound): dl is a per-row size() —
    # never an explode+groupBy over every corpus token — and only the
    # query-term HITS survive into the explode, so the tf shuffle
    # carries O(hits) rows, not O(corpus tokens).
    base = docs.select(
        "doc_id",
        let(
            X.tokens(F.col("text")),
            lambda w: F.struct(
                F.size(w).cast("double").alias("dl"),
                F.filter(w, lambda t: F.array_contains(lits, t)).alias("hits"),
            ),
        ).alias("p"),
    ).select("doc_id", F.col("p.dl").alias("dl"), F.col("p.hits").alias("hits"))
    stats = base.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        (F.sum("dl") / F.count(F.lit(1))).alias("avgdl"),
    )
    tf = (
        base.select("doc_id", "dl", F.explode("hits").alias("term"))
        .groupBy("doc_id", "dl", "term")
        .agg(F.count(F.lit(1)).cast("double").alias("tf"))
    )
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).cast("double").alias("df"))
    sc = F.round(
        F.log(
            1.0 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
        )
        * (F.col("tf") * (BM25_K1 + 1.0))
        / (
            F.col("tf")
            + BM25_K1 * (1.0 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl"))
        ),
        6,
    ).cast("decimal(18,6)")
    terms = (
        tf.join(F.broadcast(df_), "term")
        .join(F.broadcast(stats))
        .select("doc_id", sc.alias("sc"))
    )
    return (
        terms.groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_terms_hit"), F.sum("sc").alias("score"))
        .orderBy(F.desc("score"), "doc_id")
        .limit(BM25_TOPK)
        .select(
            "doc_id",
            "n_terms_hit",
            F.round(F.col("score"), 4).cast("double").alias("bm25_r"),
        )
    )


@query(
    "q_winnowing_fingerprints",
    oracle=f"""
WITH norm AS (
  SELECT source, {_NORM} AS t FROM documents
), h AS (
  SELECT source,
         [CAST(('0x' || substring(md5(substring(t, CAST(i AS INT), 8)), 1, 8))
               AS BIGINT)
          for i in range(1, greatest(length(t) - 7, 1) + 1)] AS hs
  FROM norm
), fp AS (
  SELECT source,
         list_distinct([list_min(hs[CAST(j AS INT):CAST(j AS INT) + 3])
                        for j in range(1, greatest(len(hs) - 3, 1) + 1)]) AS fps
  FROM h
)
SELECT source, COUNT(*) AS n_docs, CAST(SUM(len(fps)) AS BIGINT) AS total_fps
FROM fp GROUP BY source ORDER BY source
""",
    description="Winnowing (MOSS rolling-hash) fingerprints: char "
    "8-grams, window-4 min sampling — full algorithm replicated in the "
    "oracle via an engine-portable md5 gram hash.",
)
def q_winnowing_fingerprints(spark, sf_dir):
    (docs,) = load(spark, sf_dir, "documents")
    fps = X.winnowing_fingerprints(
        F.col("text"), k=8, window=4, hash_fn=X.md5_gram_hash
    )
    return (
        docs.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.size(fps)).cast("long").alias("total_fps"),
        )
        .orderBy("source")
    )


@query(
    "q_fingerprints",
    oracle=f"""
SELECT source,
       COUNT(DISTINCT md5({_NORM})) AS n_distinct_fingerprints,
       COUNT(*) AS n_docs
FROM documents
GROUP BY source
ORDER BY source
""",
    description="Normalized-md5 document fingerprinting (rolling-hash "
    "analog) — the near-exact dedup key.",
)
def q_fingerprints(spark, sf_dir):
    (docs,) = load(spark, sf_dir, "documents")
    return (
        docs.groupBy("source")
        .agg(
            F.countDistinct(X.fingerprint(F.col("text"))).alias(
                "n_distinct_fingerprints"
            ),
            F.count(F.lit(1)).alias("n_docs"),
        )
        .orderBy("source")
    )


_RRF_K = 60  # the standard reciprocal-rank-fusion constant


@query(
    "q_hybrid_rrf",
    # Hybrid sparse+dense retrieval fused by Reciprocal Rank Fusion
    # (Cormack et al. 2009): rrf(d) = Σ_lists 1/(60 + rank_d).  The
    # fusion is a FIXED two-operand double add over coalesced terms, so
    # it is bit-identical cross-engine; list ranks are deterministic
    # (BM25 on rounded decimal scores; cosine ranking mirrors the
    # proven q_cosine_topk contract).
    oracle=f"""
WITH dl AS (
  SELECT doc_id, CAST(len({{toks}}) AS DOUBLE) AS dl FROM documents
), stats AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
         CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl FROM dl
), toks AS (
  SELECT doc_id, unnest({{toks}}) AS term FROM documents
), tf AS (
  SELECT doc_id, term, CAST(COUNT(*) AS DOUBLE) AS tf FROM toks
  WHERE term IN ({",".join(f"'{t}'" for t in BM25_TERMS)})
  GROUP BY doc_id, term
), df AS (
  SELECT term, CAST(COUNT(*) AS DOUBLE) AS df FROM tf GROUP BY term
), terms AS (
  SELECT tf.doc_id,
         CAST(round(
           ln(1.0 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))
           * (tf.tf * ({BM25_K1} + 1.0))
           / (tf.tf + {BM25_K1}
              * (1.0 - {BM25_B} + {BM25_B} * dl.dl / s.avgdl)),
           6) AS DECIMAL(18,6)) AS sc
  FROM tf JOIN df USING (term) JOIN dl USING (doc_id), stats s
), bm25_scored AS (
  SELECT doc_id, SUM(sc) AS score
  FROM terms WHERE doc_id <> 0 GROUP BY doc_id
  ORDER BY score DESC, doc_id LIMIT 100
), bm25 AS (
  SELECT doc_id, ROW_NUMBER() OVER (ORDER BY score DESC, doc_id)
           AS r_bm25
  FROM bm25_scored
), v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
), qv AS (SELECT e FROM v WHERE vec_id = 0),
dense_scored AS (
  SELECT v.vec_id AS doc_id,
         list_dot_product(v.e, qv.e)
           / (sqrt(list_dot_product(v.e, v.e))
              * sqrt(list_dot_product(qv.e, qv.e))) AS cos
  FROM v, qv WHERE v.vec_id <> 0
  ORDER BY cos DESC, doc_id LIMIT 100
), dense AS (
  SELECT doc_id,
         ROW_NUMBER() OVER (ORDER BY cos DESC, doc_id) AS r_dense
  FROM dense_scored
), fused AS (
  SELECT COALESCE(b.doc_id, d.doc_id) AS doc_id,
         b.r_bm25, d.r_dense,
         COALESCE(1.0 / ({_RRF_K} + b.r_bm25), 0.0)
           + COALESCE(1.0 / ({_RRF_K} + d.r_dense), 0.0) AS rrf
  FROM bm25 b FULL OUTER JOIN dense d ON d.doc_id = b.doc_id
)
SELECT doc_id, CAST(r_bm25 AS BIGINT) AS r_bm25,
       CAST(r_dense AS BIGINT) AS r_dense,
       round(rrf, 6) AS rrf_r
FROM fused ORDER BY rrf DESC, doc_id LIMIT 10
""".replace("{toks}", _TOKENS),
    description="Hybrid sparse+dense retrieval (the RAG-stack shape): "
    "the TOP-100 of the BM25 posting-list ranking and the top-100 of "
    "the cosine ranking against a query embedding, fused via "
    "Reciprocal Rank Fusion rrf = sum 1/(60+rank) — both truncations "
    "compile to TakeOrderedAndProject (fusing truncated lists IS the "
    "standard RRF definition, and the only window runs over 100 "
    "rows), each list built with its proven scale path (O(hits) BM25 "
    "shuffle; broadcast query vector); fusion is one full-outer join "
    "and a top-10.",
)
def q_hybrid_rrf(spark, sf_dir):
    from pyspark.sql import Window

    from clickbom_spark.ext.similarity import _safe_div as S_safe_div
    from clickbom_spark.ext.similarity import dot as S_dot
    from clickbom_spark.ext.similarity import norm as S_norm
    from clickbom_spark.ext.text import let

    docs, emb = load(spark, sf_dir, "documents", "embeddings")
    lits = F.array(*[F.lit(t) for t in BM25_TERMS])
    base = docs.select(
        "doc_id",
        let(
            X.tokens(F.col("text")),
            lambda w: F.struct(
                F.size(w).cast("double").alias("dl"),
                F.filter(w, lambda t: F.array_contains(lits, t)).alias("hits"),
            ),
        ).alias("p"),
    ).select("doc_id", F.col("p.dl").alias("dl"), F.col("p.hits").alias("hits"))
    stats = base.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        (F.sum("dl") / F.count(F.lit(1))).alias("avgdl"),
    )
    tf = (
        base.select("doc_id", "dl", F.explode("hits").alias("term"))
        .groupBy("doc_id", "dl", "term")
        .agg(F.count(F.lit(1)).cast("double").alias("tf"))
    )
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).cast("double").alias("df"))
    sc = F.round(
        F.log(
            1.0 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
        )
        * (F.col("tf") * (BM25_K1 + 1.0))
        / (
            F.col("tf")
            + BM25_K1 * (1.0 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl"))
        ),
        6,
    ).cast("decimal(18,6)")
    w_b = Window.orderBy(F.desc("score"), "doc_id")
    # top-100 truncation FIRST (TakeOrderedAndProject); the row_number
    # window then ranks a 100-row frame, never the full hit set
    bm25 = (
        tf.join(F.broadcast(df_), "term")
        .join(F.broadcast(stats))
        .where(F.col("doc_id") != 0)
        .groupBy("doc_id")
        .agg(F.sum(sc).alias("score"))
        .orderBy(F.desc("score"), "doc_id")
        .limit(100)
        .select("doc_id", F.row_number().over(w_b).alias("r_bm25"))
    )
    vecs = emb.select(
        F.col("vec_id").alias("doc_id"),
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("e"),
    )
    # query norm once in the 1-row broadcast, corpus norm once per row:
    # cosine() inline would re-fold both self-dot-products per pair
    # (values bit-identical — only where the norm is computed moves)
    qv = (
        vecs.where(F.col("doc_id") == 0)
        .select(F.col("e").alias("qe"))
        .withColumn("qn", S_norm(F.col("qe")))
    )
    w_d = Window.orderBy(F.desc("cos"), "doc_id")
    dense = (
        vecs.where(F.col("doc_id") != 0)
        .withColumn("en", S_norm(F.col("e")))
        .join(F.broadcast(qv))
        .select(
            "doc_id",
            S_safe_div(
                S_dot(F.col("e"), F.col("qe")), F.col("en") * F.col("qn")
            ).alias("cos"),
        )
        .orderBy(F.desc("cos"), "doc_id")
        .limit(100)
        .select("doc_id", F.row_number().over(w_d).alias("r_dense"))
    )
    fused = bm25.join(dense, "doc_id", "full_outer").select(
        "doc_id",
        F.col("r_bm25").cast("long").alias("r_bm25"),
        F.col("r_dense").cast("long").alias("r_dense"),
        (
            F.coalesce(1.0 / (_RRF_K + F.col("r_bm25")), F.lit(0.0))
            + F.coalesce(1.0 / (_RRF_K + F.col("r_dense")), F.lit(0.0))
        ).alias("rrf"),
    )
    return (
        fused.orderBy(F.desc("rrf"), "doc_id")
        .limit(10)
        .select("doc_id", "r_bm25", "r_dense", F.round("rrf", 6).alias("rrf_r"))
    )
