"""Similarity-search queries over the embeddings table (north-star ops)."""

from __future__ import annotations

from pyspark.sql import functions as F

from clickbom_spark.ext import similarity as S
from clickbom_spark.queries import load, query

N_QUERY_VECTORS = 10
TOP_K = 10

# DuckDB view of the embeddings table with precomputed norms.
_VN = """
v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
vn AS (SELECT vec_id, e, sqrt(list_dot_product(e, e)) AS nrm FROM v)
"""


def _posted_sql(planes: int, tables: int) -> str:
    """DuckDB replica of ext.similarity._posted_with_norm: one row per
    (vector, table) with the planes-bit signature from the portable
    multiplicative-hash hyperplanes (ext/similarity.py KNUTH scheme) —
    bit-for-bit the signature Spark computes JVM-side."""
    return f"""
posted AS (
  SELECT vec_id, tbl,
         CAST(list_sum([CASE WHEN COALESCE(list_sum(
             [CASE WHEN bit_count((((tbl*{planes} + p)*65536 + d + 1)
                                   * 2654435761) % 4294967296) & 1 = 1
                   THEN e[d+1] ELSE -e[d+1] END for d in range(64)]), 0) >= 0
             THEN (1::BIGINT << p) ELSE 0 END for p in range({planes})])
           AS BIGINT) AS sig
  FROM vn, range({tables}) t(tbl)
)
"""


@query(
    "q_cosine_topk",
    oracle=f"""
WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
q AS (SELECT * FROM v WHERE vec_id < {N_QUERY_VECTORS}),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         list_dot_product(q.e, c.e)
           / (sqrt(list_dot_product(q.e, q.e)) * sqrt(list_dot_product(c.e, c.e)))
           AS cos
  FROM q JOIN v c ON q.vec_id <> c.vec_id
), ranked AS (
  SELECT query_id, neighbor_id, cos,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, rank, round(cos, 4) AS cos_r
FROM ranked WHERE rank <= {TOP_K}
ORDER BY query_id, rank
""",
    description="Exact brute-force cosine top-k ANN baseline: broadcast "
    "query set x partitioned corpus, per-query window rank.",
    bench=True,
)
def q_cosine_topk(spark, sf_dir):
    (emb,) = load(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < N_QUERY_VECTORS)
    return (
        S.brute_force_topk(emb, queries, k=TOP_K)
        .select(
            "query_id", "neighbor_id", "rank", F.round("cos", 4).alias("cos_r")
        )
        .orderBy("query_id", "rank")
    )


NEARDUP_COS = 0.4  # this corpus has no planted high-cos pairs (max 0.51)


@query(
    "q_embedding_neardup",
    oracle=f"""
WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round(list_dot_product(a.e, b.e)
         / (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e))), 4)
         AS cos_r
FROM v a JOIN v b ON a.vec_id < b.vec_id
WHERE list_dot_product(a.e, b.e)
        / (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e)))
      >= {NEARDUP_COS}
ORDER BY id_a, id_b
""",
    description="Exact all-pairs embedding-cosine near-dup detection "
    "(the dedup family's embedding member; O(n²) oracle path).",
)
def q_embedding_neardup(spark, sf_dir):
    (emb,) = load(spark, sf_dir, "embeddings")
    return (
        S.cosine_neardup_pairs(emb, threshold=NEARDUP_COS)
        .select("id_a", "id_b", F.round("cos", 4).alias("cos_r"))
        .orderBy("id_a", "id_b")
    )


@query(
    "q_embedding_neardup_lsh",
    # Full LSH replica in SQL: same portable hyperplane signatures, same
    # (table, signature) candidate self-join, same exact-cosine verify —
    # the oracle reproduces the approximation itself, so any recall is
    # checkable (not just recall-1 corpora).
    oracle=f"""
WITH {_VN}, {_posted_sql(4, 16)},
cands AS (
  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
  FROM posted a JOIN posted b ON a.tbl = b.tbl AND a.sig = b.sig
  WHERE a.vec_id < b.vec_id
),
scored AS (
  SELECT id_a, id_b,
         CASE WHEN x.nrm * y.nrm <> 0
              THEN list_dot_product(x.e, y.e) / (x.nrm * y.nrm) END AS cos
  FROM cands JOIN vn x ON x.vec_id = id_a JOIN vn y ON y.vec_id = id_b
)
SELECT id_a, id_b, round(cos, 4) AS cos_r
FROM scored WHERE cos >= {NEARDUP_COS}
ORDER BY id_a, id_b
""",
    description="Embedding near-dup at scale: RP-LSH bucket self-join "
    "candidates + exact cosine verify (no cross product).",
)
def q_embedding_neardup_lsh(spark, sf_dir):
    (emb,) = load(spark, sf_dir, "embeddings")
    return (
        S.cosine_neardup_pairs_lsh(emb, threshold=NEARDUP_COS)
        .select("id_a", "id_b", F.round("cos", 4).alias("cos_r"))
        .orderBy("id_a", "id_b")
    )


@query(
    "q_ivf_ann",
    # Full IVF replica in SQL: deterministic coarse centroids (first
    # n_lists vectors by id), nearest-centroid assignment, n_probe
    # probe lists per query, candidate equi-join, exact-cosine rank —
    # pure arithmetic + windows, so the probe-limited approximation is
    # itself oracle-checked.
    oracle=f"""
WITH {_VN},
cents AS (
  SELECT ROW_NUMBER() OVER (ORDER BY vec_id) AS list_id, e AS cv, nrm AS cnrm
  FROM (SELECT * FROM vn ORDER BY vec_id LIMIT 16)
),
assigned AS (
  SELECT vec_id, list_id FROM (
    SELECT vn.vec_id, c.list_id,
           ROW_NUMBER() OVER (PARTITION BY vn.vec_id
             ORDER BY (CASE WHEN vn.nrm * c.cnrm <> 0
                            THEN list_dot_product(vn.e, c.cv)
                                 / (vn.nrm * c.cnrm) END) DESC,
                      c.list_id) AS crank
    FROM vn, cents c
  ) WHERE crank = 1
),
probes AS (
  SELECT vec_id AS query_id, list_id FROM (
    SELECT vn.vec_id, c.list_id,
           ROW_NUMBER() OVER (PARTITION BY vn.vec_id
             ORDER BY (CASE WHEN vn.nrm * c.cnrm <> 0
                            THEN list_dot_product(vn.e, c.cv)
                                 / (vn.nrm * c.cnrm) END) DESC,
                      c.list_id) AS crank
    FROM vn, cents c
    WHERE vn.vec_id < {N_QUERY_VECTORS}
  ) WHERE crank <= 8
),
cands AS (
  SELECT DISTINCT p.query_id, a.vec_id AS neighbor_id
  FROM probes p JOIN assigned a USING (list_id)
  WHERE p.query_id <> a.vec_id
),
scored AS (
  SELECT query_id, neighbor_id,
         CASE WHEN qv.nrm * cv.nrm <> 0
              THEN list_dot_product(qv.e, cv.e) / (qv.nrm * cv.nrm) END AS cos
  FROM cands
  JOIN vn qv ON qv.vec_id = query_id
  JOIN vn cv ON cv.vec_id = neighbor_id
),
ranked AS (
  SELECT query_id, neighbor_id, cos,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cos DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, rank, round(cos, 4) AS cos_r
FROM ranked WHERE rank <= {TOP_K}
ORDER BY query_id, rank
""",
    description="IVF ANN (scale path): coarse-quantized inverted lists, "
    "n_probe-limited search + exact cosine verify.",
)
def q_ivf_ann(spark, sf_dir):
    (emb,) = load(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < N_QUERY_VECTORS)
    return (
        S.ivf_topk(emb, queries, k=TOP_K, n_lists=16, n_probe=8)
        .select("query_id", "neighbor_id", "rank", F.round("cos", 4).alias("cos_r"))
        .orderBy("query_id", "rank")
    )


@query(
    "q_ivf_kmeans_ann",
    # The trained-centroid IVF cannot be replicated in SQL (k-means||
    # training is ML-side), so the contract is the q_approx_quantiles
    # pattern: emit the EXACT side (top-1 cosine per query, SQL-checked
    # bit-for-bit) next to a recall flag the approximation must clear.
    # Probing half the lists (8/16) measures 84/100 recall@10 over the
    # query set; the flag is GLOBAL (>=60/100) rather than per-query so
    # a centroid ulp drift across sessions can't flip a single
    # boundary query's row.
    oracle=f"""
WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
q AS (SELECT * FROM v WHERE vec_id < {N_QUERY_VECTORS}),
scored AS (
  SELECT q.vec_id AS query_id,
         list_dot_product(q.e, c.e)
           / (sqrt(list_dot_product(q.e, q.e)) * sqrt(list_dot_product(c.e, c.e)))
           AS cos
  FROM q JOIN v c ON q.vec_id <> c.vec_id
)
SELECT query_id, round(max(cos), 4) AS exact_top1_r, true AS recall_ok
FROM scored GROUP BY query_id ORDER BY query_id
""",
    description="IVF ANN with k-means-trained coarse centroids "
    "(pyspark.ml KMeans on a hash-sample, centers broadcast): "
    "probe-limited search checked for recall against the exact top-k.",
)
def q_ivf_kmeans_ann(spark, sf_dir):
    (emb,) = load(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < N_QUERY_VECTORS)
    cents = S.train_centroids_kmeans(emb, n_lists=16, seed=42)
    ann = S.ivf_topk(
        emb, queries, k=TOP_K, n_lists=16, n_probe=8, centroids=cents
    ).select("query_id", "neighbor_id")
    exact = S.brute_force_topk(emb, queries, k=TOP_K)
    total_hits = (
        exact.select("query_id", "neighbor_id")
        .join(ann, ["query_id", "neighbor_id"], "left_semi")
        .agg(F.count(F.lit(1)).alias("total_hits"))
    )
    top1 = exact.where(F.col("rank") == 1).select(
        "query_id", F.round("cos", 4).alias("exact_top1_r")
    )
    min_hits = int(0.6 * N_QUERY_VECTORS * TOP_K)
    return (
        top1.join(F.broadcast(total_hits))
        .select(
            "query_id",
            "exact_top1_r",
            (F.col("total_hits") >= min_hits).alias("recall_ok"),
        )
        .orderBy("query_id")
    )


SEMDEDUP_COS = 0.3  # within-cluster pairs reach 0.49 on this corpus


@query(
    "q_semdedup",
    # Full SQL replica of the deterministic-centroid SemDeDup path:
    # first-16-by-id centroids, nearest-centroid assignment, in-cluster
    # lower-id max-cosine, prune at the threshold — the approximation
    # itself is oracle-checked, like the LSH/IVF family above.
    oracle=f"""
WITH {_VN},
cents AS (
  SELECT ROW_NUMBER() OVER (ORDER BY vec_id) AS list_id, e AS cv, nrm AS cnrm
  FROM (SELECT * FROM vn ORDER BY vec_id LIMIT 16)
),
assigned AS (
  SELECT vec_id, list_id FROM (
    SELECT vn.vec_id, c.list_id,
           ROW_NUMBER() OVER (PARTITION BY vn.vec_id
             ORDER BY (CASE WHEN vn.nrm * c.cnrm <> 0
                            THEN list_dot_product(vn.e, c.cv)
                                 / (vn.nrm * c.cnrm) END) DESC,
                      c.list_id) AS crank
    FROM vn, cents c
  ) WHERE crank = 1
),
prior AS (
  SELECT b.vec_id AS id, MAX(
           CASE WHEN x.nrm * y.nrm <> 0
                THEN list_dot_product(x.e, y.e) / (x.nrm * y.nrm) END
         ) AS max_prior_cos
  FROM assigned a JOIN assigned b
    ON a.list_id = b.list_id AND a.vec_id < b.vec_id
  JOIN vn x ON x.vec_id = a.vec_id
  JOIN vn y ON y.vec_id = b.vec_id
  GROUP BY b.vec_id
)
SELECT s.vec_id AS id, s.list_id,
       round(p.max_prior_cos, 4) AS max_prior_cos_r,
       (p.max_prior_cos IS NULL OR p.max_prior_cos < {SEMDEDUP_COS}) AS keep
FROM assigned s LEFT JOIN prior p ON p.id = s.vec_id
ORDER BY id
""",
    description="SemDeDup semantic deduplication (arXiv:2303.09540): "
    "k-cluster the embedding space, prune within-cluster semantic "
    "near-duplicates by lower-id max-cosine — cluster assignment is one "
    "k-row broadcast, pairwise cost is per-cluster-bounded (linear "
    "total when k grows with the corpus), no global cross product.",
)
def q_semdedup(spark, sf_dir):
    (emb,) = load(spark, sf_dir, "embeddings")
    return (
        S.semdedup(emb, threshold=SEMDEDUP_COS, n_clusters=16)
        .select(
            "id",
            F.col("list_id").cast("long").alias("list_id"),
            F.round("max_prior_cos", 4).alias("max_prior_cos_r"),
            "keep",
        )
        .orderBy("id")
    )


@query(
    "q_label_centroid_stats",
    oracle="""
WITH v AS (SELECT label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
ex AS (
  SELECT label, i.range AS pos, e[CAST(i.range AS INT) + 1] AS val
  FROM v, range(64) i
),
per_dim AS (
  SELECT label, pos, COUNT(*) AS n,
         round(CAST(SUM(CAST(val AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*), 6) AS m
  FROM ex GROUP BY label, pos
)
SELECT label,
       MAX(n) AS n_vectors,
       COUNT(*) FILTER (abs(m) > 0.01) AS n_active_dims,
       CAST(SUM(CAST(m AS DECIMAL(18,6))) AS DOUBLE) AS total_mean
FROM per_dim GROUP BY label ORDER BY label
""",
    description="Per-label centroid aggregation via posexplode + two-level "
    "re-aggregate (exact decimal means for cross-engine parity).",
)
def q_label_centroid_stats(spark, sf_dir):
    (emb,) = load(spark, sf_dir, "embeddings")
    ex = emb.select(
        "label",
        F.posexplode(F.transform("embedding", lambda x: x.cast("double"))).alias(
            "pos", "val"
        ),
    )
    per_dim = ex.groupBy("label", "pos").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(
            F.sum(F.col("val").cast("decimal(28,12)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("m"),
    )
    return (
        per_dim.groupBy("label")
        .agg(
            F.max("n").alias("n_vectors"),
            F.count(F.when(F.abs("m") > 0.01, 1)).alias("n_active_dims"),
            F.sum(F.col("m").cast("decimal(18,6)")).cast("double").alias("total_mean"),
        )
        .orderBy("label")
    )


@query(
    "q_rp_lsh_ann",
    # Full LSH replica in SQL (same portable signatures, candidate join,
    # exact-cosine rank) — the approximation itself is oracle-checked.
    oracle=f"""
WITH {_VN}, {_posted_sql(4, 16)},
q AS (SELECT * FROM posted WHERE vec_id < {N_QUERY_VECTORS}),
cands AS (
  SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
  FROM posted c JOIN q ON c.tbl = q.tbl AND c.sig = q.sig
  WHERE q.vec_id <> c.vec_id
),
scored AS (
  SELECT query_id, neighbor_id,
         CASE WHEN qv.nrm * cv.nrm <> 0
              THEN list_dot_product(qv.e, cv.e) / (qv.nrm * cv.nrm) END AS cos
  FROM cands
  JOIN vn qv ON qv.vec_id = query_id
  JOIN vn cv ON cv.vec_id = neighbor_id
),
ranked AS (
  SELECT query_id, neighbor_id, cos,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cos DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, rank, round(cos, 4) AS cos_r
FROM ranked WHERE rank <= {TOP_K}
ORDER BY query_id, rank
""",
    description="Random-hyperplane LSH ANN (scale path): signature-bucket "
    "equi-join candidates + exact cosine verify.",
)
def q_rp_lsh_ann(spark, sf_dir):
    (emb,) = load(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < N_QUERY_VECTORS)
    return (
        S.rp_lsh_topk(emb, queries, k=TOP_K, planes=4, tables=16)
        .select("query_id", "neighbor_id", "rank", F.round("cos", 4).alias("cos_r"))
        .orderBy("query_id", "rank")
    )


@query(
    "q_scalar_quantization",
    # Symmetric int8 scalar quantization with per-vector scale
    # (amax/127), plus exact reconstruction-error accounting.  Element
    # rows (posexplode / UNNEST) keep every float op per-element with a
    # fixed IEEE order; per-element squared errors are rounded into
    # exact decimals before any cross-row sum, so the reduce order
    # can't change the result in either engine.
    oracle="""
WITH el AS (
  SELECT vec_id, label, CAST(x AS DOUBLE) AS x
  FROM embeddings, UNNEST(embeddings.embedding) AS u(x)
), scaled AS (
  SELECT vec_id, label, x,
         greatest(MAX(abs(x)) OVER (PARTITION BY vec_id),
                  CAST(1e-12 AS DOUBLE)) AS amax
  FROM el
), q AS (
  SELECT vec_id, label,
         round((x * CAST(127.0 AS DOUBLE)) / amax) AS qv,
         x, amax
  FROM scaled
), err AS (
  SELECT vec_id, label,
         CASE WHEN abs(qv) = 127 THEN 1 ELSE 0 END AS saturated,
         CAST(round((x - (qv * amax) / CAST(127.0 AS DOUBLE))
                    * (x - (qv * amax) / CAST(127.0 AS DOUBLE)), 12)
              AS DECIMAL(28,12)) AS sq
  FROM q
), per_vec AS (
  SELECT vec_id, label, SUM(sq) AS vec_sq, SUM(saturated) AS n_sat,
         COUNT(*) AS n_el
  FROM err GROUP BY vec_id, label
)
SELECT label,
       COUNT(*) AS n_vecs,
       CAST(SUM(n_el) AS BIGINT) AS n_elems,
       CAST(SUM(n_sat) AS BIGINT) AS n_saturated,
       CAST(SUM(vec_sq) AS DOUBLE) AS total_sq_err
FROM per_vec
GROUP BY label
ORDER BY label
""",
    description="Embedding compression: symmetric int8 scalar "
    "quantization (per-vector amax/127 scale) with exact reconstruction "
    "error and saturation accounting per label — the storage-4×-smaller "
    "path for the ANN family; element-row plan, decimal-stabilized "
    "error sums (order-independent, engine-portable).",
)
def q_scalar_quantization(spark, sf_dir):
    from pyspark.sql import Window

    (emb,) = load(spark, sf_dir, "embeddings")
    el = emb.select(
        "vec_id",
        "label",
        F.explode(F.transform("embedding", lambda x: x.cast("double"))).alias("x"),
    )
    amax = F.greatest(
        F.max(F.abs(F.col("x"))).over(Window.partitionBy("vec_id")),
        F.lit(1e-12),
    )
    scaled = el.select("vec_id", "label", "x", amax.alias("amax"))
    qv = F.round((F.col("x") * F.lit(127.0)) / F.col("amax"))
    q = scaled.select("vec_id", "label", qv.alias("qv"), "x", "amax")
    recon_err = F.col("x") - (F.col("qv") * F.col("amax")) / F.lit(127.0)
    err = q.select(
        "vec_id",
        "label",
        F.when(F.abs(F.col("qv")) == 127, 1).otherwise(0).alias("saturated"),
        F.round(recon_err * recon_err, 12).cast("decimal(28,12)").alias("sq"),
    )
    per_vec = err.groupBy("vec_id", "label").agg(
        F.sum("sq").alias("vec_sq"),
        F.sum("saturated").alias("n_sat"),
        F.count(F.lit(1)).alias("n_el"),
    )
    return (
        per_vec.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.sum("n_el").cast("long").alias("n_elems"),
            F.sum("n_sat").cast("long").alias("n_saturated"),
            F.sum("vec_sq").cast("double").alias("total_sq_err"),
        )
        .orderBy("label")
    )


@query(
    "q_hard_negatives",
    oracle=f"""
WITH v AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
),
q AS (SELECT * FROM v WHERE vec_id < {N_QUERY_VECTORS}),
scored AS (
  SELECT q.vec_id AS query_id, q.label AS query_label,
         c.vec_id AS neighbor_id, c.label AS neighbor_label,
         list_dot_product(q.e, c.e)
           / (sqrt(list_dot_product(q.e, q.e))
              * sqrt(list_dot_product(c.e, c.e))) AS cos
  FROM q JOIN v c
    ON c.vec_id <> q.vec_id AND c.label <> q.label
), ranked AS (
  SELECT *, ROW_NUMBER() OVER (
           PARTITION BY query_id ORDER BY cos DESC, neighbor_id
         ) AS rank
  FROM scored
)
SELECT query_id, query_label, neighbor_id, neighbor_label,
       CAST(rank AS BIGINT) AS rank, round(cos, 4) AS cos_r
FROM ranked WHERE rank <= 3
ORDER BY query_id, rank
""",
    description="Hard-negative mining for contrastive training "
    "(ext/similarity.hard_negative_topk): per query vector, the top-3 "
    "most similar vectors with a DIFFERENT label — broadcast-query x "
    "partitioned-corpus with the label-mismatch residual in the join; "
    "at scale the same filter composes onto the IVF probe-limited "
    "candidate stream.",
)
def q_hard_negatives(spark, sf_dir):
    (emb,) = load(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < N_QUERY_VECTORS)
    return (
        S.hard_negative_topk(emb, queries, k=3)
        .select(
            "query_id", "query_label", "neighbor_id", "neighbor_label",
            "rank", F.round("cos", 4).alias("cos_r"),
        )
        .orderBy("query_id", "rank")
    )
