"""Similarity-search queries over the embeddings table (north-star ops)."""

from __future__ import annotations

from pyspark.sql import functions as F

from clickbom_spark.ext import similarity as S
from clickbom_spark.queries import load, query

N_QUERY_VECTORS = 10
TOP_K = 10


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


@query(
    "q_rp_lsh_ann",
    oracle=None,  # approximate by construction; recall measured in pytest
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
