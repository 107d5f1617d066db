"""Multimodal queries: binary media columns + typed metadata.

The synthetic media table derives deterministically from documents
(ext/multimodal.synth_media), so the JVM-side binary operators are
DuckDB-oracle-checkable; the Pandas-UDF decode path is rows-only here
and numerically validated against local numpy in
tests/test_multimodal.py.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from clickbom_spark.ext import multimodal as M
from clickbom_spark.queries import load, query


@query(
    "q_binary_metadata",
    oracle="""
SELECT (['image', 'audio', 'video'])[CAST(doc_id % 3 AS INT) + 1] AS modality,
       COUNT(*) AS n_media,
       CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
       COUNT(DISTINCT md5(text)) AS n_distinct_blobs,
       CAST(MAX(octet_length(encode(text))) AS BIGINT) AS max_bytes
FROM documents
GROUP BY 1
ORDER BY modality
""",
    description="Opaque-binary column handling JVM-side: byte length, "
    "blob digest, per-modality accounting — no Python in the plan.",
)
def q_binary_metadata(spark, sf_dir):
    (docs,) = load(spark, sf_dir, "documents")
    media = M.synth_media(docs)
    return (
        media.groupBy("modality")
        .agg(
            F.count(F.lit(1)).alias("n_media"),
            F.sum(F.length("content")).cast("long").alias("total_bytes"),
            F.countDistinct(F.md5("content")).alias("n_distinct_blobs"),
            F.max(F.length("content")).cast("long").alias("max_bytes"),
        )
        .orderBy("modality")
    )


@query(
    "q_multimodal_features",
    oracle=None,  # Pandas-UDF decode path; numpy-validated in pytest
    description="Arrow-batched mapInPandas decode/feature-extract over "
    "binary media (deterministic fake kernel; real batching).",
)
def q_multimodal_features(spark, sf_dir):
    (docs,) = load(spark, sf_dir, "documents")
    feats = M.decode_media(M.synth_media(docs))
    return (
        feats.groupBy("modality")
        .agg(
            F.count(F.lit(1)).alias("n_media"),
            F.sum("n_bytes").alias("total_bytes"),
            F.sum(F.round("byte_mean", 4).cast("decimal(18,4)"))
            .cast("double")
            .alias("total_byte_mean"),
            F.sum(F.round(F.element_at("features", 1), 6).cast("decimal(18,6)"))
            .cast("double")
            .alias("total_f0"),
        )
        .orderBy("modality")
    )


@query(
    "q_video_frame_sample",
    oracle=None,  # Pandas-UDF frame slicing; validated in pytest
    description="Per-video deterministic frame sampling (byte-sliced "
    "stand-in for a codec): explode to one row per sampled frame.",
)
def q_video_frame_sample(spark, sf_dir):
    (docs,) = load(spark, sf_dir, "documents")
    frames = M.sample_frames(M.synth_media(docs), k=2)
    return frames.select(
        "media_id", "frame_idx", F.length("frame_bytes").alias("frame_len")
    ).orderBy("media_id", "frame_idx")
