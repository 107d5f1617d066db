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
    # The decode kernel's outputs are exact arithmetic over the UTF-8
    # bytes (integer byte sums < 2^53 are order-independent in float64,
    # so numpy's pairwise mean equals SQL's sequential sum/n exactly),
    # and the corpus text is pure ASCII — so DuckDB can recompute the
    # Pandas-UDF results from character codes and the oracle checks the
    # decode path end to end, not just its row count.
    oracle="""
WITH m AS (
  SELECT (['image', 'audio', 'video'])[CAST(doc_id % 3 AS INT) + 1] AS modality,
         octet_length(encode(text)) AS nb,
         [ascii(text[i]) for i in range(1, length(text) + 1)] AS bs
  FROM documents
), feats AS (
  SELECT modality, nb,
         CASE WHEN nb > 0
              THEN CAST(list_sum(bs) AS DOUBLE) / nb ELSE 0.0 END AS byte_mean,
         CASE WHEN nb > 0
              THEN CAST(len(list_filter(bs, x -> x < 16)) AS DOUBLE) / nb
              ELSE 0.0 END AS f0
  FROM m
)
SELECT modality,
       COUNT(*) AS n_media,
       CAST(SUM(nb) AS BIGINT) AS total_bytes,
       CAST(SUM(CAST(round(byte_mean, 4) AS DECIMAL(18,4))) AS DOUBLE)
         AS total_byte_mean,
       CAST(SUM(CAST(round(f0, 6) AS DECIMAL(18,6))) AS DOUBLE) AS total_f0
FROM feats
GROUP BY modality
ORDER BY modality
""",
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
    "q_resize_media",
    # The raw-format nearest-neighbor resize is deterministic integer
    # sampling over the zero-padded 64x48 byte buffer: resizing to
    # 16x12 samples byte (4y*64 + 4x) per output pixel.  DuckDB
    # recomputes every sampled byte from the ASCII codes, so the
    # resize kernel itself is oracle-checked.
    oracle="""
WITH imgs AS (
  SELECT doc_id AS media_id, text, octet_length(encode(text)) AS nb
  FROM documents WHERE doc_id % 3 = 0
)
SELECT media_id,
       CAST(192 AS BIGINT) AS resized_len,
       CAST(list_sum([list_sum(
           [CASE WHEN (y*256 + x*4) < nb AND (y*256 + x*4) < 3072
                 THEN ascii(text[y*256 + x*4 + 1]) ELSE 0 END
            for x in range(16)]) for y in range(12)]) AS BIGINT)
         AS resized_byte_sum
FROM imgs
ORDER BY media_id
""",
    description="Raw-format nearest-neighbor image resize (numpy kernel "
    "in mapInPandas, codec-free): 64x48 -> 16x12, verified byte-exactly "
    "via the sampled-byte checksum.",
)
def q_resize_media(spark, sf_dir):
    (docs,) = load(spark, sf_dir, "documents")
    # synth_media emits raw buffers only — declare it so the codec gate
    # needs no plan-build scan of the corpus
    resized = M.resize_media(
        M.synth_media(docs), width=16, height=12, formats=["raw"]
    )
    return resized.select(
        "media_id",
        F.length("content").cast("long").alias("resized_len"),
        F.aggregate(
            F.transform(
                F.sequence(F.lit(1), F.length("content")),
                lambda i: F.expr("content").substr(i, F.lit(1)),
            ),
            F.lit(0).cast("long"),
            lambda acc, b: acc
            + F.coalesce(F.ascii(b.cast("string")), F.lit(0)).cast("long"),
        ).alias("resized_byte_sum"),
    ).orderBy("media_id")


@query(
    "q_video_frame_sample",
    # Frame slicing is deterministic integer arithmetic over byte
    # lengths (k=2 evenly spaced frames; Python slice truncation =
    # least/greatest clamps), so DuckDB replicates the Pandas-UDF
    # output exactly.
    oracle="""
WITH vids AS (
  SELECT doc_id AS media_id,
         octet_length(encode(text)) AS nb,
         CAST(doc_id % 8 AS INT) + 2 AS n_frames
  FROM documents
  WHERE doc_id % 3 = 2
), geom AS (
  SELECT media_id, nb, n_frames,
         GREATEST(nb // n_frames, 1) AS flen,
         GREATEST(n_frames // 2, 1) AS step
  FROM vids
), frames AS (
  SELECT media_id,
         LEAST(j * step, n_frames - 1) AS frame_idx,
         LEAST(flen, GREATEST(nb - LEAST(j * step, n_frames - 1) * flen, 0))
           AS frame_len
  FROM geom, range(2) t(j)
)
SELECT media_id, CAST(frame_idx AS BIGINT) AS frame_idx,
       CAST(frame_len AS BIGINT) AS frame_len
FROM frames
ORDER BY media_id, frame_idx
""",
    description="Per-video deterministic frame sampling (byte-sliced "
    "stand-in for a codec): explode to one row per sampled frame.",
)
def q_video_frame_sample(spark, sf_dir):
    (docs,) = load(spark, sf_dir, "documents")
    frames = M.sample_frames(M.synth_media(docs), k=2)
    return frames.select(
        "media_id",
        F.col("frame_idx").cast("long").alias("frame_idx"),
        F.length("frame_bytes").cast("long").alias("frame_len"),
    ).orderBy("media_id", "frame_idx")
