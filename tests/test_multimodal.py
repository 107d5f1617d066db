"""Multimodal plumbing: the mapInPandas batch path must agree with a
local (numpy) recomputation byte-for-byte, frame slicing must be
deterministic, and the codec stub must fail fast."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from clickbom_spark.ext import multimodal as M
from clickbom_spark.session import read_table
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def media(spark):
    docs = read_table(spark, SF_SMOKE, "documents")
    return M.synth_media(docs).cache()


def test_synth_media_schema(media):
    # simpleString ignores nullability (literals come out non-nullable)
    assert media.schema.simpleString() == M.MEDIA_SCHEMA.simpleString()


def test_decode_matches_local_numpy(spark, media):
    sample = media.orderBy("media_id").limit(20).collect()
    got = {
        r["media_id"]: r
        for r in M.decode_media(media.orderBy("media_id").limit(20)).collect()
    }
    assert len(got) == 20
    for row in sample:
        arr = np.frombuffer(row["content"], dtype=np.uint8)
        g = got[row["media_id"]]
        assert g["n_bytes"] == len(row["content"])
        assert g["byte_mean"] == pytest.approx(float(arr.mean()))
        hist = np.bincount(arr >> 4, minlength=M.FEATURE_DIM) / arr.size
        assert np.allclose(g["features"], hist)


def test_decode_distributed_batches(spark, media):
    """Partitioned input must produce identical results to single batch
    (the mapInPandas kernel is per-batch stateless)."""
    def key(r):
        return (r["media_id"], r["modality"], r["n_bytes"], r["byte_mean"], tuple(r["features"]))

    one = {key(r) for r in M.decode_media(media.coalesce(1)).collect()}
    many = {key(r) for r in M.decode_media(media.repartition(8)).collect()}
    assert one == many


def test_sample_frames_deterministic_slices(spark, media):
    videos = {r["media_id"]: r for r in media.where(F.col("modality") == "video").collect()}
    frames = M.sample_frames(media, k=2).collect()
    assert len(frames) > 0
    by_media = {}
    for fr in frames:
        by_media.setdefault(fr["media_id"], []).append(fr)
    for mid, frs in by_media.items():
        row = videos[mid]
        n_frames = row["meta"]["n_frames"]
        assert len(frs) == min(2, n_frames)
        frame_len = max(len(row["content"]) // n_frames, 1)
        for fr in frs:
            start = fr["frame_idx"] * frame_len
            assert bytes(fr["frame_bytes"]) == row["content"][start : start + frame_len]


def test_resize_raw_matches_local_numpy(media):
    """The raw-format nearest-neighbor resize must agree byte-for-byte
    with a local numpy recomputation (zero-padded 64x48 buffer, sampled
    at floor-scaled indices)."""
    out = {
        r["media_id"]: bytes(r["content"])
        for r in M.resize_media(media, 16, 12).collect()
    }
    src = {
        r["media_id"]: (bytes(r["content"]), r["meta"])
        for r in media.where(F.col("modality") == "image").collect()
    }
    assert set(out) == set(src)
    for mid, (content, meta) in src.items():
        w, h = meta["width"], meta["height"]
        buf = np.zeros(w * h, dtype=np.uint8)
        arr = np.frombuffer(content, dtype=np.uint8)[: w * h]
        buf[: arr.size] = arr
        img = buf.reshape(h, w)
        ys = (np.arange(12) * h // 12).clip(0, h - 1)
        xs = (np.arange(16) * w // 16).clip(0, w - 1)
        assert out[mid] == img[np.ix_(ys, xs)].tobytes()
        assert len(out[mid]) == 16 * 12


def test_resize_encoded_fails_fast_without_codec(spark, media):
    """Encoded formats still fail at plan-build time when no codec is
    importable (never per-row inside tasks)."""
    if M._HAS_PIL:
        pytest.skip("PIL available; encoded path would run")
    encoded = media.withColumn(
        "meta",
        F.struct(
            F.col("meta.width").alias("width"),
            F.col("meta.height").alias("height"),
            F.col("meta.sample_rate").alias("sample_rate"),
            F.col("meta.n_frames").alias("n_frames"),
            F.lit("png").alias("format"),
        ),
    )
    with pytest.raises(NotImplementedError):
        M.resize_media(encoded, 32, 32)


def _tiny_bmp(w=8, h=8):
    """Uncompressed 24-bit BMP built with stdlib struct only — no codec
    needed to CREATE it, so the encoded-format path is exercisable even
    in a PIL-less environment (the gate), and fully when PIL exists."""
    import struct

    rows = b""
    for y in range(h):
        row = b"".join(
            struct.pack("BBB", (x * 31) % 256, (y * 17) % 256, (x + y) % 256)
            for x in range(w)
        )
        rows += row + b"\x00" * ((-len(row)) % 4)
    dib = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(rows), 2835, 2835, 0, 0
    )
    off = 14 + 40
    hdr = struct.pack("<2sIHHI", b"BM", off + len(rows), 0, 0, off)
    return hdr + dib + rows


def _bmp_media(spark):
    import pyspark.sql.types as T

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("modality", T.StringType()),
            T.StructField("content", T.BinaryType()),
            T.StructField("meta", M.MEDIA_META),
        ]
    )
    return spark.createDataFrame(
        [(1, "image", bytearray(_tiny_bmp()), (8, 8, None, None, "bmp"))],
        schema,
    )


def test_resize_declared_encoded_format_gates_without_scan(spark):
    """With formats declared by the caller, the codec gate must decide
    WITHOUT running a job — assert by handing in a frame whose
    evaluation would throw, which only a scan would trigger."""
    if M._HAS_PIL:
        pytest.skip("PIL available; gate would pass")
    poisoned = _bmp_media(spark).withColumn(
        "media_id",
        F.when(F.lit(True), F.col("media_id")).otherwise(
            F.raise_error("must not be evaluated")
        ),
    )
    with pytest.raises(NotImplementedError):
        M.resize_media(poisoned, 4, 4, formats=["bmp"])


def test_resize_encoded_bmp_happy_path(spark):
    """The PIL-gated branch end-to-end on a real (struct-built) BMP."""
    if not M._HAS_PIL:
        pytest.skip("PIL not available in this environment")
    out = M.resize_media(_bmp_media(spark), 4, 4, formats=["bmp"]).collect()
    assert len(out) == 1
    # 4x4 RGB pixels from PIL -> 48 bytes
    assert len(bytes(out[0]["content"])) == 4 * 4 * 3
    assert out[0]["meta"]["width"] == 4 and out[0]["meta"]["height"] == 4
