"""Multimodal-column queries: opaque binary payloads + typed metadata
(SURVEY §1.2's byte-opaque envelope philosophy applied to media).

The media table is synthesized deterministically from the documents corpus
(md5-derived payload bytes), so the binary plumbing — cast to BINARY,
JVM-side substring frame slicing, Arrow-batched mapInPandas decode — is
oracle-checkable against DuckDB computing the same bytes as VARCHAR/ascii
arithmetic. The genuinely codec-dependent decode (md5-seeded pixel
expansion) registers rows-only; its numerics are pinned by pytest instead
(tests/test_multimodal.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from brooklin_spark.io import table
from brooklin_spark.operators import multimodal as M
from brooklin_spark.registry import query

# ---------------------------------------------------------------------------
# Frame sampling: pure binary slicing (substring on BINARY), fully JVM-side.
# 64-byte payload, 16-byte frames, every 2nd frame.
# ---------------------------------------------------------------------------


@query(
    "multimodal_frame_sample",
    oracle="""
    WITH media AS (
      SELECT doc_id, md5(text) || md5(text || ':1') AS payload
      FROM documents WHERE doc_id < 200),
    idx AS (SELECT unnest(generate_series(0, 2)) AS i),
    frames AS (
      SELECT doc_id, CAST(i * 2 AS BIGINT) AS frame_no,
             substr(payload, i * 2 * 16 + 1, 16) AS frame_ascii
      FROM media CROSS JOIN idx)
    SELECT doc_id, frame_no, frame_ascii
    FROM frames WHERE length(frame_ascii) = 16
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    payload = F.concat(
        F.md5("text"), F.md5(F.concat(F.col("text"), F.lit(":1")))
    ).cast("binary")
    media = docs.select("doc_id", payload.alias("payload"))
    frames = M.sample_video_frames(media, frame_size=16, every_k=2, max_frames=3)
    return frames.select(
        "doc_id",
        F.col("frame_no").cast("bigint").alias("frame_no"),
        F.col("frame").cast("string").alias("frame_ascii"),
    )


# ---------------------------------------------------------------------------
# Audio features through the REAL Arrow/mapInPandas path, oracle-checked:
# the 32 payload bytes (ASCII hex of md5) parse as 16 little-endian int16
# samples; DuckDB recomputes them with ascii() arithmetic. Sums are exact
# integers in double, so rms/peak match bit-for-bit.
# ---------------------------------------------------------------------------


@query(
    "multimodal_audio_features",
    oracle="""
    WITH media AS (
      SELECT doc_id, md5(text) AS payload FROM documents WHERE doc_id < 500),
    samples AS (
      SELECT doc_id, i,
             ascii(substr(payload, 2 * i + 1, 1))
               + 256 * ascii(substr(payload, 2 * i + 2, 1)) AS s
      FROM media CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS i) g),
    feat AS (
      SELECT doc_id,
             COUNT(*) AS n_samples,
             ROUND(sqrt(AVG(CAST(s AS DOUBLE) * s)), 8) AS rms,
             ROUND(MAX(ABS(CAST(s AS DOUBLE))), 8) AS peak,
             CAST(0 AS BIGINT) AS zero_crossings  -- hex-ASCII samples are all > 0
      FROM samples GROUP BY doc_id)
    SELECT doc_id, n_samples, rms, peak, zero_crossings FROM feat
    """,
)
def multimodal_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 500)
    media = docs.select("doc_id", F.md5("text").cast("binary").alias("payload"))
    feats = M.audio_features(media)
    return feats.select(
        "doc_id",
        "n_samples",
        F.round("rms", 8).alias("rms"),
        F.round("peak", 8).alias("peak"),
        "zero_crossings",
    )


# ---------------------------------------------------------------------------
# Image decode + feature extraction, oracle-checked: the md5-chain fake
# decode expands seed := md5(text) into 48 chunks of md5(seed || ':' || k),
# 16 bytes each = 768 pixels; DuckDB recomputes every pixel byte from the
# same hex math, so mean/median intensities match exactly. (The real-codec
# path stays gated behind the PIL import; numerics are additionally pinned
# in tests/test_multimodal.py against an independent numpy computation.)
# ---------------------------------------------------------------------------


@query(
    "multimodal_image_features",
    oracle="""
    WITH base AS (
      SELECT doc_id, md5(text) AS seed FROM documents WHERE doc_id < 200),
    chunks AS (
      SELECT doc_id, c.range AS c, md5(seed || ':' || c.range) AS dh
      FROM base, range(48) c),
    px AS (
      SELECT doc_id, (('0x' || substr(dh, p.range * 2 + 1, 2))::INT) AS v
      FROM chunks, range(16) p)
    SELECT doc_id,
           CAST(32 AS INT) AS width,
           CAST(24 AS INT) AS height,
           AVG(v) AS mean_intensity,
           CAST(MEDIAN(v) AS DOUBLE) AS intensity_p50,
           COUNT(*) AS n_pixels
    FROM px GROUP BY doc_id
    """,
)
def multimodal_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    media = M.synthesize_media_table(docs, width=32, height=24)
    return M.decode_image_features(media)
