"""Multimodal columns: image/audio/video as opaque BINARY + typed metadata.

The engine treats media the way it treats CDC payloads — byte-opaque
columns with schema-on-read (the reference's envelope philosophy,
BrooklinEnvelope.java:22-32, applied to media blobs). The Spark-side
plumbing is real: fixed schemas, Arrow-batched mapInPandas operators,
partition-preserving plans. The actual codecs (PIL/ffmpeg/librosa) are NOT
in this container, so decode bodies are gated: real library if importable,
else a clearly-marked deterministic fake so shape/semantics are testable.

Scale notes:
- media rows are large → keep them in their own column family/table and
  join on content id; never groupBy a binary column;
- mapInPandas streams Arrow batches — bounded memory per task regardless
  of row size; spark.sql.execution.arrow.maxRecordsPerBatch caps batch
  row-count for fat rows;
- frame sampling is pure binary slicing (substring) — JVM-side, no Python.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: typed metadata struct carried next to every media payload
MEDIA_META_DDL = (
    "media_type string, width int, height int, channels int, "
    "sample_rate int, duration_ms bigint, codec string"
)

IMAGE_FEATURES_DDL = (
    "doc_id bigint, width int, height int, mean_intensity double, "
    "intensity_p50 double, n_pixels bigint"
)

AUDIO_FEATURES_DDL = (
    "doc_id bigint, n_samples bigint, rms double, peak double, zero_crossings bigint"
)


def _fake_pixels(payload: bytes, width: int, height: int) -> np.ndarray:
    """DETERMINISTIC FAKE decode (codec libs absent): md5-chain byte
    expansion standing in for a decoded grayscale image. Replace the body
    with PIL.Image.open when the container has it.

    Chunk k's 16 bytes are md5(seed_text + ':' + str(k)) where seed_text is
    the payload decoded as latin-1 — text-domain hashing so the expansion
    is expressible in ANSI SQL (md5(seed || ':' || k)) and the features are
    cross-engine oracle-checkable."""
    n = width * height
    out = np.empty(n, dtype=np.uint8)
    seed = (payload or b"\x00").decode("latin-1")
    pos = 0
    counter = 0
    while pos < n:
        h = hashlib.md5(f"{seed}:{counter}".encode("latin-1")).digest()
        take = min(16, n - pos)
        out[pos : pos + take] = np.frombuffer(h[:take], dtype=np.uint8)
        pos += take
        counter += 1
    return out


def _decode_pixels(payload: bytes, width: int, height: int) -> tuple[np.ndarray, int, int]:
    """Decode payload to grayscale pixels: real codec when PIL is importable
    AND the bytes parse as an image, else the deterministic fake at the
    declared (width, height). Per-row fallback keeps the operator total —
    a corrupt blob yields the fake's features instead of failing the batch
    — and keeps results byte-identical to the SQL oracle on non-image
    payloads whether or not PIL is installed."""
    try:  # pragma: no cover - container has no PIL
        import io as _io

        from PIL import Image  # type: ignore

        with Image.open(_io.BytesIO(payload)) as im:
            gray = im.convert("L")
            return np.asarray(gray, dtype=np.uint8).ravel(), gray.width, gray.height
    except Exception:
        return _fake_pixels(payload, width, height), width, height


def decode_image_features(media: DataFrame) -> DataFrame:
    """media(doc_id, payload, meta) -> per-image intensity features.

    mapInPandas: each Arrow batch decodes vectorized in one Python call;
    the plan is partition-preserving (no shuffle).
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload, w, h in zip(
                pdf["doc_id"], pdf["payload"], pdf["width"], pdf["height"]
            ):
                px, rw, rh = _decode_pixels(bytes(payload or b""), int(w), int(h))
                rows.append(
                    {
                        "doc_id": int(doc_id),
                        "width": int(rw),
                        "height": int(rh),
                        "mean_intensity": float(px.mean()),
                        "intensity_p50": float(np.median(px)),
                        "n_pixels": int(px.size),
                    }
                )
            yield pd.DataFrame(rows)

    flat = media.select(
        "doc_id", F.col("payload"), F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
    )
    return flat.mapInPandas(op, schema=IMAGE_FEATURES_DDL)


def resize_image(media: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Block-average resize over the (fake-)decoded pixels — returns new
    payload bytes + updated metadata. Demonstrates the write-back shape:
    binary in, binary out, metadata struct rebuilt."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_rows = []
            for doc_id, payload, w, h in zip(
                pdf["doc_id"], pdf["payload"], pdf["width"], pdf["height"]
            ):
                px = _fake_pixels(bytes(payload or b""), int(w), int(h)).reshape(
                    int(h), int(w)
                )
                ys = np.linspace(0, int(h), out_h + 1, dtype=int)
                xs = np.linspace(0, int(w), out_w + 1, dtype=int)
                small = np.empty((out_h, out_w), dtype=np.uint8)
                for i in range(out_h):
                    for j in range(out_w):
                        block = px[ys[i] : max(ys[i + 1], ys[i] + 1),
                                   xs[j] : max(xs[j + 1], xs[j] + 1)]
                        small[i, j] = int(block.mean())
                out_rows.append(
                    {"doc_id": int(doc_id), "payload": small.tobytes(),
                     "width": out_w, "height": out_h}
                )
            yield pd.DataFrame(out_rows)

    flat = media.select(
        "doc_id", "payload", F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
    )
    return flat.mapInPandas(
        op, schema="doc_id bigint, payload binary, width int, height int"
    )


def audio_features(media: DataFrame) -> DataFrame:
    """Int16-PCM-interpreted features (rms/peak/zero crossings) — the bytes
    ARE the samples here (deterministic; a real codec slots in the same
    UDF body)."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                raw = bytes(payload or b"")
                samples = np.frombuffer(raw[: len(raw) // 2 * 2], dtype="<i2")
                if samples.size == 0:
                    samples = np.zeros(1, dtype="<i2")
                sf = samples.astype(np.float64)
                rows.append(
                    {
                        "doc_id": int(doc_id),
                        "n_samples": int(samples.size),
                        "rms": float(np.sqrt((sf**2).mean())),
                        "peak": float(np.abs(sf).max()),
                        "zero_crossings": int(((sf[:-1] * sf[1:]) < 0).sum()),
                    }
                )
            yield pd.DataFrame(rows)

    return media.select("doc_id", "payload").mapInPandas(op, schema=AUDIO_FEATURES_DDL)


def sample_video_frames(
    media: DataFrame, frame_size: int, every_k: int, max_frames: int = 8
) -> Column | DataFrame:
    """Sample every k-th fixed-size frame from the payload — PURE binary
    slicing (substring), fully JVM-side: no Python for the hot path.

    Returns (doc_id, frame_no, frame binary).
    """
    idx = F.sequence(F.lit(0), F.lit(max_frames - 1))
    frames = F.transform(
        idx,
        lambda i: F.struct(
            (i * every_k).alias("frame_no"),
            F.expr("payload").substr(
                i * every_k * frame_size + 1, F.lit(frame_size)
            ).alias("frame"),
        ),
    )
    return (
        media.select("doc_id", F.explode(frames).alias("f"))
        .select("doc_id", F.col("f.frame_no"), F.col("f.frame"))
        .filter(F.length("f.frame") == frame_size)
    )


def synthesize_media_table(docs: DataFrame, width: int = 32, height: int = 24) -> DataFrame:
    """Build a deterministic media table from the documents corpus: payload
    bytes derive from the text (md5 of text as a seed blob), metadata typed.
    Stands in for reading a real image/audio column from parquet."""
    payload = F.md5("text").cast("binary")
    meta = F.from_json(
        F.to_json(
            F.struct(
                F.lit("image/fake").alias("media_type"),
                F.lit(width).alias("width"),
                F.lit(height).alias("height"),
                F.lit(1).alias("channels"),
                F.lit(None).cast("int").alias("sample_rate"),
                F.lit(None).cast("bigint").alias("duration_ms"),
                F.lit("fake-v1").alias("codec"),
            )
        ),
        MEDIA_META_DDL,
    )
    return docs.select("doc_id", payload.alias("payload"), meta.alias("meta"))


VAD_SEGMENTS_DDL = (
    "doc_id bigint, n_segments bigint, longest_seg bigint, "
    "n_active bigint, active_ratio double"
)


def vad_segments(media: DataFrame, threshold: int) -> DataFrame:
    """Voice-activity segmentation over the int16-PCM interpretation of
    the payload: samples at/above ``threshold`` are active; consecutive
    active samples merge into segments (the run-merge happens inside the
    kernel — per-doc local state, no shuffle). Same decode contract as
    audio_features: the bytes ARE the samples; a real VAD (energy over
    sliding windows, webrtcvad, …) slots into the same kernel body with
    the same Spark-side plumbing."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                raw = bytes(payload or b"")
                samples = np.frombuffer(raw[: len(raw) // 2 * 2], dtype="<i2")
                active = samples >= threshold
                # run-length encode the active mask
                edges = np.diff(active.astype(np.int8))
                starts = int(active[:1].sum()) + int((edges == 1).sum())
                run_lens = []
                if active.any():
                    idx = np.flatnonzero(active)
                    breaks = np.flatnonzero(np.diff(idx) > 1)
                    run_lens = np.diff(
                        np.concatenate(([0], breaks + 1, [idx.size]))
                    ).tolist()
                rows.append(
                    {
                        "doc_id": int(doc_id),
                        "n_segments": int(starts),
                        "longest_seg": int(max(run_lens)) if run_lens else 0,
                        "n_active": int(active.sum()),
                        "active_ratio": float(active.mean())
                        if samples.size
                        else 0.0,
                    }
                )
            yield pd.DataFrame(rows)

    return media.select("doc_id", "payload").mapInPandas(op, schema=VAD_SEGMENTS_DDL)
