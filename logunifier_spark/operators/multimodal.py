"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as `binary` columns with a metadata struct. The
Spark-side plumbing — schema, partition-friendly layout, Arrow-batched UDF
signatures, frame-sampling shapes — is real and tested; the actual codec
work is STUBBED (this container ships no image/audio libraries): decode
raises NotImplementedError unless `fake=True`, in which case a deterministic
fake decoder (hash-derived pixels) exercises the full data path.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType([
    StructField("media_id", StringType()),
    StructField("kind", StringType()),        # image | audio | video
    StructField("mime", StringType()),
    StructField("payload", BinaryType()),
    StructField("meta", StructType([
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", IntegerType()),
        StructField("sample_rate", IntegerType()),
    ])),
])

FEATURE_SCHEMA = StructType([
    StructField("media_id", StringType()),
    StructField("kind", StringType()),
    StructField("feature", ArrayType(FloatType())),
    StructField("decode_ok", StringType()),
])


def _fake_decode(payload: bytes, dim: int = 16) -> np.ndarray:
    """Deterministic stand-in for a real decoder: derive `dim` floats from a
    sha256 of the payload. Replaces PIL/librosa/ffmpeg in this container."""
    h = hashlib.sha256(payload or b"").digest()
    raw = np.frombuffer((h * ((dim * 4) // len(h) + 1))[: dim * 4], dtype="<u4")
    return (raw.astype(np.float64) / 2**32).astype(np.float32)


def extract_features(df: DataFrame, dim: int = 16, fake: bool = True) -> DataFrame:
    """mapInPandas feature extraction over binary payloads — the Arrow batch
    path a real decoder would use (payload bytes never leave the executor;
    one Python worker round-trip per batch, vectorized inside)."""
    if not fake:
        raise NotImplementedError(
            "real image/audio decode requires codec libraries not present "
            "in this environment; run with fake=True for the plumbing path")

    def _batches(it):
        for pdf in it:
            feats = [
                _fake_decode(p, dim).tolist() if p is not None else None
                for p in pdf["payload"]
            ]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "feature": feats,
                "decode_ok": ["ok" if p is not None else "null_payload"
                              for p in pdf["payload"]],
            })

    return df.mapInPandas(_batches, schema=FEATURE_SCHEMA)


def resize_images(df: DataFrame, width: int, height: int,
                  fake: bool = True) -> DataFrame:
    """mapInPandas image resize over binary payloads: same MEDIA_SCHEMA out,
    payload replaced by the resized encoding and meta.width/height updated.
    The codec step is stubbed (no PIL in this container): the fake path
    emits a deterministic width*height*3-byte payload derived from the
    source payload hash, so partitioning/batch shapes and schema evolution
    are exercised for real."""
    if not fake:
        raise NotImplementedError(
            "real image resize requires codec libraries not present in "
            "this environment; run with fake=True for the plumbing path")

    def _batches(it):
        for pdf in it:
            rows = []
            for p in pdf["payload"]:
                if p is None:
                    rows.append(None)
                    continue
                h = hashlib.sha256(bytes(p)).digest()
                need = width * height * 3
                rows.append(bytearray((h * (need // len(h) + 1))[:need]))
            out = pdf.copy()
            out["payload"] = rows
            out["meta"] = [
                {"width": width, "height": height,
                 "duration_ms": (m or {}).get("duration_ms"),
                 "sample_rate": (m or {}).get("sample_rate")}
                for m in pdf["meta"]
            ]
            yield out

    return (df.where(F.col("kind") == "image")
              .mapInPandas(_batches, schema=MEDIA_SCHEMA))


def sample_frames(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one row per sampled frame offset, native
    explode over the duration metadata (decode of the frame itself is the
    stubbed step)."""
    n = F.greatest((F.col("meta.duration_ms") / every_ms).cast("int"), F.lit(1))
    return (df.where(F.col("kind") == "video")
              .select("media_id", "mime",
                      F.explode(F.sequence(F.lit(0), n - 1)).alias("frame_no"))
              .withColumn("offset_ms", F.col("frame_no") * every_ms))


def synth_media(spark, n: int = 64) -> DataFrame:
    """Deterministic synthetic media table (binary payload = repeated hash
    of the id) for tests and benches."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = hashlib.sha256(str(i).encode()).digest() * 4
        rows.append((
            f"m{i:06d}", kind,
            {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
            bytearray(payload),
            (64, 48, None, None) if kind == "image"
            else (None, None, 4500, 16000) if kind == "audio"
            else (640, 480, 10_000, None),
        ))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
