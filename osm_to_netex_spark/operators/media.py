"""Multimodal column plumbing: decode / feature-extract over media spans.

Media payloads are opaque ``binary`` columns with typed metadata.  The image/
audio decode libraries are NOT present in this container, so the decode step
is stubbed (deterministic fake keyed on the media_ref, or
NotImplementedError when real decoding is requested) — but the Spark-side
plumbing is real and tested: schema, Arrow batching via ``mapInPandas``,
partition-sized batches, and the exact UDF signature a real decoder drops
into.

This is the only Python-touching operator family in the engine; everything
arrives as pandas DataFrames in Arrow batches (never row-at-a-time).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

MEDIA_FEATURES = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("format", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
        T.StructField("features", T.ArrayType(T.FloatType()), True),
    ]
)

FEATURE_DIM = 16


def extract_media_refs(documents: DataFrame) -> DataFrame:
    """(doc_id, media_ref, payload binary) from media spans.  Payload is the
    (absent) blob — synthesized here as a deterministic small binary so the
    byte-plumbing is exercised end to end."""
    return (
        documents.select("doc_id", F.explode("spans").alias("span"))
        .where(F.col("span.kind") == "media")
        .select(
            "doc_id",
            F.col("span.media_ref").alias("media_ref"),
            F.expr("cast(concat('blob:', span.media_ref) as binary)").alias("payload"),
        )
    )


def _fake_decode(media_ref: str, payload: bytes) -> tuple[str, int, int, int, np.ndarray]:
    """Deterministic fake decoder (STUB — container has no image/audio libs).

    Emulates decode→resize→feature-extract: all values derive from sha256 of
    the payload, so results are stable across runs/partitionings.
    """
    h = hashlib.sha256(payload).digest()
    fmt = ["jpeg", "png", "webp"][h[0] % 3]
    width = 64 + (h[1] % 16) * 32
    height = 64 + (h[2] % 16) * 32
    n_frames = 1 + h[3] % 4
    feats = (
        np.frombuffer(h[: FEATURE_DIM * 2], dtype=np.uint16).astype(np.float32)
        / np.float32(65535.0)
    )
    return fmt, width, height, n_frames, feats


def decode_media(media: DataFrame, real_decode: bool = False) -> DataFrame:
    """mapInPandas decode: (doc_id, media_ref, payload) → MEDIA_FEATURES.

    real_decode=True raises NotImplementedError inside the batch (clearly
    marked stub boundary): plug a PIL/ffmpeg call into ``_fake_decode``'s slot
    when the libraries exist.
    """

    def batches(it):
        for pdf in it:
            if real_decode:
                raise NotImplementedError(
                    "real media decoding requires image/audio libs not present "
                    "in this container; the Arrow plumbing around this point is real"
                )
            rows = [
                _fake_decode(mr, bytes(pl))
                for mr, pl in zip(pdf["media_ref"], pdf["payload"])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "media_ref": pdf["media_ref"].values,
                    "format": [r[0] for r in rows],
                    "width": pd.array([r[1] for r in rows], dtype="int32"),
                    "height": pd.array([r[2] for r in rows], dtype="int32"),
                    "n_frames": pd.array([r[3] for r in rows], dtype="int32"),
                    "features": [r[4] for r in rows],
                }
            )

    return media.mapInPandas(batches, schema=MEDIA_FEATURES)


def frame_sample(media_features: DataFrame, every_n: int = 2) -> DataFrame:
    """Typed frame-sampling plumbing: explode n_frames into frame indexes and
    keep every n-th (Catalyst-side; a real sampler would mapInPandas over the
    frame payloads the same way decode_media does)."""
    return media_features.select(
        "doc_id",
        "media_ref",
        F.explode(F.expr("sequence(0, n_frames - 1)")).alias("frame_idx"),
    ).where(F.col("frame_idx") % every_n == 0)


def resize_media(
    media_features: DataFrame, target_w: int = 224, target_h: int = 224
) -> DataFrame:
    """mapInPandas resize stage: (… width, height, features) → the same rows
    at (target_w, target_h) with features linearly resampled (np.interp over
    the feature axis — the 1-D stand-in for spatial resampling; a real
    implementation swaps a PIL/cv2 call into the same Arrow batch slot).

    Deterministic: float32 interpolation over sha-derived inputs, so output
    is stable across runs and partitionings (pytest-pinned against a NumPy
    reference; the scalar columns ride the media_meta oracle pattern).
    Schema, batching, and column plumbing are the real thing — only the
    pixel math is the labeled stub.
    """

    def batches(it):
        for pdf in it:
            scale = [
                np.interp(
                    np.linspace(0.0, 1.0, num=FEATURE_DIM, dtype=np.float64),
                    np.linspace(0.0, 1.0, num=len(f), dtype=np.float64),
                    np.asarray(f, dtype=np.float64),
                ).astype(np.float32)
                for f in pdf["features"]
            ]
            out = pdf.copy()
            out["width"] = pd.array([target_w] * len(pdf), dtype="int32")
            out["height"] = pd.array([target_h] * len(pdf), dtype="int32")
            out["features"] = scale
            yield out

    return media_features.mapInPandas(batches, schema=MEDIA_FEATURES)
