"""Multimodal (image/audio/video) column plumbing.

Media travel as opaque ``binary`` columns with typed metadata structs; decode /
feature-extract / resize / frame-sample run as Arrow-batched ``mapInPandas``
stages so each executor processes whole record batches. The actual codecs
(PIL/ffmpeg/torchaudio) are NOT in this container, so the decode kernels are
STUBBED: ``decoder="fake"`` produces deterministic synthetic outputs (real
schema, partitioning, batch shape), any other decoder raises
NotImplementedError at the point a real codec would be invoked. The Spark-side
contract — schemas, UDF signatures, batch iteration — is real and tested.
"""
from __future__ import annotations

import hashlib
from typing import Iterator

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

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("mime", StringType()),
        StructField("payload", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", IntegerType()),
    ]
)

IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("embedding", ArrayType(FloatType())),
        StructField("payload_sha", StringType()),
    ]
)


def _fake_embedding(payload: bytes, dim: int = 16) -> np.ndarray:
    """Deterministic stand-in for a real vision encoder: bytes → unit vector."""
    h = hashlib.sha256(payload or b"").digest()
    raw = np.frombuffer((h * ((dim * 4) // len(h) + 1))[: dim * 4], dtype=np.uint32)
    v = (raw.astype(np.float64) / np.iinfo(np.uint32).max) - 0.5
    n = np.linalg.norm(v)
    return (v / n if n else v).astype(np.float32)


def extract_image_features(
    df: DataFrame, decoder: str = "fake", embedding_dim: int = 16
) -> DataFrame:
    """media table → per-image feature rows via mapInPandas (Arrow batches).

    ``decoder='fake'``: deterministic synthetic embedding + passthrough dims.
    Anything else raises NotImplementedError where PIL/torchvision would run.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decoder != "fake":
                raise NotImplementedError(
                    f"decoder {decoder!r}: real image codecs are not available "
                    "in this environment; only the deterministic 'fake' decoder runs"
                )
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": pdf["width"].astype("int32"),
                    "height": pdf["height"].astype("int32"),
                    "embedding": [
                        _fake_embedding(p, embedding_dim).tolist() for p in payloads
                    ],
                    "payload_sha": [
                        hashlib.sha256(p or b"").hexdigest() for p in payloads
                    ],
                }
            )

    return df.filter(F.col("kind") == "image").mapInPandas(run, IMAGE_FEATURES_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_ms", IntegerType()),
        StructField("frame_payload", BinaryType()),
    ]
)


def sample_video_frames(
    df: DataFrame, every_ms: int = 1000, decoder: str = "fake"
) -> DataFrame:
    """video rows → sampled frame rows (1→N fan-out inside mapInPandas).
    Fake decoder emits deterministic pseudo-frames (sliced payload bytes)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decoder != "fake":
                raise NotImplementedError(
                    f"decoder {decoder!r}: ffmpeg is not available here; "
                    "only the deterministic 'fake' frame sampler runs"
                )
            # vectorized 1→N fan-out (repeat + offset arithmetic); only the
            # per-frame payload slice — the stand-in for the real decode
            # kernel, which is a per-frame C call anyway — touches Python
            dur = pdf["duration_ms"].fillna(0).astype("int64").to_numpy()
            n = np.maximum(-(-dur // every_ms), 0)
            total = int(n.sum())
            if total == 0:
                continue
            row_pos = np.repeat(np.arange(len(pdf)), n)
            fidx = np.arange(total) - np.repeat(np.cumsum(n) - n, n)
            payloads = pdf["payload"].to_numpy()
            fpay = []
            for rp, i in zip(row_pos, fidx):
                p = payloads[rp] or b""
                start = (int(i) * 16) % max(len(p), 1)
                fpay.append(bytes(p[start : start + 16]))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy()[row_pos],
                    "frame_idx": fidx.astype("int32"),
                    "frame_ms": (fidx * every_ms).astype("int32"),
                    "frame_payload": fpay,
                }
            )

    return df.filter(F.col("kind") == "video").mapInPandas(run, FRAME_SCHEMA)


AUDIO_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("duration_ms", IntegerType()),
        StructField("n_frames", IntegerType()),
        StructField("embedding", ArrayType(FloatType())),
        StructField("payload_sha", StringType()),
    ]
)


def extract_audio_features(
    df: DataFrame,
    decoder: str = "fake",
    frame_ms: int = 25,
    hop_ms: int = 10,
    embedding_dim: int = 16,
) -> DataFrame:
    """audio rows → per-clip feature rows via mapInPandas (Arrow batches):
    framing arithmetic (how many ``frame_ms`` windows at ``hop_ms`` stride
    fit the clip — the MFCC-pipeline frame count) is real and vectorized;
    the spectral kernel itself is the honest stub (``decoder='fake'`` emits
    a deterministic payload-derived embedding; anything else raises where
    torchaudio/librosa would run)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decoder != "fake":
                raise NotImplementedError(
                    f"decoder {decoder!r}: audio codecs are not available "
                    "here; only the deterministic 'fake' decoder runs"
                )
            dur = pdf["duration_ms"].fillna(0).astype("int64").to_numpy()
            n_frames = np.where(
                dur >= frame_ms, (dur - frame_ms) // hop_ms + 1, 0
            ).astype("int32")
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "duration_ms": dur.astype("int32"),
                    "n_frames": n_frames,
                    "embedding": [
                        _fake_embedding(p, embedding_dim).tolist() for p in payloads
                    ],
                    "payload_sha": [
                        hashlib.sha256(p or b"").hexdigest() for p in payloads
                    ],
                }
            )

    return df.filter(F.col("kind") == "audio").mapInPandas(run, AUDIO_FEATURES_SCHEMA)


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("payload", BinaryType()),
    ]
)


def resize_images(
    df: DataFrame, width: int, height: int, decoder: str = "fake"
) -> DataFrame:
    """image rows → fixed-size rows (the training-pipeline resize stage).
    Fake decoder emits a deterministic width*height-proportional slice/tile
    of the payload so output size tracks the target dims; real resizing
    would be PIL's C kernel in the same mapInPandas slot."""
    target = max(int(width) * int(height) // 64, 1)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decoder != "fake":
                raise NotImplementedError(
                    f"decoder {decoder!r}: PIL is not available here; "
                    "only the deterministic 'fake' resizer runs"
                )
            out_payloads = []
            for p in pdf["payload"]:
                p = bytes(p or b"")
                tiled = (p * (target // max(len(p), 1) + 1))[:target]
                out_payloads.append(tiled)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": np.full(len(pdf), width, dtype="int32"),
                    "height": np.full(len(pdf), height, dtype="int32"),
                    "payload": out_payloads,
                }
            )

    return df.filter(F.col("kind") == "image").mapInPandas(run, RESIZED_SCHEMA)


def synthesize_media(spark, n: int = 100) -> DataFrame:
    """Deterministic fake media table for tests (binary payloads derived from
    the row id — no external data)."""
    rows = []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        payload = hashlib.sha256(str(i).encode()).digest() * 4
        rows.append(
            (
                f"m{i:05d}",
                kind,
                {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                bytearray(payload),
                64 + i % 32 if kind == "image" else None,
                48 + i % 16 if kind == "image" else None,
                (i % 7 + 1) * 1500 if kind in ("video", "audio") else None,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
