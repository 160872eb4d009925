"""Multimodal column plumbing (images/audio/video as opaque binary).

The decode/resize/frame-sample kernels need codec libraries that are not in
this container, so the kernels are STUBS — a deterministic fake keyed on the
content bytes, clearly marked. Everything Spark-side is real and tested:
schema, Arrow batch shape, `mapInPandas` signature, partition behavior.

Design mirrors the reference's per-mode preprocessing tiers
(/root/reference/src/core/vision.py:211-304 — describe 512² / detect 384² /
document 768² letterboxed resize): mode picks the target shape; the stub
records what the real kernel would have produced.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from fa_spark import pure

MODE_RESOLUTION = {"describe": 512, "detect": 384, "document": 768}

MEDIA_FEATURES = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("content_type", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("sha", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("target_res", T.IntegerType()),
        T.StructField("decode_status", T.StringType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)

FEATURE_DIM = 16


def _fake_decode(data: bytes, target_res: int) -> list[float]:
    """Deterministic stand-in for decode+resize+feature-extract.

    REAL IMPLEMENTATION REQUIRES A CODEC (PIL/ffmpeg) — NOT IN CONTAINER.
    The fake hashes the bytes into a fixed-dim float vector so downstream
    plumbing (schema, similarity join, batching) is fully exercisable.
    """
    h = hashlib.sha256(data + str(target_res).encode()).digest()
    return [round(((h[i] / 255.0) * 2 - 1), 6) for i in range(FEATURE_DIM)]


def media_features_fn(mode: str = "describe"):
    """mapInPandas generator over (media_id, content) batches."""
    target = MODE_RESOLUTION.get(mode, 512)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, data in zip(pdf["media_id"], pdf["content"]):
                b = bytes(data) if data is not None else b""
                sn = pure.sniff_bytes(b)
                meta = pure.extract_metadata(b)
                width = meta.get("png:width") or meta.get("jpeg:width")
                height = meta.get("png:height") or meta.get("jpeg:height")
                decodable = sn["content_type"] in ("png", "jpeg", "gif", "bmp", "tiff")
                rows.append(
                    {
                        "media_id": mid,
                        "content_type": sn["content_type"],
                        "n_bytes": len(b),
                        "sha": hashlib.sha256(b).hexdigest(),
                        "width": int(width) if width else None,
                        "height": int(height) if height else None,
                        "target_res": target,
                        "decode_status": "stubbed" if decodable else "skipped",
                        "feature": _fake_decode(b, target) if decodable else None,
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in MEDIA_FEATURES.fields])

    return fn


def extract_media_features(
    df: DataFrame, id_col: str = "media_id", content_col: str = "content",
    mode: str = "describe",
) -> DataFrame:
    """df(media_id, content binary) -> MEDIA_FEATURES rows.

    Partition-parallel; each Arrow batch is decoded independently, so the
    stage scales with executors exactly like the text pipeline.
    """
    src = df.select(
        F.col(id_col).cast("string").alias("media_id"),
        F.col(content_col).alias("content"),
    )
    return src.mapInPandas(media_features_fn(mode), MEDIA_FEATURES)
