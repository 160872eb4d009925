"""Multimodal plumbing tests: schema, batching, stub-decode determinism."""

from __future__ import annotations

import struct
import zlib

from pyspark.sql import functions as F

from fa_spark.stages.multimodal import (
    FEATURE_DIM,
    MODE_RESOLUTION,
    extract_media_features,
)


def _png(w: int, h: int) -> bytes:
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    chunk = (
        struct.pack(">I", len(ihdr))
        + b"IHDR"
        + ihdr
        + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr))
    )
    return b"\x89PNG\r\n\x1a\n" + chunk


def test_media_features_schema_and_stub(spark):
    rows = [
        ("img1", _png(100, 50)),
        ("img2", _png(8, 8) + b"payload"),
        ("doc1", b"%PDF-1.4 not an image"),
        ("nul", None),
    ]
    df = spark.createDataFrame(rows, "media_id string, content binary")
    out = {r["media_id"]: r for r in extract_media_features(df, mode="detect").collect()}

    assert out["img1"]["content_type"] == "png"
    assert out["img1"]["width"] == 100 and out["img1"]["height"] == 50
    assert out["img1"]["decode_status"] == "stubbed"
    assert len(out["img1"]["feature"]) == FEATURE_DIM
    assert out["img1"]["target_res"] == MODE_RESOLUTION["detect"]

    assert out["doc1"]["decode_status"] == "skipped"
    assert out["doc1"]["feature"] is None
    assert out["nul"]["n_bytes"] == 0


def test_media_features_deterministic(spark):
    rows = [(f"m{i}", _png(16, 16) + bytes([i])) for i in range(20)]
    df = spark.createDataFrame(rows, "media_id string, content binary")
    a = sorted(map(str, extract_media_features(df).collect()))
    b = sorted(map(str, extract_media_features(df.repartition(7)).collect()))
    assert a == b  # partitioning must not affect results


def test_media_features_partition_parallel(spark):
    rows = [(f"m{i}", _png(4, 4)) for i in range(100)]
    df = spark.createDataFrame(rows, "media_id string, content binary").repartition(8)
    out = extract_media_features(df)
    assert out.count() == 100
    assert out.select(F.countDistinct("sha")).collect()[0][0] == 1
