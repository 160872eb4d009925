"""Baseline JPEG codec (round 3, pure.decode_jpeg / pure.jpeg_encode):
roundtrip exactness for DC-only fixtures, lossy-tolerance for gradients,
restart markers, chroma subsampling, totality over hostile bytes, and the
multimodal-stage wiring. The codec is from-scratch per T.81's public
baseline process; the reference repo shells out to image tools and never
decodes a byte itself (parity target: config.json:6 lists .jpg first;
tests/test_with_real_images.py is jpg-based)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from fa_spark import pure


def _px(img):
    return np.frombuffer(bytes(img["pixels"]), dtype=np.uint8)


# ---------------------------------------------------------------------------
# exactness: solid blocks are DC-only and the DC quant step divides the
# closed-form DC, so the decode is bit-exact — the oracle-query lever
# ---------------------------------------------------------------------------


def test_solid_gray_roundtrip_exact_all_levels():
    for v in range(256):
        img = pure.decode_jpeg(pure.jpeg_encode([[v] * 8 for _ in range(8)], gray=True))
        assert img is not None and img["channels"] == 1
        assert (_px(img) == v).all(), v


def test_quadrant_gray_exact_and_dc_prediction_both_signs():
    """Four solid quadrants exercise differential DC with + and - diffs."""
    vals = [(10, 200, 255, 0), (128, 127, 129, 126), (0, 255, 0, 255)]
    for v00, v01, v10, v11 in vals:
        rows = [
            [v00 if x < 8 else v01 for x in range(16)]
            if y < 8
            else [v10 if x < 8 else v11 for x in range(16)]
            for y in range(16)
        ]
        img = pure.decode_jpeg(pure.jpeg_encode(rows, gray=True))
        px = _px(img).reshape(16, 16)
        assert (px[:8, :8] == v00).all() and (px[:8, 8:] == v01).all()
        assert (px[8:, :8] == v10).all() and (px[8:, 8:] == v11).all()


def test_odd_dimensions_pad_and_crop():
    img = pure.decode_jpeg(pure.jpeg_encode([[77] * 13 for _ in range(9)], gray=True))
    assert img["width"] == 13 and img["height"] == 9
    assert (_px(img) == 77).all()


def test_restart_markers_do_not_change_pixels():
    rows = [[(y * 16 + x * 2) % 256 for x in range(32)] for y in range(32)]
    a = pure.decode_jpeg(pure.jpeg_encode(rows, gray=True))
    b = pure.decode_jpeg(pure.jpeg_encode(rows, gray=True, restart=3))
    assert bytes(a["pixels"]) == bytes(b["pixels"])


# ---------------------------------------------------------------------------
# lossy paths: color transform + AC quantization are approximate by design;
# assert bounded error + determinism instead of equality
# ---------------------------------------------------------------------------


def test_color_solid_within_ycbcr_rounding():
    for rgb in [(255, 0, 0), (0, 255, 0), (0, 0, 255), (123, 45, 210), (128, 128, 128)]:
        img = pure.decode_jpeg(pure.jpeg_encode([[rgb] * 16 for _ in range(16)]))
        assert img["channels"] == 3
        px = _px(img).reshape(16, 16, 3).astype(int)
        assert np.abs(px - np.array(rgb)).max() <= 3
        assert (px == px[0, 0]).all()  # solid stays solid


def test_chroma_420_subsampling():
    img = pure.decode_jpeg(
        pure.jpeg_encode([[(50, 100, 150)] * 32 for _ in range(24)], subsampling=2)
    )
    assert img["width"] == 32 and img["height"] == 24
    px = _px(img).reshape(24, 32, 3).astype(int)
    assert np.abs(px - np.array([50, 100, 150])).max() <= 3


def test_gradient_bounded_error_and_deterministic():
    side = 32
    rows = [[(x * 8 + y * 3) % 256 for x in range(side)] for y in range(side)]
    jp = pure.jpeg_encode(rows, gray=True)
    assert jp == pure.jpeg_encode(rows, gray=True)  # encoder deterministic
    img = pure.decode_jpeg(jp)
    err = np.abs(_px(img).reshape(side, side).astype(int) - np.array(rows))
    # flat AC quant step 16 bounds per-sample error well under a block's
    # dynamic range; mean error must be tiny
    assert err.max() <= 24 and err.mean() < 3


# ---------------------------------------------------------------------------
# totality over hostile input (never raises, returns None)
# ---------------------------------------------------------------------------


def test_hostile_inputs_return_none():
    good = pure.jpeg_encode([[5] * 8 for _ in range(8)], gray=True)
    bad = [
        None,
        b"",
        b"\xff\xd8",
        b"\xff\xd8\xff\xe0",
        b"\xff\xd8" + b"\x00" * 64,
        good[:20],          # truncated mid-header
        good[:-4],          # truncated entropy data loses EOI but may still
                            # decode — just must not raise (checked below)
        good[:2] + good[4:],  # marker stream corrupted
        b"\xff\xd8\xff\xc2" + b"\x00\x10" + b"\x00" * 16,  # progressive
    ]
    for b in bad[:-3]:
        assert pure.decode_jpeg(b) is None
    for b in bad[-3:]:
        pure.decode_jpeg(b)  # totality only


def test_truncation_fuzz_never_raises():
    good = pure.jpeg_encode(
        [[(x * 31 + y * 7) % 256 for x in range(16)] for y in range(16)], gray=True
    )
    for cut in range(0, len(good), 7):
        pure.decode_jpeg(good[:cut])  # any outcome, no exception


def test_decode_bomb_rejected():
    sof = (
        b"\xff\xd8\xff\xc0"
        + struct.pack(">H", 11)
        + bytes([8])
        + struct.pack(">HH", 20000, 20000)
        + bytes([1, 1, 0x11, 0])
    )
    assert pure.decode_jpeg(sof) is None


def test_zero_quant_table_rejected():
    jp = bytearray(pure.jpeg_encode([[5] * 8 for _ in range(8)], gray=True))
    i = jp.index(b"\xff\xdb") + 5  # first DQT entry
    jp[i] = 0
    assert pure.decode_jpeg(bytes(jp)) is None


# ---------------------------------------------------------------------------
# shared downstream contract: decode dict feeds image_stats unchanged
# ---------------------------------------------------------------------------


def test_image_stats_consumes_jpeg_decode_dict():
    rows = [[200 if x < 8 else 40 for x in range(16)] for _ in range(16)]
    st = pure.image_stats(pure.decode_jpeg(pure.jpeg_encode(rows, gray=True)))
    assert st["means"] == [120.0]
    assert sum(st["hist"]) == 256


def test_jpeg_through_multimodal_stage(spark):
    from fa_spark.stages.multimodal import extract_media_features

    ok = pure.jpeg_encode([[(90, 90, 90)] * 16 for _ in range(16)])
    rows = [("jok", ok), ("jbad", b"\xff\xd8\xff\xdb" + b"\x00\x04\x00\x00")]
    df = spark.createDataFrame(rows, "media_id string, content binary")
    out = {r["media_id"]: r for r in extract_media_features(df).collect()}
    assert out["jok"]["content_type"] == "jpeg"
    assert out["jok"]["decode_status"] == "decoded"
    assert out["jok"]["width"] == 16 and out["jok"]["height"] == 16
    assert out["jok"]["ahash"] is not None
    assert out["jbad"]["decode_status"] == "decode_error"


# property fuzz: random solid tiles at random sizes stay exact
@pytest.mark.parametrize("seed", [1, 2, 3])
def test_random_solid_tiles_exact(seed):
    import random

    rng = random.Random(seed)
    for _ in range(10):
        w = rng.randrange(1, 40)
        h = rng.randrange(1, 40)
        v = rng.randrange(256)
        img = pure.decode_jpeg(pure.jpeg_encode([[v] * w for _ in range(h)], gray=True))
        assert img["width"] == w and img["height"] == h
        assert (_px(img) == v).all()


def test_progressive_bit_identical_to_baseline():
    """Round 4: a fully-refined progressive (SOF2) stream carries the
    same coefficients as the baseline coding, so decoded pixels must be
    BIT-IDENTICAL across color/gray/subsampling/size shapes."""
    import random

    rng = random.Random(42)
    shapes = [
        ([[(min(255, x * 3 + y), (x * 7 + y * 5) % 256, rng.randrange(256))
           for x in range(37)] for y in range(29)], False, 1),
        ([[rng.randrange(256) for _ in range(23)] for _ in range(17)], True, 1),
        ([[(rng.randrange(256),) * 3 for _ in range(41)] for _ in range(25)],
         False, 2),
        ([[(10, 200, 30)] * 3 for _ in range(5)], False, 1),
        ([[(128, 128, 128)] * 16 for _ in range(16)], False, 1),
    ]
    for rows, gray, sub in shapes:
        base = pure.decode_jpeg(pure.jpeg_encode(rows, gray=gray, subsampling=sub))
        prog = pure.decode_jpeg(
            pure.jpeg_encode_progressive(rows, gray=gray, subsampling=sub)
        )
        assert prog is not None
        assert bytes(base["pixels"]) == bytes(prog["pixels"])


def test_progressive_totality_hostile():
    import random

    rng = random.Random(3)
    blob = pure.jpeg_encode_progressive(
        [[(rng.randrange(256),) * 3 for _ in range(24)] for _ in range(24)]
    )
    for cut in range(0, len(blob), 31):
        pure.decode_jpeg(blob[:cut])  # never raises
    ba = bytearray(blob)
    for i in range(0, len(ba), 53):
        ba[i] ^= 0xFF
    pure.decode_jpeg(bytes(ba))


def test_progressive_through_multimodal_stage(spark):
    from pyspark.sql import functions as F
    from pyspark.sql.types import BinaryType

    import pandas as pd

    from fa_spark.stages.multimodal import extract_media_features

    rows = [[(200, 60, 30)] * 16 for _ in range(16)]
    blob = pure.jpeg_encode_progressive(rows)

    def _mk(i):
        return pd.Series([blob for _ in i])

    mk = F.pandas_udf(_mk, BinaryType())
    df = spark.range(3).select(
        F.col("id").cast("string").alias("media_id"), mk("id").alias("content")
    )
    out = extract_media_features(df, mode="describe").collect()
    assert all(r["decode_status"] == "decoded" for r in out)
    assert all(r["content_type"] == "jpeg" for r in out)
    assert out[0]["width"] == 16 and out[0]["height"] == 16
