"""MPEG-1 Layer II decode: closed-form round trips, subset gates,
hostile-input totality. The fixture encoder plants a grouped 3-level
code in one subband; the decoded PCM must equal the bare two-term
synthesis response bit-for-bit (same filterbank tables as Layer III)."""

from __future__ import annotations

import random

import numpy as np
import pytest

from fa_spark import pure


def _closed_form(k: int, e: int) -> np.ndarray:
    v = (4.0 / 3.0 * 0.5) * 2.0 ** (1 - e)
    j = np.arange(32)
    wa = np.sin(np.pi * (2 * j + 1) / 128.0)
    wb = np.sin(np.pi * (2 * (j + 32) + 1) / 128.0)
    a = np.cos(np.pi / 128.0 * (2 * j + 33) * (2 * k + 1))
    b = np.cos(np.pi / 128.0 * (2 * j + 97) * (2 * k + 1))
    pcm = np.empty(36 * 32)
    for t in range(36):
        pcm[32 * t : 32 * t + 32] = (
            v * a * wa + (v if t > 0 else 0.0) * b * wb
        ) / 16.0
    return pcm


@pytest.mark.parametrize("k", [0, 2, 3, 10, 11, 22, 23, 26])
@pytest.mark.parametrize("e", [1, 3])
def test_tone_roundtrip_exact(k, e):
    out = pure.decode_mp2(pure.mp2_tone_encode(k, e))
    assert out is not None
    pcm = _closed_form(k, e)
    ps = pcm >= 0
    # the decoder's synthesis matmul may fuse multiply-adds (BLAS FMA),
    # so equality holds at the oracle's 6-dp contract and ~1-ulp beyond,
    # not bit-for-bit against the unfused closed form
    rms = float(np.sqrt(np.mean(pcm * pcm)))
    peak = float(np.max(np.abs(pcm)))
    assert abs(out["rms"] - rms) <= 1e-12 * max(rms, 1e-9)
    assert abs(out["peak"] - peak) <= 1e-12 * max(peak, 1e-9)
    assert round(out["rms"], 6) == round(rms, 6)
    assert round(out["peak"], 6) == round(peak, 6)
    assert out["zero_crossings"] == int(np.count_nonzero(ps[1:] != ps[:-1]))
    assert (out["rate"], out["n_channels"], out["n_samples"]) == (44100, 1, 1152)


def test_multi_frame_concatenates():
    two = pure.mp2_tone_encode(4, 1) + pure.mp2_tone_encode(4, 1)
    out = pure.decode_mp2(two)
    assert out is not None and out["n_samples"] == 2304
    # frame 2 sees frame 1's synthesis FIFO, so its PCM differs from a
    # cold-start frame — the state threading is real, not per-frame reset
    one = pure.decode_mp2(pure.mp2_tone_encode(4, 1))
    assert out["peak"] >= one["peak"]


def test_subset_gates():
    d = pure.mp2_tone_encode(5, 1)
    assert pure.decode_mp2(pure.mp3_tone_encode(1, 1)) is None  # Layer III
    assert pure.decode_mp3(d) is None  # Layer II rejected by the L3 path
    # stereo mode bits flip -> out of mono subset
    b = bytearray(d)
    b[3] = 0x04  # mode 00: stereo
    assert pure.decode_mp2(bytes(b)) is None
    # 48 kbps @ 44.1 kHz selects table B.2c -> out of subset
    assert pure.decode_mp2(
        pure.mp2_tone_encode(5, 1, rate=44100, bitrate_kbps=48)
    ) is None


def test_table_a_gate_accepts_48k_high_rates():
    out = pure.decode_mp2(pure.mp2_tone_encode(7, 2, rate=48000, bitrate_kbps=192))
    assert out is not None and out["rate"] == 48000


def test_hostile_truncation_and_bitflips_total():
    d = pure.mp2_tone_encode(9, 1)
    for cut in range(len(d)):
        pure.decode_mp2(d[:cut])
    rng = random.Random(6)
    for _ in range(500):
        b = bytearray(d)
        for _ in range(4):
            b[rng.randrange(len(b))] ^= 1 << rng.randrange(8)
        r = pure.decode_mp2(bytes(b))
        assert r is None or np.isfinite(r["rms"])


def test_media_stage_routes_layer2(spark):
    from pyspark.sql import Row

    from fa_spark.stages.multimodal import extract_media_features

    media = spark.createDataFrame(
        [Row(media_id=1, content=bytearray(pure.mp2_tone_encode(3, 1)))],
        "media_id long, content binary",
    )
    row = extract_media_features(media, mode="describe").collect()[0]
    assert row.content_type == "mp3"  # MPEG-audio family sniff
    assert row.decode_status == "decoded"


@pytest.mark.parametrize("k", [0, 7, 15, 31])
def test_layer1_roundtrip(k):
    out = pure.decode_mp1(pure.mp1_tone_encode(k, 2))
    assert out is not None and out["n_samples"] == 384
    v = (4.0 / 3.0 * 0.5) * 2.0 ** (1 - 2)
    j = np.arange(32)
    wa = np.sin(np.pi * (2 * j + 1) / 128.0)
    wb = np.sin(np.pi * (2 * (j + 32) + 1) / 128.0)
    a = np.cos(np.pi / 128.0 * (2 * j + 33) * (2 * k + 1))
    b = np.cos(np.pi / 128.0 * (2 * j + 97) * (2 * k + 1))
    pcm = np.empty(384)
    for t in range(12):
        pcm[32 * t : 32 * t + 32] = (
            v * a * wa + (v if t > 0 else 0.0) * b * wb
        ) / 16.0
    rms = float(np.sqrt(np.mean(pcm * pcm)))
    assert abs(out["rms"] - rms) <= 1e-12 * max(rms, 1e-9)


def test_layer1_gates_and_hostility():
    d = pure.mp1_tone_encode(5, 1)
    assert pure.decode_mp2(d) is None and pure.decode_mp3(d) is None
    assert pure.decode_mp1(pure.mp2_tone_encode(5, 1)) is None
    b = bytearray(d)
    b[3] = 0x04  # stereo mode
    assert pure.decode_mp1(bytes(b)) is None
    for cut in range(0, len(d), 3):
        pure.decode_mp1(d[:cut])
    rng = random.Random(61)
    for _ in range(300):
        bb = bytearray(d)
        for _ in range(4):
            bb[rng.randrange(len(bb))] ^= 1 << rng.randrange(8)
        r = pure.decode_mp1(bytes(bb))
        assert r is None or np.isfinite(r["rms"])


def test_ms_stereo_is_mono_over_sqrt2():
    for k, e in ((0, 1), (5, 2), (7, 4)):
        ms = pure.decode_mp3(pure.mp3_ms_tone_encode(k, e))
        mono = pure.decode_mp3(pure.mp3_tone_encode(k, e))
        assert ms is not None and ms["n_channels"] == 2
        assert abs(ms["rms"] - mono["rms"] / np.sqrt(2.0)) < 1e-15
        assert abs(ms["peak"] - mono["peak"] / np.sqrt(2.0)) < 1e-15
        assert ms["zero_crossings"] == mono["zero_crossings"]


def test_joint_stereo_modes_round7():
    """Round 7 widens joint stereo: intensity (mode_ext 01) and plain
    joint headers (mode_ext 00) decode as independent channels — the
    intensity tan-ratio split sums to 1 per band, so the channel
    AVERAGE (this engine's whole output surface) equals the independent
    decode exactly. Only M/S + intensity combined (mode_ext 11) stays
    rejected. Re-headering the M/S fixture turns off the butterfly, so
    the planted mid-channel tone lands in the LEFT channel alone and
    the average is the mono closed form at HALF amplitude (vs 1/sqrt(2)
    under M/S)."""
    base = pure.mp3_ms_tone_encode(1, 1)
    ms = pure.decode_mp3(base)
    assert ms is not None
    import math

    for ext in (0x54, 0x44):  # intensity on / nothing on
        d = bytearray(base)
        d[3] = ext
        got = pure.decode_mp3(bytes(d))
        assert got is not None and got["n_channels"] == 2
        # ms avg = pattern/sqrt(2); independent avg = pattern/2
        assert got["rms"] == pytest.approx(
            ms["rms"] * math.sqrt(2.0) / 2.0, rel=1e-12
        )
    d = bytearray(base)
    d[3] = 0x74  # M/S + intensity combined: still out of subset
    assert pure.decode_mp3(bytes(d)) is None


def test_ms_hostile_total():
    d = pure.mp3_ms_tone_encode(6, 1)
    for cut in range(0, len(d), 7):
        pure.decode_mp3(d[:cut])
    rng = random.Random(64)
    for _ in range(300):
        b = bytearray(d)
        for _ in range(4):
            b[rng.randrange(len(b))] ^= 1 << rng.randrange(8)
        r = pure.decode_mp3(bytes(b))
        assert r is None or np.isfinite(r["rms"])


def test_mp1_stereo_decode_matches_channel_average():
    """Round 7: Layer I mode-00 stereo — channel-inner allocation and
    per-channel scalefactors; output is the channel average, so the
    stereo rms relates to the mono rms by the mean of the dyadic
    gains."""
    for k, el, er in ((0, 1, 2), (7, 2, 3), (31, 3, 1)):
        st = pure.decode_mp1(pure.mp1_tone_encode(k, el, amp_exp_r=er))
        mono = pure.decode_mp1(pure.mp1_tone_encode(k, el))
        assert st is not None and st["n_channels"] == 2
        gl, gr = 2.0 ** (1 - el), 2.0 ** (1 - er)
        assert st["rms"] == pytest.approx(
            mono["rms"] * (gl + gr) / (2 * gl), abs=1e-12
        )
        assert st["n_samples"] == 384


def test_mp2_stereo_decode_and_per_channel_table_gate():
    """Round 7: Layer II mode-00 stereo — the ISO 2.4.2.6 PER-CHANNEL
    bitrate table selection is live: 128 kbps total stereo (64/ch) is a
    table-A row and decodes; 64 kbps total stereo (32/ch) is not and
    rejects."""
    for k, el, er in ((0, 1, 2), (13, 2, 4), (26, 3, 1)):
        st = pure.decode_mp2(
            pure.mp2_tone_encode(k, el, 44100, 128, amp_exp_r=er)
        )
        mono = pure.decode_mp2(pure.mp2_tone_encode(k, el))
        assert st is not None and st["n_channels"] == 2
        gl, gr = 2.0 ** (1 - el), 2.0 ** (1 - er)
        assert st["rms"] == pytest.approx(
            mono["rms"] * (gl + gr) / (2 * gl), abs=1e-12
        )
    assert pure.decode_mp2(
        pure.mp2_tone_encode(3, 1, 44100, 64, amp_exp_r=2)
    ) is None


def test_layer12_joint_stereo_rejects():
    b2 = bytearray(pure.mp2_tone_encode(3, 1, 44100, 128, amp_exp_r=2))
    b2[3] = (b2[3] & 0x3F) | 0x40  # mode 01: intensity stereo
    assert pure.decode_mp2(bytes(b2)) is None
    b1 = bytearray(pure.mp1_tone_encode(3, 1, amp_exp_r=2))
    b1[3] = (b1[3] & 0x3F) | 0x40
    assert pure.decode_mp1(bytes(b1)) is None


def test_layer12_stereo_hostile_bitflips():
    import random

    rnd = random.Random(53)
    for base in (
        pure.mp1_tone_encode(5, 2, amp_exp_r=3),
        pure.mp2_tone_encode(13, 2, 44100, 128, amp_exp_r=4),
    ):
        for _ in range(200):
            b = bytearray(base)
            for _ in range(4):
                b[rnd.randrange(len(b))] ^= 1 << rnd.randrange(8)
            pure.decode_mp1(bytes(b))
            pure.decode_mp2(bytes(b))
