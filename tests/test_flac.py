"""FLAC codec (round 4 — pure.flac_encode / pure.decode_flac, RFC 9639
layout). The encoder emits fixed-order-2 Rice-coded mono frames; the
decoder additionally covers verbatim/constant/LPC subframes, Rice escape
partitions, and all three stereo decorrelations — those paths are
exercised with hand-built frames below."""

from __future__ import annotations

import random

import pytest

from fa_spark import pure
from fa_spark.pure import _FBitWriter, _crc8, _crc16, _utf8_frame_number


def _square(n, a, period=8):
    return [a if (i // (period // 2)) % 2 == 0 else -a for i in range(n)]


def test_roundtrip_square_wave_closed_form():
    a, n = 5000, 10000  # spans 2 full frames + a partial (16-bit bs code)
    d = pure.decode_flac(pure.flac_encode(_square(n, a), 16000))
    assert d["n_samples"] == n
    assert d["rate"] == 16000
    assert d["peak"] == a
    assert abs(d["rms"] - a) < 1e-9
    assert d["duration_s"] == n / 16000


def test_roundtrip_random_lossless():
    rng = random.Random(11)
    s = [rng.randrange(-32768, 32768) for _ in range(6000)]
    d = pure.decode_flac(pure.flac_encode(s, 44100))
    assert d["n_samples"] == len(s)
    assert d["peak"] == max(abs(v) for v in s)
    exp_rms = (sum(v * v for v in s) / len(s)) ** 0.5
    assert abs(d["rms"] - exp_rms) < 1e-9
    zc = sum(1 for i in range(1, len(s)) if (s[i] >= 0) != (s[i - 1] >= 0))
    assert d["zero_crossings"] == zc


def test_matches_wav_decode_exactly():
    """Same samples through both codecs -> identical feature dicts
    (lossless means the FLAC path can never drift from the WAV truth)."""
    s = _square(2048, 1234)
    w = pure.decode_wav(pure.wav_encode(s, 8000))
    f = pure.decode_flac(pure.flac_encode(s, 8000))
    skip = {"n_channels", "codec"}  # codec tags the WAV payload form only
    assert {k: w[k] for k in w if k not in skip} == {
        k: f[k] for k in f if k not in skip
    }


def _frame_header(bs: int, ch_code: int, frame_no: int = 0) -> bytes:
    w = _FBitWriter()
    w.write(0x3FFE, 14)
    w.write(0, 1)
    w.write(0, 1)
    w.write(7, 4)  # 16-bit blocksize follows
    w.write(0, 4)  # rate from STREAMINFO
    w.write(ch_code, 4)
    w.write(4, 3)  # 16-bit samples
    w.write(0, 1)
    header = w.bytes() + _utf8_frame_number(frame_no) + (bs - 1).to_bytes(2, "big")
    return header + bytes([_crc8(header)])


def _streaminfo(rate: int, channels: int, total: int) -> bytes:
    si = _FBitWriter()
    si.write(16, 16)
    si.write(65535, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(rate, 20)
    si.write(channels - 1, 3)
    si.write(15, 5)
    si.write(total, 36)
    body = si.bytes() + b"\x00" * 16
    return b"fLaC" + bytes([0x80]) + len(body).to_bytes(3, "big") + body


def _sub_verbatim(w: _FBitWriter, samples, bits=16):
    w.write(0, 1)
    w.write(1, 6)
    w.write(0, 1)
    for s in samples:
        w.write(s & ((1 << bits) - 1), bits)


def _finish_frame(header: bytes, w: _FBitWriter) -> bytes:
    frame = header + w.bytes()
    return frame + _crc16(frame).to_bytes(2, "big")


def test_decoder_constant_and_verbatim_subframes():
    bs = 16
    w = _FBitWriter()
    # constant subframe: value 777
    w.write(0, 1)
    w.write(0, 6)
    w.write(0, 1)
    w.write(777, 16)
    blob = _streaminfo(8000, 1, bs) + _finish_frame(_frame_header(bs, 0), w)
    d = pure.decode_flac(blob)
    assert d["n_samples"] == bs and d["peak"] == 777 and d["rms"] == 777.0


def test_decoder_lpc_subframe():
    """LPC order 2, qlp = [2, -1] with shift 0 == the fixed-order-2
    predictor, so expected samples are closed-form."""
    bs = 8
    samples = [100, 110, 121, 133, 146, 160, 175, 191]
    w = _FBitWriter()
    w.write(0, 1)
    w.write(0b100001, 6)  # LPC, order 2
    w.write(0, 1)
    for s in samples[:2]:
        w.write(s & 0xFFFF, 16)
    w.write(4, 4)  # precision 5 bits
    w.write(0, 5)  # shift 0
    w.write(2 & 0x1F, 5)  # qlp[0] = 2
    w.write(-1 & 0x1F, 5)  # qlp[1] = -1
    w.write(0, 2)  # rice method 0
    w.write(0, 4)  # partition order 0
    w.write(3, 4)  # rice param 3
    coef = (2, -1)
    for i in range(2, bs):
        r = samples[i] - sum(c * samples[i - 1 - j] for j, c in enumerate(coef))
        z = (r << 1) if r >= 0 else ((-r) << 1) - 1
        q = z >> 3
        w.write(0, q)
        w.write(1, 1)
        w.write(z & 7, 3)
    blob = _streaminfo(8000, 1, bs) + _finish_frame(_frame_header(bs, 0), w)
    d = pure.decode_flac(blob)
    assert d is not None
    assert d["n_samples"] == bs
    assert d["peak"] == max(samples)
    exp_rms = (sum(v * v for v in samples) / bs) ** 0.5
    assert abs(d["rms"] - exp_rms) < 1e-9


@pytest.mark.parametrize("ch_code", [8, 9, 10])
def test_decoder_stereo_decorrelation(ch_code):
    left = [100, -200, 300, -400]
    right = [90, -180, 270, -360]
    bs = len(left)
    w = _FBitWriter()
    if ch_code == 8:  # left/side
        _sub_verbatim(w, left, 16)
        _sub_verbatim(w, [l - r for l, r in zip(left, right)], 17)
    elif ch_code == 9:  # right/side: side first, then right
        _sub_verbatim(w, [l - r for l, r in zip(left, right)], 17)
        _sub_verbatim(w, right, 16)
    else:  # mid/side
        mids = [(l + r) >> 1 for l, r in zip(left, right)]
        _sub_verbatim(w, mids, 16)
        _sub_verbatim(w, [l - r for l, r in zip(left, right)], 17)
    blob = _streaminfo(8000, 2, bs) + _finish_frame(_frame_header(bs, ch_code), w)
    d = pure.decode_flac(blob)
    assert d is not None
    mono = [(l + r) // 2 for l, r in zip(left, right)]
    assert d["n_samples"] == bs
    assert d["peak"] == max(abs(v) for v in mono)


def test_decoder_independent_stereo():
    left = [1000] * 8
    right = [-1000] * 8
    w = _FBitWriter()
    _sub_verbatim(w, left)
    _sub_verbatim(w, right)
    blob = _streaminfo(8000, 2, 8) + _finish_frame(_frame_header(8, 1), w)
    d = pure.decode_flac(blob)
    assert d["n_samples"] == 8 and d["peak"] == 0  # (1000 + -1000)//2


def test_rice_escape_partition():
    bs = 4
    samples = [5, 6, 7, 8]
    w = _FBitWriter()
    w.write(0, 1)
    w.write(0b001000, 6)  # fixed order 0
    w.write(0, 1)
    w.write(0, 2)  # method 0
    w.write(0, 4)  # partition order 0
    w.write(0xF, 4)  # ESCAPE
    w.write(16, 5)  # raw 16-bit residuals
    for s in samples:
        w.write(s & 0xFFFF, 16)
    blob = _streaminfo(8000, 1, bs) + _finish_frame(_frame_header(bs, 0), w)
    d = pure.decode_flac(blob)
    assert d["n_samples"] == bs and d["peak"] == 8


def test_totality_hostile_bytes():
    blob = pure.flac_encode(_square(5000, 3000), 16000)
    for cut in range(0, len(blob), 53):
        pure.decode_flac(blob[:cut])  # any outcome, never raises
    rng = random.Random(3)
    assert pure.decode_flac(None) is None
    assert pure.decode_flac(b"") is None
    assert pure.decode_flac(b"fLaC") is None
    pure.decode_flac(b"fLaC" + bytes(rng.randrange(256) for _ in range(256)))
    # bit-flip storm over the real blob
    ba = bytearray(blob)
    for i in range(0, len(ba), 211):
        ba[i] ^= 0xFF
    pure.decode_flac(bytes(ba))


def test_multimodal_stage_decodes_flac(spark):
    from pyspark.sql import functions as F
    from pyspark.sql.types import BinaryType

    from fa_spark.stages.multimodal import extract_media_features

    import pandas as pd

    blob = pure.flac_encode(_square(512, 2000), 16000)

    def _mk(doc_id):
        return pd.Series([blob for _ in doc_id])

    mk = F.pandas_udf(_mk, BinaryType())

    df = spark.range(4).select(
        F.col("id").cast("string").alias("media_id"), mk("id").alias("content")
    )
    out = extract_media_features(df, mode="describe").collect()
    assert all(r["content_type"] == "flac" for r in out)
    assert all(r["decode_status"] == "decoded" for r in out)
    feats = out[0]["feature"]
    assert abs(feats[0] - 2000.0) < 0.5  # rms
    assert feats[1] == 2000.0  # peak
