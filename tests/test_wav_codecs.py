"""Compressed-in-WAV codecs (round 6): IMA ADPCM + G.711 mulaw/alaw.

Reference parity: the reference's analyzer shells to exiftool/ffprobe-
class tools for audio metadata (/root/reference/src/core/analyzer.py:
366-476); here the decode itself is real, pure-Python, and exact.
"""

import random

import pytest

from fa_spark import pure


# ---------------------------------------------------------------------------
# G.711 expansion tables
# ---------------------------------------------------------------------------


def test_mulaw_table_extremes_and_symmetry():
    t = pure._G711_MULAW
    assert len(t) == 256
    assert t[0] == -32124  # code 0 -> u=0xFF -> max negative
    assert t[0x80] == 32124
    assert t[0xFF] == 0  # quiet code
    # sign symmetry: c and c^0x80 decode to negated values
    for c in range(256):
        assert t[c] == -t[c ^ 0x80]


def test_alaw_table_extremes_and_symmetry():
    t = pure._G711_ALAW
    assert len(t) == 256
    assert max(t) == 32256 and min(t) == -32256
    assert t[0x55] == -8 and t[0xD5] == 8  # quietest codes
    for c in range(256):
        assert t[c] == -t[c ^ 0x80]


def test_g711_segments_monotonic():
    """Within one sign, magnitude is monotonically non-decreasing over
    (segment, mantissa) order — the compander staircase."""
    for table, order in (
        (pure._G711_MULAW, [(~c) & 0x7F for c in range(128)]),
        (pure._G711_ALAW, [(c ^ 0x55) & 0x7F for c in range(128)]),
    ):
        pos = sorted(
            (v for v in table if v > 0)
        )
        assert pos == sorted(set(pos)), "positive magnitudes collide"


# ---------------------------------------------------------------------------
# IMA ADPCM step machine
# ---------------------------------------------------------------------------


def test_adpcm_hand_traced_block():
    """First nibbles hand-computed from the IMA tables: pred=0 idx=0,
    byte 0x17 -> nibble 7 (diff 0+1+3+7=11, idx->8), nibble 1 at step 16
    (diff 2+4=6 -> 17, idx->7); then zero nibbles add step>>3 while idx
    decays 7..0 (diff 1,1,1,1,1,1,1 then 0)."""
    b = pure.wav_adpcm_encode([0], nibbles=bytes([0x17] + [0] * 7))
    d = pure.decode_wav(b)
    assert d is not None and d["codec"] == 1
    assert d["n_samples"] == 17
    assert d["peak"] == 24  # 17 + 7 unit steps
    assert d["zero_crossings"] == 0


def test_adpcm_constant_blocks_exact():
    for amp in (1, 137, 500, 8645, 32000):
        d = pure.decode_wav(pure.wav_adpcm_encode([amp, -amp, amp, -amp]))
        assert d["rms"] == float(amp)
        assert d["peak"] == amp
        assert d["zero_crossings"] == 3
        assert d["n_samples"] == 68
        assert d["rate"] == 8000 and d["n_channels"] == 1


def test_adpcm_clamps_at_int16_rails():
    """All-max nibbles from a high predictor must clamp, not overflow."""
    b = pure.wav_adpcm_encode([32000], nibbles=b"\x77" * 8)
    d = pure.decode_wav(b)
    assert d is not None and d["peak"] <= 32767


def test_adpcm_bad_step_index_rejected():
    b = bytearray(pure.wav_adpcm_encode([100]))
    i = b.find(b"data") + 8
    b[i + 2] = 89  # step index out of range
    assert pure.decode_wav(bytes(b)) is None


def test_stereo_and_weird_bits_rejected():
    for law in ("mulaw", "alaw"):
        b = bytearray(pure.wav_g711_encode(bytes(16), law))
        i = b.find(b"fmt ") + 8 + 2
        b[i] = 2  # stereo -> out of subset
        assert pure.decode_wav(bytes(b)) is None
    b = bytearray(pure.wav_adpcm_encode([7]))
    i = b.find(b"fmt ") + 8 + 14
    b[i] = 16  # bits-per-sample 16 on an adpcm fmt -> structural
    assert pure.decode_wav(bytes(b)) is None


def test_fact_chunk_caps_samples():
    b = bytearray(pure.wav_adpcm_encode([10, 20]))
    i = b.find(b"fact") + 8
    b[i:i + 4] = (20).to_bytes(4, "little")
    d = pure.decode_wav(bytes(b))
    assert d is not None and d["n_samples"] == 20


def test_pcm_path_regression_codec_zero():
    d = pure.decode_wav(pure.wav_encode([100, -100] * 50))
    assert d is not None and d["codec"] == 0


def test_truncated_and_fuzzed_never_raise():
    rnd = random.Random(611)
    seeds = [
        pure.wav_adpcm_encode([500, -500]),
        pure.wav_g711_encode(bytes(range(64)), "mulaw"),
        pure.wav_g711_encode(bytes(range(64)), "alaw"),
    ]
    for seed in seeds:
        for cut in range(0, len(seed), 7):
            pure.decode_wav(seed[:cut])  # must not raise
        for _ in range(60):
            b = bytearray(seed)
            for _ in range(rnd.randint(1, 8)):
                b[rnd.randrange(len(b))] = rnd.randrange(256)
            pure.decode_wav(bytes(b))  # must not raise


# ---------------------------------------------------------------------------
# stage dispatch
# ---------------------------------------------------------------------------


@pytest.mark.usefixtures("spark")
def test_stage_decodes_all_three_codecs(spark):
    from fa_spark.stages.multimodal import extract_media_features

    rows_in = [
        ("adpcm", bytearray(pure.wav_adpcm_encode([900, -900, 900, -900]))),
        ("mulaw", bytearray(pure.wav_g711_encode(bytes([0x12] * 32), "mulaw"))),
        ("alaw", bytearray(pure.wav_g711_encode(bytes([0x9A] * 32), "alaw"))),
        ("pcm", bytearray(pure.wav_encode([700, -700] * 20))),
    ]
    df = spark.createDataFrame(rows_in, "media_id string, content binary")
    rows = {
        r["media_id"]: r
        for r in extract_media_features(df, mode="describe").collect()
    }
    expected_codec = {"adpcm": 1.0, "mulaw": 2.0, "alaw": 3.0, "pcm": 0.0}
    for mid, code in expected_codec.items():
        assert rows[mid]["decode_status"] == "decoded", mid
        assert rows[mid]["feature"][7] == code, mid
    assert rows["adpcm"]["feature"][0] == 900.0
    assert rows["mulaw"]["feature"][1] == abs(pure._G711_MULAW[0x12])
    assert rows["alaw"]["feature"][1] == abs(pure._G711_ALAW[0x9A])
