"""Round 7: MPEG-1 Layer III big-value Huffman tables 2-9 + count1 A.

The (hlen, hcod) data in pure._MP3_HUFF_RAW / _MP3_CT1A_* is transcribed
from ISO 11172-3 Table B.7. Each table must be a COMPLETE prefix code:
the Kraft sum over codeword lengths equals exactly 1 and no codeword is
a prefix of another — the structural checksum any mistyped row breaks.
The roundtrip tests then drive every codeword of every table through
the real decoder and compare the PCM against an independently computed
cosine closed form (not the decoder's own DSP tables).
"""

from __future__ import annotations

from fractions import Fraction

import numpy as np
import pytest

from fa_spark import pure


def _codes(table: dict) -> list[tuple[int, int]]:
    return list(table.keys())


def _assert_complete_prefix_code(codes: list[tuple[int, int]], n: int):
    assert len(codes) == n, "duplicate (len, code) collapsed an entry"
    kraft = sum(Fraction(1, 2**ln) for ln, _ in codes)
    assert kraft == 1, f"Kraft sum {kraft} != 1 — a length row is wrong"
    bits = sorted(f"{code:0{ln}b}" for ln, code in codes)
    for a, b in zip(bits, bits[1:]):
        assert not b.startswith(a), f"{a} is a prefix of {b}"
    for ln, code in codes:
        assert code < (1 << ln), "codeword wider than its length"


@pytest.mark.parametrize("tsel", sorted(pure._MP3_HUFF_RAW))
def test_bigvalue_table_is_complete_prefix_code(tsel):
    hlen, _ = pure._MP3_HUFF_RAW[tsel]
    n = sum(len(row) for row in hlen)
    _assert_complete_prefix_code(_codes(pure._MP3_HUFF_BV[tsel]), n)
    assert pure._MP3_HUFF_MAXLEN[tsel] == max(
        ln for row in hlen for ln in row
    )


def test_count1_table_a_is_complete_prefix_code():
    _assert_complete_prefix_code(list(pure._MP3_CT1A.keys()), 16)


def _expected_pcm(coeffs: dict[int, float]) -> np.ndarray:
    """Granule-1 PCM of a silent-then-spectral-lines frame: the
    IMDCT + polyphase cosine closed form, computed from scratch."""
    t = np.arange(18)
    h = np.sin(np.pi * (2 * t + 1) / 72.0) * sum(
        c * np.cos(np.pi / 72.0 * (2 * t + 19) * (2 * k + 1))
        for k, c in coeffs.items()
    )
    j = np.arange(32)
    a = np.cos(np.pi / 128.0 * (2 * j + 33))
    b = np.cos(np.pi / 128.0 * (2 * j + 97))
    w64 = np.sin(np.pi * (2 * np.arange(64) + 1) / 128.0)
    hp = np.concatenate([[0.0], h[:-1]])
    p = (
        h[:, None] * a[None, :] * w64[None, :32]
        + hp[:, None] * b[None, :] * w64[None, 32:]
    ) / 16.0
    return np.concatenate([np.zeros(576), p.ravel()])


def _check_roundtrip(tsel, x, y, sign_x, quad_idx, e=1):
    frame = pure.mp3_huff_tone_encode(tsel, x, y, sign_x, quad_idx, e)
    got = pure.decode_mp3(frame)
    assert got is not None, (tsel, x, y, sign_x, quad_idx)
    amp = 2.0**-e
    coeffs = {
        0: (1 if x == 0 or sign_x >= 0 else -1) * x ** (4.0 / 3.0) * amp,
        1: y ** (4.0 / 3.0) * amp,
    }
    for bpos in range(4):
        coeffs[2 + bpos] = ((quad_idx >> (3 - bpos)) & 1) * amp
    pcm = _expected_pcm(coeffs)
    assert got["n_samples"] == 1152
    assert got["rate"] == 32000
    assert got["rms"] == pytest.approx(
        float(np.sqrt(np.mean(pcm * pcm))), abs=1e-12
    )
    assert got["peak"] == pytest.approx(float(np.max(np.abs(pcm))), abs=1e-12)
    pos = pcm >= 0
    assert got["zero_crossings"] == int(np.count_nonzero(pos[1:] != pos[:-1]))


@pytest.mark.parametrize("tsel", sorted(pure._MP3_HUFF_RAW))
def test_every_bigvalue_codeword_roundtrips(tsel):
    hlen, _ = pure._MP3_HUFF_RAW[tsel]
    n = len(hlen)
    for x in range(n):
        for y in range(n):
            _check_roundtrip(tsel, x, y, +1, (x * n + y) % 16)
    # negative x sign path
    _check_roundtrip(tsel, n - 1, 0, -1, 5)


def test_every_count1a_quad_roundtrips():
    for q in range(16):
        _check_roundtrip(7, 1, 2, +1, q, e=2)


def test_esc_tables_stay_out_of_subset():
    # table_select 10 (an ESC-family table without data here) must
    # reject the frame, not mis-decode it
    frame = bytearray(pure.mp3_huff_tone_encode(7, 1, 1, +1, 3, 1))
    assert pure.decode_mp3(bytes(frame)) is not None
    # the fixture writer has no data for ESC tables either
    with pytest.raises(KeyError):
        pure.mp3_huff_tone_encode(10, 1, 1, +1, 3, 1)
    # rewrite granule 1's table_select[0] (5 bits) from 7 to 10 in
    # place: side info bit offset = 9+5+4 (header fields) + 59 (gran 0)
    # + 34 (gran-1 fields before table_select) = 111; frame header is
    # 4 bytes, so absolute bits 143..147
    for i, bit in enumerate((0, 1, 0, 1, 0)):
        pos = 143 + i
        if bit:
            frame[pos >> 3] |= 0x80 >> (pos & 7)
        else:
            frame[pos >> 3] &= ~(0x80 >> (pos & 7)) & 0xFF
    assert pure.decode_mp3(bytes(frame)) is None


def _expected_pcm_short(p0: int, w0: int, e: int) -> np.ndarray:
    """Granule-1 PCM for the pure-short single-line fixture, computed
    from scratch: one 12-point IMDCT output windowed by the short sine
    window, placed at overlap offset 6+6*w0, through the polyphase."""
    t = np.arange(18)
    off = 6 + 6 * w0
    jj = t - off
    h = np.where(
        (jj >= 0) & (jj < 12),
        2.0**-e
        * np.cos(np.pi / 24.0 * (2 * jj + 7) * (2 * p0 + 1))
        * np.sin(np.pi * (2 * jj + 1) / 24.0),
        0.0,
    )
    j = np.arange(32)
    a = np.cos(np.pi / 128.0 * (2 * j + 33))
    b = np.cos(np.pi / 128.0 * (2 * j + 97))
    w64 = np.sin(np.pi * (2 * np.arange(64) + 1) / 128.0)
    hp = np.concatenate([[0.0], h[:-1]])
    p = (
        h[:, None] * a[None, :] * w64[None, :32]
        + hp[:, None] * b[None, :] * w64[None, 32:]
    ) / 16.0
    return np.concatenate([np.zeros(576), p.ravel()])


@pytest.mark.parametrize("w0", (0, 1))
@pytest.mark.parametrize("p0", range(6))
def test_short_block_roundtrips(p0, w0):
    frame = pure.mp3_short_tone_encode(p0, w0, 1 + (p0 + w0) % 3)
    got = pure.decode_mp3(frame)
    assert got is not None, (p0, w0)
    pcm = _expected_pcm_short(p0, w0, 1 + (p0 + w0) % 3)
    assert got["n_samples"] == 1152
    assert got["rms"] == pytest.approx(
        float(np.sqrt(np.mean(pcm * pcm))), abs=1e-12
    )
    assert got["peak"] == pytest.approx(float(np.max(np.abs(pcm))), abs=1e-12)
    pos = pcm >= 0
    assert got["zero_crossings"] == int(np.count_nonzero(pos[1:] != pos[:-1]))


def test_short_block_gates():
    frame = bytearray(pure.mp3_short_tone_encode(2, 1, 1))
    # granule 1 starts at side bit 18+59=77; fields before
    # window_switching_flag: 12+9+8+4 = 33 -> wsf at bit 110, block_type
    # 111-112, mixed at 113 (absolute bit = 32 + offset)
    def setbit(buf, pos, bit):
        if bit:
            buf[pos >> 3] |= 0x80 >> (pos & 7)
        else:
            buf[pos >> 3] &= ~(0x80 >> (pos & 7)) & 0xFF

    mixed = bytearray(frame)
    setbit(mixed, 32 + 113, 1)
    # round 7: flipping mixed_block_flag re-types the granule as MIXED,
    # which now decodes (the count1 plant lands in the mixed layout's
    # long region instead) — value-level mixed coverage lives in
    # test_mixed_block_*_roundtrips
    assert pure.decode_mp3(bytes(mixed)) is not None
    bt0 = bytearray(frame)
    setbit(bt0, 32 + 111, 0)
    setbit(bt0, 32 + 112, 0)
    assert pure.decode_mp3(bytes(bt0)) is None  # wsf + block_type 0
    assert pure.decode_mp3(bytes(frame)) is not None


def test_short_block_hostile_bitflips():
    import random

    rnd = random.Random(17)
    base = pure.mp3_short_tone_encode(4, 0, 2)
    for _ in range(400):
        b = bytearray(base)
        for _ in range(rnd.randint(1, 6)):
            b[rnd.randrange(len(b))] ^= 1 << rnd.randrange(8)
        pure.decode_mp3(bytes(b))  # must never raise


def test_hostile_bitflips_are_total():
    import random

    rnd = random.Random(7)
    base = pure.mp3_huff_tone_encode(8, 3, 2, -1, 9, 2)
    for _ in range(400):
        b = bytearray(base)
        for _ in range(rnd.randint(1, 6)):
            b[rnd.randrange(len(b))] ^= 1 << rnd.randrange(8)
        pure.decode_mp3(bytes(b))  # must never raise


def test_l3_subset_gate_tracks_the_widened_decoder():
    """Round 7: mp3:l3_subset (the lineage stub-accounting gate) must
    agree with decode_mp3 on every fixture family — a stale gate would
    mislabel decodable streams as stubbed in the counters."""
    fixtures = [
        (pure.mp3_tone_encode(3, 1), True),
        (pure.mp3_huff_tone_encode(7, 2, 1, -1, 9, 1), True),
        (pure.mp3_short_tone_encode(4, 1, 2), True),
        (pure.mp3_ms_tone_encode(5, 1), True),
        (pure.mp3_intensity_tone_encode(2, 1, 4), True),
        # M/S + intensity combined: the one rejected joint mode
        (pure.mp3_envelope_encode(2, joint_stereo=True), False),
    ]
    for blob, expect in fixtures:
        meta = pure._parse_mp3_meta(blob)
        assert meta.get("mp3:l3_subset") == ("1" if expect else "0"), blob[:4]
        assert (pure.decode_mp3(blob) is not None) == expect


def test_l3_subset_gate_mirrors_decoder_exactly():
    """Round-8 ADVICE: the header-only mp3:l3_subset verdict must model
    the decoder's EXACT side-info gates — (a) scfsi reuse paired with a
    window-switched granule 1 rejects in both, (b) the M/S layout
    equality check ignores the mixed bit for non-short block types
    (the decoder treats block_type!=2 as plain long either way)."""
    # (a) scfsi bit set on a mono fixture whose granule 1 is
    # window-switched: decoder rejects (scfsi reuse is long-block-only,
    # ISO 2.4.2.7) and the verdict must agree — before round 8 it said
    # '1' while decode returned None, skewing lineage stub accounting
    base = pure.mp3_short_tone_encode(4, 0, 2)
    p = pure._id3v2_size(base)
    b = bytearray(base)
    b[p + 5] |= 0x02  # scfsi bit 0 (side-info bit 14, mono layout)
    blob = bytes(b)
    assert pure._parse_mp3_meta(blob).get("mp3:l3_subset") == "0"
    assert pure.decode_mp3(blob) is None

    # (b) M/S frame, granule 0 both channels wsf long-start
    # (block_type 1) with DIFFERING mixed bits and part2_3_length 0:
    # the decoder classifies both layouts "long" and decodes; the old
    # verdict compared (bt2, mixed) tuples and falsely rejected
    base = pure.mp3_ms_tone_encode(5, 1)
    p = pure._id3v2_size(base)
    b = bytearray(base)

    def setbit(side_bit, val=1):
        byte = (p + 4) + side_bit // 8
        mask = 1 << (7 - side_bit % 8)
        if val:
            b[byte] |= mask
        else:
            b[byte] &= ~mask

    # stereo side info: 20 bits of mdb/private/scfsi, 59 bits/granule/ch;
    # wsf sits 33 bits into a granule (p23 12 + bv 9 + gg 8 + sfc 4)
    setbit(53), setbit(54, 0), setbit(55, 1), setbit(56, 1)  # ch0: bt1 mixed1
    setbit(112), setbit(113, 0), setbit(114, 1), setbit(115, 0)  # ch1: bt1 mixed0
    blob = bytes(b)
    assert pure._parse_mp3_meta(blob).get("mp3:l3_subset") == "1"
    assert pure.decode_mp3(blob) is not None
    # sanity: the crafted side info is what the test thinks it is
    r = pure._FBitReader(blob, p + 4)
    _mdb, _scfsi, grans = pure._mp3_side_info(r, 2)
    assert [g["block_type"] for g in grans[0]] == [1, 1]
    assert [g["mixed"] for g in grans[0]] == [1, 0]


def _expected_pcm_mixed_long(k: int, e: int) -> np.ndarray:
    return _expected_pcm({k: 2.0**-e})


def _expected_pcm_mixed_short(i: int, w0: int, e: int) -> np.ndarray:
    """Short plant in subband 2 of a mixed granule: the 12-point form
    with synthesis cosines at (2j+33)*5 / (2j+97)*5."""
    t = np.arange(18)
    off = 6 + 6 * w0
    jj = t - off
    h = np.where(
        (jj >= 0) & (jj < 12),
        2.0**-e
        * np.cos(np.pi / 24.0 * (2 * jj + 7) * (2 * i + 1))
        * np.sin(np.pi * (2 * jj + 1) / 24.0),
        0.0,
    )
    j = np.arange(32)
    a = np.cos(np.pi / 128.0 * ((2 * j + 33) * 5))
    b = np.cos(np.pi / 128.0 * ((2 * j + 97) * 5))
    w64 = np.sin(np.pi * (2 * np.arange(64) + 1) / 128.0)
    hp = np.concatenate([[0.0], h[:-1]])
    p = (
        h[:, None] * a[None, :] * w64[None, :32]
        + hp[:, None] * b[None, :] * w64[None, 32:]
    ) / 16.0
    return np.concatenate([np.zeros(576), p.ravel()])


def _check_pcm(frame, pcm, tag):
    got = pure.decode_mp3(frame)
    assert got is not None, tag
    assert got["rms"] == pytest.approx(
        float(np.sqrt(np.mean(pcm * pcm))), abs=1e-12
    ), tag
    assert got["peak"] == pytest.approx(
        float(np.max(np.abs(pcm))), abs=1e-12
    ), tag
    pos = pcm >= 0
    assert got["zero_crossings"] == int(
        np.count_nonzero(pos[1:] != pos[:-1])
    ), tag


@pytest.mark.parametrize("k", range(8))
def test_mixed_block_long_region_roundtrips(k):
    frame = pure.mp3_mixed_tone_encode(k, None, 0, 1 + k % 3)
    _check_pcm(frame, _expected_pcm_mixed_long(k, 1 + k % 3), f"long{k}")


@pytest.mark.parametrize("w0", (0, 1))
@pytest.mark.parametrize("i", range(4))
def test_mixed_block_short_region_roundtrips(i, w0):
    frame = pure.mp3_mixed_tone_encode(None, i, w0, 2)
    _check_pcm(frame, _expected_pcm_mixed_short(i, w0, 2), f"s{i}w{w0}")


def test_mixed_block_hostile_bitflips():
    import random

    rnd = random.Random(23)
    base = pure.mp3_mixed_tone_encode(None, 2, 1, 1)
    for _ in range(400):
        b = bytearray(base)
        for _ in range(rnd.randint(1, 6)):
            b[rnd.randrange(len(b))] ^= 1 << rnd.randrange(8)
        pure.decode_mp3(bytes(b))  # must never raise


def test_subset_gate_covers_layers_one_and_two():
    """Round 7: the lineage verdict must also track the Layer I/II
    decoders — real-decoding mono AND stereo streams verdict '1',
    joint mode and non-table-A stereo bitrates verdict '0'."""
    cases = [
        (pure.mp1_tone_encode(5, 1), True, pure.decode_mp1),
        (pure.mp1_tone_encode(5, 1, amp_exp_r=2), True, pure.decode_mp1),
        (pure.mp2_tone_encode(13, 1), True, pure.decode_mp2),
        (pure.mp2_tone_encode(13, 1, 44100, 128, amp_exp_r=2), True,
         pure.decode_mp2),
        # 64 kbps total stereo = 32/ch, not a table-A row
        (pure.mp2_tone_encode(13, 1, 44100, 64, amp_exp_r=2), False,
         pure.decode_mp2),
    ]
    for blob, expect, dec in cases:
        meta = pure._parse_mp3_meta(blob)
        assert meta.get("mp3:l3_subset") == ("1" if expect else "0")
        assert (dec(blob) is not None) == expect
    # joint mode rejects in both layers
    b = bytearray(pure.mp1_tone_encode(5, 1, amp_exp_r=2))
    b[3] = (b[3] & 0x3F) | 0x40
    assert pure._parse_mp3_meta(bytes(b)).get("mp3:l3_subset") == "0"
