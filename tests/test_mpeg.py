"""MPEG-1 video I-frame codec (pure.decode_mpeg1 / pure.mpeg1_encode).

Round 6 — VERDICT r5 #5: the compressed-video family beyond MJPEG.
Covers: exact solid-frame round trips (DC-only path), a hand-written
bitstream with a known AC coefficient checked against independently
computed IDCT pixel values, escape-coding forms, subset gates (P
pictures, geometry, truncation), envelope metadata, sniffing, and the
multimodal stage dispatch. Adversarial bit-reader cases per VERDICT r5
#8 (bounds bugs breed in bit-cursor code).
"""

import numpy as np
import pytest

from fa_spark import pure


def _solid(v, n=1, side=16):
    return [[[v + k] * side for _ in range(side)] for k in range(n)]


# ---------------------------------------------------------------------------
# round trips
# ---------------------------------------------------------------------------


def test_solid_roundtrip_exact():
    es = pure.mpeg1_encode(_solid(21, n=4), fps=25.0)
    d = pure.decode_mpeg1(es)
    assert d is not None
    assert (d["width"], d["height"], d["n_frames"]) == (16, 16, 4)
    assert d["fps"] == 25.0
    assert d["duration_s"] == pytest.approx(4 / 25)
    assert d["sampled_frames"] == [0, 1, 2, 3]
    assert d["frame_means"] == [21.0, 22.0, 23.0, 24.0]


def test_solid_extremes_exact():
    # DC differentials at both ends of the predictor (128) range
    for v in (0, 1, 127, 128, 129, 254, 255):
        d = pure.decode_mpeg1(pure.mpeg1_encode(_solid(v)))
        assert d is not None and d["frame_means"] == [float(v)], v


def test_multi_macroblock_geometry():
    # 48x32 = 3x2 macroblocks, per-MB distinct value, one slice
    frame = [
        [(17 + 40 * ((y // 16) * 3 + (x // 16))) for x in range(48)]
        for y in range(32)
    ]
    d = pure.decode_mpeg1(pure.mpeg1_encode([frame]))
    assert d is not None
    assert (d["width"], d["height"]) == (48, 32)
    assert d["frame_means"] == [pytest.approx(np.mean(frame))]


def test_textured_roundtrip_close():
    # gradient exercises AC table rows; quantization error is bounded
    g = [[(x * 3 + y * 2) % 200 for x in range(32)] for y in range(32)]
    d = pure.decode_mpeg1(pure.mpeg1_encode([g], qs=2))
    assert d is not None
    assert d["frame_means"][0] == pytest.approx(np.mean(g), abs=2.0)


def test_noise_roundtrip_exercises_escapes():
    rng = np.random.default_rng(11)
    n = rng.integers(0, 256, size=(16, 16)).tolist()
    d = pure.decode_mpeg1(pure.mpeg1_encode([n], qs=1))
    assert d is not None
    assert d["frame_means"][0] == pytest.approx(np.mean(n), abs=4.0)


def test_frame_sampling_cap():
    es = pure.mpeg1_encode(_solid(50, n=12))
    d = pure.decode_mpeg1(es)
    assert d is not None and d["n_frames"] == 12
    assert len(d["sampled_frames"]) <= pure.VIDEO_SAMPLE_FRAMES
    assert d["sampled_frames"][0] == 0 and d["sampled_frames"][-1] == 11
    assert d["frame_means"][0] == 50.0 and d["frame_means"][-1] == 61.0


# ---------------------------------------------------------------------------
# hand-written bitstream: known AC coefficient -> exact pixels
# ---------------------------------------------------------------------------


def _handmade_stream(qs, blocks_bits):
    """Minimal 16x16 single-I-picture stream with hand-supplied block
    payload bits (list of (value, nbits) after the slice's first MB's
    address+type)."""
    bw = pure._FBitWriter()
    bw.write(16, 12)
    bw.write(16, 12)
    bw.write(1, 4)
    bw.write(3, 4)  # 25 fps
    bw.write(0x3FFFF, 18)
    bw.write(1, 1)
    bw.write(0, 10)
    bw.write(0, 1)
    bw.write(0, 1)
    bw.write(0, 1)
    out = bytearray(b"\x00\x00\x01\xb3" + bw.bytes())
    bw = pure._FBitWriter()
    bw.write(0, 10)
    bw.write(1, 3)
    bw.write(0xFFFF, 16)
    bw.write(0, 1)
    out += b"\x00\x00\x01\x00" + bw.bytes()
    bw = pure._FBitWriter()
    bw.write(qs, 5)
    bw.write(0, 1)
    bw.write(1, 1)  # mba 1
    bw.write(1, 1)  # intra
    for v, n in blocks_bits:
        bw.write(v, n)
    out += b"\x00\x00\x01\x01" + bw.bytes()
    out += b"\x00\x00\x01\xb7"
    return bytes(out)


def test_handmade_ac_coefficient_exact():
    # Y block 0: DC size 2 diff +2 (dc=130) then AC row (0,1) positive,
    # EOB; remaining 3 Y blocks + chroma: DC diff 0, EOB.
    qs = 8
    bits = [
        (0b01, 2), (0b10, 2),       # dc size 2, diff +2
        (0b11, 2), (0, 1),          # (0,1) positive
        (0b10, 2),                  # EOB
    ]
    for _ in range(3):  # remaining luma blocks: diff 0
        bits += [(0b100, 3), (0b10, 2)]
    for _ in range(2):  # chroma blocks: diff 0
        bits += [(0b00, 2), (0b10, 2)]
    d = pure.decode_mpeg1(_handmade_stream(qs, bits))
    assert d is not None
    # expected: block0 has F00 = 130*8 = 1040 and F at zigzag idx 1
    # (raster (0,1)) = oddified (2*1*8*16)>>4 = 16 -> 15
    # DC prediction chains across the Y blocks: blocks 1-3 carry diff 0,
    # inheriting block 0's cumulative 130 — not the slice-start 128
    zz = np.zeros((4, 64), dtype=np.int64)
    zz[:, 0] = 130 * 8
    zz[0, 1] = 15
    planes = pure._mpeg_idct_blocks(zz)
    expect = float(np.mean(planes.reshape(4, 64)))
    assert d["frame_means"][0] == pytest.approx(expect)


def test_handmade_escape_negative_level():
    # escape run=1 level=-130 (double-byte negative form) in Y block 0
    qs = 2
    bits = [
        (0b100, 3),                  # dc size 0
        (0b000001, 6), (1, 6),       # escape, run 1
        (0b10000000, 8), (126, 8),   # level = 126 - 256 = -130
        (0b10, 2),                   # EOB
    ]
    for _ in range(3):
        bits += [(0b100, 3), (0b10, 2)]
    for _ in range(2):
        bits += [(0b00, 2), (0b10, 2)]
    d = pure.decode_mpeg1(_handmade_stream(qs, bits))
    assert d is not None
    zz = np.zeros((4, 64), dtype=np.int64)
    zz[:, 0] = 1024
    zz[0, 2] = pure._mpeg_dequant_ac(-130, qs, 16)  # zigzag idx 2, q=16
    expect = float(np.mean(pure._mpeg_idct_blocks(zz).reshape(4, 64)))
    assert d["frame_means"][0] == pytest.approx(expect)


def test_dequant_oddification_and_clamp():
    assert pure._mpeg_dequant_ac(1, 8, 16) == 15      # 16 even -> 15
    assert pure._mpeg_dequant_ac(-1, 8, 16) == -15
    assert pure._mpeg_dequant_ac(1, 1, 8) == 1        # (2*1*1*8)>>4 = 1, odd
    assert pure._mpeg_dequant_ac(255, 31, 83) == 2047  # saturation
    assert pure._mpeg_dequant_ac(-255, 31, 83) == -2048


# ---------------------------------------------------------------------------
# subset gates and adversarial inputs
# ---------------------------------------------------------------------------


def _flip_picture_type(es, newtype):
    i = es.find(b"\x00\x00\x01\x00")
    b = bytearray(es)
    # picture header: tr(10) type(3) -> type occupies bits 2..4 of the
    # second payload byte
    b[i + 5] = (b[i + 5] & 0b11000111) | (newtype << 3)
    return bytes(b)


def test_p_picture_rejected_and_verdicted():
    es = pure.mpeg1_encode(_solid(40, n=2))
    pes = _flip_picture_type(es, 2)
    assert pure.decode_mpeg1(pes) is None
    meta = pure._parse_mpeg_meta(pes)
    assert meta["mpeg:i_subset"] == "0"
    assert "P" in meta["mpeg:picture_types"]
    assert pure._parse_mpeg_meta(es)["mpeg:i_subset"] == "1"


def test_non_mod16_geometry_rejected():
    with pytest.raises(ValueError):
        pure.mpeg1_encode([[[1] * 8 for _ in range(8)]])
    # craft a 24x16 header (24 % 16 != 0)
    es = bytearray(pure.mpeg1_encode(_solid(10)))
    es[4] = 0x01
    es[5] = 0x80  # width 24 (12 bits: 0x018)
    assert pure.decode_mpeg1(bytes(es)) is None


def test_truncation_never_raises():
    es = pure.mpeg1_encode(_solid(60, n=3))
    for cut in range(0, len(es), 7):
        assert pure.decode_mpeg1(es[:cut]) in (None,) or True
        d = pure.decode_mpeg1(es[:cut])
        assert d is None or d["n_frames"] <= 3


def test_garbage_slice_rejected():
    es = bytearray(pure.mpeg1_encode(_solid(60)))
    i = bytes(es).find(b"\x00\x00\x01\x01")
    es[i + 4 :] = b"\xff" * (len(es) - i - 4)
    assert pure.decode_mpeg1(bytes(es)) is None


def test_program_stream_not_sniffed():
    ps = b"\x00\x00\x01\xba" + b"\x44" * 64
    assert pure.sniff_bytes(ps)["content_type"] != "mpeg"
    assert pure.decode_mpeg1(ps) is None


def test_quantizer_scale_zero_rejected():
    d = pure.decode_mpeg1(_handmade_stream(0, [(0b100, 3), (0b10, 2)] * 1))
    assert d is None


def test_custom_quant_matrix_with_zero_rejected():
    bw = pure._FBitWriter()
    bw.write(16, 12)
    bw.write(16, 12)
    bw.write(1, 4)
    bw.write(3, 4)
    bw.write(0x3FFFF, 18)
    bw.write(1, 1)
    bw.write(0, 10)
    bw.write(0, 1)
    bw.write(1, 1)  # load intra matrix...
    for _ in range(64):
        bw.write(0, 8)  # ...all zeros: invalid
    bw.write(0, 1)
    es = b"\x00\x00\x01\xb3" + bw.bytes() + b"\x00\x00\x01\xb7"
    assert pure.decode_mpeg1(es) is None


def test_meta_envelope_fields():
    es = pure.mpeg1_encode(_solid(33, n=5), fps=25.0)
    m = pure.extract_metadata(es)
    assert m["mpeg:kind"] == "video-es"
    assert m["mpeg:width"] == "16" and m["mpeg:height"] == "16"
    assert m["mpeg:fps"] == "25"
    assert m["mpeg:n_pictures"] == "5"
    assert m["mpeg:picture_types"] == "I"
    assert m["mpeg:i_subset"] == "1"


def test_sniff_magic():
    es = pure.mpeg1_encode(_solid(9))
    assert pure.sniff_bytes(es)["content_type"] == "mpeg"


# ---------------------------------------------------------------------------
# multimodal stage dispatch
# ---------------------------------------------------------------------------


def test_stage_decodes_i_only_and_stubs_p(spark):
    from fa_spark.stages.multimodal import extract_media_features

    es = pure.mpeg1_encode(_solid(77, n=3))
    pes = _flip_picture_type(es, 3)  # B picture -> out of subset
    df = spark.createDataFrame(
        [("i", bytearray(es)), ("p", bytearray(pes))],
        "media_id string, content binary",
    )
    rows = {
        r["media_id"]: r
        for r in extract_media_features(df, mode="describe").collect()
    }
    assert rows["i"]["decode_status"] == "decoded"
    assert rows["i"]["width"] == 16 and rows["i"]["height"] == 16
    feat = rows["i"]["feature"]
    assert feat[0] == 3.0  # n_frames
    assert feat[6] == 77.0  # first sampled mean
    assert rows["p"]["decode_status"] == "stubbed"


def test_truncated_seq_header_returns_none():
    """A sequence header that declares a custom intra quantizer matrix
    but is cut off mid-matrix must read as None/non-subset, not raise
    (round-6 self-review: _mpeg_seq_header EOFError leak)."""
    bits = (
        format(16, "012b") + format(16, "012b") + format(1, "04b")
        + format(3, "04b") + "0" * 18 + "1" + "0" * 10 + "0" + "1"
    )
    by = bytearray()
    for i in range(0, (len(bits) // 8) * 8, 8):
        by.append(int(bits[i : i + 8], 2))
    rem = len(bits) % 8
    if rem:
        by.append(int(bits[-rem:].ljust(8, "1"), 2))
    data = b"\x00\x00\x01\xb3" + bytes(by)
    padded = data + b"\xff" * max(0, 17 - len(data))
    assert pure.decode_mpeg1(data) is None
    assert pure.decode_mpeg1(padded) is None
    assert pure._parse_mpeg_meta(data)["mpeg:i_subset"] == "0"
    assert pure._parse_mpeg_meta(padded)["mpeg:i_subset"] == "0"


# ---------------------------------------------------------------------------
# P pictures (round 6: forward motion compensation)
# ---------------------------------------------------------------------------


def _colbands(vals, h=16):
    row = []
    for v in vals:
        row += [v] * 16
    return [list(row) for _ in range(h)]


def test_p_copy_and_fullpel_shift_exact():
    es = pure.mpeg1_encode_ip(_colbands([80, 120, 200]), [("copy",), ("shift", -16)])
    d = pure.decode_mpeg1(es)
    assert d is not None and d["n_frames"] == 3
    m0 = (80 + 120 + 200) / 3
    assert d["frame_means"] == [m0, m0, (80 + 80 + 120) / 3]


def test_p_halfpel_rounded_average():
    """Odd half-pel vector: every sample is the spec's rounded average
    (a+b+1)>>1 of horizontal neighbours — checked against a numpy
    reference of exactly that arithmetic."""
    vals = [80, 121, 200]
    es = pure.mpeg1_encode_ip(_colbands(vals), [("halfpel", -1)])
    d = pure.decode_mpeg1(es)
    ref = np.array(_colbands(vals), dtype=np.int64)
    exp = ref.copy()
    for c in (1, 2):
        x0 = 16 * c
        exp[:, x0] = (ref[:, x0 - 1] + ref[:, x0] + 1) >> 1
    assert d is not None and d["frame_means"][1] == float(exp.mean())


def test_p_residual_nonintra_dequant():
    """No-MC coded macroblocks with a DC-only escape residual: decoded
    mean equals ref + the signed-IDCT of the non-intra dequant value
    ((2L+1)·qs·16)>>4, oddified — uniform across the block."""
    vals = [80, 121, 200]
    ref = np.array(_colbands(vals), dtype=np.int64)
    for level, qs in ((5, 8), (-3, 8), (40, 3)):
        es = pure.mpeg1_encode_ip(_colbands(vals), [("residual", level)], qs=qs)
        d = pure.decode_mpeg1(es)
        c = ((2 * abs(level) + 1) * qs * 16) >> 4
        if c and not (c & 1):
            c -= 1
        if level < 0:
            c = -c
        zz = np.zeros((1, 64), dtype=np.int64)
        zz[0, 0] = c
        v = pure._mpeg_idct_signed(zz)[0]
        assert v.min() == v.max()  # DC-only residual is uniform
        exp = float(np.clip(ref + int(v[0, 0]), 0, 255).mean())
        assert d is not None and d["frame_means"][1] == exp, (level, qs)


def test_p_chain_accumulates():
    """P-after-P: each shift takes the PREVIOUS decoded frame, so two
    -16 shifts smear the left band across two columns."""
    es = pure.mpeg1_encode_ip(
        _colbands([30, 90, 210]), [("shift", -16), ("shift", -16)]
    )
    d = pure.decode_mpeg1(es)
    assert d is not None
    assert d["frame_means"][1] == (30 + 30 + 90) / 3
    assert d["frame_means"][2] == (30 + 30 + 30) / 3


def test_p_meta_subset_keys():
    ip = pure.mpeg1_encode_ip(_colbands([10, 20, 30]), [("copy",)])
    m = pure._parse_mpeg_meta(ip)
    assert m["mpeg:picture_types"] == "I,P"
    assert m["mpeg:i_subset"] == "0"
    assert m["mpeg:ip_subset"] == "1"
    i_only = pure.mpeg1_encode(_solid(9))
    mi = pure._parse_mpeg_meta(i_only)
    assert mi["mpeg:i_subset"] == "1" and mi["mpeg:ip_subset"] == "1"
    b = _flip_picture_type(pure.mpeg1_encode(_solid(9, n=2)), 3)
    mb = pure._parse_mpeg_meta(b)
    assert mb["mpeg:ip_subset"] == "0"


def test_p_first_picture_must_be_intra():
    es = pure.mpeg1_encode_ip(_colbands([10, 20, 30]), [("copy",)])
    # flip the I picture to P: stream then opens on a reference-less P
    flipped = _flip_picture_type(es, 2)
    assert pure.decode_mpeg1(flipped) is None


def test_p_out_of_bounds_vector_rejected():
    """A +16 full-pel shift on the RIGHTMOST macroblock would read past
    the frame edge — encode it raw and expect a clean None."""
    first = _colbands([50, 60, 70])
    es = bytearray(pure.mpeg1_encode_ip(first, [("shift", -16)]))
    # re-encode with an illegal +15 shift on every non-col0 MB instead:
    bad = pure.mpeg1_encode_ip(first, [("shift", 15)])
    assert pure.decode_mpeg1(bad) is None


def test_p_frame_cap_gates_subset():
    es = pure.mpeg1_encode_ip(
        _colbands([10, 20, 30]),
        [("copy",)] * (pure.MPEG_MAX_DECODE_FRAMES + 1),
    )
    assert pure.decode_mpeg1(es) is None
    assert pure._parse_mpeg_meta(es)["mpeg:ip_subset"] == "0"


def test_p_fuzz_never_raises():
    import random

    rnd = random.Random(612)
    seed = pure.mpeg1_encode_ip(
        _colbands([80, 120, 200]), [("copy",), ("shift", -16), ("residual", 5)]
    )
    for _ in range(300):
        b = bytearray(seed)
        for _ in range(rnd.randint(1, 8)):
            b[rnd.randrange(len(b))] = rnd.randrange(256)
        pure.decode_mpeg1(bytes(b))  # must not raise
        pure._parse_mpeg_meta(bytes(b))
    for cut in range(0, len(seed), 11):
        pure.decode_mpeg1(seed[:cut])
        pure._parse_mpeg_meta(seed[:cut])


def test_stage_decodes_ip_stream(spark):
    from fa_spark.stages.multimodal import extract_media_features

    es = pure.mpeg1_encode_ip(_colbands([30, 51, 72]), [("copy",), ("shift", -16)])
    df = spark.createDataFrame(
        [("ip", bytearray(es))], "media_id string, content binary"
    )
    row = extract_media_features(df, mode="describe").collect()[0]
    assert row["decode_status"] == "decoded"
    assert row["feature"][0] == 3.0
    assert row["feature"][6] == 51.0  # I mean
    assert row["feature"][7] == 51.0  # copy
    assert row["feature"][8] == 37.0  # shift: (30+30+51)/3


def _ipb_first(l0: int):
    row = [l0] * 16 + [l0 + 24] * 16 + [l0 + 48] * 16
    return [list(row) for _ in range(16)]


def test_ipb_display_order_and_closed_forms():
    data = pure.mpeg1_encode_ipb(
        _ipb_first(40), -16, [("interp",), ("bwd",), ("fwd", -16)]
    )
    out = pure.decode_mpeg1(data)
    assert out is not None and out["n_frames"] == 5
    # display order [I, B-interp, B-bwd, B-fwd, P]
    assert out["frame_means"] == [64.0, 56.0, 48.0, 48.0, 48.0]
    meta = pure._parse_mpeg_meta(data)
    assert meta["mpeg:ipb_subset"] == "1"
    assert meta["mpeg:ip_subset"] == "0"  # the narrower verdict excludes B


def test_b_interp_rounds_half_away_from_zero():
    # I solid 41, P shifts nothing (shift 0 via spec geometry): choose
    # interp over anchors 41 and 40 -> (81+1)>>1 = 41 per pixel
    first = [[41] * 48 for _ in range(16)]
    data = pure.mpeg1_encode_ipb(first, -16, [("interp",)])
    out = pure.decode_mpeg1(data)
    assert out is not None
    # P == I here (shift moves identical columns), so interp == I
    assert out["frame_means"] == [41.0, 41.0, 41.0]


def test_b_before_anchors_rejected():
    data = pure.mpeg1_encode_ipb(_ipb_first(40), -16, [("interp",)])
    # move the B picture's coded position before the P by swapping the
    # picture_coding_type fields: P (type 2) <-> B (type 3) headers would
    # corrupt payloads, so instead truncate the stream to I + B only:
    codes = pure._mpeg_startcodes(data)
    pic_offs = [o for o, c in codes if c == 0x00]
    # keep everything up to the P picture, then append the B picture
    p_start, b_start = pic_offs[1], pic_offs[2]
    ib_only = data[:p_start] + data[b_start:]
    assert pure.decode_mpeg1(ib_only) is None  # B with one anchor


def test_ipb_truncation_and_bitflips_total():
    import random

    data = pure.mpeg1_encode_ipb(_ipb_first(80), -16, [("interp",), ("bwd",)])
    for cut in range(0, len(data), 5):
        pure.decode_mpeg1(data[:cut])
    rng = random.Random(63)
    for _ in range(250):
        b = bytearray(data)
        for _ in range(4):
            b[rng.randrange(len(b))] ^= 1 << rng.randrange(8)
        r = pure.decode_mpeg1(bytes(b))
        assert r is None or all(np.isfinite(m) for m in r["frame_means"])


def test_p_fcode2_wideshift_exact():
    """Round 7 (VERDICT r6 #4): f_code 2 P picture with a -20 full-pel
    vector — beyond the f_code-1 range, so every nonzero vector carries
    a motion_r residual bit. Macroblocks whose window would leave the
    frame take vector 0; the rest copy from 20 px left."""
    vals = [80, 120, 200, 40]
    es = pure.mpeg1_encode_ip(_colbands(vals), [("wideshift", -20, 2)])
    d = pure.decode_mpeg1(es)
    assert d is not None and d["n_frames"] == 2
    ref = np.array(_colbands(vals), dtype=np.int64)
    exp = ref.copy()
    w = ref.shape[1]
    for c in range(len(vals)):
        x0 = c * 16
        if x0 - 20 >= 0 and x0 - 4 <= w:
            exp[:, x0 : x0 + 16] = ref[:, x0 - 20 : x0 - 4]
    assert d["frame_means"][1] == float(exp.mean())


def test_p_fcode_residual_bit_parity():
    """At f_code 2, -15 and -16 share the magnitude code (8) and differ
    only in the residual bit — both must reconstruct exactly."""
    vals = [80, 120, 200]
    for dx in (-15, -16):
        es = pure.mpeg1_encode_ip(_colbands(vals), [("wideshift", dx, 2)])
        d = pure.decode_mpeg1(es)
        assert d is not None
        ref = np.array(_colbands(vals), dtype=np.int64)
        exp = ref.copy()
        w = ref.shape[1]
        for c in range(len(vals)):
            x0 = c * 16
            if x0 + dx >= 0 and x0 + 16 + dx <= w:
                exp[:, x0 : x0 + 16] = ref[:, x0 + dx : x0 + 16 + dx]
        assert d["frame_means"][1] == float(exp.mean()), dx


def test_p_fcode3_wideshift_exact():
    """f_code 3: two residual bits, principal range [-64, 63]."""
    vals = [80, 120, 200, 40, 160]
    es = pure.mpeg1_encode_ip(_colbands(vals), [("wideshift", -37, 3)])
    d = pure.decode_mpeg1(es)
    assert d is not None
    ref = np.array(_colbands(vals), dtype=np.int64)
    exp = ref.copy()
    w = ref.shape[1]
    for c in range(len(vals)):
        x0 = c * 16
        if x0 - 37 >= 0 and x0 - 21 <= w:
            exp[:, x0 : x0 + 16] = ref[:, x0 - 37 : x0 - 21]
    assert d["frame_means"][1] == float(exp.mean())


def test_p_fcode0_rejected():
    es = bytearray(pure.mpeg1_encode_ip(_colbands([80, 120]), [("copy",)]))
    codes = pure._mpeg_startcodes(bytes(es))
    p_off = [o for o, c in codes if c == 0x00][1]
    # picture header bits after start code: tref 10 + type 3 + vbv 16 +
    # full_pel 1 = 30; forward_f_code at bits 30..32
    for i in range(3):
        pos = (p_off + 4) * 8 + 30 + i
        es[pos >> 3] &= ~(0x80 >> (pos & 7)) & 0xFF
    assert pure.decode_mpeg1(bytes(es)) is None


def test_p_fcode2_hostile_bitflips_total():
    import random

    data = pure.mpeg1_encode_ip(
        _colbands([80, 120, 200, 40]), [("wideshift", -20, 2)]
    )
    rng = random.Random(29)
    for _ in range(250):
        b = bytearray(data)
        for _ in range(4):
            b[rng.randrange(len(b))] ^= 1 << rng.randrange(8)
        r = pure.decode_mpeg1(bytes(b))
        assert r is None or all(np.isfinite(m) for m in r["frame_means"])


def _rowbands(vals, w=32):
    """Horizontal bands: 16 rows per value."""
    return [[v] * w for v in vals for _ in range(16)]


def test_p_vertical_shift_exact():
    """Round 7: vertical motion vectors through the same reconstruct/MC
    machinery — a 32x32 picture with two row bands, vshift -16 copies
    the top band into the bottom macroblock row (top row keeps vector
    0, its window would leave the frame)."""
    es = pure.mpeg1_encode_ip(_rowbands([80, 200]), [("vshift", -16)])
    d = pure.decode_mpeg1(es)
    assert d is not None and d["n_frames"] == 2
    assert d["frame_means"] == [140.0, 80.0]


def test_p_vertical_shift_fcode2_exact():
    """Vertical f_code 2 (-20): macroblock rows whose window leaves the
    frame keep vector 0; row 2 references 20 px up (4 px of band 0 +
    12 px of band 1 per column)."""
    vals = [80, 120, 200]
    es = pure.mpeg1_encode_ip(_rowbands(vals), [("vshift", -20, 2)])
    d = pure.decode_mpeg1(es)
    assert d is not None
    ref = np.array(_rowbands(vals), dtype=np.int64)
    exp = ref.copy()
    h = ref.shape[0]
    for r in range(3):
        y0 = r * 16
        if y0 - 20 >= 0 and y0 - 4 <= h:
            exp[y0 : y0 + 16, :] = ref[y0 - 20 : y0 - 4, :]
    assert d["frame_means"][1] == float(exp.mean())
