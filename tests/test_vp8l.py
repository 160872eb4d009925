"""WebP VP8L lossless codec tests (round 8, VERDICT r7 #3).

The decoder implements the full public WebP Lossless Bitstream
Specification (RFC 9649 section 3); the fixture encoder emits real
bitstreams over the same feature set. The reference repo reaches this
surface by shelling out to external image tooling
(/root/reference/src/core/analyzer.py:140-313)."""
from __future__ import annotations

import random

import pytest

from fa_spark import pure


def _grad(w: int, h: int, did: int = 7) -> list:
    return [
        [(did % 251, x * 17 % 256, y * 17 % 256) for x in range(w)]
        for y in range(h)
    ]


def _check(rows, blob, channels=3, tag=""):
    img = pure.decode_webp_lossless(blob)
    assert img is not None, tag
    h, w = len(rows), len(rows[0])
    assert (img["width"], img["height"], img["channels"]) == (w, h, channels)
    px = img["pixels"]
    for y in range(h):
        for x in range(w):
            t = rows[y][x]
            o = (y * w + x) * channels
            exp = tuple(t[:3]) if channels == 3 else (
                t[0], t[1], t[2], t[3] if len(t) > 3 else 255
            )
            assert tuple(px[o : o + channels]) == exp, (tag, x, y)


def test_vp8l_roundtrip_plain_and_stream_features():
    rows = _grad(16, 16)
    _check(rows, pure.webp_vp8l_encode(rows), tag="plain")
    _check(rows, pure.webp_vp8l_encode(rows, subtract_green=True), tag="sg")
    for cb in (1, 4, 8, 11):
        _check(rows, pure.webp_vp8l_encode(rows, cache_bits=cb), tag=f"c{cb}")
    _check(rows, pure.webp_vp8l_encode(rows, use_lz77=False), tag="nolz")
    # LZ77 left-runs through the plane-code distance map
    runs = [[(200 if x < 8 else 10, 100, 50) for x in range(24)]
            for y in range(9)]
    _check(runs, pure.webp_vp8l_encode(runs, cache_bits=3), tag="runs")


def test_vp8l_roundtrip_all_predictor_modes():
    rows = _grad(16, 16)
    for mode in range(14):
        for bits in (2, 3, 4):
            _check(
                rows,
                pure.webp_vp8l_encode(rows, predictor=mode,
                                      transform_bits=bits),
                tag=f"pred{mode}/{bits}",
            )


def test_vp8l_roundtrip_color_palette_alpha_and_stacking():
    rows = _grad(16, 16)
    _check(rows, pure.webp_vp8l_encode(rows, color=(33, 239, 5),
                                       transform_bits=2), tag="color")
    # palette bundling widths 3/2/1/0 (2, 4, 13, 250 colors)
    for nc in (2, 4, 13, 250):
        prows = [
            [((y * 19 + x) * 37 % nc * 7 % 256,
              (y * 19 + x) * 37 % nc * 3 % 256,
              (y * 19 + x) * 37 % nc) for x in range(19)]
            for y in range(7)
        ]
        _check(prows, pure.webp_vp8l_encode(prows, palette=True),
               tag=f"pal{nc}")
    arows = [
        [(x * 9 % 256, y * 13 % 256, (x + y) % 256, 128 + x % 64)
         for x in range(11)]
        for y in range(13)
    ]
    _check(arows, pure.webp_vp8l_encode(arows, alpha=True), channels=4,
           tag="alpha")
    _check(rows, pure.webp_vp8l_encode(rows, predictor=11,
                                       color=(5, 250, 12),
                                       subtract_green=True, cache_bits=5),
           tag="stack")
    _check(rows, pure.webp_vp8l_encode(rows, subtract_green=True,
                                       palette=True), tag="sg+pal")


def test_vp8l_meta_prefix_image():
    """Spatially-varying prefix codes: a real meta prefix image with two
    tile groups decodes through the group-selection path."""
    rows = _grad(16, 16)
    for mb in (2, 3, 4, 5):
        _check(rows, pure.webp_vp8l_encode(rows, meta_bits=mb),
               tag=f"meta{mb}")
    wide = _grad(20, 12)
    _check(wide, pure.webp_vp8l_encode(wide, subtract_green=True,
                                       meta_bits=2), tag="meta+sg")
    _check(wide, pure.webp_vp8l_encode(wide, predictor=7, meta_bits=3),
           tag="meta+pred")
    narrow = _grad(3, 9)  # single-tile-wide canvas: one group, path taken
    _check(narrow, pure.webp_vp8l_encode(narrow, meta_bits=2),
           tag="meta-narrow")


def test_vp8l_roundtrip_fuzz():
    rng = random.Random(42)
    for trial in range(25):
        w, h = rng.randint(1, 33), rng.randint(1, 17)
        rows = [
            [(rng.randrange(256), rng.randrange(256), rng.randrange(256))
             for _ in range(w)]
            for _ in range(h)
        ]
        kwargs = {}
        if rng.random() < 0.4:
            kwargs["predictor"] = rng.randrange(14)
        if rng.random() < 0.3:
            kwargs["color"] = tuple(rng.randrange(256) for _ in range(3))
        if rng.random() < 0.4:
            kwargs["subtract_green"] = True
        if rng.random() < 0.4:
            kwargs["cache_bits"] = rng.randint(1, 8)
        _check(rows, pure.webp_vp8l_encode(rows, **kwargs),
               tag=f"fuzz{trial}")


def test_vp8l_plane_map_structure():
    """120 distinct offsets; dy=0 row has dx 1..8, rows 1..7 have dx
    -7..8; ordered by squared distance then |dx|, positive dx first —
    the spec's distance-mapping table, generated not typed."""
    P = pure._VP8L_PLANE
    assert len(P) == 120 and len(set(P)) == 120
    assert P[:10] == [(0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0),
                      (1, 2), (-1, 2), (2, 1), (-2, 1)]
    assert P[-1] == (8, 7)
    assert all(1 <= x <= 8 for x, y in P if y == 0)
    assert all(-7 <= x <= 8 for x, y in P)
    d2 = [x * x + y * y for x, y in P]
    assert d2 == sorted(d2)


def test_vp8l_canonical_code_edges():
    # complete 2-level code: canonical map is {0:(1,0), 1:(2,2), 2:(2,3)}
    kind, (root, m), ml = pure._vp8l_canonical([1, 2, 2])
    assert kind == 1 and ml == 2
    assert m == {(1, 0): 0, (2, 2): 1, (2, 3): 2}
    # root table resolves by LSB-first peek: bit0=0 -> sym 0; bits
    # (1,0) -> code 10 -> sym 1; bits (1,1) -> code 11 -> sym 2
    assert root[0b0] == (0, 1) and root[0b10] == (0, 1)
    assert root[0b01] == (1, 2) and root[0b11] == (2, 2)
    # decoding agrees with the map for every 8-bit prefix
    for v in range(256):
        r = pure._VBitReader(bytes([v]))
        s = pure._vp8l_read_sym(r, (kind, (root, m), ml))
        exp = 0 if v & 1 == 0 else (1 if (v >> 1) & 1 == 0 else 2)
        assert s == exp, v
    # single used symbol -> 0-bit tree
    kind, payload, ml = pure._vp8l_canonical([0, 0, 5, 0])
    assert (kind, payload, ml) == (0, 2, 0)
    # incomplete and oversubscribed codes rejected
    with pytest.raises(ValueError):
        pure._vp8l_canonical([2, 2, 2])
    with pytest.raises(ValueError):
        pure._vp8l_canonical([1, 1, 1])
    with pytest.raises(ValueError):
        pure._vp8l_canonical([0, 0, 0])


def test_vp8l_hostile_input_total():
    rows = [[(x * 7 % 256, y * 11 % 256, x * y % 256) for x in range(12)]
            for y in range(12)]
    blob = pure.webp_vp8l_encode(rows, predictor=5, cache_bits=3)
    for cut in range(len(blob)):
        pure.decode_webp_lossless(blob[:cut])  # never raises
    rng = random.Random(7)
    for _ in range(1500):
        ba = bytearray(blob)
        for _ in range(rng.randint(1, 6)):
            ba[rng.randrange(len(ba))] ^= 1 << rng.randrange(8)
        pure.decode_webp_lossless(bytes(ba))  # never raises
    assert pure.decode_webp_lossless(
        pure.webp_encode_envelope("lossy", 64, 48)) is None
    assert pure.decode_webp_lossless(
        pure.webp_encode_envelope("extended", 64, 48)) is None
    assert pure.decode_webp_lossless(b"") is None
    assert pure.decode_webp_lossless(None) is None
    # oversized dims rejected up front (CPU budget): a 1024x1024 header
    big = pure.webp_encode_envelope("lossless", 1024, 1024)
    assert pure.decode_webp_lossless(big) is None


def test_vp8l_envelope_meta_agrees_with_decode():
    rows = _grad(9, 5, did=3)
    blob = pure.webp_vp8l_encode(rows)
    m = pure.extract_metadata(blob)
    assert m["webp:format"] == "lossless"
    assert m["webp:width"] == "9" and m["webp:height"] == "5"
    assert pure.sniff_bytes(blob)["content_type"] == "webp"


def test_vp8x_container_walk_and_embedded_vp8l():
    rows = _grad(10, 6, did=4)
    still = pure.webp_vp8l_encode(rows, subtract_green=True)
    # VP8X wrapping a real VP8L still: meta flags it, decoder decodes it
    wrapped = pure.webp_vp8x_encode(10, 6, vp8l=still)
    m = pure.extract_metadata(wrapped)
    assert m["webp:format"] == "extended" and m["webp:has_vp8l"] == "1"
    img = pure.decode_webp_lossless(wrapped)
    assert img is not None and (img["width"], img["height"]) == (10, 6)
    assert img["pixels"] == pure.decode_webp_lossless(still)["pixels"]
    # animation: exact frame count, loop count, summed duration
    anim = pure.webp_vp8x_encode(32, 24, frames=[40, 40, 120], loop_count=3)
    ma = pure.extract_metadata(anim)
    assert ma["webp:animation"] == "1" and ma["webp:n_frames"] == "3"
    assert ma["webp:loop_count"] == "3"
    assert ma["webp:anim_duration_s"] == "0.200"
    assert pure.decode_webp_lossless(anim) is None  # no still to decode
    # truncation never raises
    for cut in range(0, len(wrapped), 7):
        pure.extract_metadata(wrapped[:cut])
        pure.decode_webp_lossless(wrapped[:cut])


def test_vp8x_embedded_still_decodes_through_stage(spark):
    from fa_spark.stages.multimodal import extract_media_features

    rows = _grad(16, 16, did=11)
    wrapped = pure.webp_vp8x_encode(
        16, 16, vp8l=pure.webp_vp8l_encode(rows)
    )
    df = spark.createDataFrame([("x1", wrapped)],
                               "media_id string, content binary")
    out = extract_media_features(df, mode="describe").collect()[0]
    assert out["decode_status"] == "decoded"
    assert out["width"] == 16 and out["feature"][0] == float(11 % 251)


def test_vp8l_decodes_lossy_stays_stubbed(spark):
    """Round 8: webp leaves the stub tier for VP8L payloads through the
    feature stage; VP8-lossy keeps decode_status stubbed; a corrupted
    VP8L payload reports decode_error."""
    from fa_spark.stages.multimodal import extract_media_features

    rows = _grad(16, 16, did=9)
    good = pure.webp_vp8l_encode(rows, subtract_green=True, cache_bits=4)
    bad = good[:-4]  # truncated chunk: envelope still sniffs lossless,
    # the RIFF walk rejects the short chunk -> deterministic decode_error
    lossy = pure.webp_encode_envelope("lossy", 64, 48)
    df = spark.createDataFrame(
        [("w1", good), ("w2", bad), ("w3", lossy)],
        "media_id string, content binary",
    )
    out = {
        r["media_id"]: r
        for r in extract_media_features(df, mode="describe").collect()
    }
    assert out["w1"]["content_type"] == "webp"
    assert out["w1"]["decode_status"] == "decoded"
    assert out["w1"]["width"] == 16 and out["w1"]["height"] == 16
    assert out["w1"]["feature"][0] == float(9 % 251)  # mean_r closed form
    assert out["w1"]["feature"][1] == 127.5           # mean_g
    assert out["w2"]["decode_status"] == "decode_error"
    assert out["w3"]["decode_status"] == "stubbed"


# --- ICO favicons (round 8; lives here with the other round-8 raster work) --


def test_ico_roundtrip_and_directory_walk():
    rows = _grad(16, 16)
    png_ico = pure.ico_encode([("png", rows)])
    assert pure.sniff_bytes(png_ico)["content_type"] == "ico"
    m = pure.extract_metadata(png_ico)
    assert m["ico:kind"] == "icon" and m["ico:formats"] == "png"
    img = pure.decode_ico(png_ico)
    assert img["pixels"] == pure.decode_png(pure.png_encode(rows))["pixels"]
    bmp_ico = pure.ico_encode([("bmp", rows)])
    m2 = pure.extract_metadata(bmp_ico)
    assert m2["ico:formats"] == "bmp" and m2["ico:bpp"] == "24"
    img2 = pure.decode_ico(bmp_ico)
    assert (img2["width"], img2["height"], img2["channels"]) == (16, 16, 3)
    for y in range(16):
        for x in range(16):
            o = (y * 16 + x) * 3
            assert tuple(img2["pixels"][o : o + 3]) == rows[y][x]
    # multi-image directory: the largest entry is elected
    multi = pure.ico_encode([
        ("bmp", _grad(8, 8, did=100)), ("png", rows),
        ("bmp", [[(1, 2, 3)] * 4] * 4),
    ])
    m3 = pure.extract_metadata(multi)
    assert m3["ico:n_images"] == "3" and m3["ico:width"] == "16"
    assert m3["ico:formats"] == "bmp,png"
    assert pure.decode_ico(multi)["pixels"] == img["pixels"]


def test_ico_hostile_and_sniff_strictness():
    blob = pure.ico_encode([("bmp", _grad(12, 10)), ("png", _grad(6, 6))])
    for cut in range(0, len(blob), 7):
        pure.decode_ico(blob[:cut])
        pure.extract_metadata(blob[:cut])
    import random
    rng = random.Random(3)
    for _ in range(800):
        ba = bytearray(blob)
        for _ in range(rng.randint(1, 5)):
            ba[rng.randrange(len(ba))] ^= 1 << rng.randrange(8)
        pure.decode_ico(bytes(ba))
    # near-magic prose must not sniff as ico (weak zero-heavy magic)
    assert pure.sniff_bytes(b"\x00\x00\x01\x00" + b"x" * 40)[
        "content_type"] != "ico"
    assert pure.decode_ico(b"") is None and pure.decode_ico(None) is None
    # odd double-height or non-40 info header rejected
    bad = bytearray(pure.ico_encode([("bmp", _grad(5, 5))]))
    off = int.from_bytes(bad[18:22], "little")
    bad[off + 8 : off + 12] = (11).to_bytes(4, "little")  # odd XOR+AND h
    assert pure.decode_ico(bytes(bad)) is None


def test_ico_decodes_through_stage(spark):
    from fa_spark.stages.multimodal import extract_media_features

    rows = _grad(16, 16, did=77)
    df = spark.createDataFrame(
        [("i1", pure.ico_encode([("png", rows)])),
         ("i2", pure.ico_encode([("bmp", rows)]))],
        "media_id string, content binary",
    )
    out = {
        r["media_id"]: r
        for r in extract_media_features(df, mode="describe").collect()
    }
    for k in ("i1", "i2"):
        assert out[k]["content_type"] == "ico"
        assert out[k]["decode_status"] == "decoded"
        assert out[k]["feature"][0] == float(77 % 251)
        assert out[k]["feature"][1] == 127.5


# --- AVIF/HEIF envelopes (round 8) ------------------------------------------


def test_avif_envelope_walk():
    blob = pure.avif_envelope_encode(640, 480, bpp=10, channels=3)
    assert pure.sniff_bytes(blob)["content_type"] == "avif"
    m = pure.extract_metadata(blob)
    assert m["avif:width"] == "640" and m["avif:height"] == "480"
    assert m["avif:bpp"] == "10" and m["avif:channels"] == "3"
    assert m["avif:codec"] == "av1" and m["mp4:brand"] == "avif"
    h = pure.avif_envelope_encode(320, 240, codec=b"hvcC", brand=b"heic")
    mh = pure.extract_metadata(h)
    assert pure.sniff_bytes(h)["content_type"] == "heic"
    assert mh["heic:width"] == "320" and mh["heic:codec"] == "hevc"
    # plain video mp4 keeps its type and gains no image-item keys
    v = pure.mp4_envelope_encode(2.0)
    assert pure.sniff_bytes(v)["content_type"] == "mp4"
    assert not any(k.startswith(("avif", "heic"))
                   for k in pure.extract_metadata(v))
    for cut in range(0, len(blob), 7):
        pure.extract_metadata(blob[:cut])


def test_avif_stays_stubbed_with_dims(spark):
    from fa_spark.stages.multimodal import extract_media_features

    df = spark.createDataFrame(
        [("a1", pure.avif_envelope_encode(200, 100))],
        "media_id string, content binary",
    )
    out = extract_media_features(df, mode="describe").collect()[0]
    assert out["content_type"] == "avif"
    assert out["decode_status"] == "stubbed"  # honest AV1 envelope tier
    assert out["width"] == 200 and out["height"] == 100


# --- APNG (round 8) ----------------------------------------------------------


def test_apng_clip_decode():
    frames = [[[(v, v, v)] * 8 for _ in range(6)] for v in (10, 23, 36)]
    blob = pure.apng_encode(frames, delays=[(2, 50), (4, 50), (6, 50)])
    d = pure.decode_apng_frames(blob)
    assert d["n_frames"] == 3 and (d["width"], d["height"]) == (8, 6)
    assert d["frame_means"] == [10.0, 23.0, 36.0]
    assert abs(d["duration_s"] - 0.24) < 1e-9 and abs(d["fps"] - 12.5) < 1e-9
    m = pure.extract_metadata(blob)
    assert m["png:n_frames"] == "3" and m["png:anim_duration_s"] == "0.240"
    # default image is excluded from the clip
    blob2 = pure.apng_encode(
        [[[(255, 0, 0)] * 8] * 6] + frames, delays=[(1, 100)] * 3,
        default_image=True,
    )
    d2 = pure.decode_apng_frames(blob2)
    assert d2["n_frames"] == 3 and d2["frame_means"] == [10.0, 23.0, 36.0]
    # the raster stage still sees a decodable (first/default) image
    assert pure.decode_png(blob)["width"] == 8
    # plain png is not an animation
    assert pure.decode_apng_frames(pure.png_encode([[(1, 2, 3)] * 4] * 4)) \
        is None
    # delay denominator 0 means 1/100 s per spec
    b3 = pure.apng_encode([frames[0], frames[1]], delays=[(5, 0), (5, 0)])
    d3 = pure.decode_apng_frames(b3)
    assert abs(d3["duration_s"] - 0.10) < 1e-9


def test_apng_full_compositing():
    """The complete APNG model (late round 8): partial frames, dispose
    NONE/BACKGROUND/PREVIOUS, blend SOURCE/OVER on an RGBA canvas."""
    full = [[(100, 100, 100)] * 4 for _ in range(4)]
    patch = [[(200, 200, 200)] * 2 for _ in range(2)]
    strip = [[(50, 50, 50)] * 4]
    # dispose NONE: the patch persists into the mean
    d = pure.decode_apng_frames(pure.apng_encode(specs=[
        (full, 0, 0, (1, 100), 0, 0), (patch, 1, 1, (1, 100), 0, 0),
    ]))
    assert d["frame_means"] == [100.0, (100 * 12 + 200 * 4) / 16]
    # dispose BACKGROUND: region clears to transparent black afterward
    d = pure.decode_apng_frames(pure.apng_encode(specs=[
        (full, 0, 0, (1, 100), 0, 0), (patch, 1, 1, (1, 100), 1, 0),
        (strip, 0, 3, (1, 100), 0, 0),
    ]))
    assert abs(d["frame_means"][2] - (100 * 8 + 50 * 4) / 16) < 1e-9
    # dispose PREVIOUS: region reverts afterward
    d = pure.decode_apng_frames(pure.apng_encode(specs=[
        (full, 0, 0, (1, 100), 0, 0), (patch, 1, 1, (1, 100), 2, 0),
        (strip, 0, 3, (1, 100), 0, 0),
    ]))
    assert abs(d["frame_means"][2] - (100 * 12 + 50 * 4) / 16) < 1e-9
    # blend OVER with per-pixel alpha: opaque column paints, transparent keeps
    full_a = [[(100, 100, 100, 255)] * 4 for _ in range(4)]
    half_a = [[(200, 200, 200, 255 if x == 0 else 0) for x in range(2)]
              for _ in range(2)]
    d = pure.decode_apng_frames(pure.apng_encode(specs=[
        (full_a, 0, 0, (1, 100), 0, 0), (half_a, 1, 1, (1, 100), 0, 1),
    ]))
    assert abs(d["frame_means"][1] - (100 * 14 + 200 * 2) / 16) < 1e-9
    # the IDAT frame must cover the canvas (spec) — encoder enforces it
    with pytest.raises(ValueError):
        pure.apng_encode(specs=[(patch, 1, 1, (1, 100), 0, 0)])


def test_apng_subset_bounds_and_hostility():
    frames = [[[(9, 9, 9)] * 8 for _ in range(6)] for _ in range(2)]
    blob = bytearray(pure.apng_encode(frames))
    # a frame whose region exceeds the canvas rejects
    at = bytes(blob).index(b"fcTL") + 4 + 12
    blob[at : at + 4] = (1).to_bytes(4, "big")  # fx=1 -> fx+fw > w
    assert pure.decode_apng_frames(bytes(blob)) is None
    good = pure.apng_encode(frames)
    for cut in range(0, len(good), 9):
        pure.decode_apng_frames(good[:cut])
    import random
    rng = random.Random(5)
    for _ in range(600):
        ba = bytearray(good)
        for _ in range(rng.randint(1, 5)):
            ba[rng.randrange(len(ba))] ^= 1 << rng.randrange(8)
        pure.decode_apng_frames(bytes(ba))
