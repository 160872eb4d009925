"""BMP / GIF / TIFF codecs (round 3 — the last stubbed raster formats):
lossless roundtrips, LZW code-width growth and 12-bit reset, interlace,
endianness, hostile-input totality, and stage routing. All from-scratch
per the public specs; the reference never decodes a byte itself."""

from __future__ import annotations

import random

import numpy as np
import pytest

from fa_spark import pure


def _px(img, shape):
    return np.frombuffer(bytes(img["pixels"]), dtype=np.uint8).reshape(*shape)


@pytest.mark.parametrize("codec", ["bmp", "gif", "tiff"])
def test_lossless_roundtrip_random_images(codec):
    enc = {"bmp": pure.bmp_encode, "gif": pure.gif_encode, "tiff": pure.tiff_encode}[codec]
    dec = {"bmp": pure.decode_bmp, "gif": pure.decode_gif, "tiff": pure.decode_tiff}[codec]
    rng = random.Random(hash(codec) & 0xFFFF)
    for w, h in [(1, 1), (3, 2), (16, 16), (13, 9), (40, 27)]:
        # gif needs <=256 distinct colors: draw from a bounded palette
        colors = [
            (rng.randrange(256), rng.randrange(256), rng.randrange(256))
            for _ in range(200)
        ]
        rows = [[colors[rng.randrange(len(colors))] for _ in range(w)] for _ in range(h)]
        img = dec(enc(rows))
        assert img is not None and img["width"] == w and img["height"] == h
        assert (_px(img, (h, w, 3)) == np.array(rows, dtype=np.uint8)).all()


def test_gif_interlace_and_code_width_growth():
    rng = random.Random(3)
    w = h = 48
    rows = [
        [(rng.randrange(256), rng.randrange(256), rng.randrange(256)) for _ in range(w)]
        for _ in range(h)
    ]
    rows = [[px if i < 250 else rows[0][0] for i, px in enumerate(r)] for r in rows]
    flat = {px for r in rows for px in r}
    while len(flat) > 256:  # clamp palette for the encoder contract
        rows = [[r[0]] * w for r in rows]
        flat = {px for r in rows for px in r}
    plain = pure.decode_gif(pure.gif_encode(rows))
    inter = pure.decode_gif(pure.gif_encode(rows, interlace=True))
    assert bytes(plain["pixels"]) == bytes(inter["pixels"])


def test_gif_12bit_table_reset():
    rng = random.Random(9)
    w = h = 128
    rows = [[(rng.randrange(256),) * 3 for _ in range(w)] for _ in range(h)]
    img = pure.decode_gif(pure.gif_encode(rows))
    assert (_px(img, (h, w, 3)) == np.array(rows, dtype=np.uint8)).all()


def test_gif_palette_overflow_rejected():
    rng = random.Random(1)
    rows = [
        [(rng.randrange(256), rng.randrange(256), rng.randrange(256)) for _ in range(40)]
        for _ in range(20)
    ]
    if len({p for r in rows for p in r}) > 256:
        with pytest.raises(ValueError, match="256"):
            pure.gif_encode(rows)


def test_bmp_topdown_and_32bit():
    """Negative height = top-down; 32-bit BGRA drops alpha."""
    base = pure.bmp_encode([[(1, 2, 3), (4, 5, 6)], [(7, 8, 9), (10, 11, 12)]])
    img = pure.decode_bmp(base)
    assert _px(img, (2, 2, 3)).tolist() == [[[1, 2, 3], [4, 5, 6]], [[7, 8, 9], [10, 11, 12]]]
    # craft top-down: flip height sign and row order
    b = bytearray(base)
    b[22:26] = (-2).to_bytes(4, "little", signed=True)
    off = int.from_bytes(base[10:14], "little")
    stride = 8  # 2 px * 3 B padded to 4
    rows = [bytes(base[off : off + stride]), bytes(base[off + stride : off + 2 * stride])]
    b[off : off + 2 * stride] = rows[1] + rows[0]
    img2 = pure.decode_bmp(bytes(b))
    assert bytes(img2["pixels"]) == bytes(img["pixels"])


def test_tiff_big_endian_gray():
    def be(v, n):
        return int(v).to_bytes(n, "big")

    n = 9
    ifd_off = 8
    px_off = ifd_off + 2 + n * 12 + 4 + 2

    def entry(tag, typ, cnt, val):
        return be(tag, 2) + be(typ, 2) + be(cnt, 4) + val

    ifd = be(n, 2)
    ifd += entry(256, 3, 1, be(2, 2) + be(0, 2))
    ifd += entry(257, 3, 1, be(2, 2) + be(0, 2))
    ifd += entry(258, 3, 1, be(8, 2) + be(0, 2))
    ifd += entry(259, 3, 1, be(1, 2) + be(0, 2))
    ifd += entry(262, 3, 1, be(1, 2) + be(0, 2))
    ifd += entry(273, 4, 1, be(px_off, 4))
    ifd += entry(277, 3, 1, be(1, 2) + be(0, 2))
    ifd += entry(278, 4, 1, be(2, 4))
    ifd += entry(279, 4, 1, be(4, 4))
    ifd += be(0, 4)
    tif = b"MM\x00*" + be(ifd_off, 4) + ifd + be(8, 2) + bytes([10, 20, 30, 40])
    img = pure.decode_tiff(tif)
    assert img["channels"] == 1 and bytes(img["pixels"]) == bytes([10, 20, 30, 40])


@pytest.mark.parametrize("dec", [pure.decode_bmp, pure.decode_gif, pure.decode_tiff])
def test_hostile_inputs_total(dec):
    good = {
        pure.decode_bmp: pure.bmp_encode,
        pure.decode_gif: pure.gif_encode,
        pure.decode_tiff: pure.tiff_encode,
    }[dec]([[(5, 6, 7)] * 4 for _ in range(4)])
    for cut in range(0, len(good), 3):
        dec(good[:cut])  # truncation: any outcome, no exception
    assert dec(None) is None and dec(b"") is None
    rng = random.Random(7)
    for _ in range(50):
        blob = bytearray(good)
        for _ in range(4):
            blob[rng.randrange(len(blob))] = rng.randrange(256)
        dec(bytes(blob))  # bit flips: total


def test_decode_bomb_dims_rejected():
    big = bytearray(pure.bmp_encode([[(0, 0, 0)]]))
    big[18:22] = (60000).to_bytes(4, "little")
    big[22:26] = (60000).to_bytes(4, "little")
    assert pure.decode_bmp(bytes(big)) is None
    g = bytearray(pure.gif_encode([[(0, 0, 0)]]))
    # image descriptor dims live after the 13-byte header + 6-byte palette
    # -> patch via re-encode path instead: descriptor w at fixed offset
    idx = bytes(g).find(b"\x2c")
    g[idx + 5 : idx + 7] = (60000).to_bytes(2, "little")
    g[idx + 7 : idx + 9] = (60000).to_bytes(2, "little")
    assert pure.decode_gif(bytes(g)) is None


def test_all_rasters_through_stage(spark):
    from fa_spark.stages.multimodal import detect_objects, extract_media_features, ocr_media

    quad = [[(200, 200, 200) if x < 8 else (10, 10, 10) for x in range(16)] for _ in range(16)]
    rows = [
        ("bmp", pure.bmp_encode(quad)),
        ("gif", pure.gif_encode(quad)),
        ("tiff", pure.tiff_encode(quad)),
    ]
    df = spark.createDataFrame(rows, "media_id string, content binary")
    feats = {r["media_id"]: r for r in extract_media_features(df).collect()}
    for fmt in ("bmp", "gif", "tiff"):
        assert feats[fmt]["content_type"] == fmt
        assert feats[fmt]["decode_status"] == "decoded"
        assert feats[fmt]["width"] == 16
        assert feats[fmt]["ahash"] is not None
    # identical pixels -> identical perceptual hash across formats
    assert len({feats[f]["ahash"] for f in ("bmp", "gif", "tiff")}) == 1
    det = {r["media_id"]: r for r in detect_objects(df).collect()}
    assert all(det[f]["decode_status"] == "decoded" for f in ("bmp", "gif", "tiff"))
    # OCR through a GIF: render text, palette-encode, read back
    text_img = pure.render_text_image("gif ocr 99")
    odf = spark.createDataFrame([("g", pure.gif_encode(text_img))], "media_id string, content binary")
    assert ocr_media(odf).collect()[0]["ocr_text"] == "gif ocr 99"


def test_compare_images_methods():
    """Round 4 — reference `fa validate images` parity: pixel / pHash /
    SSIM over this repo's own decoders, closed-form checks."""
    solid = lambda v, n=16: [[(v, v, v)] * n for _ in range(n)]  # noqa: E731
    a = pure.decode_png(pure.png_encode(solid(100)))
    b = pure.decode_png(pure.png_encode(solid(140)))
    c = pure.decode_png(pure.png_encode(solid(100)))
    px = pure.compare_images(a, c, "pixel")
    assert px["success"] and px["mismatch_count"] == 0
    px2 = pure.compare_images(a, b, "pixel")
    assert not px2["success"] and px2["mismatch_percent"] == 100.0
    # within-threshold color delta: 10/255 < 0.05 -> no mismatch
    d = pure.decode_png(pure.png_encode(solid(110)))
    assert pure.compare_images(a, d, "pixel")["mismatch_count"] == 0
    hs = pure.compare_images(a, b, "hash")
    assert hs["distance"] == 0 and hs["success"]  # flat images hash equal
    ss = pure.compare_images(a, b, "ssim")
    C1 = (0.01 * 255) ** 2
    exp = (2 * 100 * 140 + C1) / (100**2 + 140**2 + C1)
    assert abs(ss["ssim_score"] - round(exp, 6)) < 1e-6
    assert pure.compare_images(a, c, "ssim")["ssim_score"] == 1.0
    # strict mode flips lenient passes
    assert not pure.compare_images(a, b, "ssim", strict=True)["success"]
    # pHash is stable under re-encode and differs across structures
    import random

    rng = random.Random(5)
    noisy = [[(rng.randrange(256),) * 3 for _ in range(16)] for _ in range(16)]
    x = pure.decode_png(pure.png_encode(noisy))
    assert pure.compare_images(x, x, "hash")["distance"] == 0
    jx = pure.decode_jpeg(pure.jpeg_encode(noisy))
    assert pure.compare_images(x, jx, "hash")["distance"] <= 16  # lossy drift


def test_cli_validate_images(tmp_path, capsys):
    import json

    from fa_spark import cli

    p1 = tmp_path / "a.png"
    p2 = tmp_path / "b.png"
    p1.write_bytes(pure.png_encode([[(50, 50, 50)] * 8 for _ in range(8)]))
    p2.write_bytes(pure.png_encode([[(53, 53, 53)] * 8 for _ in range(8)]))
    cli.main(["validate-images", "--image1", str(p1), "--image2", str(p2)])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["success"] is True and out["mismatch_count"] == 0
    cli.main(["validate-images", "--image1", str(p1), "--image2", str(p2),
              "--method", "ssim", "--strict"])
    out2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out2["success"] is False  # not bit-identical in strict ssim
