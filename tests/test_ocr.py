"""OCR glyph matcher (round 3, reference M2): render -> codec round trip ->
segment -> match. Scope: exact fixed-pitch glyph font, black-on-white —
documented in pure.ocr_image; the reference's analyzer shells to tesseract
(/root/reference/src/core/analyzer.py), absent in this container."""

from __future__ import annotations

import random

import pytest

from fa_spark import pure


def _roundtrip_png(text):
    return pure.ocr_image(pure.decode_png(pure.png_encode(pure.render_text_image(text))))


def test_png_roundtrip_exact():
    for text in ["doc123", "hello world", "a", "0123456789", "spark engine"]:
        assert _roundtrip_png(text) == text.rstrip()


def test_jpeg_roundtrip_survives_lossy_codec():
    """The ink threshold absorbs JPEG ringing on the 0/255 contrast — OCR
    must be exact through the LOSSY codec, color and grayscale."""
    for text in ["doc42", "the quick brown fox", "a1b2c3"]:
        rows = pure.render_text_image(text)
        assert pure.ocr_image(pure.decode_jpeg(pure.jpeg_encode(rows))) == text
        gray = [[px[0] for px in r] for r in rows]
        assert (
            pure.ocr_image(pure.decode_jpeg(pure.jpeg_encode(gray, gray=True)))
            == text
        )


def test_fuzz_random_strings():
    rng = random.Random(99)
    alphabet = pure.OCR_CHARSET + " "
    for _ in range(25):
        text = "".join(rng.choice(alphabet) for _ in range(rng.randrange(1, 30)))
        assert _roundtrip_png(text) == text.rstrip()


def test_unknown_glyph_reads_question_mark():
    rows = pure.render_text_image("ab")
    rows[2][2] = (0, 0, 0) if rows[2][2] == (255, 255, 255) else (255, 255, 255)
    got = pure.ocr_image(pure.decode_png(pure.png_encode(rows)))
    assert got == "?b"


def test_rejects_unrenderable_chars_and_tiny_images():
    with pytest.raises(ValueError, match="not in OCR font"):
        pure.render_text_image("UPPER")
    assert pure.ocr_image(None) is None
    tiny = pure.decode_png(pure.png_encode([[(0, 0, 0)] * 3 for _ in range(3)]))
    assert pure.ocr_image(tiny) is None


def test_font_pairwise_distinct():
    bits = list(pure.OCR_FONT.values())
    assert len(bits) == len(set(bits))


def test_ocr_through_stage(spark):
    from fa_spark.stages.multimodal import ocr_media

    rows = [
        ("t1", pure.jpeg_encode(pure.render_text_image("doc7"))),
        ("t2", pure.png_encode(pure.render_text_image("png path"))),
        ("t3", b"plain text, not an image"),
        ("t4", b"\xff\xd8\xff\xdb\x00\x04\x00\x00"),
    ]
    df = spark.createDataFrame(rows, "media_id string, content binary")
    out = {r["media_id"]: r for r in ocr_media(df).collect()}
    assert out["t1"]["ocr_text"] == "doc7" and out["t1"]["decode_status"] == "decoded"
    assert out["t2"]["ocr_text"] == "png path"
    assert out["t3"]["decode_status"] == "skipped" and out["t3"]["ocr_text"] is None
    assert out["t4"]["decode_status"] == "decode_error"


def test_multi_scale_roundtrip():
    """Round 4 (VERDICT #6): the matcher must read its font rendered at
    any pixel scale — PNG exact and through the lossy JPEG codec."""
    for s in (1, 2, 3, 4):
        rows = pure.render_text_image("doc42 scale", scale=s)
        assert (
            pure.ocr_image(pure.decode_png(pure.png_encode(rows)))
            == "doc42 scale"
        )
    for s in (2, 3):
        rows = pure.render_text_image("doc7", scale=s)
        assert pure.ocr_image(pure.decode_jpeg(pure.jpeg_encode(rows))) == "doc7"


def test_threshold_invariance_gray_on_gray():
    rows = pure.render_text_image("gray ink", scale=2, ink=90, paper=180)
    assert pure.ocr_image(pure.decode_png(pure.png_encode(rows))) == "gray ink"
    # and through JPEG at the fixture contrast the registry query uses
    rows = pure.render_text_image("doc3", scale=2, ink=64, paper=224)
    assert pure.ocr_image(pure.decode_jpeg(pure.jpeg_encode(rows))) == "doc3"


def test_parameterized_font():
    """Any glyph table works — recognition is not hardwired to OCR_FONT."""
    alt = {"x": 0b10101_01010_10101_01010_10101_01010_10101, " ": 0}
    # render with the alt glyph by hand: reuse render via monkey table
    rows = [[(255, 255, 255)] * 13 for _ in range(9)]
    for gy in range(7):
        for gx in range(5):
            if alt["x"] >> (gy * 5 + gx) & 1:
                rows[1 + gy][1 + gx] = (0, 0, 0)
    img = pure.decode_png(pure.png_encode(rows))
    assert pure.ocr_image(img, font=alt) == "x"
    assert pure.ocr_image(img) == "?"  # built-in font doesn't know it


def test_hamming_tolerance_opt_in():
    rows = pure.render_text_image("ab")
    rows[2][2] = (0, 0, 0) if rows[2][2] == (255, 255, 255) else (255, 255, 255)
    img = pure.decode_png(pure.png_encode(rows))
    assert pure.ocr_image(img) == "?b"  # default stays exact
    assert pure.ocr_image(img, max_hamming=3) == "ab"


def test_soft_matcher_reads_antialiased_at_two_scales():
    """Round 5 (VERDICT r4 #4): anti-aliased renders (3x3 box blur, gray
    edge ramps) are unreadable by the exact cell matcher but read by the
    soft sub-cell confidence path — at BOTH render scales 2 and 3,
    through both codecs, at both contrast classes."""
    for s in (2, 3):
        for ink, paper in ((0, 255), (64, 224)):
            rows = pure.render_text_image(
                "soft9", scale=s, ink=ink, paper=paper, antialias=True
            )
            png = pure.decode_png(pure.png_encode(rows))
            jpg = pure.decode_jpeg(pure.jpeg_encode(rows))
            assert pure.ocr_image(png, soft=True) == "soft9", (s, ink)
            assert pure.ocr_image(jpg, soft=True) == "soft9", (s, ink)


def test_soft_equals_exact_on_binary_input():
    """On clean binary renders the soft path must read identically to the
    exact path (the agreement formula reduces to nbits - Hamming)."""
    for text in ("abc", "doc42", "zz00"):
        for s in (1, 2, 3):
            img = pure.decode_png(
                pure.png_encode(pure.render_text_image(text, scale=s))
            )
            assert pure.ocr_image(img, soft=True) == pure.ocr_image(img) == text


def test_soft_low_confidence_reads_question_mark():
    """A cell far from every glyph still reads '?' under the soft path:
    scramble half a glyph's pixels so no candidate clears the
    confidence threshold."""
    rows = pure.render_text_image("ab", scale=1)
    # overwrite the 'a' cell with an alternating pattern (non-glyph)
    for gy in range(pure.GLYPH_H):
        for gx in range(pure.GLYPH_W):
            v = 0 if (gx + gy) % 2 == 0 else 255
            rows[1 + gy][1 + gx] = (v, v, v)
    img = pure.decode_png(pure.png_encode(rows))
    got = pure.ocr_image(img, soft=True, scales=(1,))
    assert got is not None and got.endswith("b") and got[0] == "?"


# ---------------------------------------------------------------------------
# proportional (variable-pitch) tier — round 6, VERDICT r5 #6
# ---------------------------------------------------------------------------


def test_prop_font_structure():
    """Widths 3/4/5; per-width patterns unique; every column carries a
    vertically-adjacent ink pair (the blur-survivability densification
    rule — a lone bit washes out under AA + midpoint threshold)."""
    seen = {}
    for ch in pure.OCR_CHARSET:
        w, b = pure.PROP_FONT[ch]
        assert w in (3, 4, 5)
        assert (w, b) not in seen, (ch, seen[(w, b)])
        seen[(w, b)] = ch
        for gx in range(w):
            rows = [gy for gy in range(pure.GLYPH_H) if b >> (gy * w + gx) & 1]
            assert rows, (ch, gx)
            assert any(y - x == 1 for x, y in zip(rows, rows[1:])), (ch, gx)


def test_prop_roundtrip_scales_and_codecs():
    for text in ("doc123", "hello world", "a1 b2 c3"):
        for s in (1, 2, 3):
            rows = pure.render_text_image_prop(text, scale=s)
            for codec in ("png", "jpeg"):
                blob = (
                    pure.png_encode(rows) if codec == "png"
                    else pure.jpeg_encode(rows)
                )
                img = (
                    pure.decode_png(blob) if codec == "png"
                    else pure.decode_jpeg(blob)
                )
                assert pure.ocr_image(img, soft=True, pitch="prop") == text, (
                    text, s, codec,
                )


def test_prop_antialiased_full_charset():
    txt = "abcdefghijklm nopqrstuvwxyz 0123456789"
    for s in (2, 3):
        rows = pure.render_text_image_prop(txt, scale=s, antialias=True)
        img = pure.decode_jpeg(pure.jpeg_encode(rows))
        assert pure.ocr_image(img, soft=True, pitch="prop") == txt, s


def test_prop_gray_contrast():
    rows = pure.render_text_image_prop("gray42", ink=64, paper=224, scale=2)
    img = pure.decode_jpeg(pure.jpeg_encode(rows))
    assert pure.ocr_image(img, soft=True, pitch="prop") == "gray42"


def test_auto_pitch_selects_correctly():
    """pitch='auto' must read BOTH render families — fixed-pitch images
    keep their fixed reading (normalized-confidence tie goes to fixed),
    proportional images win on confidence."""
    for s, aa in ((1, False), (2, True), (3, True)):
        fimg = pure.decode_jpeg(
            pure.jpeg_encode(
                pure.render_text_image("doc77", scale=s, antialias=aa)
            )
        )
        pimg = pure.decode_jpeg(
            pure.jpeg_encode(
                pure.render_text_image_prop("doc77", scale=s, antialias=aa)
            )
        )
        assert pure.ocr_image(fimg, soft=True, pitch="auto") == "doc77", (s, aa)
        assert pure.ocr_image(pimg, soft=True, pitch="auto") == "doc77", (s, aa)


def test_prop_unknown_width_run_reads_question_mark():
    """A glyph run whose width matches no font width class reads '?' —
    paint a 7-column solid block (widths are only 3/4/5)."""
    import numpy as np

    w = 2 * pure._OCR_MARGIN + 7
    rows = [[(255, 255, 255)] * w for _ in range(pure.GLYPH_H + 2)]
    for gy in range(pure.GLYPH_H):
        for gx in range(7):
            rows[1 + gy][1 + gx] = (0, 0, 0)
    img = pure.decode_png(pure.png_encode(rows))
    assert pure.ocr_image(img, soft=True, pitch="prop", scales=(1,)) == "?"


def test_prop_space_collapse_and_word_gaps():
    """Words separated by one space read back single-spaced; the matcher
    collapses wider gaps to one space by contract."""
    rows = pure.render_text_image_prop("ab  cd", scale=1)
    img = pure.decode_png(pure.png_encode(rows))
    assert pure.ocr_image(img, soft=True, pitch="prop") == "ab cd"
