"""PDF layout-parse operator (north_rule "PDF/layout parse").

Reference parity target: document mode returns {text, document_type}
(/root/reference/src/utils/json_utils.py:190-196); the reference treats .pdf
as a first-class document type (/root/reference/config.json:6-9). These tests
pin the pure extractor's operator semantics (Tj/TJ/'/hex/octal/escapes,
FlateDecode, line segmentation) and the Spark end-to-end path.
"""

from __future__ import annotations

import zlib

from pyspark.sql import functions as F

from fa_spark import pure


def _wrap_stream(content: bytes, flate: bool = False, extra: bytes = b"") -> bytes:
    body = zlib.compress(content) if flate else content
    filt = b" /Filter /FlateDecode" if flate else b""
    return (
        b"%PDF-1.4\n"
        b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n"
        b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n"
        b"3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n"
        b"4 0 obj << /Length " + str(len(body)).encode() + filt + b" >>\nstream\n"
        + body + b"\nendstream\nendobj\n" + extra + b"%%EOF\n"
    )


# ---- operator semantics ----

def test_tj_and_line_moves():
    pdf = _wrap_stream(b"BT /F1 12 Tf 72 720 Td (line one) Tj 0 -14 Td (line two) Tj ET")
    r = pure.extract_pdf_text(pdf)
    assert r.text == "line one\nline two"
    assert r.status == "success" and r.doc_type == "pdf" and r.attempts == 1


def test_tj_array_joins_without_kerning_spaces():
    pdf = _wrap_stream(b"BT [(He) -30 (llo) 5 ( world)] TJ ET")
    assert pure.extract_pdf_text(pdf).text == "Hello world"


def test_quote_operator_starts_new_line():
    pdf = _wrap_stream(b"BT (first) Tj (second)' ET")
    assert pure.extract_pdf_text(pdf).text == "first\nsecond"


def test_hex_string_and_octal_escape():
    pdf = _wrap_stream(b"BT <48692100> Tj T* (\\101\\102C) Tj ET")
    assert pure.extract_pdf_text(pdf).text == "Hi!\nABC"


def test_literal_escapes_and_nested_parens():
    pdf = _wrap_stream(rb"BT (a\(b\)c \\ (nested)) Tj ET")
    assert pure.extract_pdf_text(pdf).text == "a(b)c \\ (nested)"


def test_flatedecode_stream():
    pdf = _wrap_stream(b"BT (compressed body text) Tj ET", flate=True)
    r = pure.extract_pdf_text(pdf)
    assert r.text == "compressed body text" and r.status == "success"


def test_multiple_streams_concatenate():
    one = _wrap_stream(b"BT (page one) Tj ET")
    # splice a second content stream object before %%EOF
    two = b"6 0 obj << /Length 19 >>\nstream\nBT (page two) Tj ET\nendstream\nendobj\n"
    pdf = one.replace(b"%%EOF\n", two + b"%%EOF\n")
    assert pure.extract_pdf_text(pdf).text == "page one\npage two"


def test_info_title_surfaces():
    info = b"5 0 obj << /Title (My Report) >> endobj\n"
    pdf = _wrap_stream(b"BT (body) Tj ET", extra=info)
    r = pure.extract_pdf_text(pdf)
    assert r.title == "My Report" and r.text == "body"


def test_unsupported_filter_skipped_not_garbled():
    body = b"\xff\xfe\xfd\xfc"
    pdf = (
        b"%PDF-1.4\n4 0 obj << /Length 4 /Filter /DCTDecode >>\nstream\n"
        + body + b"\nendstream\nendobj\n%%EOF\n"
    )
    r = pure.extract_pdf_text(pdf)
    assert r.status == "empty" and r.text == ""


def test_corrupt_flate_is_empty_not_crash():
    pdf = (
        b"%PDF-1.4\n4 0 obj << /Length 8 /Filter /FlateDecode >>\nstream\n"
        b"notflate\nendstream\nendobj\n%%EOF\n"
    )
    assert pure.extract_pdf_text(pdf).status == "empty"


def test_truncated_pdf_no_crash():
    pdf = _wrap_stream(b"BT (will be cut) Tj ET")[:40]
    r = pure.extract_pdf_text(pdf)
    assert r.doc_type == "pdf"  # never raises


def test_streamless_pdf_empty():
    r = pure.extract_main_text(b"%PDF-1.7\n%fake junk bytes")
    assert r.status == "empty" and r.doc_type == "pdf"


def test_fused_matches_individual():
    pdf = _wrap_stream(b"BT (fused equals individual) Tj ET", flate=True)
    d = pure.analyze_document(pdf)
    assert d["extract"] == pure.extract_pdf_text(pdf)
    assert d["sniff"]["content_type"] == "pdf"
    assert d["meta"].get("pdf:version") == "1.4"


# ---- Spark end-to-end ----

def test_pdf_extract_spark_roundtrip(spark):
    """Synthesized PDFs through the fused Arrow UDF: extracted text must
    byte-identically equal the single-threaded pure-Python oracle."""
    from fa_spark.queries import _synth_pdfs, q_pdf_extract

    sf = "/root/testdata/sf0.001"
    got = {
        r["doc_id"]: (r["ext_text"], r["status"], r["title"])
        for r in q_pdf_extract(spark, sf).collect()
    }
    raw = {r["doc_id"]: bytes(r["html"]) for r in _synth_pdfs(spark, sf).collect()}
    assert len(got) == len(raw) > 0
    for doc_id, blob in raw.items():
        exp = pure.extract_pdf_text(blob)
        assert got[doc_id] == (exp.text, exp.status, exp.title), doc_id


def test_pdf_participates_in_pipeline(spark):
    """PDF pages flow through analyze_pages like HTML: dedup keys, lang,
    tokens all populate from the extracted layout text."""
    from fa_spark.pipeline import JobConfig, analyze_pages
    from fa_spark.queries import _synth_pdfs

    pdfs = _synth_pdfs(spark, "/root/testdata/sf0.001").limit(20).select(
        F.concat(F.lit("https://pdf.example/"), F.col("doc_id").cast("string")).alias("url"),
        F.to_timestamp(F.lit("2025-01-01 00:00:00")).alias("warc_ts"),
        "html",
        F.lit("").alias("text"),
        F.lit("en").alias("lang"),
    )
    out = analyze_pages(pdfs, JobConfig(run_id="pdf-test")).collect()
    assert len(out) == 20
    for r in out:
        assert r["extract"]["doc_type"] == "pdf"
        assert r["extract"]["status"] == "success"
        assert r["n_tokens_ws"] > 0
        assert r["sha"] is not None
