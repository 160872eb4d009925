"""Spark pipeline tests over the deterministic fixture pages table:
byte-identical extraction vs the single-threaded pure oracle (the
north_rule invariant), dedup election, near-dup recovery, tags, summary."""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from fa_spark import pure
from fa_spark.pipeline import JobConfig, analyze_pages, summary
from fa_spark.stages.dedup import minhash_band_pairs, simhash_near_dups


@pytest.fixture(scope="module")
def analysis(spark, pages_df):
    df = analyze_pages(
        pages_df.select("url", "warc_ts", "html", "text", "lang"),
        JobConfig(run_id="test-run"),
    ).persist()
    yield df
    df.unpersist()


@pytest.fixture(scope="module")
def source_rows(pages_path):
    return {r["url"]: r for r in pq.read_table(pages_path).to_pylist()}


def test_byte_identical_extraction(analysis, source_rows):
    """THE invariant: spark_extracted_text == oracle_extracted_text per url."""
    rows = analysis.select("url", F.col("extract.text").alias("t")).collect()
    assert len(rows) == len(source_rows)
    for r in rows:
        oracle = pure.extract_main_text(source_rows[r["url"]]["html"])
        assert r["t"] == oracle.text, f"byte mismatch at {r['url']}"


def test_ground_truth_recovery(analysis, source_rows):
    """For generator cases with embedded ground truth, extraction recovers it
    exactly (not just oracle-consistent)."""
    gt_cases = {"article", "boiler_heavy", "spam", "exact_dup", "near_dup", "embedded_img"}
    rows = analysis.select("url", F.col("extract.text").alias("t")).collect()
    checked = 0
    for r in rows:
        src = source_rows[r["url"]]
        if src["gt_case"] in gt_cases:
            assert r["t"] == src["gt_text"], f"gt mismatch at {r['url']}"
            checked += 1
    assert checked > 400


def test_exact_dedup_groups(analysis, source_rows):
    """Every exact_dup row must be non-canonical or share sha with its source."""
    shas = analysis.select("url", "sha", "is_canonical", "dup_of").collect()
    by_sha = {}
    for r in shas:
        by_sha.setdefault(r["sha"], []).append(r)
    n_dup_groups = sum(1 for g in by_sha.values() if len(g) > 1)
    assert n_dup_groups > 0
    for group in by_sha.values():
        canon = [r for r in group if r["is_canonical"]]
        assert len(canon) == 1, "exactly one canonical per sha group"
        first_url = min(r["url"] for r in group)
        assert canon[0]["url"] == first_url, "canonical = first by url"
        for r in group:
            if not r["is_canonical"]:
                assert r["dup_of"] == first_url


def test_minhash_near_dups_on_pages(analysis, source_rows):
    near_urls = {
        u for u, r in source_rows.items() if r["gt_case"] in ("near_dup", "exact_dup")
    }
    if not near_urls:
        pytest.skip("no near-dup fixtures generated at this size")
    pairs = minhash_band_pairs(
        analysis.where(F.col("extract.text") != ""), id_col="url", min_jaccard=0.6
    ).collect()
    paired = {p["id_a"] for p in pairs} | {p["id_b"] for p in pairs}
    assert near_urls & paired, "planted near-dups not found by MinHash"


def test_simhash_near_dups_on_pages(analysis, source_rows):
    pairs = simhash_near_dups(
        analysis.where(F.col("extract.text") != ""), id_col="url"
    ).collect()
    assert pairs, "simhash found no near-dup pairs on fixture set"


def test_sniff_distribution(analysis, source_rows):
    got = dict(
        analysis.groupBy(F.col("sniff.content_type").alias("ct")).count().collect()
    )
    # non_html + real-pdf cases must be detected by magic bytes, not as html
    n_magic_cases = sum(
        1 for r in source_rows.values() if r["gt_case"] in ("non_html", "pdf")
    )
    n_magic = sum(v for k, v in got.items() if k in ("pdf", "png", "gif", "zip", "gzip"))
    assert n_magic == n_magic_cases
    # the real-pdf share must actually extract (north_rule "PDF/layout parse")
    pdf_ok = analysis.where(
        (F.col("sniff.content_type") == "pdf")
        & (F.col("extract.status") == "success")
    ).count()
    n_pdf = sum(1 for r in source_rows.values() if r["gt_case"] == "pdf")
    assert pdf_ok == n_pdf > 0


def test_tags_and_slug(analysis):
    rows = analysis.select("url", "tags", "slug").collect()
    assert all(r["slug"] for r in rows)
    tagged = [r for r in rows if r["tags"]]
    assert len(tagged) > 0
    for r in tagged[:50]:
        assert len(r["tags"]) <= 10
        assert all(len(t) > 2 for t in r["tags"])


def test_tags_match_pure_oracle(analysis, source_rows):
    """Native-expr tag ranking == pure.keywords on the same extracted text."""
    rows = analysis.select("url", F.col("extract.text").alias("t"), "tags").collect()
    for r in rows[:100]:
        assert list(r["tags"]) == pure.keywords(r["t"]), f"tag mismatch at {r['url']}"


def test_detected_lang_matches_pure(analysis):
    rows = analysis.select(F.col("extract.text").alias("t"), "detected_lang").collect()
    for r in rows[:200]:
        assert r["detected_lang"] == pure.detect_lang(r["t"])


def test_summary_counts(analysis):
    s = summary(analysis).collect()[0]
    assert s["analyses"] == analysis.count()
    assert s["successful"] > 0
    assert s["duplicates"] > 0


def test_quality_struct_matches_pure(analysis, source_rows):
    rows = analysis.select("url", F.col("extract.text").alias("t"), "quality").collect()
    for r in rows[:50]:
        q = pure.quality_score(r["t"])
        got = r["quality"].asDict()
        assert got["n_chars"] == q["n_chars"]
        assert got["n_words"] == q["n_words"]
        assert abs(got["alpha_ratio"] - q["alpha_ratio"]) < 1e-9


def test_pipeline_total_over_hostile_pages(spark):
    """The full fused pipeline must NEVER raise on adversarial page bytes —
    only classify and set status (the verify-contract invariant). Media
    blobs (valid and truncated), codec bombs, escape soups, and binary
    noise all flow through as pages."""
    import random

    from fa_spark import pure
    from fa_spark.pipeline import JobConfig, analyze_pages
    from pyspark.sql import functions as F

    rng = random.Random(17)
    png = pure.png_encode([[(1, 2, 3)] * 8 for _ in range(8)])
    jpg = pure.jpeg_encode([[9] * 8 for _ in range(8)], gray=True)
    gif = pure.gif_encode([[(4, 5, 6)] * 4 for _ in range(4)])
    hostile = [
        b"",
        b"\x00" * 256,
        bytes(rng.randrange(256) for _ in range(4096)),
        png, jpg, gif, png[:20], jpg[:10], gif[:9],
        b"%PDF-1.4\n" + bytes(rng.randrange(256) for _ in range(512)),
        b"<html>" + b"&amp;" * 5000,
        b"<div>" * 2000,
        b"<script>" + b"x" * 1000,  # unterminated rawtext
        b"\xff\xfe" + "utf16 text".encode("utf-16-le"),
        ("word " * 5000).encode(),
        b"<!--" + b"-" * 500,
        b"a<b<c<d" * 300,
    ]
    rows = [
        (f"https://h/{i}", b) for i, b in enumerate(hostile)
    ]
    pages = spark.createDataFrame(rows, "url string, html binary").select(
        "url",
        F.to_timestamp(F.lit("2025-01-01")).alias("warc_ts"),
        "html",
        F.lit("").alias("text"),
        F.lit("en").alias("lang"),
    )
    out = analyze_pages(pages, JobConfig(run_id="hostile")).collect()
    assert len(out) == len(hostile)
    statuses = {r["extract"]["status"] for r in out}
    assert statuses <= {"success", "success_lenient", "empty", "skipped"}
    # media pages classify by magic, not as documents
    by_url = {r["url"]: r for r in out}
    assert by_url["https://h/3"]["sniff"]["content_type"] == "png"
    assert by_url["https://h/4"]["sniff"]["content_type"] == "jpeg"
    assert by_url["https://h/5"]["sniff"]["content_type"] == "gif"
