"""Operator CLI (fa_spark/cli.py) — the reference's analyze-command UX
(include/exclude globs, language/quality thresholds, output paths,
/root/reference/src/cli/analyze/main.py:124-231) mapped to job parameters.

main() reuses the active test session (SparkSession.getActiveSession), so
these run in-process; the spark-submit packaging path is test_submit.py.
"""

from __future__ import annotations

import json
import os

import pytest

from fa_spark import cli

SF0001 = "/root/testdata/sf0.001"


def _run(capsys, argv) -> dict:
    cli.main(argv)
    return json.loads(capsys.readouterr().out.strip().splitlines()[-1])


def test_cli_analyze_and_expire(spark, pages_path, tmp_path, capsys):
    out = str(tmp_path / "analysis")
    payload = _run(capsys, [
        "analyze", "--input", pages_path, "--output", out,
        "--run-id", "r1", "--committed-at", "2025-06-01T00:00:00+00:00",
        "--limit", "100",
    ])
    assert payload["analyses"] == 100
    # idempotent re-run: nothing left to do
    payload2 = _run(capsys, [
        "analyze", "--input", pages_path, "--output", out,
        "--run-id", "r2", "--committed-at", "2025-06-02T00:00:00+00:00",
        "--limit", "100",
    ])
    assert payload2["analyses"] == 0
    # retention via the CLI
    payload3 = _run(capsys, ["expire", "--output", out, "--keep-last-n", "0"])
    assert payload3["expired"] == ["r1"]


def test_cli_corpus_with_filters(spark, pages_path, tmp_path, capsys):
    out = str(tmp_path / "corpus")
    report = str(tmp_path / "report.json")
    payload = _run(capsys, [
        "corpus", "--input", pages_path, "--output", out,
        "--langs", "en,und", "--min-words", "10",
        "--exclude", "*host1.example*",
        "--report-json", report,
    ])
    assert payload["n_input"] > 0
    assert payload["n_corpus"] <= payload["n_quality"] <= payload["n_input"]
    assert os.path.isdir(out)
    with open(report) as f:
        assert json.load(f)["n_input"] == payload["n_input"]
    # the exclude glob really filtered
    corpus = spark.read.parquet(out)
    assert corpus.where("url LIKE '%host1.example%'").count() == 0
    assert {"url", "text", "lang", "n_tokens_ws", "sha"} <= set(corpus.columns)


def test_cli_include_glob_limits_input(spark, pages_path, tmp_path, capsys):
    payload = _run(capsys, [
        "analyze", "--input", pages_path, "--output", str(tmp_path / "a"),
        "--run-id", "r1", "--committed-at", "2025-06-01T00:00:00+00:00",
        "--include", "*host1.example*",
    ])
    full = _run(capsys, [
        "analyze", "--input", pages_path, "--output", str(tmp_path / "b"),
        "--run-id", "r1", "--committed-at", "2025-06-01T00:00:00+00:00",
    ])
    assert 0 < payload["analyses"] < full["analyses"]


def test_cli_binaryfile_input(spark, tmp_path, capsys):
    """Directory-of-loose-files mode (reference `fa analyze all <dir>`):
    binaryFile source walks the tree; mixed HTML + PDF both analyze."""
    d = tmp_path / "docs"
    d.mkdir()
    (d / "a.html").write_bytes(
        b"<html><body><main><p>"
        + b"loose file analysis works for html pages just fine " * 3
        + b"</p></main></body></html>"
    )
    content = b"BT (loose pdf file text) Tj ET"
    (d / "b.pdf").write_bytes(
        b"%PDF-1.4\n4 0 obj << /Length " + str(len(content)).encode()
        + b" >>\nstream\n" + content + b"\nendstream\nendobj\n%%EOF\n"
    )
    (d / "skip.txt").write_bytes(b"excluded by glob")
    out = str(tmp_path / "out")
    payload = _run(capsys, [
        "analyze", "--input", str(d), "--input-format", "binaryFile",
        "--path-glob", "*.{html,pdf}",
        "--output", out, "--run-id", "loose",
        "--committed-at", "2025-06-01T00:00:00+00:00",
    ])
    assert payload["analyses"] == 2 and payload["successful"] == 2


def test_cli_query(capsys, spark):
    payload = _run(capsys, [
        "query", "--name", "pricing_summary", "--sf-dir", SF0001, "--limit", "3",
    ])
    assert payload["query"] == "pricing_summary"
    assert 0 < payload["n_shown"] <= 3
    assert "l_returnflag" in payload["rows"][0]


def test_cli_unknown_query_lists_available(spark):
    with pytest.raises(SystemExit) as e:
        cli.main(["query", "--name", "nope", "--sf-dir", SF0001])
    assert "pricing_summary" in str(e.value)


def test_cli_env_layer(spark, pages_path, tmp_path, capsys, monkeypatch):
    """env default (FA_SPARK_MIN_WORDS) loses to an explicit flag but beats
    the built-in default — the reference's config>env>default layering."""
    monkeypatch.setenv("FA_SPARK_MIN_WORDS", "10000")  # absurd: filters all
    p1 = _run(capsys, [
        "corpus", "--input", pages_path, "--output", str(tmp_path / "c1"),
        "--langs", "en,und",
    ])
    assert p1["n_quality"] == 0
    p2 = _run(capsys, [
        "corpus", "--input", pages_path, "--output", str(tmp_path / "c2"),
        "--langs", "en,und", "--min-words", "10",
    ])
    assert p2["n_quality"] > 0


def test_cli_corpus_gates(spark, pages_path, tmp_path, capsys):
    """Round 3: the repetition + decontamination gates reach the CLI
    surface; forced-low thresholds make the counters bite."""
    # eval table: prefix of one real page's extracted text
    base_out = str(tmp_path / "base")
    base = _run(capsys, [
        "corpus", "--input", pages_path, "--output", base_out,
        "--langs", "en,und", "--min-words", "10",
    ])
    row = spark.read.parquet(base_out).orderBy("url").limit(1).collect()[0]
    prefix = " ".join(row["text"].split()[:12])
    eval_path = str(tmp_path / "eval.parquet")
    spark.createDataFrame([(1, prefix)], "eval_id long, text string").write.parquet(
        eval_path
    )
    payload = _run(capsys, [
        "corpus", "--input", pages_path, "--output", str(tmp_path / "gated"),
        "--langs", "en,und", "--min-words", "10",
        "--max-top2gram-frac", "0.001", "--max-dup10gram-frac", "0.001",
        "--eval-parquet", eval_path,
    ])
    assert payload["n_contaminated"] >= 1
    assert payload["n_repetitious"] >= 1
    assert payload["n_corpus"] <= base["n_corpus"]
    gated = spark.read.parquet(str(tmp_path / "gated"))
    assert gated.where(gated.url == row["url"]).count() == 0
