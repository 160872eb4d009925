"""Post-hoc schema validation (reference `fa validate schema`,
/root/reference/src/cli/validate/main.py:43-185): a foreign analysis
parquet is checked against schema.ANALYSIS, per-row violation structs
out, file verdict aggregated — all Catalyst, no UDF, no shuffle."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from fa_spark import cli


@pytest.fixture(scope="module")
def analysis_df(spark, pages_df):
    from fa_spark.pipeline import JobConfig, analyze_pages

    return analyze_pages(
        pages_df.limit(60), JobConfig(run_id="val-test")
    ).persist()


def test_valid_analysis_has_no_errors(spark, analysis_df, tmp_path):
    from fa_spark.stages.validate import validate_analysis, validation_summary

    path = str(tmp_path / "analysis")
    analysis_df.write.mode("overwrite").parquet(path)
    report = validate_analysis(spark.read.parquet(path))
    agg = validation_summary(report).collect()[0]
    assert agg["rows"] == 60
    assert agg["n_errors"] == 0
    assert bool(agg["success"])
    # validating a parquet table must be one scan: no exchange, no python
    plan = report._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Python" not in plan


def test_corrupted_fixture_reports_each_rule(spark, analysis_df, tmp_path):
    from fa_spark.stages.validate import validate_analysis

    urls = [r["url"] for r in analysis_df.select("url").limit(10).collect()]
    u_null, u_enum = urls[0], urls[1]
    bad = (
        analysis_df.where(F.col("url").isin(urls))
        # rule: required field null (row-level)
        .withColumn(
            "sha", F.when(F.col("url") == u_null, None).otherwise(F.col("sha"))
        )
        # rule: enum violation
        .withColumn(
            "extract",
            F.when(
                F.col("url") == u_enum,
                F.col("extract").withField("status", F.lit("bogus")),
            ).otherwise(F.col("extract")),
        )
        # rule: unexpected column (structural warning)
        .withColumn("mystery", F.lit(1))
        # rule: missing required column (structural error)
        .drop("minhash")
    )
    report = validate_analysis(bad)
    rows = {r["url"]: r for r in report.collect()}
    assert len(rows) == 10
    assert all(not r["valid"] for r in rows.values())  # missing col hits all
    paths = {
        v["path"]
        for r in rows.values()
        for v in r["violations"]
    }
    assert {"minhash", "mystery"} <= paths
    assert any(
        v["path"] == "sha" and v["kind"] == "error"
        for v in rows[u_null]["violations"]
    )
    assert any(
        v["path"] == "extract.status" and "not one of" in v["message"]
        for v in rows[u_enum]["violations"]
    )


def test_type_mismatch_is_structural_error(spark, analysis_df):
    from fa_spark.stages.validate import validate_analysis

    bad = analysis_df.limit(5).withColumn("sha", F.lit(7))
    report = validate_analysis(bad)
    first = report.collect()[0]
    assert any(
        v["path"] == "sha" and "expected string" in v["message"]
        for v in first["violations"]
    )
    assert not first["valid"]


def test_strict_mode_fails_on_warnings(spark, analysis_df):
    from fa_spark.stages.validate import validate_analysis

    # clean rows plus a guaranteed warning: empty tags
    df = analysis_df.limit(5).withColumn("tags", F.array().cast("array<string>"))
    lax = validate_analysis(df, strict=False).collect()
    strict = validate_analysis(df, strict=True).collect()
    assert all(r["valid"] for r in lax)
    assert all(not r["valid"] for r in strict)
    assert all(r["n_warnings"] >= 1 for r in strict)


def test_cli_validate_roundtrip(spark, analysis_df, tmp_path, capsys):
    path = str(tmp_path / "foreign_analysis")
    analysis_df.limit(20).write.mode("overwrite").parquet(path)
    vout = str(tmp_path / "violations")
    cli.main(["validate", "--input", path, "--violations-out", vout])
    payload = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert payload["rows"] == 20
    assert payload["n_errors"] == 0
    assert payload["success"] is True
    back = spark.read.parquet(vout)
    assert back.count() == 20
    assert {"url", "violations", "n_errors", "n_warnings", "valid"} <= set(
        back.columns
    )


def test_summary_empty_report_is_zero_success(spark, analysis_df):
    """Round-5 ADVICE: SUM over zero rows is NULL — an empty parquet must
    verdict rows=0/invalid_rows=0/success=true, not success=null."""
    from fa_spark.stages.validate import validate_analysis, validation_summary

    empty = validate_analysis(analysis_df.limit(0))
    row = validation_summary(empty).collect()[0]
    assert row["rows"] == 0
    assert row["invalid_rows"] == 0
    assert row["n_errors"] == 0 and row["n_warnings"] == 0
    assert row["success"] is True
