"""Bucketed sink tests: partition layout, pruning on read, stable bucket ids."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from fa_spark.pipeline import JobConfig, analyze_pages, bucket_col, write_analysis


def test_bucketed_write_and_pruning(spark, pages_df, tmp_path):
    out = str(tmp_path / "analysis")
    df = analyze_pages(
        pages_df.select("url", "warc_ts", "html", "text", "lang").limit(200),
        JobConfig(run_id="sink-test", buckets=16),
    )
    write_analysis(df, out)

    # physical layout: one directory per bucket value
    buckets = sorted(
        int(d.split("=")[1]) for d in os.listdir(out) if d.startswith("bucket=")
    )
    assert buckets and all(0 <= b < 16 for b in buckets)

    # partition pruning: a bucket-filtered read must only touch that directory
    back = spark.read.parquet(out).where(F.col("bucket") == buckets[0])
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(bucket" in plan or "bucket#" in plan
    files = back.select(F.input_file_name()).distinct().collect()
    assert all(f"bucket={buckets[0]}/" in r[0] for r in files)


def test_bucket_assignment_stable(spark, pages_df):
    """bucket = pmod(xxhash64(url), B) must be identical across runs and
    partitionings (it is the lineage key)."""
    pages = pages_df.select("url").limit(100)
    a = {r["url"]: r["b"] for r in pages.select("url", bucket_col("url", 64).alias("b")).collect()}
    b = {
        r["url"]: r["b"]
        for r in pages.repartition(7)
        .select("url", bucket_col("url", 64).alias("b"))
        .collect()
    }
    assert a == b
