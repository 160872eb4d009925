"""Per-partition lineage + resumable runs (reference J2 + artifact manifest,
/root/reference/src/core/artifact_guard.py:80-186 re-expressed as tables).

Two small tables live next to the output:
  _lineage/processed/   (url, sha, run_id)           — the processed set
  _lineage/partitions/  (run_id, bucket, input_rows, output_rows, bytes,
                         attempt, committed_at)       — per-bucket counters

Restart = left-anti join of incoming pages against processed on (url, sha):
already-done rows are skipped, changed rows (same url, new sha) recompute.
This is idempotent per bucket — the exactly-once story Iceberg snapshots give
in production, reproduced over plain parquet for local runs (SURVEY.md §4.2
item 5: Spark's own df.checkpoint() is NOT durable across applications).

Scale note: at 10^12 docs the processed set is itself huge; the anti-join is
a shuffle on url. Both sides are bucketed by xxhash64(url) so a
storage-partitioned join can avoid the shuffle entirely when the sink is
Iceberg with matching bucket specs.
"""

from __future__ import annotations

import datetime as dt
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fa_spark import schema as S


def _processed_path(base: str) -> str:
    return os.path.join(base, "_lineage", "processed")


def _partitions_path(base: str) -> str:
    return os.path.join(base, "_lineage", "partitions")


def read_processed(spark: SparkSession, base: str) -> DataFrame:
    p = _processed_path(base)
    try:
        return spark.read.schema(S.PROCESSED).parquet(p)
    except Exception:
        return spark.createDataFrame([], S.PROCESSED)


def filter_unprocessed(pages: DataFrame, processed: DataFrame) -> DataFrame:
    """Anti-join restart primitive: only new or changed (url, sha) pass."""
    keyed = pages.withColumn("sha", F.sha2("html", 256))
    return keyed.join(processed.select("url", "sha"), ["url", "sha"], "left_anti")


def commit_lineage(
    analysis: DataFrame,
    base: str,
    run_id: str,
    committed_at: dt.datetime,
    attempt: int = 1,
) -> None:
    """Append processed-set rows and per-bucket counters for a finished run.

    ``committed_at`` is a job parameter, never wall clock read inside the job
    (determinism discipline, SURVEY.md §7.3 item 2).
    """
    spark = analysis.sparkSession
    analysis.select("url", "sha", F.lit(run_id).alias("run_id")).write.mode(
        "append"
    ).parquet(_processed_path(base))
    counters = (
        analysis.groupBy("bucket")
        .agg(
            F.count("*").alias("input_rows"),
            F.sum(
                (F.col("extract.status") != "error").cast("long")
            ).alias("output_rows"),
            F.sum("html_bytes").alias("bytes"),
        )
        .select(
            F.lit(run_id).alias("run_id"),
            F.col("bucket").cast("int"),
            "input_rows",
            "output_rows",
            "bytes",
            F.lit(attempt).cast("int").alias("attempt"),
            F.lit(committed_at).alias("committed_at"),
        )
    )
    counters.write.mode("append").parquet(_partitions_path(base))


def read_lineage(spark: SparkSession, base: str) -> DataFrame:
    return spark.read.parquet(_partitions_path(base))


def run_resumable(
    spark: SparkSession,
    pages: DataFrame,
    base: str,
    run_id: str,
    committed_at: dt.datetime,
    cfg=None,
) -> DataFrame:
    """One resumable increment: filter -> analyze -> write -> commit lineage.

    Returns the analysis DataFrame of the increment (already persisted).
    Calling it twice with the same input is a no-op the second time.
    """
    from fa_spark.pipeline import JobConfig, analyze_pages, write_analysis

    cfg = cfg or JobConfig(run_id=run_id)
    processed = read_processed(spark, base)
    todo = filter_unprocessed(pages, processed).drop("sha")
    analysis = analyze_pages(todo, cfg)
    analysis = analysis.persist()
    n = analysis.count()
    if n:
        write_analysis(analysis, os.path.join(base, "analysis"))
        commit_lineage(analysis, base, run_id, committed_at)
    analysis.unpersist()
    return analysis
