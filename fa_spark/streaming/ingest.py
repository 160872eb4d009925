"""Streaming ingest: watch a pages directory, run the fused analysis stage
incrementally, append results + windowed counters.

The reference is strictly batch (SURVEY.md §2.8 — no watermarks/state
anywhere in /root/reference); this mode exists for continuously-landing
crawl data. Semantics:

  - source: parquet file stream over the input dir (production: an Iceberg
    table with streaming read / a Kafka WARC feed)
  - per-file analysis: the SAME fused Arrow stage as batch — byte-identical
    output per url by construction
  - sink 1: append analysis rows (exactly-once via the streaming checkpoint)
  - sink 2: per-window ingest counters with a watermark for late warc_ts
    (the streaming analogue of the batch `_lineage` counters)

`trigger(availableNow=True)` drains everything currently in the source then
stops — used by tests and backfills; drop it for a live run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fa_spark import schema as S
from fa_spark.stages.analyze import with_analysis


def read_pages_stream(
    spark: SparkSession, input_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    reader = spark.readStream.schema(S.PAGES)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.parquet(input_dir)


def analysis_stream(pages_stream: DataFrame) -> DataFrame:
    """Fused analysis over the stream. No dedup window here — global dedup
    needs unbounded state; streaming rows carry `sha` so a periodic batch
    dedup job (or the lineage anti-join) reconciles duplicates."""
    return with_analysis(pages_stream)


def ingest_counters(
    pages_stream: DataFrame, window: str = "1 hour", late: str = "2 hours"
) -> DataFrame:
    """Windowed ingest counters with late-data tolerance on warc_ts."""
    return (
        pages_stream.withWatermark("warc_ts", late)
        .groupBy(F.window("warc_ts", window).alias("w"), "lang")
        .agg(
            F.count("*").alias("pages"),
            F.sum(F.length("html")).alias("bytes"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "lang",
            "pages",
            "bytes",
        )
    )


def run_ingest(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Start (and with available_now=True, drain) the ingest pipeline.
    Returns the two StreamingQuery handles."""
    pages = read_pages_stream(spark, input_dir)
    analysis = analysis_stream(pages)

    w1 = (
        analysis.writeStream.format("parquet")
        .option("path", f"{output_dir}/analysis")
        .option("checkpointLocation", f"{checkpoint_dir}/analysis")
        .outputMode("append")
    )
    w2 = (
        ingest_counters(pages)
        .writeStream.format("parquet")
        .option("path", f"{output_dir}/counters")
        .option("checkpointLocation", f"{checkpoint_dir}/counters")
        .outputMode("append")
    )
    if available_now:
        w1 = w1.trigger(availableNow=True)
        w2 = w2.trigger(availableNow=True)
    q1 = w1.start()
    q2 = w2.start()
    return q1, q2
