"""Streaming ingest tests: availableNow drain, exactly-once restart,
byte-identity with the batch stage."""

from __future__ import annotations

import os
import shutil

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from fa_spark import pure
from fa_spark.streaming.ingest import run_ingest


def _drain(queries):
    for q in queries:
        q.awaitTermination(180)


def test_streaming_ingest_and_restart(spark, pages_path, tmp_path):
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ck_dir = str(tmp_path / "ck")
    os.makedirs(in_dir)
    shutil.copy(pages_path, os.path.join(in_dir, "part-000.parquet"))

    _drain(run_ingest(spark, in_dir, out_dir, ck_dir))

    analysis = spark.read.parquet(f"{out_dir}/analysis")
    n = pq.ParquetFile(pages_path).metadata.num_rows
    assert analysis.count() == n

    # byte-identity vs pure oracle on a sample
    src = {r["url"]: r["html"] for r in pq.read_table(pages_path).to_pylist()}
    for r in analysis.select("url", F.col("extract.text").alias("t")).limit(50).collect():
        assert r["t"] == pure.extract_main_text(src[r["url"]]).text

    # restart with no new files: exactly-once, nothing reprocessed
    _drain(run_ingest(spark, in_dir, out_dir, ck_dir))
    assert spark.read.parquet(f"{out_dir}/analysis").count() == n

    # land a second file with far-future warc_ts: only the delta is
    # processed, and its watermark advance closes the first file's windows
    # (append-mode windowed aggs emit only once the watermark passes them)
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pqw

    sub = pq.read_table(pages_path).slice(0, 50)
    future_ts = pc.add(sub["warc_ts"], pa.scalar(365 * 24 * 3600 * 1_000_000, pa.duration("us")))
    sub = sub.set_column(sub.schema.get_field_index("warc_ts"), "warc_ts", future_ts)
    pqw.write_table(sub, os.path.join(in_dir, "part-001.parquet"))
    _drain(run_ingest(spark, in_dir, out_dir, ck_dir))
    assert spark.read.parquet(f"{out_dir}/analysis").count() == n + 50

    # first file's windows are now closed and emitted
    counters = spark.read.parquet(f"{out_dir}/counters")
    assert counters.agg(F.sum("pages")).collect()[0][0] == n
