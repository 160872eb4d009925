"""applyInPandasWithState streaming dedup: first-seen per host, state
persists across micro-batches and restarts (checkpointed state store)."""

from __future__ import annotations

import os
import shutil

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from fa_spark import schema as S
from fa_spark.streaming.dedup_state import streaming_first_seen


def _run(spark, in_dir, out_dir, ck_dir):
    stream = spark.readStream.schema(S.PAGES).parquet(in_dir)
    q = (
        streaming_first_seen(stream)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ck_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)


def test_streaming_first_seen_dedup(spark, pages_path, tmp_path):
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ck_dir = str(tmp_path / "ck")
    os.makedirs(in_dir)
    shutil.copy(pages_path, os.path.join(in_dir, "f0.parquet"))

    _run(spark, in_dir, out_dir, ck_dir)
    out = spark.read.parquet(out_dir)
    n = pq.ParquetFile(pages_path).metadata.num_rows
    assert out.count() == n

    # within one batch: exactly one first_seen per (host, sha)
    firsts = out.where("first_seen")
    assert (
        firsts.groupBy("host", "sha").count().where("count > 1").count() == 0
    )
    # the fixture contains exact duplicates -> some rows are suppressed
    assert firsts.count() < n

    # second delivery of the SAME pages under new urls: state says all dups
    tbl = pq.read_table(pages_path)
    import pyarrow as pa
    import pyarrow.compute as pc

    # same host prefix, new url: append a query suffix
    urls2 = pc.binary_join_element_wise(
        tbl["url"].combine_chunks().cast(pa.string()),
        pa.array(["?v=2"] * len(tbl)),
        "",
    )
    tbl2 = tbl.set_column(tbl.schema.get_field_index("url"), "url", urls2)
    pq.write_table(tbl2, os.path.join(in_dir, "f1.parquet"))

    _run(spark, in_dir, out_dir, ck_dir)
    out2 = spark.read.parquet(out_dir)
    assert out2.count() == 2 * n
    second_wave = out2.where(F.col("url").endswith("?v=2"))
    assert second_wave.count() == n
    # every second-wave sha was already in state -> zero first_seen
    assert second_wave.where("first_seen").count() == 0
