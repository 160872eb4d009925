"""Sources (SURVEY.md §2.1 S1-S4).

The reference walks directories with os.walk + fnmatch include/exclude +
extension filters + caps (/root/reference/src/core/analyzer.py:126-162).
Spark-native equivalents:

  S1  read_pages          — the pages table (parquet locally, Iceberg in prod)
  S1' read_loose_files    — binaryFile source over a directory tree
  S2  glob_filter         — fnmatch globs translated ONCE on the driver to a
                            regex pushed into the scan via rlike
  S3  extension_filter    — lowercase suffix ∈ set
  S4  capped              — deterministic orderBy(key).limit(n); the
                            reference caps in os.walk order, which is
                            host-dependent — a documented divergence
                            (SURVEY.md §2.1 S4)
"""

from __future__ import annotations

import fnmatch

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_pages(spark: SparkSession, path: str) -> DataFrame:
    """The primary source. With an Iceberg catalog configured this is
    `spark.read.format("iceberg").load(path)`; parquet locally."""
    return spark.read.parquet(path)


def read_loose_files(
    spark: SparkSession, root: str, glob: str | None = None
) -> DataFrame:
    """Directory tree -> pages-shaped rows via the binaryFile source
    (path, modificationTime, length, content)."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    df = reader.option("recursiveFileLookup", "true").load(root)
    return df.select(
        F.col("path").alias("url"),
        F.col("modificationTime").alias("warc_ts"),
        F.col("content").alias("html"),
        F.lit("").alias("text"),
        F.lit("und").alias("lang"),
    )


def read_warc(spark: SparkSession, root: str, glob: str | None = None) -> DataFrame:
    """WARC files (the NATIVE Common-Crawl container, plain or per-record
    gzip members) -> pages-shaped rows. binaryFile brings each .warc[.gz]
    to one task; pure.warc_iter (total, bounded) splits records inside a
    mapInPandas stage — record parsing parallelizes per FILE, the unit CC
    already shards at (~1 GB each), so a crawl dump's natural layout is
    the partitioning. Content-bearing records become rows:
    response/resource payloads land in ``html`` (HTTP framing stripped),
    WET ``conversion`` records — already-extracted text — land in ``text``
    with NULL ``html`` so they skip the HTML extraction path (round-3
    ADVICE: WET text was being re-run through the DOM extractor)."""
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql import types as T

    from fa_spark import pure

    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    files = reader.option("recursiveFileLookup", "true").load(root).select(
        "path", "content"
    )
    schema = T.StructType(
        [
            T.StructField("url", T.StringType()),
            T.StructField("warc_ts", T.TimestampType()),
            T.StructField("html", T.BinaryType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
        ]
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import datetime as dt

        for pdf in batches:
            rows = []
            for _path, content in zip(pdf["path"], pdf["content"]):
                for rec in pure.warc_iter(bytes(content)):
                    try:
                        ts = dt.datetime.fromisoformat(
                            rec["ts"].replace("Z", "+00:00")
                        ).replace(tzinfo=None)
                    except ValueError:
                        ts = None
                    if rec["type"] == "conversion":
                        rows.append(
                            {
                                "url": rec["url"],
                                "warc_ts": ts,
                                "html": None,
                                "text": rec["payload"].decode("utf-8", "replace"),
                                "lang": "und",
                            }
                        )
                    else:
                        rows.append(
                            {
                                "url": rec["url"],
                                "warc_ts": ts,
                                "html": rec["payload"],
                                "text": "",
                                "lang": "und",
                            }
                        )
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    return files.mapInPandas(fn, schema)


def globs_to_regex(patterns: list[str]) -> str:
    """fnmatch globs -> one alternation regex (driver-side, once)."""
    return "|".join(f"(?:{fnmatch.translate(p)})" for p in patterns)


def glob_filter(
    df: DataFrame,
    include: list[str] | None = None,
    exclude: list[str] | None = None,
    col: str = "url",
) -> DataFrame:
    """include = must match >=1, exclude = must match none (reference
    `_should_process_file` semantics, analyzer.py:126-138)."""
    if include:
        df = df.filter(F.col(col).rlike(globs_to_regex(include)))
    if exclude:
        df = df.filter(~F.col(col).rlike(globs_to_regex(exclude)))
    return df


def extension_filter(
    df: DataFrame, extensions: set[str], col: str = "url"
) -> DataFrame:
    """lowercase suffix ∈ set (reference analyzer.py:380-383)."""
    ext = F.lower(F.element_at(F.split(F.col(col), r"\."), -1))
    return df.filter(ext.isin(*sorted(extensions)))


def capped(df: DataFrame, n: int, order_col: str = "url") -> DataFrame:
    """Deterministic cap: orderBy + limit (reproducible across clusters,
    unlike the reference's os.walk-order truncation)."""
    return df.orderBy(order_col).limit(n)
