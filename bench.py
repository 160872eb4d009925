#!/usr/bin/env python3
"""Benchmark harness (driver contract + north-metric evidence).

Default mode: run the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "docs_per_sec": ..., ...}

--scaling mode: run the flagship extraction job at local[8] AND local[32]
on identical input and report throughput at both plus scaling efficiency
(the sandbox evidence for the north_rule's N vs 4N executor criterion),
appending results to BENCH/BASELINE.md.

Statistics use the reference's benchmark shape (mean/median/min/max,
/root/reference/src/cli/benchmark/main.py:304-332) when --repeat > 1.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _session(cores: int, shuffle_partitions: int | None = None):
    from fa_spark.pipeline import default_session

    sp = shuffle_partitions or max(cores * 2, 16)
    s = default_session(app=f"fa-spark-bench-{cores}", cores=cores,
                       shuffle_partitions=sp)
    s.sparkContext.setLogLevel("ERROR")
    return s


def _force(df) -> int:
    """Fully evaluate a DataFrame (noop sink — no column pruning shortcuts)."""
    df.write.format("noop").mode("overwrite").save()
    return 0


def _extraction_job(spark, sf_dir: str, multiplier: int = 1):
    """Flagship: synthesize CC-style pages from `documents`, run the fused
    analysis + dedup + tags pipeline (the north-metric workload).

    ``multiplier`` replicates each document into distinct variants (suffix
    varies, so sha/url differ) to make the job compute-bound for the
    core-scaling measurement — fixed job overhead would otherwise mask the
    parallel fraction at small sf."""
    from fa_spark.pipeline import JobConfig, analyze_pages
    from fa_spark.queries import _synth_pages
    from pyspark.sql import functions as F

    docs = _synth_pages(spark, sf_dir)
    if multiplier > 1:
        docs = docs.crossJoin(
            spark.range(multiplier).select(F.col("id").alias("variant"))
        ).select(
            (F.col("doc_id") * multiplier + F.col("variant")).alias("doc_id"),
            F.concat(
                "html", F.encode(F.concat(F.lit("<!-- v"), "variant", F.lit(" -->")), "utf-8")
            ).alias("html"),
        )
    pages = docs.select(
        F.concat(F.lit("https://bench.example/"), F.col("doc_id").cast("string")).alias("url"),
        F.to_timestamp(F.lit("2025-01-01 00:00:00")).alias("warc_ts"),
        "html",
        F.lit("").alias("text"),
        F.lit("en").alias("lang"),
    )
    # The sf parquet is one file -> one input partition; a production run reads
    # an Iceberg table bucketed by url with thousands of splits. Emulate that
    # here so the UDF stage has work for every core.
    par = spark.sparkContext.defaultParallelism * 3
    pages = pages.repartition(par, "url")
    return analyze_pages(pages, JobConfig(run_id="bench"))


HEADLINE = [
    "pricing_summary",
    "nation_revenue",
    "events_sessions",
    "doc_top_tags",
    "global_terms",
    "doc_quality",
    "doc_exact_dedup",
    "ann_topk",
    "minhash_near_dups",
    "extract_synth",
]


def run_headline(spark, sf_dir: str) -> dict[str, float]:
    from fa_spark.queries import REGISTRY

    times: dict[str, float] = {}
    for name in HEADLINE:
        fn = REGISTRY[name][0]
        t0 = time.perf_counter()
        _force(fn(spark, sf_dir))
        times[name] = round(time.perf_counter() - t0, 3)
    # flagship extraction pipeline end-to-end
    t0 = time.perf_counter()
    _force(_extraction_job(spark, sf_dir))
    times["extraction_pipeline"] = round(time.perf_counter() - t0, 3)
    return times


def count_docs(sf_dir: str) -> int:
    import pyarrow.parquet as pq

    return pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows


def bench_once(cpus: int, sf_dir: str) -> dict:
    spark = _session(cpus)
    try:
        # warm the JVM + Python workers so timings measure steady state
        _force(spark.range(1_000_000).selectExpr("sum(id) as s"))
        times = run_headline(spark, sf_dir)
    finally:
        spark.stop()
    total = round(sum(times.values()), 3)
    n_docs = count_docs(sf_dir)
    return {
        "metric": "headline query suite wall time",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": sf_dir,
        "cpus": cpus,
        "n_docs": n_docs,
        "docs_per_sec": round(n_docs / times["extraction_pipeline"], 1),
    }


def extraction_throughput(
    cores: int, sf_dir: str, repeat: int, multiplier: int = 1
) -> dict:
    spark = _session(cores)
    try:
        _force(spark.range(1_000_000).selectExpr("sum(id) as s"))
        samples = []
        for _ in range(repeat):
            t0 = time.perf_counter()
            _force(_extraction_job(spark, sf_dir, multiplier))
            samples.append(time.perf_counter() - t0)
    finally:
        spark.stop()
    n = count_docs(sf_dir) * multiplier
    best = min(samples)
    return {
        "cores": cores,
        "n_docs": n,
        "secs": {
            "mean": round(statistics.mean(samples), 3),
            "median": round(statistics.median(samples), 3),
            "min": round(min(samples), 3),
            "max": round(max(samples), 3),
        },
        "docs_per_sec": round(n / best, 1),
    }


def bench_scaling(sf_dir: str, repeat: int = 3, multiplier: int | None = None) -> dict:
    if multiplier is None:
        # target ~40k pages so the job is compute-bound, not overhead-bound
        multiplier = max(1, 40_000 // max(count_docs(sf_dir), 1))
    lo = extraction_throughput(8, sf_dir, repeat, multiplier)
    hi = extraction_throughput(32, sf_dir, repeat, multiplier)
    # efficiency = speedup achieved / speedup available
    eff = (lo["secs"]["min"] / hi["secs"]["min"]) / (32 / 8)
    return {
        "metric": "extraction docs/sec scaling local[8] -> local[32]",
        "value": round(eff, 3),
        "unit": "efficiency",
        "sf": sf_dir,
        "local8": lo,
        "local32": hi,
    }


def write_baseline_md(result: dict) -> None:
    os.makedirs("BENCH", exist_ok=True)
    lo, hi = result["local8"], result["local32"]
    with open("BENCH/BASELINE.md", "a") as f:
        f.write(
            f"\n## Scaling run — sf_dir={result['sf']}, n_docs={lo['n_docs']}\n\n"
            f"| cores | min s | median s | docs/sec |\n|---|---|---|---|\n"
            f"| 8 | {lo['secs']['min']} | {lo['secs']['median']} | {lo['docs_per_sec']} |\n"
            f"| 32 | {hi['secs']['min']} | {hi['secs']['median']} | {hi['docs_per_sec']} |\n\n"
            f"**Scaling efficiency (8→32 cores): {result['value']}** "
            f"(gate ≥ 0.8 per BASELINE.json north_rule)\n"
        )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=DEFAULT_SF_DIR)
    ap.add_argument("--cpus", type=int, default=DEFAULT_CPUS)
    ap.add_argument("--scaling", action="store_true")
    ap.add_argument("--repeat", type=int, default=3)
    ap.add_argument("--multiplier", type=int, default=None)
    args = ap.parse_args()

    if args.scaling:
        result = bench_scaling(args.sf_dir, args.repeat, args.multiplier)
        write_baseline_md(result)
    else:
        result = bench_once(args.cpus, args.sf_dir)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
