"""Operator CLI — the spark-submit surface of the engine.

The reference layers config.json + env + CLI flags and exposes
include/exclude globs, mode and output options on its `analyze` command
(/root/reference/src/cli/analyze/main.py:124-231,
 /root/reference/src/cli/common/config.py:100-121). This maps that UX onto
job parameters for the Spark rebuild:

    spark-submit --py-files fa_spark.zip jobs/cli_job.py analyze \
        --input pages.parquet --output out/ --run-id r1 \
        --include 'https://host1*' --exclude '*spam*' --limit 10000

    spark-submit --py-files fa_spark.zip jobs/cli_job.py corpus \
        --input pages.parquet --output corpus/ --langs en,de \
        --min-words 20 --near-dup-jaccard 0.8 --report-json report.json

    python -m fa_spark.cli query --name pricing_summary \
        --sf-dir /root/testdata/sf0.01 --limit 5

Flag precedence is CLI > env (FA_SPARK_<FLAG>) > built-in default — the
reference's three-layer config resolution, without a config file (job
parameters belong in the scheduler, not a mutable file, at cluster scale).
All timestamps are explicit parameters; the only wall-clock read is the
documented --committed-at default on the driver, resolved once.
"""

from __future__ import annotations

import argparse
import datetime as dt
import json
import os
import sys


def _env_default(flag: str, fallback):
    """Env layer: FA_SPARK_MIN_WORDS=30 overrides the built-in default but
    loses to an explicit CLI flag (argparse default mechanism)."""
    raw = os.environ.get("FA_SPARK_" + flag.upper().replace("-", "_"))
    if raw is None:
        return fallback
    if isinstance(fallback, bool):
        return raw.lower() in ("1", "true", "yes")
    if isinstance(fallback, int):
        return int(raw)
    if isinstance(fallback, float):
        return float(raw)
    return raw


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(prog="fa-spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    def common(p):
        p.add_argument("--input", required=True, help="pages parquet/Iceberg path")
        p.add_argument("--input-format", choices=("parquet", "binaryFile", "warc"),
                       default=_env_default("input-format", "parquet"),
                       help="binaryFile walks a directory tree of loose "
                            "files into pages rows (reference: analyze a "
                            "dir); warc reads Common-Crawl WARC[.gz] files")
        p.add_argument("--path-glob", default=None,
                       help="binaryFile only: pathGlobFilter, e.g. '*.html'")
        p.add_argument("--include", action="append", default=None,
                       help="fnmatch url glob; repeatable; must match >=1")
        p.add_argument("--exclude", action="append", default=None,
                       help="fnmatch url glob; repeatable; must match none")
        p.add_argument("--extensions", default=_env_default("extensions", ""),
                       help="comma list; empty = no extension filter")
        p.add_argument("--limit", type=int, default=None,
                       help="deterministic cap (orderBy url, limit)")
        p.add_argument("--buckets", type=int, default=_env_default("buckets", 64))
        p.add_argument("--cores", type=int, default=None,
                       help="local[N] when no master is configured")

    pa = sub.add_parser("analyze", help="resumable analysis increment")
    common(pa)
    pa.add_argument("--output", required=True, help="analysis base dir")
    pa.add_argument("--run-id", required=True)
    pa.add_argument("--committed-at", default=None, help="ISO timestamp")

    pc = sub.add_parser("corpus", help="end-to-end training-corpus build")
    common(pc)
    pc.add_argument("--output", required=True, help="corpus parquet dir")
    pc.add_argument("--langs", default=_env_default("langs", "en"),
                    help="comma list of allowed detected languages")
    pc.add_argument("--min-words", type=int,
                    default=_env_default("min-words", 20))
    pc.add_argument("--min-uniq-ratio", type=float,
                    default=_env_default("min-uniq-ratio", 0.3))
    pc.add_argument("--min-alpha-ratio", type=float,
                    default=_env_default("min-alpha-ratio", 0.5))
    pc.add_argument("--near-dup-jaccard", type=float,
                    default=_env_default("near-dup-jaccard", 0.8))
    pc.add_argument("--max-top2gram-frac", type=float, default=None,
                    help="drop docs whose top-2gram char fraction exceeds "
                         "this (Gopher repetition gate; off by default)")
    pc.add_argument("--max-dup10gram-frac", type=float, default=None,
                    help="drop docs whose duplicate-10gram fraction exceeds "
                         "this (off by default)")
    pc.add_argument("--eval-parquet", default=None,
                    help="held-out eval table (eval_id, text) parquet; "
                         "docs containing >= --decon-overlap of an eval "
                         "item's n-grams are dropped")
    pc.add_argument("--decon-overlap", type=float,
                    default=_env_default("decon-overlap", 0.5))
    pc.add_argument("--strip-dup-passages", type=int, default=None,
                    metavar="WINDOW",
                    help="remove >=WINDOW-token passages duplicated across "
                         "the corpus (ExactSubstr; off by default)")
    pc.add_argument("--dup-passage-min-count", type=int,
                    default=_env_default("dup-passage-min-count", 2))
    pc.add_argument("--report-json", default=None,
                    help="also write the funnel report to this path")

    pq = sub.add_parser("query", help="run a registry query")
    pq.add_argument("--name", required=True)
    pq.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    pq.add_argument("--limit", type=int, default=20)
    pq.add_argument("--cores", type=int, default=None)

    pe = sub.add_parser("expire", help="lineage retention GC")
    pe.add_argument("--output", required=True, help="analysis base dir")
    pe.add_argument("--keep-last-n", type=int, default=None)
    pe.add_argument("--older-than", default=None, help="ISO timestamp")

    pv = sub.add_parser(
        "validate",
        help="post-hoc schema validation of a foreign analysis parquet "
             "(reference `fa validate schema`)",
    )
    pv.add_argument("--input", required=True, help="analysis parquet path")
    pv.add_argument("--strict", action="store_true",
                    help="warnings also fail validation")
    pv.add_argument("--violations-out", default=None,
                    help="write the per-row violation report parquet here")
    pv.add_argument("--cores", type=int, default=None)

    pvi = sub.add_parser(
        "validate-images",
        help="compare two images (pixel / hash / ssim — reference "
             "`fa validate images`)",
    )
    pvi.add_argument("--image1", required=True)
    pvi.add_argument("--image2", required=True)
    pvi.add_argument("--method", choices=("pixel", "hash", "ssim"),
                     default="pixel")
    pvi.add_argument("--pixel-threshold", type=float, default=0.05)
    pvi.add_argument("--max-difference", type=float, default=5.0)
    pvi.add_argument("--threshold", type=float, default=0.1)
    pvi.add_argument("--strict", action="store_true")
    return ap


def _session(app: str, cores: int | None):
    """Under spark-submit the master/conf arrive via system properties
    (SparkConf picks them up); a bare python invocation falls back to the
    tuned local session."""
    from pyspark import SparkConf
    from pyspark.sql import SparkSession

    active = SparkSession.getActiveSession()
    if active is not None:
        return active
    if SparkConf().contains("spark.master"):
        return SparkSession.builder.appName(app).getOrCreate()
    from fa_spark.pipeline import default_session

    return default_session(app=app, cores=cores)


def _filtered_pages(spark, args):
    from fa_spark import sources

    fmt = getattr(args, "input_format", "parquet")
    if fmt == "binaryFile":
        pages = sources.read_loose_files(spark, args.input, glob=args.path_glob)
    elif fmt == "warc":
        pages = sources.read_warc(spark, args.input, glob=args.path_glob)
    else:
        pages = sources.read_pages(spark, args.input)
    pages = sources.glob_filter(pages, args.include, args.exclude)
    exts = [e for e in (args.extensions or "").split(",") if e]
    if exts:
        pages = sources.extension_filter(pages, set(exts))
    if args.limit is not None:  # --limit 0 is a valid (empty) cap
        pages = sources.capped(pages, args.limit)
    return pages


def cmd_analyze(args) -> dict:
    from fa_spark.lineage import run_resumable
    from fa_spark.pipeline import JobConfig, summary

    committed_at = (
        dt.datetime.fromisoformat(args.committed_at)
        if args.committed_at
        else dt.datetime.now(dt.timezone.utc)  # resolved ONCE on the driver
    )
    spark = _session(f"fa-analyze-{args.run_id}", args.cores)
    pages = _filtered_pages(spark, args)
    run_resumable(
        spark, pages, args.output, args.run_id, committed_at,
        JobConfig(run_id=args.run_id, buckets=args.buckets),
    )
    # summarize the just-committed PARQUET, not the returned (uncached)
    # DataFrame — re-evaluating that would re-run the whole UDF pipeline
    from pyspark.sql import functions as F

    from fa_spark.lineage import read_analysis

    if not os.path.isdir(os.path.join(args.output, "analysis")):
        return {"analyses": 0}  # first run with an all-filtered input
    committed = read_analysis(spark, args.output).where(
        F.col("run_id") == args.run_id
    )
    rows = summary(committed).collect()
    return rows[0].asDict() if rows else {"analyses": 0}


def cmd_corpus(args) -> dict:
    from fa_spark.corpus import build_corpus, CorpusConfig
    from fa_spark.pipeline import JobConfig

    spark = _session("fa-corpus", args.cores)
    pages = _filtered_pages(spark, args)
    cfg = CorpusConfig(
        langs=tuple(x for x in args.langs.split(",") if x),
        min_words=args.min_words,
        min_uniq_ratio=args.min_uniq_ratio,
        min_alpha_ratio=args.min_alpha_ratio,
        near_dup_jaccard=args.near_dup_jaccard,
        max_top2gram_frac=args.max_top2gram_frac,
        max_dup10gram_frac=args.max_dup10gram_frac,
        dup_passage_window=args.strip_dup_passages,
        dup_passage_min_count=args.dup_passage_min_count,
        decon_overlap=args.decon_overlap,
        job=JobConfig(run_id="corpus-cli", buckets=args.buckets),
    )
    eval_df = (
        spark.read.parquet(args.eval_parquet) if args.eval_parquet else None
    )
    # write happens INSIDE build_corpus while its caches are alive — a
    # caller-side write would re-run the whole pipeline from scratch
    _corpus, report = build_corpus(pages, cfg, output_path=args.output, eval_df=eval_df)
    payload = report.collect()[0].asDict()
    if args.report_json:
        with open(args.report_json, "w") as f:
            json.dump(payload, f)
    return payload


def cmd_query(args) -> dict:
    from fa_spark.queries import REGISTRY

    if args.name not in REGISTRY:
        raise SystemExit(
            f"unknown query {args.name!r}; available: {', '.join(sorted(REGISTRY))}"
        )
    spark = _session(f"fa-query-{args.name}", args.cores)
    df = REGISTRY[args.name][0](spark, args.sf_dir)
    rows = [r.asDict() for r in df.limit(args.limit).collect()]
    # near-dup queries register persisted signature caches; release them once
    # the action is consumed so a long-lived driver doesn't accumulate blocks
    from fa_spark.stages.dedup import release_pair_caches

    release_pair_caches()
    return {"query": args.name, "n_shown": len(rows), "rows": rows}


def cmd_validate(args) -> dict:
    from fa_spark.stages.validate import validate_analysis, validation_summary

    spark = _session("fa-validate", args.cores)
    df = spark.read.parquet(args.input)
    report = validate_analysis(df, strict=args.strict)
    if args.violations_out:
        # one pass serves both outputs: persist the report, write the
        # per-row parquet, then aggregate the file verdict from the cache
        report = report.persist()
        report.write.mode("overwrite").parquet(args.violations_out)
    payload = validation_summary(report).collect()[0].asDict()
    if args.violations_out:
        report.unpersist()
    payload["file"] = args.input
    payload["strict"] = args.strict
    return payload


def cmd_validate_images(args) -> dict:
    """Driver-side image compare (no cluster needed — two files)."""
    from fa_spark import pure
    from fa_spark.stages.multimodal import _decode_raster

    def load(path):
        with open(path, "rb") as f:
            data = f.read()
        ct = pure.sniff_bytes(data)["content_type"]
        return _decode_raster(ct, data)

    out = pure.compare_images(
        load(args.image1), load(args.image2), method=args.method,
        pixel_color_threshold=args.pixel_threshold,
        max_difference_percent=args.max_difference,
        threshold=args.threshold, strict=args.strict,
    )
    out["image1"], out["image2"] = args.image1, args.image2
    return out


def cmd_expire(args) -> dict:
    from fa_spark.lineage import expire_runs

    older = dt.datetime.fromisoformat(args.older_than) if args.older_than else None
    expired = expire_runs(args.output, keep_last_n=args.keep_last_n, older_than=older)
    return {"expired": expired}


def main(argv: list[str] | None = None) -> None:
    args = build_parser().parse_args(argv)
    out = {
        "analyze": cmd_analyze,
        "corpus": cmd_corpus,
        "query": cmd_query,
        "expire": cmd_expire,
        "validate": cmd_validate,
        "validate-images": cmd_validate_images,
    }[args.cmd](args)
    print(json.dumps(out, default=str))


if __name__ == "__main__":
    main()
