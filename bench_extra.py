#!/usr/bin/env python3
"""Extra benchmarks for the optimization round (guide §1.4 noop isolation).

NOT the driver contract — bench.py stays frozen. This harness:
  --plans:   write .explain("formatted") for headline queries to plans/r09/
  --isolate: per-query noop timing (single query, N samples) so one query
             can be measured without the whole suite
  --stages:  stage-by-stage timing inside minhash_near_dups
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _session(cores: int):
    from fa_spark.pipeline import default_session

    s = default_session(app=f"fa-extra-{cores}", cores=cores,
                        shuffle_partitions=max(cores, 16))
    s.sparkContext.setLogLevel("ERROR")
    return s


def _force(df):
    df.write.format("noop").mode("overwrite").save()


def _warm(spark, cores):
    from bench import _warm as w

    w(spark, cores)


def plans(spark, sf_dir, names, suffix):
    from fa_spark.queries import REGISTRY

    os.makedirs("plans/r09", exist_ok=True)
    for name in names:
        fn = REGISTRY[name][0]
        df = fn(spark, sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(f"plans/r09/{name}_{suffix}.txt", "w") as f:
            f.write(txt)
        print(f"wrote plans/r09/{name}_{suffix}.txt")
        from fa_spark.stages.dedup import release_pair_caches

        release_pair_caches()


def isolate(spark, sf_dir, names, samples):
    from fa_spark.queries import REGISTRY
    from fa_spark.stages.dedup import release_pair_caches

    out = {}
    for name in names:
        if name == "extraction_pipeline":
            from bench import _extraction_job

            thunk = lambda: _force(_extraction_job(spark, sf_dir))  # noqa: E731
        else:
            fn = REGISTRY[name][0]
            thunk = lambda: _force(fn(spark, sf_dir))  # noqa: E731
        ts = []
        for _ in range(samples):
            spark.sparkContext.setJobDescription(f"isolate:{name}")
            t0 = time.perf_counter()
            thunk()
            ts.append(round(time.perf_counter() - t0, 3))
            release_pair_caches()
        out[name] = ts
        print(name, ts, flush=True)
    print(json.dumps(out))


def stages_minhash(spark, sf_dir):
    """Noop-time each internal stage of minhash_near_dups."""
    from pyspark.sql import functions as F

    from fa_spark.queries import _docs_with_mutants, _exact_jaccard
    from fa_spark.stages.analyze import minhash_udf
    from fa_spark.stages.dedup import minhash_band_pairs, release_pair_caches

    def t(label, thunk):
        spark.sparkContext.setJobDescription(label)
        t0 = time.perf_counter()
        thunk()
        print(f"{label}: {time.perf_counter() - t0:.3f}s", flush=True)

    df = _docs_with_mutants(spark, sf_dir).withColumn("minhash", minhash_udf("text"))
    t("1 signature UDF only", lambda: _force(df))
    cand = minhash_band_pairs(df, id_col="doc_id", bands=16, min_jaccard=0.0,
                              max_bucket=4096).select("id_a", "id_b")
    t("2 band pairs (incl UDF)", lambda: _force(cand))
    n = cand.count()
    print(f"   candidate pairs: {n}")
    release_pair_caches()
    cand = minhash_band_pairs(df, id_col="doc_id", bands=16, min_jaccard=0.0,
                              max_bucket=4096).select("id_a", "id_b")
    full = _exact_jaccard(cand, _docs_with_mutants(spark, sf_dir), n=2,
                          min_jaccard=0.8)
    t("3 full query", lambda: _force(full))
    release_pair_caches()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=DEFAULT_SF_DIR)
    ap.add_argument("--cpus", type=int, default=DEFAULT_CPUS)
    ap.add_argument("--plans", action="store_true")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--isolate", action="store_true")
    ap.add_argument("--stages", action="store_true")
    ap.add_argument("--samples", type=int, default=3)
    ap.add_argument("--queries", default="")
    args = ap.parse_args()

    names = [q for q in args.queries.split(",") if q]
    spark = _session(args.cpus)
    try:
        _warm(spark, args.cpus)
        if args.plans:
            plans(spark, args.sf_dir, names, args.suffix)
        if args.stages:
            stages_minhash(spark, args.sf_dir)
        if args.isolate:
            isolate(spark, args.sf_dir, names, args.samples)
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
