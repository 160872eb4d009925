"""Deterministic stratified sampling (round 5 — the corpus-composition
operator a training-data pipeline needs: "n documents per (lang, source)
cell, reproducibly", e.g. balancing a multilingual pretraining mix).

Exact semantics: per stratum keep the n rows with the SMALLEST
md5(id) (ties broken by id) — a seedless uniform sample that is
identical across engines, cluster sizes, and partitionings, because it
hashes row identity and never partition or order (the dataset_split
rule). DuckDB computes the same md5 hex string, so the oracle re-derives
the exact row set with a plain window.

Scale shape (100 TB): a bare row_number window over the stratum sorts
every row of a hot stratum in one task — the round-2 dedup lesson
(OptimizeSkewedJoin never splits window partitions). Instead:

  1. per-stratum counts — partial-agg groupBy, skew-safe;
  2. hash-prefix PRUNE: keep rows whose 32-bit md5-prefix fraction is
     below margin/count where margin = n + 6*sqrt(n) + 16 (a >= 6-sigma
     binomial bound on the n-th order statistic) — the window input
     shrinks from |stratum| to O(n) rows per stratum;
  3. the exact row_number window over the pruned survivors;
  4. exactness AUDIT: any stratum that produced fewer than
     min(n, count) rows — the < 1e-9 prune-undershoot tail — is
     re-ranked WITHOUT the prune and patched in. Exact by construction;
     the expensive path runs only for the strata that actually need it
     (one extra action to detect, none in the common case).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from fa_spark.stages.dedup import _PAIR_CACHES

_PREFIX_DENOM = float(16**8)


def _hash_col(id_col: str):
    return F.md5(F.col(id_col).cast("string"))


def stratified_sample(
    df: DataFrame,
    strata: list,
    n: int,
    id_col: str = "doc_id",
    rank_col: str = "sample_rank",
    margin: int | None = None,
) -> DataFrame:
    """n deterministic rows per stratum (fewer iff the stratum is
    smaller). Output = input columns + ``rank_col`` (1..n within the
    stratum, in hash order). ``margin`` overrides the prune bound —
    tests use a deliberately-too-small value to force the audit/repair
    path that production would hit once in ~1e9 strata."""
    if n < 1:
        raise ValueError("n must be >= 1")
    if margin is None:
        margin = n + 6 * math.isqrt(n) + 16
    # the strata key is a single STRUCT column: struct equality treats
    # NULL members as equal, so NULL-valued strata survive every join
    # below (a plain multi-column equi-join silently drops NULL keys —
    # the round-4 dedup NULL-key bug class, round-5 review finding)
    hashed = df.withColumn(
        "_sk", F.struct(*[F.col(c) for c in strata])
    ).withColumn("_h", _hash_col(id_col))
    counts = hashed.groupBy("_sk").agg(F.count("*").alias("_cnt"))
    frac = F.conv(F.substring("_h", 1, 8), 16, 10).cast("double") / F.lit(
        _PREFIX_DENOM
    )
    pruned = hashed.join(counts, "_sk").where(
        (F.col("_cnt") <= F.lit(margin)) | (frac < F.lit(margin) / F.col("_cnt"))
    )
    w = Window.partitionBy("_sk").orderBy("_h", id_col)
    # persisted: the audit action below and the caller's own action both
    # consume this relation — without the cache the prune+window subplan
    # (the operator's dominant stage) would run twice. The cached set is
    # O(n * margin-factor) rows per stratum, tiny by construction; it
    # registers with the shared release mechanism so long-lived sessions
    # (the driver's registry sweep) reclaim it like the signature caches
    # do (round-5 ADVICE: q_corpus_sample never unpersisted).
    ranked = (
        pruned.withColumn(rank_col, F.row_number().over(w))
        .where(F.col(rank_col) <= n)
        .persist()
    )
    _PAIR_CACHES.append(ranked)

    # exactness audit (step 4): strata whose sample came up short
    got = ranked.groupBy("_sk").agg(F.count("*").alias("_got"))
    short = (
        counts.join(got, "_sk", "left")
        .where(F.coalesce(F.col("_got"), F.lit(0)) < F.least(F.lit(n), F.col("_cnt")))
        .select("_sk")
    )
    if short.limit(1).count() > 0:  # <1e-9 tail per stratum at default margin
        wf = Window.partitionBy("_sk").orderBy("_h", id_col)
        full = (
            hashed.join(short, "_sk", "left_semi")
            .withColumn(rank_col, F.row_number().over(wf))
            .where(F.col(rank_col) <= n)
        )
        keep = ranked.join(short, "_sk", "left_anti")
        return keep.drop("_h", "_cnt", "_sk").unionByName(
            full.drop("_h", "_sk")
        )
    return ranked.drop("_h", "_cnt", "_sk")
