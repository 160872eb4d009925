"""Skew-defense tests: MinHash band-bucket cap (the documented drop rule for
host-spam clusters, SURVEY.md §7.3 hard part 3) and salted aggregation."""

from __future__ import annotations

from pyspark.sql import functions as F

from fa_spark.stages.analyze import minhash_udf
from fa_spark.stages.dedup import minhash_band_pairs


def _spam_cluster(spark, n_spam=60, n_normal=20):
    """One hot near-dup cluster (n_spam nearly-identical docs — the host-spam
    analogue) plus unrelated normal docs."""
    base = "the same spam page content repeated across a whole host " * 5
    rows = [(i, base + f"tail {i % 3}") for i in range(n_spam)]
    rows += [
        (1000 + i, f"unique document number {i} " + ("alpha beta gamma " * (i % 7 + 3)))
        for i in range(n_normal)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string").withColumn(
        "minhash", minhash_udf("text")
    )


def test_band_cap_bounds_hot_bucket(spark):
    df = _spam_cluster(spark).persist()
    try:
        # uncapped: the hot cluster makes ~n² pairs
        wide = minhash_band_pairs(
            df, id_col="doc_id", max_bucket=1000, min_jaccard=0.5
        ).count()
        # capped below the cluster width: its band buckets are dropped
        capped = minhash_band_pairs(
            df, id_col="doc_id", max_bucket=10, min_jaccard=0.5
        ).count()
        assert wide > 1000, f"uncapped spam cluster should explode, got {wide}"
        assert capped < wide / 10, f"cap must bound the blowup: {capped} vs {wide}"
    finally:
        df.unpersist()


def test_band_cap_is_deterministic(spark):
    df = _spam_cluster(spark)
    a = sorted(
        map(str, minhash_band_pairs(df, id_col="doc_id", max_bucket=20).collect())
    )
    b = sorted(
        map(
            str,
            minhash_band_pairs(
                df.repartition(13), id_col="doc_id", max_bucket=20
            ).collect(),
        )
    )
    assert a == b


def test_cap_does_not_drop_normal_pairs(spark):
    """Docs outside hot buckets keep their near-dup pairs under the cap."""
    rows = [(1, "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 4)]
    rows.append((2, rows[0][1] + " small tail"))
    rows += [(10 + i, f"totally different text {i} " + "x y z w v u t s r q " * 3) for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, text string").withColumn(
        "minhash", minhash_udf("text")
    )
    pairs = {
        (r["id_a"], r["id_b"])
        for r in minhash_band_pairs(
            df, id_col="doc_id", max_bucket=8, min_jaccard=0.5
        ).collect()
    }
    assert (1, 2) in pairs


def test_salted_agg_on_skewed_keys(spark):
    """Zipf-skewed keys: salted two-phase == naive groupBy exactly."""
    import numpy as np

    from fa_spark.stages.skew import salted_counts

    rng = np.random.default_rng(42)
    keys = np.minimum(rng.zipf(1.3, size=5000), 20)
    rows = [(int(k), int(i)) for i, k in enumerate(keys)]
    df = spark.createDataFrame(rows, "host int, v long")
    salted = {
        r["host"]: (r["n_rows"], r["sum_v"])
        for r in salted_counts(df, "host", sum_cols=("v",), salt_source="v").collect()
    }
    naive = {
        r["host"]: (r["cnt"], r["s"])
        for r in df.groupBy("host")
        .agg(F.count("*").alias("cnt"), F.sum("v").alias("s"))
        .collect()
    }
    assert salted == naive


def test_exact_dedup_hot_class_no_window(spark):
    """Round-2 VERDICT "what's wrong" #2: a degenerate dup class (30% of
    all rows on ONE key — blank pages) must not route through a window over
    the key (one straggler task; AQE never splits window partitions). The
    two-phase election keeps values identical and plans a partial-agg
    groupBy + join instead."""
    from fa_spark.stages.dedup import exact_dedup

    n = 1000
    rows = [
        (f"u{i:04d}", "HOT" if i % 10 < 3 else f"sha{i}") for i in range(n)
    ]
    df = spark.createDataFrame(rows, "url string, sha string").repartition(8)
    out = exact_dedup(df, key="sha", order="url")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "partial_count" in plan or "HashAggregate" in plan  # map-side agg
    got = {r["url"]: r for r in out.collect()}
    hot = [r for r in got.values() if r["sha"] == "HOT"]
    assert len(hot) == 300
    assert all(r["dup_count"] == 300 for r in hot)
    canon = [r for r in hot if r["is_canonical"]]
    assert len(canon) == 1 and canon[0]["url"] == "u0000"
    assert all(r["dup_of"] == "u0000" for r in hot if not r["is_canonical"])
    singles = [r for r in got.values() if r["sha"] != "HOT"]
    assert all(r["is_canonical"] and r["dup_count"] == 1 for r in singles)


def test_exact_dedup_null_keys_survive(spark):
    """Round-3 ADVICE (medium): sha2(NULL html) is NULL — an inner join on
    the key silently dropped those rows. The null-safe election must keep
    every NULL-key row, group them together (window/PARTITION BY
    semantics on both engines put all NULLs in one partition), and elect
    one canonical."""
    from fa_spark.stages.dedup import exact_dedup

    rows = [
        ("u0", "shaA"),
        ("u1", "shaA"),
        ("u2", None),
        ("u3", None),
        ("u4", None),
        ("u5", "shaB"),
    ]
    df = spark.createDataFrame(rows, "url string, sha string")
    out = {r["url"]: r for r in exact_dedup(df, key="sha", order="url").collect()}
    assert len(out) == 6, "NULL-key rows must not vanish"
    nulls = [r for r in out.values() if r["sha"] is None]
    assert len(nulls) == 3
    assert all(r["dup_count"] == 3 for r in nulls)
    assert sorted(r["url"] for r in nulls if r["is_canonical"]) == ["u2"]
    assert all(r["dup_of"] == "u2" for r in nulls if not r["is_canonical"])
    assert out["u0"]["is_canonical"] and out["u0"]["dup_count"] == 2
    assert out["u5"]["is_canonical"] and out["u5"]["dup_count"] == 1
