"""Stratified sampling (round 5): exact deterministic per-stratum top-n
by md5 order, skew-safe prune + window + audit/repair."""

from __future__ import annotations

import hashlib

from fa_spark.stages.sample import stratified_sample


def _expected(rows, strata_of, n):
    """Ground truth: n smallest (md5(id), id) per stratum."""
    by = {}
    for r in rows:
        by.setdefault(strata_of(r), []).append(r)
    out = {}
    for k, rs in by.items():
        rs.sort(key=lambda r: (hashlib.md5(str(r[0]).encode()).hexdigest(), r[0]))
        out[k] = [r[0] for r in rs[:n]]
    return out


def test_exact_per_stratum_sample(spark):
    rows = [(i, ["en", "de", "fr"][i % 3], f"s{i % 2}") for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, source string")
    got = stratified_sample(df, ["lang", "source"], 5).collect()
    exp = _expected(rows, lambda r: (r[1], r[2]), 5)
    by = {}
    for r in got:
        by.setdefault((r["lang"], r["source"]), []).append(r)
    assert set(by) == set(exp)
    for k, rs in by.items():
        rs.sort(key=lambda r: r["sample_rank"])
        assert [r["sample_rank"] for r in rs] == list(range(1, len(rs) + 1))
        assert [r["doc_id"] for r in rs] == exp[k]


def test_small_strata_keep_all_rows(spark):
    rows = [(i, "en" if i < 3 else "de") for i in range(103)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    got = stratified_sample(df, ["lang"], 10).collect()
    en = [r for r in got if r["lang"] == "en"]
    de = [r for r in got if r["lang"] == "de"]
    assert len(en) == 3  # stratum smaller than n: every row kept
    assert len(de) == 10


def test_audit_repair_path_is_exact(spark):
    """A deliberately-too-small prune margin forces the undershoot
    repair; the result must STILL be the exact top-n set."""
    rows = [(i, "x" if i % 4 else "y") for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    exp = _expected(rows, lambda r: r[1], 8)
    got = stratified_sample(df, ["lang"], 8, margin=1).collect()
    by = {}
    for r in got:
        by.setdefault(r["lang"], []).append(r)
    for k in exp:
        assert sorted(r["doc_id"] for r in by[k]) == sorted(exp[k]), k


def test_partitioning_invariant(spark):
    rows = [(i, f"l{i % 5}") for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    a = sorted(map(tuple, stratified_sample(df, ["lang"], 6).collect()))
    b = sorted(
        map(tuple, stratified_sample(df.repartition(13), ["lang"], 6).collect())
    )
    assert a == b


def test_null_strata_survive(spark):
    """Round-5 review: NULL stratum values must sample like any other
    stratum (struct-key joins; a plain multi-column equi-join drops
    NULL keys — the dedup NULL-key bug class)."""
    rows = [(i, None if i % 3 == 0 else "en") for i in range(90)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    got = stratified_sample(df, ["lang"], 5).collect()
    nulls = [r for r in got if r["lang"] is None]
    ens = [r for r in got if r["lang"] == "en"]
    assert len(nulls) == 5 and len(ens) == 5
    exp = _expected(rows, lambda r: r[1], 5)
    assert sorted(r["doc_id"] for r in nulls) == sorted(exp[None])
