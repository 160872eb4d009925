"""Grouped-map (applyInPandas) vocabulary profile tests."""

from __future__ import annotations

from fa_spark.stages.grouped import vocab_profile


def test_vocab_profile_basic(spark):
    rows = [
        ("a", 1, "alpha beta gamma alpha"),
        ("a", 2, "alpha delta"),
        ("b", 3, "one two three"),
        ("b", 4, ""),
    ]
    df = spark.createDataFrame(rows, "source string, doc_id long, text string")
    out = {r["source"]: r for r in vocab_profile(df).collect()}
    assert out["a"]["n_docs"] == 2
    assert out["a"]["total_tokens"] == 6
    assert out["a"]["vocab"] == 4  # alpha beta gamma delta
    assert out["b"]["n_docs"] == 2 and out["b"]["vocab"] == 3
    assert not out["a"]["capped"]
    # sublinear vocabulary growth -> beta in (0, 1]
    assert 0 < out["a"]["heaps_beta"] <= 1.0


def test_vocab_profile_deterministic_and_capped(spark):
    rows = [("s", i, f"tok{i % 7} tok{i % 3} common word") for i in range(50)]
    df = spark.createDataFrame(rows, "source string, doc_id long, text string")
    a = vocab_profile(df, max_docs=20).collect()[0]
    b = vocab_profile(df.repartition(9), max_docs=20).collect()[0]
    assert a == b  # doc_id ordering makes the cumulative curve deterministic
    assert a["capped"] and a["n_docs"] == 20
