"""BM25 retrieval: ranking semantics, two-phase exactness, plan shape."""

from __future__ import annotations

import math

from pyspark.sql import Row

from fa_spark.stages.retrieval import bm25_topk


def _docs(spark, texts):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)],
        "doc_id long, text string",
    )


def test_tf_saturation_and_ranking(spark):
    docs = _docs(
        spark,
        [
            "spark spark spark spark filler filler",  # heavy tf
            "spark filler filler filler filler filler",  # single hit
            "filler filler filler filler filler filler",  # no hit
            "spark spark filler filler filler filler",
        ],
    )
    got = bm25_topk(docs, [("q", ["spark"])], k=10).collect()
    by_rank = {r.rank: r.doc_id for r in got}
    assert by_rank[1] == 0 and by_rank[2] == 3 and by_rank[3] == 1
    assert 2 not in {r.doc_id for r in got}  # zero-hit docs never surface


def test_shorter_doc_wins_at_equal_tf(spark):
    docs = _docs(
        spark,
        [
            "cat " + "pad " * 40,
            "cat pad pad",
            "pad pad pad pad",
        ],
    )
    got = bm25_topk(docs, [("q", ["cat"])], k=2).collect()
    assert [r.doc_id for r in sorted(got, key=lambda r: r.rank)] == [1, 0]


def test_matches_reference_formula(spark):
    texts = ["a b c a", "a b", "c c c", "b b a"]
    got = bm25_topk(docs := _docs(spark, texts), [("q", ["a", "c"])], k=10)
    rows = {r.doc_id: r.score for r in got.collect()}
    # independent driver-side BM25 with the same constants
    toks = [t.split() for t in texts]
    n, avgdl = len(toks), sum(map(len, toks)) / len(toks)
    dfs = {t: sum(1 for d in toks if t in d) for t in ("a", "c")}

    def score(d):
        s = 0.0
        for t in ("a", "c"):
            tf = toks[d].count(t)
            if not tf:
                continue
            idf = math.log(1 + (n - dfs[t] + 0.5) / (dfs[t] + 0.5))
            s += idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * len(toks[d]) / avgdl))
        return round(round(s, 6), 3)

    for d, sc in rows.items():
        assert abs(sc - score(d)) < 1e-9, (d, sc, score(d))
    assert docs is not None


def test_two_phase_equals_naive_topk(spark):
    texts = [f"w{i % 7} w{i % 3} common filler" for i in range(60)]
    got = bm25_topk(
        _docs(spark, texts), [("q", ["common", "w1"])], k=5, salt_cells=4
    )
    wide = bm25_topk(
        _docs(spark, texts), [("q", ["common", "w1"])], k=5, salt_cells=1
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, wide.collect()))


def test_plan_broadcasts_small_sides(spark):
    df = bm25_topk(_docs(spark, ["spark join"] * 30), [("q", ["spark"])])
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
