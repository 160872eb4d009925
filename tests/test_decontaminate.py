"""Eval-set decontamination operator (stages/text.decontaminate):
planted contamination detection, asymmetric denominator, thresholding,
no-match absence, and broadcast-join plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from fa_spark.stages.text import decontaminate

DOC = "alpha beta gamma delta epsilon zeta eta theta iota kappa"


def _corpus(spark):
    rows = [
        (1, DOC + " lambda mu nu xi omicron pi rho sigma"),
        (2, "one two three four five six seven eight nine ten"),
        (3, "unrelated words entirely different content here today folks"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_planted_contamination_detected(spark):
    ev = spark.createDataFrame([(100, DOC)], "eval_id long, text string")
    out = decontaminate(_corpus(spark), ev).collect()
    assert len(out) == 1
    r = out[0]
    assert r["doc_id"] == 1 and r["eval_id"] == 100 and r["overlap_frac"] == 1.0


def test_partial_overlap_and_threshold(spark):
    # eval = 5 corpus tokens + 5 novel -> 8 trigrams, 3 fully inside doc 1
    ev_text = "alpha beta gamma delta epsilon nov1 nov2 nov3 nov4 nov5"
    ev = spark.createDataFrame([(7, ev_text)], "eval_id long, text string")
    got = decontaminate(_corpus(spark), ev, min_overlap=0.3).collect()
    assert len(got) == 1 and got[0]["overlap_frac"] == 0.375  # 3/8
    assert decontaminate(_corpus(spark), ev, min_overlap=0.5).count() == 0


def test_denominator_is_eval_side(spark):
    """A huge training doc containing a tiny eval item must report 1.0 —
    the fraction is of the EVAL grams, not Jaccard."""
    big = spark.createDataFrame(
        [(1, "x" + str(0) + " " + DOC + " " + " ".join(f"pad{i}" for i in range(200)))],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame([(9, DOC)], "eval_id long, text string")
    out = decontaminate(big, ev).collect()
    assert out[0]["overlap_frac"] == 1.0


def test_clean_eval_items_absent(spark):
    ev = spark.createDataFrame(
        [(5, "zz1 zz2 zz3 zz4 zz5")], "eval_id long, text string"
    )
    assert decontaminate(_corpus(spark), ev).count() == 0


def test_empty_eval_table(spark):
    ev = spark.createDataFrame([], "eval_id long, text string")
    assert decontaminate(_corpus(spark), ev).count() == 0


def test_broadcast_plan_no_corpus_shuffle_before_join(spark):
    """The eval side must broadcast: the corpus gram explosion feeds the
    join without an exchange (the 100-TB property)."""
    ev = spark.createDataFrame([(1, DOC)], "eval_id long, text string")
    plan = (
        decontaminate(_corpus(spark), ev)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
