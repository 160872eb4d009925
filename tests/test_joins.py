"""as-of join operator semantics (stages/joins.py): backward match,
equal-ts visibility, duplicate-right-ts tie-break, no-match nulls, and the
one-shuffle plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


@pytest.fixture()
def frames(spark):
    left = _df(
        spark,
        [("A", 0, 100), ("A", 2, 101), ("A", 3, 102), ("B", 6, 103), ("C", 9, 104)],
        "k string, ts long, lid long",
    )
    right = _df(
        spark,
        [
            ("A", 1, 10, 1.0),
            ("A", 3, 11, 2.0),
            ("B", 5, 20, 3.0),
            ("B", 5, 21, 4.0),  # duplicate (k, ts): greatest order wins
        ],
        "k string, ts long, rid long, rv double",
    )
    return left, right


def test_asof_backward_semantics(spark, frames):
    from fa_spark.stages.joins import asof_join

    left, right = frames
    out = {
        r["lid"]: (r["rid"], r["rv"], r["_asof_ts"])
        for r in asof_join(left, right, key="k", ts="ts", order_col="rid").collect()
    }
    assert out[100] == (None, None, None)  # before any right row
    assert out[101] == (10, 1.0, 1)  # strictly-prior match
    assert out[102] == (11, 2.0, 3)  # equal ts IS visible (>= semantics)
    assert out[103] == (21, 4.0, 5)  # duplicate right ts -> max order_col
    assert out[104] == (None, None, None)  # key with no right rows at all


def test_asof_forward_semantics(spark, frames):
    """Forward direction: earliest right row with right.ts >= left.ts;
    equal ts visible; duplicate right ts -> greatest order_col, mirroring
    backward."""
    from fa_spark.stages.joins import asof_join

    left, right = frames
    out = {
        r["lid"]: (r["rid"], r["rv"], r["_asof_ts"])
        for r in asof_join(
            left, right, key="k", ts="ts", order_col="rid", direction="forward"
        ).collect()
    }
    assert out[100] == (10, 1.0, 1)  # next right row after ts=0
    assert out[101] == (11, 2.0, 3)  # nearest at/after ts=2 is ts=3
    assert out[102] == (11, 2.0, 3)  # equal ts IS visible
    assert out[103] == (None, None, None)  # B has no right row at/after ts=6
    assert out[104] == (None, None, None)  # key with no right rows


def test_asof_forward_tie_break_and_rowcount(spark):
    from fa_spark.stages.joins import asof_join

    left = _df(spark, [("B", 4, 110)], "k string, ts long, lid long")
    right = _df(
        spark,
        [("B", 5, 20, 3.0), ("B", 5, 21, 4.0)],
        "k string, ts long, rid long, rv double",
    )
    rows = asof_join(left, right, "k", "ts", "rid", direction="forward").collect()
    assert len(rows) == 1
    assert rows[0]["rid"] == 21 and rows[0]["rv"] == 4.0  # max order_col wins


def test_asof_rejects_bad_direction_and_order_type(spark, frames):
    """Loud failure (ADVICE r2): a string order_col would cast to NULL for
    every row and silently break the documented tie-break."""
    from fa_spark.stages.joins import asof_join

    left, right = frames
    with pytest.raises(ValueError, match="direction"):
        asof_join(left, right, "k", "ts", "rid", direction="nearest")
    right_str = right.withColumn("rid", F.col("rid").cast("string"))
    with pytest.raises(ValueError, match="non-numeric"):
        asof_join(left, right_str, "k", "ts", "rid")


def test_asof_forward_single_shuffle_plan(spark, frames):
    from fa_spark.stages.joins import asof_join

    left, right = frames
    plan = (
        asof_join(left, right, key="k", ts="ts", order_col="rid", direction="forward")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


def test_asof_null_column_not_backfilled(spark):
    """Regression (round-2 review): a NULL value column in the MATCHED right
    row must stay NULL — per-column last(ignorenulls) would fabricate a row
    by backfilling it from an older right row."""
    from fa_spark.stages.joins import asof_join

    left = _df(spark, [("D", 3, 105)], "k string, ts long, lid long")
    right = _df(
        spark,
        [("D", 1, 30, 5.0), ("D", 2, 31, None)],
        "k string, ts long, rid long, rv double",
    )
    row = asof_join(left, right, key="k", ts="ts", order_col="rid").collect()[0]
    assert row["rid"] == 31 and row["rv"] is None and row["_asof_ts"] == 2


def test_asof_preserves_left_rowcount(spark, frames):
    from fa_spark.stages.joins import asof_join

    left, right = frames
    out = asof_join(left, right, key="k", ts="ts", order_col="rid")
    assert out.count() == left.count()


def test_asof_column_collision_rejected(spark, frames):
    from fa_spark.stages.joins import asof_join

    left, right = frames
    with pytest.raises(ValueError, match="collide"):
        asof_join(left, right.withColumnRenamed("rid", "lid"), "k", "ts", "lid")


def test_range_join_semantics(spark):
    """Half-open [lts, lts+W) window, cell-boundary pairs found, no
    duplicate pairs, key isolation."""
    from fa_spark.stages.joins import range_join

    def ts(sec):
        return f"2025-01-01 00:00:{sec:02d}"

    left = _df(
        spark,
        [("A", 100, ts(0)), ("A", 101, ts(58)), ("B", 102, ts(0))],
        "k string, lid long, lts string",
    ).withColumn("lts", F.to_timestamp("lts"))
    right = _df(
        spark,
        [
            ("A", 200, ts(0)),   # == lts -> included (>=)
            ("A", 201, ts(9)),   # inside
            ("A", 202, ts(10)),  # == lts + W -> EXCLUDED (half-open)
            ("A", 203, ts(59)),  # crosses the 10s cell boundary from 58
            ("B", 204, ts(5)),   # other key
        ],
        "k string, rid long, rts string",
    ).withColumn("rts", F.to_timestamp("rts"))
    W = 10_000_000  # 10s in µs
    pairs = {
        (r["lid"], r["rid"])
        for r in range_join(left, right, "k", "lts", "rts", W).collect()
    }
    assert pairs == {(100, 200), (100, 201), (101, 203), (102, 204)}
    # no duplicates by construction (each right row has ONE cell)
    rows = range_join(left, right, "k", "lts", "rts", W).collect()
    assert len(rows) == len(pairs)


def test_range_join_no_cartesian_plan(spark):
    from fa_spark.stages.joins import range_join

    left = _df(spark, [("A", 1, "2025-01-01 00:00:00")], "k string, lid long, lts string").withColumn("lts", F.to_timestamp("lts"))
    right = _df(spark, [("A", 2, "2025-01-01 00:00:01")], "k string, rid long, rts string").withColumn("rts", F.to_timestamp("rts"))
    plan = range_join(left, right, "k", "lts", "rts", 10_000_000)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


def test_asof_single_shuffle_plan(spark, frames):
    """The union-sort-window form must plan exactly ONE exchange (on the
    key) — the scale property that justifies it over a range join."""
    from fa_spark.stages.joins import asof_join

    left, right = frames
    plan = asof_join(left, right, key="k", ts="ts", order_col="rid")._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
