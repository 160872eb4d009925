"""Beyond-reference join operators Spark lacks natively.

as-of join (point-in-time attribution): for each left row, the most recent
right row of the same key with right.ts <= left.ts. Implemented as the
union-sort-window composition — ONE shuffle on the key, no range explosion,
no per-row Python:

    left(side=1) ∪ right(side=0)
    -> window partitionBy(key) orderBy(ts, side, order)
       last(right value, ignorenulls) over rows unbounded-preceding..current
    -> keep side=1

This is the 100-TB-safe shape: a range-condition join (l.ts >= r.ts) would
either cross-join within key (O(n·m) per key) or need an interval index;
the union form is a single sort-based window over |L|+|R| rows. Skewed keys
are bounded by the same salting/AQE story as any other key window.

Tie semantics (pinned, matching DuckDB's ASOF JOIN after right-side
(key, ts) dedup-to-max-order): right rows at ts == left.ts ARE visible
(side 0 sorts before side 1); among right rows sharing (key, ts) the one
with the greatest ``order_col`` wins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def range_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    window_us: int,
) -> DataFrame:
    """Time-window (range) join: every (left, right) pair with the same key
    and right_ts in [left_ts, left_ts + window_us). Spark has no native
    range join; a raw `ON l.ts <= r.ts AND r.ts < l.ts + W` predicate plans
    as a per-key cross product. Composition: bucket time into window-sized
    cells — a qualifying right row lands in the left row's cell or the next
    one, so the LEFT side explodes into exactly 2 probe cells and the join
    is a plain equi-join on (key, cell) + an exact residual filter. Each
    pair matches in exactly one cell (the right row has one cell), so no
    dedup pass is needed. Candidates are bounded by cell co-location — the
    shape that survives 100×."""
    overlap = (set(right.columns) - {key}) & set(left.columns)
    if overlap:
        raise ValueError(f"right columns collide with left: {sorted(overlap)}")
    reserved = {"_cell"} & (set(left.columns) | set(right.columns))
    if reserved:
        raise ValueError(f"inputs carry reserved working columns: {sorted(reserved)}")

    def us(c):
        return F.unix_micros(F.col(c).cast("timestamp"))

    cell = F.floor(us(left_ts) / F.lit(window_us)).cast("long")
    l = left.withColumn("_cell", F.explode(F.array(cell, cell + 1)))
    r = right.withColumn(
        "_cell", F.floor(us(right_ts) / F.lit(window_us)).cast("long")
    )
    return (
        l.join(r, [key, "_cell"])
        .where((us(right_ts) >= us(left_ts)) & (us(right_ts) < us(left_ts) + window_us))
        .drop("_cell")
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    order_col: str,
    direction: str = "backward",
) -> DataFrame:
    """Left as-of join. ``right`` must contain (key, ts, order_col, value
    columns); every non-(key, ts) right column is attached to each left row
    from the most recent right row with right.ts <= left.ts (``backward``,
    the attribution direction) or the earliest right row with
    right.ts >= left.ts (``forward``, the mirrored window) — NULLs when no
    such row (left-join semantics). ``order_col`` breaks ties among right
    rows sharing (key, ts): the greatest order_col wins in both directions.
    Both directions are ONE shuffle (union-sort-window); forward only flips
    the window's ts sort to descending."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    ord_type = dict(right.dtypes).get(order_col)
    if ord_type is None:
        raise ValueError(f"order_col {order_col!r} not in right columns")
    castable = ("tinyint", "smallint", "int", "bigint", "float", "double",
                "date", "timestamp", "timestamp_ntz", "boolean")
    if not (ord_type in castable or ord_type.startswith("decimal")):
        # a string order_col would cast to NULL for every row, silently
        # turning the documented greatest-order tie-break nondeterministic
        raise ValueError(
            f"order_col {order_col!r} has non-numeric type {ord_type}; "
            "tie-breaking needs a type castable to long"
        )
    value_cols = [c for c in right.columns if c not in (key, ts)]
    overlap = set(value_cols) & set(left.columns)
    if overlap:
        raise ValueError(f"right value columns collide with left: {sorted(overlap)}")
    reserved = {"_side", "_ord", "_m", "_asof_ts"} & (
        set(left.columns) | set(right.columns)
    )
    if reserved:
        raise ValueError(f"inputs carry reserved working columns: {sorted(reserved)}")

    l = left.withColumn("_side", F.lit(1)).withColumn("_ord", F.lit(None).cast("long"))
    r = right.withColumn("_side", F.lit(0)).withColumn(
        "_ord", F.col(order_col).cast("long")
    )
    u = l.unionByName(r, allowMissingColumns=True)
    # backward scans time ascending (last right row at/before left.ts wins);
    # forward scans descending (last right row seen = nearest at/after
    # left.ts). In both, side 0 sorts before side 1 at equal ts (right rows
    # at ts == left.ts ARE visible) and greatest _ord is scanned last among
    # (key, ts) right ties, so last() picks it.
    ts_order = F.col(ts).asc() if direction == "backward" else F.col(ts).desc()
    w = (
        Window.partitionBy(key)
        .orderBy(ts_order, F.col("_side").asc(), F.col("_ord").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # ONE last() over a whole-row struct: per-column last(ignorenulls) would
    # backfill a NULL column of the matched row from an OLDER right row —
    # fabricating a row that never existed. The struct is non-null for every
    # right row even when its members are null, so the match is row-atomic.
    matched = F.last(
        F.when(
            F.col("_side") == 0,
            F.struct(F.col(ts).alias("_asof_ts"), *[F.col(c) for c in value_cols]),
        ),
        ignorenulls=True,
    ).over(w)
    u = u.withColumn("_m", matched)
    out = u.where(F.col("_side") == 1)
    for c in value_cols:
        out = out.withColumn(c, F.col("_m").getField(c))
    out = out.withColumn("_asof_ts", F.col("_m").getField("_asof_ts"))
    return out.drop("_side", "_ord", "_m")
