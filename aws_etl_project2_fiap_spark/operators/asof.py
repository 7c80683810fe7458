"""As-of (most-recent-prior) join — a custom operator Spark lacks.

Needed for the reference's data shape (1 Hz price ticks × daily
snapshots, SURVEY §2.7/§7.3). Implemented with the union-sort-window
pattern, which is the scalable strategy:

1. tag left ("probe") and right ("quote") rows and union them;
2. one shuffle: window partitioned by the join keys, ordered by event
   time with quotes sorting before probes at equal timestamps;
3. ``last(value, ignorenulls=True)`` carries the latest quote forward;
4. keep probe rows.

Cost: a single hash-partition shuffle + per-partition sort — identical
asymptotics to a sort-merge join, with no range-explosion (a naive
``l.ts >= r.ts`` range join is O(n·m) per key). Skewed keys are handled
by AQE; at 100 TB pre-bucket both sides on the key to skip the shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    suffix: str = "_asof",
    direction: str = "backward",
    tolerance=None,
) -> DataFrame:
    """For each left row, attach the right row's ``value_cols`` from the
    nearest right event within the same ``on`` keys (left outer: no
    candidate → nulls). The pandas ``merge_asof`` surface:

    - ``direction="backward"`` (default): greatest ``right_ts`` <=
      ``left_ts``;
    - ``direction="forward"``: smallest ``right_ts`` >= ``left_ts`` —
      same plan with the sort order reversed;
    - ``tolerance``: maximum allowed |left_ts − right_ts| (same units as
      the ts columns — use ns longs for exactness); matches further away
      resolve to null. Applied as a post-filter on the carried ts, so
      the single-shuffle plan is unchanged.
    """
    if direction not in {"backward", "forward"}:
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    ts = "__asof_ts"
    side = "__asof_side"  # 0 = quote (right), 1 = probe (left)
    l_tag = left.withColumn(ts, F.col(left_ts)).withColumn(side, F.lit(1))
    r_tag = right.select(
        *on, F.col(right_ts).alias(ts), *[F.col(c) for c in value_cols]
    ).withColumn(side, F.lit(0))

    left_cols = [c for c in left.columns]
    merged = l_tag.unionByName(r_tag, allowMissingColumns=True)

    # backward: scan forward in time, quotes before probes at equal ts.
    # forward: scan backward in time (desc), so "last seen quote" is the
    # next-upcoming one; quotes still win ties.
    order = (
        [F.col(ts).asc(), F.col(side).asc()]
        if direction == "backward"
        else [F.col(ts).desc(), F.col(side).asc()]
    )
    w = (
        Window.partitionBy(*on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    quote_ts = "__asof_quote_ts"
    carried = [
        F.last(F.when(F.col(side) == 0, F.col(c)), ignorenulls=True)
        .over(w)
        .alias(c + suffix)
        for c in value_cols
    ] + [
        F.last(F.when(F.col(side) == 0, F.col(ts)), ignorenulls=True)
        .over(w)
        .alias(quote_ts)
    ]
    out = merged.select(*merged.columns, *carried).filter(F.col(side) == 1)
    if tolerance is not None:
        in_range = F.abs(F.col(ts) - F.col(quote_ts)) <= tolerance
        out = out.select(
            *left_cols,
            F.col(quote_ts),
            *[
                F.when(in_range, F.col(c + suffix)).alias(c + suffix)
                for c in value_cols
            ],
        )
    return out.select(*left_cols, *[c + suffix for c in value_cols])
