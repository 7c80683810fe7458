"""Bucketized range join: points ⋈ intervals without a cross product.

Spark plans a plain non-equi condition (``p.ts BETWEEN i.lo AND i.hi``)
as BroadcastNestedLoopJoin — O(points × intervals), a cluster-killer.
The scale pattern (used by every warehouse that offers native range
joins) is binning: quantize the domain into fixed-width bins, explode
each interval into the bins it covers, join points to intervals on the
bin EQUI-key, then re-check the exact predicate. Cost:
O(points + intervals × bins_per_interval + true_matches).

Bin width tunes the tradeoff: narrow bins → more interval replication,
fewer false candidates; wide bins → the reverse. Start near the median
interval length.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BIN = "__bin"


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bin_width: int,
    extra_on: list[str] | None = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-bin + exact-filter range join.

    ``points[point_col]`` ∈ [lo, hi] (inclusive), numeric domain (use
    epoch numbers for timestamps — nanoseconds keep both sides exact).
    ``extra_on`` adds equality keys (e.g. user_id) that co-partition the
    join further. Intervals spanning many bins replicate per bin —
    that's the deliberate, bounded cost (sequence length = span/width).
    """
    if how != "inner":
        raise ValueError(
            f"range_join supports how='inner' only (got {how!r}): the exact "
            "post-filter would silently drop outer rows' null-extended matches"
        )
    on = extra_on or []
    p = points.withColumn(BIN, (F.col(point_col) / bin_width).cast("long"))
    i = intervals.withColumn(
        BIN,
        F.explode(
            F.sequence(
                (F.col(lo_col) / bin_width).cast("long"),
                (F.col(hi_col) / bin_width).cast("long"),
            )
        ),
    )
    exact: Column = (F.col(point_col) >= F.col(lo_col)) & (
        F.col(point_col) <= F.col(hi_col)
    )
    return p.join(i, [*on, BIN], how).filter(exact).drop(BIN)
