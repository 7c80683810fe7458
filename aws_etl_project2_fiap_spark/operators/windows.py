"""Window-function operators (SURVEY §2.8).

The reference has no window functions; these are the idiomatic patterns
its data shape implies (daily snapshots + tick streams): day-over-day
deltas, dedup-keep-latest, running totals, per-group top-n,
sessionization. Each is one hash-partition shuffle on its keys; windows
over the same (keys, order) share the shuffle in one plan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, WindowSpec
from pyspark.sql import functions as F


def by_key_ordered(keys: list[str], order: list[Column | str]) -> WindowSpec:
    return Window.partitionBy(*keys).orderBy(*order)


def lag_delta(
    df: DataFrame, keys: list[str], order: list, value_col: str, out_col: str = "delta"
) -> DataFrame:
    """Day-over-day (tick-over-tick) delta via lag."""
    w = by_key_ordered(keys, order)
    return df.withColumn(out_col, F.col(value_col) - F.lag(value_col).over(w))


def running_sum(
    df: DataFrame, keys: list[str], order: list, value_col: str, out_col: str = "rsum"
) -> DataFrame:
    w = by_key_ordered(keys, order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.withColumn(out_col, F.sum(value_col).over(w))


def top_n_per_group(
    df: DataFrame, keys: list[str], order: list, n: int, rank_col: str = "rnk"
) -> DataFrame:
    """Per-group top-n via row_number (deterministic when ``order`` ends
    with a unique key)."""
    w = by_key_ordered(keys, order)
    return df.withColumn(rank_col, F.row_number().over(w)).filter(
        F.col(rank_col) <= n
    )


def sessionize(
    df: DataFrame,
    key: str,
    ts_col: str,
    gap_minutes: int = 30,
    session_col: str = "session_id",
) -> DataFrame:
    """Gap-based sessionization: a new session starts when the time since
    the previous event exceeds the gap; session id = running count of
    session starts per key. Two stacked windows, one shuffle."""
    w = Window.partitionBy(key).orderBy(F.col(ts_col).asc())
    gap = F.col(ts_col).cast("double") - F.lag(F.col(ts_col).cast("double")).over(w)
    is_new = F.when(
        gap.isNull() | (gap > gap_minutes * 60), F.lit(1)
    ).otherwise(F.lit(0))
    return df.withColumn("__new", is_new).withColumn(
        session_col,
        F.sum("__new").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    ).drop("__new")


def autoincrement_id(df: DataFrame, order: list, id_col: str = "id") -> DataFrame:
    """K4's AUTOINCREMENT emulation — dense ids in a defined order.
    Single-partition window: only for driver-scale frames; at scale use
    (partition-key, row_number) compound identity."""
    return df.withColumn(id_col, F.row_number().over(Window.orderBy(*order)))
