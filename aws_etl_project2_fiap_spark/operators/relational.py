"""Relational operator helpers — the join/set surface (SURVEY §2.7).

The reference has zero joins; this module is the parity-completing
surface. Thin by design: Spark's joins are already right, the value here
is encoding the *scale decisions* (broadcast thresholds, semi/anti
idioms) in one place.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def broadcast_join(
    big: DataFrame, small: DataFrame, on, how: str = "inner"
) -> DataFrame:
    """Dimension join with an explicit broadcast hint: no shuffle of the
    big side — the only sane plan for star-schema dims at 100 TB."""
    return big.join(F.broadcast(small), on, how)


def semi_join(left: DataFrame, right: DataFrame, on) -> DataFrame:
    """EXISTS: keep left rows with a match; never duplicates left rows."""
    return left.join(right, on, "left_semi")


def anti_join(left: DataFrame, right: DataFrame, on) -> DataFrame:
    """NOT EXISTS: keep left rows without a match."""
    return left.join(right, on, "left_anti")


def dedup_exact_rows(df: DataFrame, subset: list[str] | None = None) -> DataFrame:
    """DISTINCT / dropDuplicates — hash-shuffle on the subset columns."""
    return df.dropDuplicates(subset) if subset else df.distinct()
