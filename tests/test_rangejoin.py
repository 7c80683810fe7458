"""Bucketized range join: equivalence to the naive non-equi join, and
the plan stays an equi-join (no nested-loop explosion)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from aws_etl_project2_fiap_spark.operators.rangejoin import range_join


def _data(spark):
    points = spark.createDataFrame(
        [(i, i * 7 % 100) for i in range(200)], ["pid", "x"]
    )
    intervals = spark.createDataFrame(
        [(0, 5, 20), (1, 18, 40), (2, 90, 99), (3, 150, 160)],
        ["iid", "lo", "hi"],
    )
    return points, intervals


@pytest.mark.slow  # quadratic-reference differential replay (r13)
def test_range_join_matches_naive(spark):
    points, intervals = _data(spark)
    naive = sorted(
        (r.pid, r.iid)
        for r in points.join(
            intervals, (F.col("x") >= F.col("lo")) & (F.col("x") <= F.col("hi"))
        ).collect()
    )
    binned = sorted(
        (r.pid, r.iid)
        for r in range_join(points, intervals, "x", "lo", "hi", bin_width=8).collect()
    )
    assert binned == naive
    assert len(binned) > 0
    # empty-range interval (150..160, no point) contributes nothing
    assert all(iid != 3 for _, iid in binned)


def test_range_join_plans_as_equi_join(spark):
    points, intervals = _data(spark)
    joined = range_join(points, intervals, "x", "lo", "hi", bin_width=8)
    p = joined._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p


def test_range_join_with_extra_key(spark):
    points = spark.createDataFrame(
        [(1, "u1", 10), (2, "u1", 30), (3, "u2", 10)], ["pid", "user", "x"]
    )
    intervals = spark.createDataFrame(
        [(100, "u1", 5, 15), (200, "u2", 5, 15)], ["iid", "user", "lo", "hi"]
    )
    got = sorted(
        (r.pid, r.iid)
        for r in range_join(
            points, intervals, "x", "lo", "hi", bin_width=4, extra_on=["user"]
        ).collect()
    )
    assert got == [(1, 100), (3, 200)]  # user co-key separates the matches


def test_range_join_rejects_outer(spark):
    import pytest as _pytest

    points, intervals = _data(spark)
    with _pytest.raises(ValueError, match="inner"):
        range_join(points, intervals, "x", "lo", "hi", bin_width=8, how="left")


def test_resample_ffill_fills_gaps_and_respects_boundaries(spark):
    from datetime import datetime

    from aws_etl_project2_fiap_spark.operators.windows import resample_ffill
    from pyspark.sql import functions as F

    rows = [
        (1, datetime(2024, 1, 1, 0, 30), 10.0, 100),
        (1, datetime(2024, 1, 1, 3, 0), 30.0, 101),   # exactly on the grid
        (1, datetime(2024, 1, 1, 5, 45), 55.0, 102),
        (2, datetime(2024, 1, 1, 1, 15), 7.0, 200),
    ]
    df = spark.createDataFrame(
        rows, "user_id: long, ts: timestamp, value: double, event_id: long"
    )
    out = {
        (r["user_id"], r["ts"].isoformat()): r["value"]
        for r in resample_ffill(
            df, "user_id", "ts", "value", tiebreak_col="event_id"
        ).collect()
    }
    # user 1: grid from 00:00 (trunc of 00:30) to 05:45 → 00:00..05:00
    assert out[(1, "2024-01-01T00:00:00")] is None      # before first obs
    assert out[(1, "2024-01-01T01:00:00")] == 10.0      # carried forward
    assert out[(1, "2024-01-01T02:00:00")] == 10.0      # gap > step
    assert out[(1, "2024-01-01T03:00:00")] == 30.0      # boundary obs visible
    assert out[(1, "2024-01-01T05:00:00")] == 30.0
    assert (1, "2024-01-01T06:00:00") not in out        # past the range
    # user 2: single observation → single grid point at 01:00, pre-obs
    assert out[(2, "2024-01-01T01:00:00")] is None
