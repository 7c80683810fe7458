"""Bucketized range join: equivalence to the naive non-equi join, and
the plan stays an equi-join (no nested-loop explosion)."""

from __future__ import annotations

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
