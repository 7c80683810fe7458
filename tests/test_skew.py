"""Salting rewrites preserve semantics (compared against unsalted plans
on data with a deliberately hot key)."""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_etl_project2_fiap_spark.operators.skew import (
    SALT,
    salted_agg,
    salted_join,
    with_salt,
)


def _skewed(spark):
    # key "hot" carries 90% of rows
    hot = spark.range(0, 900).select(
        F.lit("hot").alias("k"), (F.col("id") % 7).cast("double").alias("v")
    )
    cold = spark.range(0, 100).select(
        F.concat(F.lit("c"), (F.col("id") % 10)).alias("k"),
        (F.col("id") % 5).cast("double").alias("v"),
    )
    return hot.unionByName(cold)


def test_salt_is_deterministic_and_bounded(spark):
    df = with_salt(_skewed(spark), 8)
    salts = df.select(SALT).distinct().collect()
    assert all(0 <= r[0] < 8 for r in salts)
    a = df.orderBy("k", "v", SALT).collect()
    b = with_salt(_skewed(spark), 8).orderBy("k", "v", SALT).collect()
    assert a == b
    # the hot key actually spreads across salts
    hot_salts = df.filter(F.col("k") == "hot").select(SALT).distinct().count()
    assert hot_salts >= 4


def test_salted_agg_matches_unsalted(spark):
    df = _skewed(spark)
    plain = {
        (r.k): (r.n, r.s, round(r.a, 6))
        for r in df.groupBy("k")
        .agg(
            F.count("v").alias("n"),
            F.sum("v").alias("s"),
            F.avg("v").alias("a"),
        )
        .collect()
    }
    salted = salted_agg(
        df,
        keys=["k"],
        partial={"pn": F.count("v"), "ps": F.sum("v")},
        final=lambda p: p.groupBy("k").agg(
            F.sum("pn").alias("n"),
            F.sum("ps").alias("s"),
            (F.sum("ps") / F.sum("pn")).alias("a"),
        ),
    )
    got = {r.k: (r.n, r.s, round(r.a, 6)) for r in salted.collect()}
    assert got == plain


def test_salted_join_matches_unsalted(spark):
    left = _skewed(spark)
    right = spark.createDataFrame(
        [("hot", 1.5), ("c1", 2.0), ("c9", 3.0)], ["k", "w"]
    )
    plain = sorted(
        (r.k, r.v, r.w) for r in left.join(right, ["k"]).collect()
    )
    salted = sorted(
        (r.k, r.v, r.w) for r in salted_join(left, right, ["k"], n_salts=8).collect()
    )
    assert salted == plain
    assert len(salted) == 900 + 10 + 10  # hot + c1 + c9 matches


def test_salted_join_rejects_right_outer(spark):
    import pytest as _pytest

    left = _skewed(spark)
    right = spark.createDataFrame([("hot", 1.0)], ["k", "w"])
    with _pytest.raises(ValueError, match="salted_join cannot preserve"):
        salted_join(left, right, ["k"], how="full")


def test_identical_duplicate_rows_still_spread(spark):
    """The archetypal hot key: byte-identical rows must NOT all land on
    one salt (content hash alone would send them to a single reducer)."""
    import pyspark.sql.functions as F2

    dup = spark.range(0, 1000).select(
        F2.lit("hot").alias("k"), F2.lit(1.0).alias("v")
    )
    n = with_salt(dup, 8).select(SALT).distinct().count()
    assert n >= 4
