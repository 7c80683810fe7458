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


def test_aqe_skew_join_split_engages(spark):
    """The SCALE.md claim "AQE splits skewed joins at runtime" must be
    demonstrable, not aspirational: under a skewed sort-merge join with
    the advisory/threshold sizes forced low, the FINAL adaptive plan
    must carry a skew=true SortMergeJoin. (AQE plans exist only after
    execution, hence the collect-then-explain order.)"""
    confs = {
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "8KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        # left: 95% of rows on one key; right: uniform match table
        left = spark.range(0, 200_000).select(
            F.when(F.col("id") % 20 != 0, F.lit(7)).otherwise(
                F.col("id") % 1000
            ).alias("k"),
            F.col("id").alias("payload"),
        )
        right = spark.range(0, 1000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("r")
        )
        joined = left.join(right, "k")
        # collect(), not count(): count() wraps the plan in a NEW query
        # execution, leaving joined's own plan un-executed
        # (isFinalPlan=false) with no skew annotation to observe
        assert len(joined.collect()) == 200_000
        final_plan = joined._sc._jvm.PythonSQLUtils.explainString(
            joined._jdf.queryExecution(), "simple"
        )
        assert "isFinalPlan=true" in final_plan
        assert "skew=true" in final_plan, final_plan
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
