"""Incremental rollup maintenance (io/rollup.py)."""

from __future__ import annotations

import os
from pathlib import Path

from pyspark.sql import functions as F

from aws_etl_project2_fiap_spark.io.rollup import incremental_rollup, init_rollup

SF = "/root/testdata/sf0.001"


def _orders(spark):
    return spark.read.parquet(f"{SF}/orders.parquet").withColumn(
        "om", F.date_format("o_orderdate", "yyyy-MM")
    )


AGGS = {
    "n_orders": ("count", None),
    "revenue": ("sum", "o_totalprice"),
    "max_price": ("max", "o_totalprice"),
}


def _full_recompute(o):
    return {
        (r["om"], r["o_orderpriority"]): (r["n_orders"], round(r["revenue"], 2), r["max_price"])
        for r in o.groupBy("om", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("o_totalprice").alias("revenue"),
            F.max("o_totalprice").alias("max_price"),
        )
        .collect()
    }


def _partition_files(path: str) -> dict[str, set[tuple[str, float]]]:
    out: dict[str, set[tuple[str, float]]] = {}
    for part_dir in Path(path).glob("om=*"):
        out[part_dir.name] = {
            (f.name, os.stat(f).st_mtime) for f in part_dir.glob("*.parquet")
        }
    return out


def test_incremental_equals_full_and_leaves_history_untouched(spark, tmp_path):
    o = _orders(spark)
    rollup = str(tmp_path / "rollup")
    init_rollup(o.filter(F.col("om") < "1998-01"), rollup, "om", ["o_orderpriority"], AGGS)
    before = _partition_files(rollup)

    affected = incremental_rollup(
        spark, o.filter(F.col("om") >= "1998-01"), rollup, "om", ["o_orderpriority"], AGGS
    )
    assert affected and all(a >= "1998-01" for a in affected)

    after = _partition_files(rollup)
    untouched = {k: v for k, v in before.items() if k.split("=", 1)[1] not in affected}
    for part, files in untouched.items():
        assert after[part] == files, f"history partition {part} was rewritten"

    got = {
        (r["om"], r["o_orderpriority"]): (r["n_orders"], round(r["revenue"], 2), r["max_price"])
        for r in spark.read.parquet(rollup).collect()
    }
    assert got == _full_recompute(o)


def test_fold_into_existing_partition_merges(spark, tmp_path):
    # a delta landing in an ALREADY-ROLLED-UP month must merge, not append
    o = _orders(spark)
    rollup = str(tmp_path / "rollup")
    some_month = o.agg(F.max("om")).collect()[0][0]
    in_month = o.filter(F.col("om") == some_month)
    half1 = in_month.filter(F.col("o_orderkey") % 2 == 0)
    half2 = in_month.filter(F.col("o_orderkey") % 2 != 0)

    init_rollup(half1, rollup, "om", ["o_orderpriority"], AGGS)
    incremental_rollup(spark, half2, rollup, "om", ["o_orderpriority"], AGGS)

    got = {
        (r["om"], r["o_orderpriority"]): (r["n_orders"], round(r["revenue"], 2), r["max_price"])
        for r in spark.read.parquet(rollup).collect()
    }
    assert got == _full_recompute(in_month)


def test_empty_delta_is_a_noop(spark, tmp_path):
    o = _orders(spark)
    rollup = str(tmp_path / "rollup")
    init_rollup(o, rollup, "om", ["o_orderpriority"], AGGS)
    before = _partition_files(rollup)
    assert incremental_rollup(
        spark, o.filter(F.lit(False)), rollup, "om", ["o_orderpriority"], AGGS
    ) == []
    assert _partition_files(rollup) == before


# -- mergeable HLL sketches (kind "approx_distinct") -------------------

HLL_AGGS = {
    "n_orders": ("count", None),
    "n_cust": ("approx_distinct", "o_custkey"),
}


def test_hll_incremental_equals_full_recompute_exactly(spark, tmp_path):
    # sketch union is associative/commutative/idempotent → the folded
    # rollup's ESTIMATES are bit-identical to a from-scratch rollup's
    from aws_etl_project2_fiap_spark.io.rollup import finalize_rollup

    o = _orders(spark)
    inc_path = str(tmp_path / "inc")
    full_path = str(tmp_path / "full")
    init_rollup(
        o.filter(F.col("om") < "1997-01"), inc_path, "om",
        ["o_orderpriority"], HLL_AGGS,
    )
    incremental_rollup(
        spark, o.filter(F.col("om") >= "1997-01"), inc_path, "om",
        ["o_orderpriority"], HLL_AGGS,
    )
    init_rollup(o, full_path, "om", ["o_orderpriority"], HLL_AGGS)

    def estimates(path):
        df = finalize_rollup(spark.read.parquet(path), HLL_AGGS)
        return {
            (r["om"], r["o_orderpriority"]): (r["n_orders"], r["n_cust"])
            for r in df.collect()
        }

    assert estimates(inc_path) == estimates(full_path)


def test_hll_overlapping_redelivery_does_not_double_count(spark, tmp_path):
    # the same batch folded twice: counts inflate (documented: count is
    # a sum) but the DISTINCT estimate is idempotent — union of a set
    # with itself
    from aws_etl_project2_fiap_spark.io.rollup import finalize_rollup

    o = _orders(spark)
    some_month = o.agg(F.max("om")).collect()[0][0]
    batch = o.filter(F.col("om") == some_month)
    path = str(tmp_path / "r")
    init_rollup(batch, path, "om", ["o_orderpriority"], HLL_AGGS)
    first = {
        (r["om"], r["o_orderpriority"]): r["n_cust"]
        for r in finalize_rollup(
            spark.read.parquet(path), HLL_AGGS
        ).collect()
    }
    incremental_rollup(spark, batch, path, "om", ["o_orderpriority"], HLL_AGGS)
    again = {
        (r["om"], r["o_orderpriority"]): r["n_cust"]
        for r in finalize_rollup(
            spark.read.parquet(path), HLL_AGGS
        ).collect()
    }
    assert first == again


def test_hll_estimate_close_to_exact(spark, tmp_path):
    from aws_etl_project2_fiap_spark.io.rollup import finalize_rollup

    o = _orders(spark)
    path = str(tmp_path / "r")
    init_rollup(o, path, "om", [], HLL_AGGS)
    got = {
        r["om"]: r["n_cust"]
        for r in finalize_rollup(spark.read.parquet(path), HLL_AGGS).collect()
    }
    exact = {
        r["om"]: r["n"]
        for r in o.groupBy("om")
        .agg(F.countDistinct("o_custkey").alias("n"))
        .collect()
    }
    assert got.keys() == exact.keys()
    for k in exact:
        # lgK=12 → ~1.6% rse; allow 5 sigma plus small-count slack
        assert abs(got[k] - exact[k]) <= max(5, 0.08 * exact[k]), (
            k, got[k], exact[k],
        )
