"""Compaction job: inventory finds fragmented partitions, rewrite merges
them without touching healthy partitions' files."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from aws_etl_project2_fiap_spark.io.compact import compact_partitions, plan_compaction


def _fragmented_table(spark, root: str) -> None:
    # partition a: 5 tiny files (fragmented); partition b: 1 file (healthy)
    for i in range(5):
        spark.createDataFrame([(i, "a")], ["id", "grp"]).coalesce(1).write.mode(
            "append"
        ).partitionBy("grp").parquet(root)
    spark.createDataFrame([(99, "b")], ["id", "grp"]).coalesce(1).write.mode(
        "append"
    ).partitionBy("grp").parquet(root)


def test_plan_flags_only_fragmented(spark, tmp_path):
    root = str(tmp_path / "tbl")
    _fragmented_table(spark, root)
    plan = plan_compaction(spark, root, ["grp"]).collect()
    assert [r.grp for r in plan] == ["a"]
    assert plan[0].n_files == 5


def test_compact_merges_and_preserves_rows(spark, tmp_path):
    root = str(tmp_path / "tbl")
    _fragmented_table(spark, root)
    b_files_before = set(glob.glob(f"{root}/grp=b/*.parquet"))

    n = compact_partitions(spark, root, ["grp"])
    assert n == 1

    back = spark.read.parquet(root)
    assert back.count() == 6
    assert sorted(r.id for r in back.filter(F.col("grp") == "a").collect()) == [0, 1, 2, 3, 4]
    # partition a merged to a single file; partition b untouched
    assert len(glob.glob(f"{root}/grp=a/*.parquet")) == 1
    assert set(glob.glob(f"{root}/grp=b/*.parquet")) == b_files_before
    # idempotent: nothing left to do
    assert compact_partitions(spark, root, ["grp"]) == 0
