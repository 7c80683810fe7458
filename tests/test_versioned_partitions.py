"""Dynamic partition overwrite on versioned tables
(io/versioned.overwrite_partitions + cluster_by writes).

The claims under test:

- overwriting the partitions present in the delivery replaces exactly
  those rows — other partitions' files are REFERENCED by path, not
  copied or rewritten;
- under a ``cluster_by=[part_col]`` layout the replaced partitions'
  files are dropped WHOLE (files_rewritten == 0);
- unclustered (straddling) layouts still produce the correct rows via
  a scoped rewrite that keeps NULL-partition rows (SQL three-valued
  logic edge);
- re-delivering the same partition is idempotent;
- date-typed partition columns prune (ISO-string canonicalized stats);
- history is retained (time travel sees the pre-overwrite rows) and
  prior merge-on-read deletes survive a straddle rewrite.
"""

from __future__ import annotations

import datetime

import pytest

from pyspark.sql import functions as F

from aws_etl_project2_fiap_spark.io import versioned as V


def _mk(spark, days, rows_per_day=10, tag="a"):
    return (
        spark.range(0, len(days) * rows_per_day)
        .select(
            F.col("id"),
            F.element_at(
                F.array(*[F.lit(d) for d in days]),
                (F.col("id") % len(days) + 1).cast("int"),
            ).alias("day"),
            F.lit(tag).alias("tag"),
        )
    )


def _days(spark, path):
    return {
        (r["day"], r["tag"])
        for r in V.read_table(spark, path).select("day", "tag").distinct().collect()
    }


def test_clustered_overwrite_drops_whole_files(spark, tmp_path):
    path = str(tmp_path / "t")
    V.create_table(
        _mk(spark, ["d1", "d2", "d3"]), path,
        cluster_by=["day"], num_files=3,
    )
    v1_files = set(V._paths(V._read_manifest(path, 1)["files"]))
    res = V.overwrite_partitions(
        spark, _mk(spark, ["d2"], tag="b"), path, "day"
    )
    assert res["files_rewritten"] == 0  # clustered: whole-file drops
    assert res["files_dropped"] >= 1
    assert res["files_reused"] >= 1
    v2_files = set(V._paths(V._read_manifest(path, 2)["files"]))
    assert v2_files & v1_files  # untouched partitions referenced by path
    assert _days(spark, path) == {("d1", "a"), ("d3", "a"), ("d2", "b")}


def test_overwrite_is_idempotent(spark, tmp_path):
    path = str(tmp_path / "t")
    V.create_table(_mk(spark, ["d1", "d2"]), path, cluster_by=["day"],
                   num_files=2)
    delivery = _mk(spark, ["d1"], tag="b")
    V.overwrite_partitions(spark, delivery, path, "day")
    n1 = V.read_table(spark, path).count()
    V.overwrite_partitions(spark, delivery, path, "day")
    assert V.read_table(spark, path).count() == n1
    assert _days(spark, path) == {("d1", "b"), ("d2", "a")}


def test_unclustered_straddle_rewrite_correct(spark, tmp_path):
    path = str(tmp_path / "t")
    # single file holding every day — overwrite must rewrite it scoped
    V.create_table(_mk(spark, ["d1", "d2", "d3"]).coalesce(1), path)
    res = V.overwrite_partitions(
        spark, _mk(spark, ["d2"], rows_per_day=5, tag="b"), path, "day"
    )
    assert res["files_rewritten"] == 1
    got = V.read_table(spark, path)
    assert got.filter(F.col("day") == "d2").count() == 5
    assert _days(spark, path) == {("d1", "a"), ("d3", "a"), ("d2", "b")}


def test_null_partition_rows_survive_straddle(spark, tmp_path):
    path = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, "d1", "a"), (2, None, "a"), (3, "d2", "a")],
        "id long, day string, tag string",
    )
    V.create_table(df.coalesce(1), path)
    V.overwrite_partitions(
        spark,
        spark.createDataFrame([(9, "d1", "b")], "id long, day string, tag string"),
        path,
        "day",
    )
    rows = {
        (r["id"], r["day"]) for r in V.read_table(spark, path).collect()
    }
    assert rows == {(9, "d1"), (2, None), (3, "d2")}


def test_null_in_delivery_rejected(spark, tmp_path):
    path = str(tmp_path / "t")
    V.create_table(_mk(spark, ["d1"]), path)
    bad = spark.createDataFrame(
        [(1, None, "b")], "id long, day string, tag string"
    )
    with pytest.raises(ValueError, match="NULL"):
        V.overwrite_partitions(spark, bad, path, "day")


def test_date_partition_column_prunes(spark, tmp_path):
    path = str(tmp_path / "t")
    d1, d2 = datetime.date(2024, 1, 1), datetime.date(2024, 1, 2)
    df = spark.createDataFrame(
        [(1, d1, "a"), (2, d2, "a")], "id long, day date, tag string"
    )
    V.create_table(df, path, cluster_by=["day"], num_files=2)
    # ISO-canonicalized stats give date columns real [min,max] entries
    files = V._read_manifest(path, 1)["files"]
    assert any("day" in f.get("stats", {}) for f in files)
    res = V.overwrite_partitions(
        spark,
        spark.createDataFrame([(9, d2, "b")], "id long, day date, tag string"),
        path,
        "day",
    )
    assert res["files_rewritten"] == 0 and res["files_dropped"] == 1
    rows = {(r["id"], r["tag"]) for r in V.read_table(spark, path).collect()}
    assert rows == {(1, "a"), (9, "b")}
    # and the BETWEEN read path prunes on the date column too
    got = V.read_table(spark, path, between=("day", d1, d1))
    assert [r["id"] for r in got.collect()] == [1]


def test_time_travel_and_dv_interaction(spark, tmp_path):
    path = str(tmp_path / "t")
    V.create_table(_mk(spark, ["d1", "d2"]).coalesce(1), path)
    # merge-on-read delete one d1 row, then overwrite d2 (straddle
    # rewrite of the single file must APPLY the DV, not resurrect)
    V.delete_from(spark, path, F.col("id") == 0, mode="dv")
    n_live = V.read_table(spark, path).count()
    V.overwrite_partitions(spark, _mk(spark, ["d2"], tag="b"), path, "day")
    got = V.read_table(spark, path)
    # id 0 was a d1 row; the delivery reuses id 0 for d2 — only the
    # deleted (id=0, d1) row must stay gone after the straddle rewrite
    assert got.filter((F.col("id") == 0) & (F.col("day") == "d1")).count() == 0
    assert got.filter(F.col("day") == "d1").count() == n_live - 10
    assert V.read_table(spark, path, version=1).count() == 20
