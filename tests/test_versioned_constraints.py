"""CHECK constraints on versioned tables (io/versioned.py
add_constraint / _enforce_constraints — the Delta ADD CONSTRAINT
shape).

The claims under test:

- every write path (append / overwrite / partition overwrite / merge /
  update) validates its DELTA in one aggregation pass and commits
  NOTHING on violation;
- SQL CHECK semantics: a NULL-evaluating expression passes (unknown is
  not a violation), unlike the stricter expectations gate;
- add_constraint validates existing data first — a constraint can
  never be born broken;
- the streaming versioned_sink quarantines constraint-violating
  batches instead of failing the stream.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from aws_etl_project2_fiap_spark.io import versioned as V


@pytest.fixture()
def table(spark, tmp_path):
    df = spark.range(0, 100).select(
        F.col("id"), (F.col("id") * 1.0).alias("v")
    )
    path = str(tmp_path / "t")
    V.create_table(df, path, constraints={"v_nonneg": "v >= 0"})
    return path


def test_create_rejects_broken_constraint(spark, tmp_path):
    df = spark.createDataFrame([(1, -5.0)], "id long, v double")
    path = str(tmp_path / "bad")
    with pytest.raises(V.ConstraintViolation, match="v_nonneg"):
        V.create_table(df, path, constraints={"v_nonneg": "v >= 0"})
    # nothing committed, and the table can be created cleanly after
    assert not __import__("os").path.exists(V._pointer(path))


def test_append_enforces_and_commits_nothing(spark, table):
    bad = spark.createDataFrame([(200, -1.0)], "id long, v double")
    v_before = V.current_version(table)
    with pytest.raises(V.ConstraintViolation):
        V.append_table(bad, table)
    assert V.current_version(table) == v_before
    assert V.read_table(spark, table).count() == 100


def test_update_enforces_on_rewritten_slice(spark, table):
    with pytest.raises(V.ConstraintViolation):
        V.update_table(
            spark, table, {"v": F.lit(-9.0)}, F.col("id") < 10
        )
    assert V.read_table(spark, table).filter(F.col("v") < 0).count() == 0


def test_merge_enforces_on_merged_batch(spark, table):
    src = spark.createDataFrame([(5, -2.0)], "id long, v double")
    with pytest.raises(V.ConstraintViolation):
        V.merge_table(spark, table, src, keys=["id"])
    assert V.read_table(spark, table).filter(F.col("v") < 0).count() == 0


def test_overwrite_partitions_enforces_delivery(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "d1", 1.0), (2, "d2", 2.0)], "id long, day string, v double"
    )
    path = str(tmp_path / "p")
    V.create_table(df, path, constraints={"v_nonneg": "v >= 0"})
    bad = spark.createDataFrame([(9, "d1", -1.0)], "id long, day string, v double")
    with pytest.raises(V.ConstraintViolation):
        V.overwrite_partitions(spark, bad, path, "day")
    assert V.read_table(spark, path).count() == 2


def test_null_expression_passes_sql_check_semantics(spark, table):
    # v IS NULL → "v >= 0" evaluates NULL → passes, as in SQL CHECK
    ok = spark.createDataFrame([(300, None)], "id long, v double")
    V.append_table(ok, table)
    assert V.read_table(spark, table).count() == 101


def test_add_constraint_validates_existing_data(spark, table):
    with pytest.raises(V.ConstraintViolation):
        V.add_constraint(spark, table, "id_small", "id < 50")
    assert "id_small" not in V.table_constraints(table)
    V.add_constraint(spark, table, "id_bounded", "id < 1000")
    assert "id_bounded" in V.table_constraints(table)
    # and it enforces from now on
    with pytest.raises(V.ConstraintViolation):
        V.append_table(
            spark.createDataFrame([(5000, 1.0)], "id long, v double"), table
        )
    V.drop_constraint(table, "id_bounded")
    V.append_table(
        spark.createDataFrame([(5000, 1.0)], "id long, v double"), table
    )


def test_sink_quarantines_violating_batch(spark, tmp_path):
    import os

    from aws_etl_project2_fiap_spark.streaming.sinks import versioned_sink

    src_dir = str(tmp_path / "arrivals")
    os.makedirs(src_dir)
    table_path = str(tmp_path / "tbl")
    qdir = str(tmp_path / "quarantine")
    V.create_table(
        spark.createDataFrame([(1, 1.0)], "id long, v double"),
        table_path,
        constraints={"v_nonneg": "v >= 0"},
    )
    spark.createDataFrame(
        [(2, -7.0)], "id long, v double"
    ).write.mode("overwrite").parquet(os.path.join(src_dir, "b1"))
    stream = (
        spark.readStream.schema("id long, v double")
        .parquet(src_dir + "/*")
    )
    q = versioned_sink(
        stream,
        table_path,
        checkpoint=str(tmp_path / "ckpt"),
        quarantine_path=qdir,
    )
    q.awaitTermination(120)
    assert V.read_table(spark, table_path).count() == 1  # nothing landed
    quarantined = spark.read.parquet(qdir + "/*")
    assert quarantined.count() == 1 and quarantined.collect()[0]["v"] == -7.0
