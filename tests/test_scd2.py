"""SCD2 history build + incremental merge (io/scd.py)."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from aws_etl_project2_fiap_spark.io.scd import scd2_merge, scd2_snapshot


def _hist_set(df):
    return {
        (
            r["user_id"],
            r["event_type"],
            r["valid_from"].isoformat(),
            r["valid_to"].isoformat() if r["valid_to"] else None,
        )
        for r in df.collect()
    }


def test_snapshot_collapses_runs_and_null_terminates(spark):
    rows = [
        (1, datetime(2024, 1, 1, 0), 100, "a"),
        (1, datetime(2024, 1, 1, 1), 101, "a"),  # same run — collapsed
        (1, datetime(2024, 1, 1, 2), 102, "b"),
        (1, datetime(2024, 1, 1, 3), 103, "a"),  # value returns — NEW version
        (2, datetime(2024, 1, 1, 0), 200, "x"),
    ]
    df = spark.createDataFrame(
        rows, "user_id: long, ts: timestamp, event_id: long, event_type: string"
    )
    got = _hist_set(
        scd2_snapshot(df, "user_id", "ts", "event_type", tiebreak="event_id")
    )
    assert got == {
        (1, "a", "2024-01-01T00:00:00", "2024-01-01T02:00:00"),
        (1, "b", "2024-01-01T02:00:00", "2024-01-01T03:00:00"),
        (1, "a", "2024-01-01T03:00:00", None),
        (2, "x", "2024-01-01T00:00:00", None),
    }


def test_merge_in_batches_equals_one_shot(spark, tmp_path):
    ev = (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .select("user_id", "ts", "event_id", "event_type")
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    one_shot = {
        (r["user_id"], r["event_type"], r["valid_from"], r["valid_to"])
        for r in scd2_snapshot(
            ev, "user_id", "ts", "event_type", tiebreak="event_id"
        ).collect()
    }

    path = str(tmp_path / "scd2")
    cut = ev.agg(F.expr("percentile(cast(ts as double), 0.5)")).collect()[0][0]
    from pyspark.sql.functions import col, lit

    batches = [
        ev.filter(col("ts").cast("double") <= lit(cut)),
        # second batch split again — three merges total
        ev.filter(
            (col("ts").cast("double") > lit(cut)) & (col("user_id") % 2 == 0)
        ),
        ev.filter(
            (col("ts").cast("double") > lit(cut)) & (col("user_id") % 2 != 0)
        ),
    ]
    for b in batches:
        scd2_merge(spark, path, b, "user_id", "ts", "event_type")
    merged = {
        (r["user_id"], r["event_type"], r["valid_from"], r["valid_to"])
        for r in spark.read.parquet(path).collect()
    }
    assert merged == one_shot


def test_merge_untouched_keys_pass_through(spark, tmp_path):
    rows1 = [
        (1, datetime(2024, 1, 1, 0), "a"),
        (2, datetime(2024, 1, 1, 0), "x"),
    ]
    rows2 = [(1, datetime(2024, 1, 2, 0), "b")]  # only key 1 changes
    path = str(tmp_path / "scd2")
    df1 = spark.createDataFrame(rows1, "user_id: long, ts: timestamp, event_type: string")
    df2 = spark.createDataFrame(rows2, "user_id: long, ts: timestamp, event_type: string")
    scd2_merge(spark, path, df1, "user_id", "ts", "event_type")
    scd2_merge(spark, path, df2, "user_id", "ts", "event_type")
    got = _hist_set(spark.read.parquet(path))
    assert got == {
        (1, "a", "2024-01-01T00:00:00", "2024-01-02T00:00:00"),
        (1, "b", "2024-01-02T00:00:00", None),
        (2, "x", "2024-01-01T00:00:00", None),
    }
