"""Versioned table as a streaming source
(streaming/table_source.VersionedTableDataSource).

The claims under test:

- the first micro-batch delivers the full snapshot, later batches
  deliver ONLY the rows appended since the committed offset (the
  table version IS the offset);
- a deletion-vector DELETE commit delivers nothing (insert feed), and
  a snapshot read through the source applies DVs;
- batch mode reads any version (time travel through the source);
- metadata-only aggregates (table_count / table_column_minmax) answer
  from the manifest without a Spark job and stay DV-exact.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from aws_etl_project2_fiap_spark.io import versioned as V
from aws_etl_project2_fiap_spark.streaming.table_source import (
    VersionedTableDataSource,
)


@pytest.fixture()
def table(spark, tmp_path):
    df = spark.range(0, 50).select(
        F.col("id"), (F.col("id") * 1.0).alias("v")
    )
    path = str(tmp_path / "tbl")
    V.create_table(df, path)
    spark.dataSource.register(VersionedTableDataSource)
    return path


def _run_stream(spark, path, ckpt, out_dir):
    """One availableNow pass into a parquet sink (memory sinks can't
    resume from a checkpoint); returns the rows of THIS run only."""
    import glob

    before = set(glob.glob(f"{out_dir}/*.parquet"))
    q = (
        spark.readStream.format("versioned_table")
        .option("path", path)
        .load()
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    fresh = [
        f
        for f in set(glob.glob(f"{out_dir}/*.parquet")) - before
    ]
    if not fresh:
        return spark.createDataFrame([], "id long, v double")
    return spark.read.parquet(*fresh)


def test_snapshot_then_deltas(spark, table, tmp_path):
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    got = _run_stream(spark, table, ckpt, out)
    assert got.count() == 50  # first batch = full snapshot
    V.append_table(
        spark.range(50, 60).select(
            F.col("id"), (F.col("id") * 1.0).alias("v")
        ),
        table,
    )
    got = _run_stream(spark, table, ckpt, out)
    # same checkpoint: only the appended rows arrive
    assert sorted(r["id"] for r in got.collect()) == list(range(50, 60))


def test_dv_delete_delivers_nothing_but_filters_snapshot(
    spark, table, tmp_path
):
    V.delete_from(spark, table, F.col("id") < 5, mode="dv")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    got = _run_stream(spark, table, ckpt, out)
    # snapshot through the source applies the DV
    assert got.count() == 45
    V.delete_from(spark, table, F.col("id") < 10, mode="dv")
    got = _run_stream(spark, table, ckpt, out)
    assert got.count() == 0  # delete-only commit: insert feed is empty


def test_batch_mode_time_travel(spark, table):
    V.append_table(
        spark.range(50, 60).select(
            F.col("id"), (F.col("id") * 1.0).alias("v")
        ),
        table,
    )
    cur = (
        spark.read.format("versioned_table").option("path", table).load()
    )
    old = (
        spark.read.format("versioned_table")
        .option("path", table)
        .option("version", "1")
        .load()
    )
    assert cur.count() == 60 and old.count() == 50


def test_metadata_only_aggregates(spark, table):
    assert V.table_count(table) == 50
    assert V.table_column_minmax(table, "id") == (0, 49)
    V.delete_from(spark, table, F.col("id") < 7, mode="dv")
    assert V.table_count(table) == 43  # DV-exact without a scan
    assert V.table_count(table, version=1) == 50
    lo, hi = V.table_column_minmax(table, "v")
    assert lo == 0.0 and hi == 49.0


def test_enriched_versioned_sink_sees_dim_updates(spark, tmp_path):
    """Stream-static enrich re-resolves the dimension snapshot per
    batch: an SCD correction committed between batches changes the
    NEXT batch's join, and the output lands exactly-once."""
    import os

    from aws_etl_project2_fiap_spark.streaming.sinks import (
        enriched_versioned_sink,
    )

    dim_path = str(tmp_path / "dim")
    out_path = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    src_dir = str(tmp_path / "arrivals")
    os.makedirs(src_dir)
    V.create_table(
        spark.createDataFrame(
            [(1, "bronze"), (2, "silver")], "cust long, tier string"
        ),
        dim_path,
    )

    def deliver(batch_rows, subdir):
        spark.createDataFrame(
            batch_rows, "cust long, amount double"
        ).write.mode("overwrite").parquet(os.path.join(src_dir, subdir))

    def run():
        stream = spark.readStream.schema(
            "cust long, amount double"
        ).parquet(src_dir + "/*")
        q = enriched_versioned_sink(
            stream, dim_path, ["cust"], out_path, ckpt
        )
        q.awaitTermination(120)

    deliver([(1, 10.0), (2, 20.0)], "b1")
    run()
    got = {
        (r["cust"], r["tier"])
        for r in V.read_table(spark, out_path).collect()
    }
    assert got == {(1, "bronze"), (2, "silver")}

    # SCD correction between batches: cust 1 upgraded
    V.update_table(
        spark, dim_path, {"tier": F.lit("gold")}, F.col("cust") == 1
    )
    deliver([(1, 30.0)], "b2")
    run()
    rows = V.read_table(spark, out_path).filter(F.col("amount") == 30.0)
    assert [r["tier"] for r in rows.collect()] == ["gold"]
    # earlier batch's enrichment is unchanged (append, not rewrite)
    assert V.read_table(spark, out_path).count() == 3


def test_batch_time_travel_schema_resolves_at_requested_version(
    spark, tmp_path
):
    """A time-travel read through the DataSource must expose the
    REQUESTED version's column set — not the current version's (which
    would leak later-added columns as NULL), matching
    read_table(version=v)."""
    from aws_etl_project2_fiap_spark.io import versioned as V
    from aws_etl_project2_fiap_spark.streaming.table_source import (
        VersionedTableDataSource,
    )

    path = str(tmp_path / "tt")
    V.create_table(
        spark.createDataFrame([(1, 10.0)], "id long, v double"), path
    )
    V.append_table(
        spark.createDataFrame(
            [(2, 20.0, "x")], "id long, v double, tag string"
        ),
        path,
    )
    spark.dataSource.register(VersionedTableDataSource)
    old = (
        spark.read.format("versioned_table")
        .option("path", path)
        .option("version", "1")
        .load()
    )
    assert old.columns == V.read_table(spark, path, version=1).columns
    assert "tag" not in old.columns
    assert [tuple(r) for r in old.collect()] == [(1, 10.0)]
    cur = spark.read.format("versioned_table").option("path", path).load()
    assert set(cur.columns) == {"id", "v", "tag"}


def _run_cdc_stream(spark, path, ckpt, out_dir):
    """One availableNow CDC pass into a parquet sink; rows of THIS run."""
    import glob

    before = set(glob.glob(f"{out_dir}/*.parquet"))
    q = (
        spark.readStream.format("versioned_table")
        .option("path", path)
        .option("feed", "cdc")
        .load()
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    fresh = list(set(glob.glob(f"{out_dir}/*.parquet")) - before)
    if not fresh:
        return spark.createDataFrame(
            [], "id long, v double, _change_type string, _commit_version long"
        )
    return spark.read.parquet(*fresh)


def test_cdc_feed_emits_deletes_and_churn(spark, table, tmp_path):
    """feed=cdc: snapshot arrives as inserts; a DV delete arrives as
    true deletes; a CoW update arrives as delete+insert churn that
    reconciles on the key."""
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    got = _run_cdc_stream(spark, table, ckpt, out)
    assert got.count() == 50
    assert got.filter(F.col("_change_type") != "insert").count() == 0

    V.delete_from(spark, table, F.col("id") < 5, mode="dv")
    got = _run_cdc_stream(spark, table, ckpt, out)
    rows = got.collect()
    assert {r["_change_type"] for r in rows} == {"delete"}
    assert sorted(r["id"] for r in rows) == [0, 1, 2, 3, 4]

    V.update_table(spark, table, {"v": F.lit(-1.0)}, F.col("id") == 7)
    got = _run_cdc_stream(spark, table, ckpt, out)
    ins = {r["id"]: r["v"] for r in got.filter(
        F.col("_change_type") == "insert").collect()}
    dels = {r["id"] for r in got.filter(
        F.col("_change_type") == "delete").collect()}
    assert ins[7] == -1.0
    # churn: every deleted key reappears on the insert side except none
    assert dels <= set(ins)


def test_cdc_rollback_emits_undeletes(spark, table, tmp_path):
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    _run_cdc_stream(spark, table, ckpt, out)  # v1 snapshot
    V.delete_from(spark, table, F.col("id") < 3, mode="dv")  # v2
    _run_cdc_stream(spark, table, ckpt, out)
    V.rollback(table, 1)  # v3: un-deletes 0,1,2
    got = _run_cdc_stream(spark, table, ckpt, out)
    rows = got.collect()
    assert {r["_change_type"] for r in rows} == {"insert"}
    assert sorted(r["id"] for r in rows) == [0, 1, 2]


def test_streaming_replication_end_to_end(spark, table, tmp_path):
    """CDC source + cdf_replica_sink = continuous replication: after
    each drained pass the replica equals the source — including
    updates, DV deletes, and appends."""
    from aws_etl_project2_fiap_spark.streaming.sinks import (
        cdf_replica_sink,
    )

    replica = str(tmp_path / "replica")
    ckpt = str(tmp_path / "ckpt")

    def replicate():
        q = cdf_replica_sink(
            spark.readStream.format("versioned_table")
            .option("path", table)
            .option("feed", "cdc")
            .load(),
            replica, ["id"], ckpt,
        )
        q.awaitTermination(120)

    def same():
        a = {tuple(r) for r in V.read_table(spark, table).collect()}
        b = {tuple(r) for r in V.read_table(spark, replica).collect()}
        return a == b

    replicate()
    assert same()
    V.update_table(spark, table, {"v": F.lit(9.0)}, F.col("id") < 10)
    V.delete_from(spark, table, F.col("id").between(20, 29), mode="dv")
    V.append_table(
        spark.createDataFrame([(100, 1.0)], "id long, v double"), table
    )
    replicate()
    assert same()
    # replay with a fresh checkpoint: batch ids repeat, guard holds
    v_before = V.current_version(replica)
    q = cdf_replica_sink(
        spark.readStream.format("versioned_table")
        .option("path", table).option("feed", "cdc").load(),
        replica, ["id"], str(tmp_path / "ckpt2"),
    )
    q.awaitTermination(120)
    assert V.current_version(replica) == v_before
    assert same()
