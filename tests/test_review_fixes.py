"""Regression pins for the round-4 self-review findings — each test
reproduces a defect found by reviewing the deletion-vector / partition-
overwrite / constraints / table-source surface, and fails on the
pre-fix code.
"""

from __future__ import annotations

import datetime

import pytest

from pyspark.sql import functions as F

from aws_etl_project2_fiap_spark.io import versioned as V


def test_partition_drop_never_loses_null_rows(spark, tmp_path):
    """A file whose stats say min==max==<overwritten value> may still
    hold NULL-partition rows (parquet stats exclude nulls) — it must be
    rewritten scoped, never dropped whole."""
    path = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, "d1"), (2, None), (3, "d1")], "id long, day string"
    ).coalesce(1)
    V.create_table(df, path)
    res = V.overwrite_partitions(
        spark,
        spark.createDataFrame([(9, "d1")], "id long, day string"),
        path,
        "day",
    )
    assert res["files_dropped"] == 0 and res["files_rewritten"] == 1
    rows = {(r["id"], r["day"]) for r in V.read_table(spark, path).collect()}
    assert rows == {(9, "d1"), (2, None)}


def test_partition_drop_still_whole_file_when_null_free(spark, tmp_path):
    path = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, "d1"), (2, "d2")], "id long, day string"
    )
    V.create_table(df, path, cluster_by=["day"], num_files=2)
    res = V.overwrite_partitions(
        spark,
        spark.createDataFrame([(9, "d1")], "id long, day string"),
        path,
        "day",
    )
    assert res["files_dropped"] == 1 and res["files_rewritten"] == 0


def test_add_constraint_bad_expr_preserves_existing_rules(spark, tmp_path):
    path = str(tmp_path / "t")
    V.create_table(
        spark.range(5).select("id"), path, constraints={"c1": "id >= 0"}
    )
    with pytest.raises(Exception):  # AnalysisException: unknown column
        V.add_constraint(spark, path, "c2", "no_such_col > 0")
    assert V.table_constraints(path) == {"c1": "id >= 0"}
    with pytest.raises(ValueError):
        V.add_constraint(spark, path, "", "id > 0")
    assert V.table_constraints(path) == {"c1": "id >= 0"}


def test_cli_constraint_add_requires_name_and_expr(spark, tmp_path):
    from aws_etl_project2_fiap_spark.__main__ import main

    path = str(tmp_path / "t")
    V.create_table(spark.range(5).select("id"), path)
    assert main(["constraint", "add", path]) == 2
    assert main(["constraint", "drop", path]) == 2
    assert V.table_constraints(path) == {}


def test_auto_delete_bounds_cumulative_dv_debt(spark, tmp_path):
    """Repeated just-under-threshold deletes must not ratchet a DV past
    the threshold: the decision is against PHYSICAL rows, so the second
    delete (cumulative 70% of physical) rewrites."""
    path = str(tmp_path / "t")
    V.create_table(spark.range(0, 100).select("id").coalesce(1), path)
    r1 = V.delete_from(
        spark, path, F.col("id") < 40, mode="auto", rewrite_threshold=0.5
    )
    assert r1["files_dv"] == 1 and r1["files_rewritten"] == 0
    r2 = V.delete_from(
        spark, path, F.col("id") < 70, mode="auto", rewrite_threshold=0.5
    )
    assert r2["n_deleted"] == 30
    assert r2["files_rewritten"] == 1 and r2["files_dv"] == 0
    files = V._read_manifest(path, r2["version"])["files"]
    assert all("dv" not in f for f in files)  # debt physically purged
    assert V.read_table(spark, path).count() == 30


def test_plus_in_table_path_keeps_dv_and_discovery_exact(spark, tmp_path):
    """'+' is a literal in URI paths; form-style url_decode would turn
    it into a space and desync every (file, position) comparison."""
    path = str(tmp_path / "exp+v2" / "tbl")
    V.create_table(spark.range(0, 50).select("id").coalesce(1), path)
    res = V.delete_from(spark, path, F.col("id") < 10, mode="dv")
    assert res["n_deleted"] == 10 and res["files_dv"] == 1
    assert V.read_table(spark, path).count() == 40
    # second delete can't rematch deleted rows (discovery is DV-aware)
    res2 = V.delete_from(spark, path, F.col("id") < 20, mode="dv")
    assert res2["n_deleted"] == 10
    assert V.read_table(spark, path).count() == 30
    # update discovery under the same path
    r3 = V.update_table(spark, path, {"id": F.col("id")}, F.col("id") < 25)
    assert r3["n_matched"] == 5


def test_timestamp_stats_prune_with_sql_string_probes(spark, tmp_path):
    """Timestamp stats canonicalize with a SPACE separator so the
    common 'YYYY-MM-DD HH:MM:SS' string probes order correctly — a
    'T'-separated form would wrongly prune in-range files."""
    path = str(tmp_path / "t")
    ts = datetime.datetime
    df = spark.createDataFrame(
        [
            (1, ts(1995, 3, 1, 0, 0)),
            (2, ts(1995, 3, 1, 10, 0)),
            (3, ts(1995, 6, 1, 0, 0)),
        ],
        "id long, ev timestamp",
    )
    V.create_table(df.repartitionByRange(2, "ev"), path)
    # the feature must actually FIRE: TIMESTAMP_MICROS output (session
    # config) gives timestamp columns real footer min/max, so the
    # manifest carries usable stats and prunable() skips the June file
    # for a March probe — with INT96 (no stats) this test would pass
    # vacuously, never exercising the canonicalization it documents
    files = V._read_manifest(path, 1)["files"]
    assert all(f.get("stats", {}).get("ev") for f in files), (
        "timestamp stats missing from manifest — pruning is inert"
    )
    kept, skipped = V.prunable(
        files, "ev", "1995-03-01 00:00:00", "1995-03-01 12:00:00"
    )
    assert len(skipped) >= 1, "in-range probe pruned no file"
    # inclusive-boundary safety: a probe whose upper bound EQUALS a
    # file's min must keep that file (the tz-suffix bug pruned it)
    june_min = min(
        f["stats"]["ev"][0] for f in files
        if f["stats"]["ev"][0].startswith("1995-06")
    )
    kept_b, _ = V.prunable(files, "ev", "1995-01-01 00:00:00", june_min)
    assert len(kept_b) == len(files)
    got = V.read_table(
        spark, path,
        between=("ev", "1995-03-01 00:00:00", "1995-03-01 12:00:00"),
    )
    assert sorted(r["id"] for r in got.collect()) == [1, 2]
    # datetime-object probes canonicalize identically
    got2 = V.read_table(
        spark, path,
        between=("ev", ts(1995, 3, 1, 0, 0), ts(1995, 3, 1, 12, 0)),
    )
    assert sorted(r["id"] for r in got2.collect()) == [1, 2]


def test_table_source_reads_schema_evolved_files(spark, tmp_path):
    from aws_etl_project2_fiap_spark.streaming.table_source import (
        VersionedTableDataSource,
    )

    path = str(tmp_path / "t")
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
    got = (
        spark.read.format("versioned_table").option("path", path).load()
    )
    assert set(got.columns) == {"id", "v", "tag"}
    rows = {(r["id"], r["tag"]) for r in got.collect()}
    assert rows == {(1, None), (2, "x")}  # old file's new column = NULL


def test_enriched_sink_quarantines_constraint_violation(spark, tmp_path):
    import os

    from aws_etl_project2_fiap_spark.streaming.sinks import (
        enriched_versioned_sink,
    )

    dim_path = str(tmp_path / "dim")
    out_path = str(tmp_path / "out")
    qdir = str(tmp_path / "q")
    src_dir = str(tmp_path / "arrivals")
    os.makedirs(src_dir)
    V.create_table(
        spark.createDataFrame([(1, "bronze")], "cust long, tier string"),
        dim_path,
    )
    # seed the out table WITH a constraint the left join will break
    V.create_table(
        spark.createDataFrame(
            [(0, 0.0, "seed")], "cust long, amount double, tier string"
        ),
        out_path,
        constraints={"tier_known": "tier IS NOT NULL"},
    )
    spark.createDataFrame(
        [(99, 5.0)], "cust long, amount double"  # cust 99 not in dim
    ).write.parquet(os.path.join(src_dir, "b1"))
    stream = spark.readStream.schema("cust long, amount double").parquet(
        src_dir + "/*"
    )
    q = enriched_versioned_sink(
        stream, dim_path, ["cust"], out_path,
        checkpoint=str(tmp_path / "ckpt"), quarantine_path=qdir,
    )
    q.awaitTermination(120)
    assert V.read_table(spark, out_path).count() == 1  # only the seed
    quarantined = spark.read.parquet(qdir + "/*")
    assert quarantined.count() == 1
    assert quarantined.collect()[0]["tier"] is None
