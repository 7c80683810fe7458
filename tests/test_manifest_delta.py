"""Delta-encoded manifests with periodic checkpoints (io/versioned).

Commit bytes must be O(touched files), not O(table files); every read
path (time travel, CDF, streaming source, history, vacuum) must see
identical file lists whether a version is stored full or as a delta.
"""

import json
import os

import pytest
from pyspark.sql import functions as F

from aws_etl_project2_fiap_spark.io import versioned as V


def _append(spark, path, df):
    return V.append_table(df, path)


def _raw(path, v):
    with open(os.path.join(path, "_manifests", f"v{v}.json")) as fh:
        return json.load(fh)


@pytest.fixture()
def table(spark, tmp_path):
    path = str(tmp_path / "t")
    V.create_table(
        spark.range(0, 100).select(
            F.col("id"), (F.col("id") % 10).alias("k")
        ),
        path,
    )
    return path


def test_appends_between_checkpoints_are_delta_encoded(spark, table):
    for i in range(3):
        _append(
            spark,
            table,
            spark.range(1000 + i, 1001 + i).select(
                F.col("id"), (F.col("id") % 10).alias("k")
            ),
        )
    assert "files" in _raw(table, 1)  # v1 is always a full snapshot
    for v in (2, 3, 4):
        raw = _raw(table, v)
        assert "delta" in raw and "files" not in raw
        assert raw["delta"]["base"] == v - 1
        assert raw["n_files"] == len(V._read_manifest(table, v)["files"])


def test_checkpoint_versions_store_full_snapshots(spark, table, monkeypatch):
    monkeypatch.setattr(V, "_CHECKPOINT_EVERY", 3)
    for i in range(5):
        _append(
            spark,
            table,
            spark.range(2000 + i, 2001 + i).select(
                F.col("id"), (F.col("id") % 10).alias("k")
            ),
        )
    for v in range(1, 7):
        raw = _raw(table, v)
        if v == 1 or v % 3 == 0:
            assert "files" in raw, f"v{v} should be a checkpoint"
        else:
            assert "delta" in raw, f"v{v} should be a delta"


def test_time_travel_resolves_through_the_chain(spark, table):
    counts = {1: 100}
    for i in range(4):
        _append(
            spark,
            table,
            spark.range(3000, 3010).select(
                F.col("id"), (F.col("id") % 10).alias("k")
            ),
        )
        counts[2 + i] = 100 + 10 * (i + 1)
    for v, n in counts.items():
        assert V.read_table(spark, table, version=v).count() == n


def test_delete_and_update_delta_encode_only_touched_files(spark, tmp_path):
    path = str(tmp_path / "wide")
    V.create_table(
        spark.range(0, 1000)
        .select(F.col("id"), (F.col("id") * 1.0).alias("v"))
        .repartitionByRange(8, "id"),
        path,
    )
    V.update_table(spark, path, {"v": F.lit(-1.0)}, F.col("id") == 5)
    raw = _raw(path, 2)
    assert "delta" in raw
    # one file rewritten: one put (the replacement) + one drop (original)
    assert len(raw["delta"]["put"]) == 1
    assert len(raw["delta"]["drop"]) == 1
    got = {r["id"]: r["v"] for r in V.read_table(spark, path).collect()}
    assert got[5] == -1.0 and len(got) == 1000


def test_commit_bytes_are_o_touched_not_o_table(spark, tmp_path):
    path = str(tmp_path / "big")
    V.create_table(
        spark.range(0, 3200)
        .select(F.col("id"), (F.col("id") * 1.0).alias("v"))
        .repartitionByRange(32, "id"),
        path,
    )
    full_bytes = os.path.getsize(
        os.path.join(path, "_manifests", "v1.json")
    )
    _append(
        spark,
        path,
        spark.range(9000, 9001).select(
            F.col("id"), (F.col("id") * 1.0).alias("v")
        ),
    )
    delta_bytes = os.path.getsize(
        os.path.join(path, "_manifests", "v2.json")
    )
    assert delta_bytes * 5 < full_bytes, (
        f"1-file append wrote {delta_bytes}B vs {full_bytes}B snapshot"
    )


def test_vacuum_materializes_retained_deltas(spark, table):
    for i in range(4):
        _append(
            spark,
            table,
            spark.range(4000 + i, 4001 + i).select(
                F.col("id"), (F.col("id") % 10).alias("k")
            ),
        )
    # keep v4..v5: v4 is a delta based on v3, which vacuum drops
    assert "delta" in _raw(table, 4)
    before = V.read_table(spark, table, version=4).count()
    mpath = os.path.join(table, "_manifests", "v4.json")
    mtime_before = os.stat(mpath).st_mtime
    V.vacuum(table, keep_last=2)
    raw = _raw(table, 4)
    assert "files" in raw and "delta" not in raw
    assert os.stat(mpath).st_mtime == pytest.approx(mtime_before)
    assert V.read_table(spark, table, version=4).count() == before
    assert V.read_table(spark, table).count() == before + 1


def test_history_and_detail_report_through_deltas(spark, table):
    _append(
        spark,
        table,
        spark.range(5000, 5001).select(
            F.col("id"), (F.col("id") % 10).alias("k")
        ),
    )
    hist = V.table_history(table)
    rec = {h["version"]: h for h in hist}
    assert rec[2]["n_files"] == len(V._read_manifest(table, 2)["files"])
    assert "delta" not in rec[2] and "files" not in rec[2]


def test_change_feed_spans_delta_versions(spark, table):
    _append(
        spark,
        table,
        spark.range(6000, 6005).select(
            F.col("id"), (F.col("id") % 10).alias("k")
        ),
    )
    ch = V.table_changes(spark, table, 1, 2)
    inserts = ch.filter(F.col("_change_type") == "insert")
    assert inserts.count() == 5


def test_streaming_source_reads_delta_manifests(spark, table, tmp_path):
    _append(
        spark,
        table,
        spark.range(7000, 7003).select(
            F.col("id"), (F.col("id") % 10).alias("k")
        ),
    )
    assert "delta" in _raw(table, 2)
    from aws_etl_project2_fiap_spark.streaming.table_source import (
        build_versioned_table_source,
    )

    spark.dataSource.register(build_versioned_table_source())
    got = (
        spark.read.format("versioned_table")
        .option("path", table)
        .load()
    )
    assert got.count() == 103


def test_rollback_across_deltas_restores_rows(spark, table):
    for i in range(3):
        _append(
            spark,
            table,
            spark.range(8000 + i, 8001 + i).select(
                F.col("id"), (F.col("id") % 10).alias("k")
            ),
        )
    V.rollback(table, 2)
    assert V.read_table(spark, table).count() == 101


# ---------------------------------------------------------------------
# Property: under random mutation sequences and a dense checkpoint
# interval, every retained version reads identically BEFORE and AFTER
# vacuum's delta-materialization pass — the resolution and the
# materialized snapshot can never disagree.
# ---------------------------------------------------------------------
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    ops=st.lists(
        st.sampled_from(["append", "update", "delete"]),
        min_size=3,
        max_size=6,
    ),
    interval=st.sampled_from([2, 3, 16]),
)
def test_vacuum_materialization_preserves_reads(
    spark, tmp_path_factory, monkeypatch, ops, interval
):
    monkeypatch.setattr(V, "_CHECKPOINT_EVERY", interval)
    path = str(tmp_path_factory.mktemp("mdprop") / "t")
    V.create_table(
        spark.range(0, 40).select(
            F.col("id"), (F.col("id") * 1.0).alias("v")
        ).repartitionByRange(4, "id"),
        path,
    )
    nid = 100
    for i, kind in enumerate(ops):
        if kind == "append":
            V.append_table(
                spark.createDataFrame(
                    [(nid + i, -1.0)], "id long, v double"
                ),
                path,
            )
        elif kind == "update":
            V.update_table(
                spark, path, {"v": F.lit(float(i))}, F.col("id") % 7 == i % 7
            )
        else:
            V.delete_from(spark, path, F.col("id") == i, mode="auto")
    keep_last = 3
    current = V.current_version(path)
    retained = [v for v in range(current - keep_last + 1, current + 1) if v >= 1]
    before = {
        v: sorted(
            map(tuple, V.read_table(spark, path, version=v).collect())
        )
        for v in retained
    }
    V.vacuum(path, keep_last=keep_last)
    for v in retained:
        after = sorted(
            map(tuple, V.read_table(spark, path, version=v).collect())
        )
        assert after == before[v], f"v{v} changed across vacuum"
