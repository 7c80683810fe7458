"""Checkpointed incremental batch ingest (io/incremental.py)."""

from __future__ import annotations

import os
import time

import pytest

from pyspark.sql import functions as F

from aws_etl_project2_fiap_spark.io import incremental as I
from aws_etl_project2_fiap_spark.io import versioned as V


def _drop(spark, n0, n1, path):
    spark.range(n0, n1).select(
        F.col("id"), (F.col("id") * 1.5).alias("v")
    ).coalesce(1).write.mode("overwrite").parquet(path)


@pytest.fixture()
def land(tmp_path):
    src = tmp_path / "landing"
    src.mkdir()
    return str(src), str(tmp_path / "state.json")


def test_first_run_sees_all_second_sees_none(spark, land):
    src, state = land
    _drop(spark, 0, 10, f"{src}/d1")
    _drop(spark, 10, 25, f"{src}/d2")
    got = []
    res = I.ingest_batch(spark, src, state, lambda df: got.append(df.count()))
    assert res["committed"] and got == [25]
    res2 = I.ingest_batch(spark, src, state, lambda df: got.append(df.count()))
    assert res2["files"] == 0 and not res2["committed"] and got == [25]


def test_only_new_arrivals_processed(spark, land):
    src, state = land
    _drop(spark, 0, 10, f"{src}/d1")
    I.ingest_batch(spark, src, state, lambda df: None)
    _drop(spark, 10, 13, f"{src}/d2")
    seen = []
    I.ingest_batch(
        spark, src, state, lambda df: seen.extend(r["id"] for r in df.collect())
    )
    assert sorted(seen) == [10, 11, 12]


def test_modified_file_reprocessed(spark, land):
    src, state = land
    _drop(spark, 0, 5, f"{src}/d1")
    I.ingest_batch(spark, src, state, lambda df: None)
    time.sleep(0.05)
    _drop(spark, 100, 103, f"{src}/d1")  # re-upload same prefix
    n = []
    I.ingest_batch(spark, src, state, lambda df: n.append(df.count()))
    assert n == [3]


def test_sink_failure_leaves_state_uncommitted(spark, land):
    src, state = land
    _drop(spark, 0, 5, f"{src}/d1")

    def boom(df):
        raise RuntimeError("sink crashed")

    with pytest.raises(RuntimeError):
        I.ingest_batch(spark, src, state, boom)
    assert not os.path.exists(state)  # nothing committed
    n = []
    I.ingest_batch(spark, src, state, lambda df: n.append(df.count()))
    assert n == [5]  # at-least-once replay of the same delivery


def test_composes_with_versioned_append(spark, land, tmp_path):
    """The lakehouse loop: arrivals -> versioned table commits."""
    src, state = land
    table = str(tmp_path / "tbl")
    _drop(spark, 0, 20, f"{src}/d1")

    def sink(df):
        if os.path.exists(os.path.join(table, "_CURRENT")):
            V.append_table(df, table)
        else:
            V.create_table(df, table)

    I.ingest_batch(spark, src, state, sink)
    _drop(spark, 20, 30, f"{src}/d2")
    I.ingest_batch(spark, src, state, sink)
    assert V.current_version(table) == 2
    assert V.read_table(spark, table).count() == 30
    # version 1 still reads the first delivery alone
    assert V.read_table(spark, table, version=1).count() == 20


def test_corrupt_file_quarantined_not_fatal(spark, land):
    src, state = land
    _drop(spark, 0, 10, f"{src}/d1")
    with open(f"{src}/junk.parquet", "wb") as fh:
        fh.write(b"not a parquet file")
    n = []
    res = I.ingest_batch(spark, src, state, lambda df: n.append(df.count()))
    assert n == [10] and res["files"] == 1
    assert res["quarantined"] == [f"{src}/junk.parquet"]
    # next run: quarantined file stays skipped, nothing new
    res2 = I.ingest_batch(spark, src, state, lambda df: n.append(df.count()))
    assert res2["files"] == 0 and res2["quarantined"] == []


def test_requarantined_file_heals_on_reupload(spark, land):
    src, state = land
    with open(f"{src}/d1.parquet", "wb") as fh:
        fh.write(b"truncated")
    res = I.ingest_batch(spark, src, state, lambda df: None)
    assert res["quarantined"] and res["files"] == 0
    time.sleep(0.05)
    # the re-upload replaces the bad object with a real file
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(pa.table({"id": [1, 2, 3]}), f"{src}/d1.parquet")
    n = []
    res2 = I.ingest_batch(spark, src, state, lambda df: n.append(df.count()))
    assert res2["files"] == 1 and n == [3]
