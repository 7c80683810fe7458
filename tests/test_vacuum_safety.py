"""VACUUM safety: a reader of a reclaimed version must fail LOUDLY.

Two reader/vacuum interleavings exist and both must error, never
return a silently-empty (or partial) result:

1. resolve AFTER vacuum — the manifest is gone: _read_manifest raises
   FileNotFoundError at plan time;
2. resolve BEFORE vacuum, EXECUTE after — the manifest was read but
   the batch dirs are gone: Spark's scan fails the job (the session
   keeps `spark.sql.files.ignoreMissingFiles` at its false default —
   flipping it on would turn this failure mode into silent row loss).
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from aws_etl_project2_fiap_spark.io import versioned as V


@pytest.fixture()
def table(spark, tmp_path):
    path = str(tmp_path / "tbl")
    V.create_table(
        spark.range(0, 100).select("id").repartitionByRange(2, "id"), path
    )
    # v2 and v3 rewrite everything so v1's batch dirs become garbage
    V.overwrite_table(spark.range(100, 200).select("id"), path)
    V.overwrite_table(spark.range(200, 300).select("id"), path)
    return path


def test_plan_after_vacuum_raises(spark, table):
    V.vacuum(table, keep_last=2)
    with pytest.raises(FileNotFoundError):
        V.read_table(spark, table, version=1)
    # retained versions still read fine
    assert V.read_table(spark, table, version=2).count() == 100


def test_execute_after_vacuum_fails_loudly_not_empty(spark, table):
    # reader resolves the snapshot FIRST (manifest read, lazy plan) ...
    df = V.read_table(spark, table, version=1)
    # ... then vacuum reclaims v1's batch dirs under it
    removed = V.vacuum(table, keep_last=2)
    assert removed, "vacuum reclaimed nothing — fixture broken"
    assert (
        spark.conf.get("spark.sql.files.ignoreMissingFiles") == "false"
    ), "ignoreMissingFiles must stay false or this becomes silent row loss"
    with pytest.raises(Exception) as exc_info:
        df.count()
    assert "FileNotFound" in str(exc_info.value) or "does not exist" in str(
        exc_info.value
    ) or "FAILED_READ_FILE" in str(exc_info.value)


def test_consume_changes_cursor_past_retention_raises(spark, table, tmp_path):
    cursor = str(tmp_path / "cursor.json")
    import json

    with open(cursor, "w") as fh:
        json.dump({"version": 1}, fh)
    V.vacuum(table, keep_last=2)
    with pytest.raises(ValueError, match="retention"):
        V.consume_changes(spark, table, cursor, lambda df: df.count())
