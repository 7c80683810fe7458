"""SCD2 — slowly-changing-dimension history (validity intervals).

The warehouse pattern the reference's refined zone implies but never
builds: instead of overwriting a dimension row, every attribute change
opens a new version ``[valid_from, valid_to)`` and closes the previous
one (open versions carry ``valid_to = NULL``). Joining facts against
the version whose interval contains the fact's timestamp gives
as-of-correct attributes forever.

Two entry points:

- :func:`scd2_snapshot` — build the full history from an update stream
  in one pass (two windows, one key shuffle): consecutive runs of the
  same attribute value collapse into one version.
- :func:`scd2_merge` — fold a NEW batch of updates into a stored
  history. A compressed history is exactly its own change stream
  (each version row IS the change event that opened it), so the merge
  re-expands only the AFFECTED keys' versions, unions the new updates,
  reruns the snapshot build for those keys, and leaves every other
  key's bytes untouched — O(affected history + delta), never a full
  rebuild. The write is an atomic swap (same pattern as io/update.py).

Correctness: tests/test_scd2.py proves merge-in-batches ≡ one-shot
snapshot for arbitrary batch splits; the `scd2_from_events` workload
component hash-checks the window formulation against DuckDB.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def scd2_snapshot(
    updates: DataFrame,
    key: str,
    ts_col: str,
    attr: str,
    tiebreak: str | None = None,
) -> DataFrame:
    """Full SCD2 history from an update stream.

    Returns (key, attr, valid_from, valid_to): one row per run of equal
    consecutive ``attr`` values per key, ``valid_to`` = next version's
    start (NULL for the open version)."""
    order = [ts_col] + ([tiebreak] if tiebreak else [])
    w = Window.partitionBy(key).orderBy(*order)
    prev = F.lag(attr).over(w)
    starts = (
        updates.withColumn("__chg", prev.isNull() | (prev != F.col(attr)))
        .filter("__chg")
    )
    # lead() over the SAME order (the tiebreak column still exists here;
    # it is projected away only after the window resolves)
    return starts.select(
        key,
        attr,
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(Window.partitionBy(key).orderBy(*order)).alias(
            "valid_to"
        ),
    )


def scd2_merge(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    key: str,
    ts_col: str,
    attr: str,
) -> None:
    """Fold new updates into the stored SCD2 table at ``path``.

    Affected keys' versions re-expand into their change stream (one
    row per version, at ``valid_from``), union with the new updates,
    and rebuild; untouched keys pass through byte-for-byte. Atomic
    directory swap on write."""
    if not os.path.exists(path):
        scd2_snapshot(updates, key, ts_col, attr).write.parquet(path)
        return
    existing = spark.read.parquet(path)
    affected = updates.select(key).distinct()
    untouched = existing.join(affected, key, "anti")
    replay = (
        existing.join(affected, key, "semi")
        .select(key, attr, F.col("valid_from").alias(ts_col))
    )
    merged = scd2_snapshot(
        replay.unionByName(updates.select(key, attr, ts_col)), key, ts_col, attr
    )
    out = untouched.unionByName(merged)
    staging = f"{path}.__staging_{uuid.uuid4().hex[:8]}"
    out.write.parquet(staging)
    backup = f"{path}.__old_{uuid.uuid4().hex[:8]}"
    os.rename(path, backup)
    os.rename(staging, path)
    shutil.rmtree(backup)
