"""K6 — in-place UPDATE semantics without mutable storage.

The reference mutates SQLite directly: ``UPDATE pregao_b3 SET data_hora =
datetime('now','-1 day') WHERE data_hora IS NULL`` (reference
src/query_db.py:36-43). Parquet has no UPDATE, so the engine implements
the snapshot-rewrite pattern (SURVEY §7.4 item 6): read → conditional
projection → write to a staging dir → atomic directory swap. Readers see
either the old snapshot or the new one, never a half-written mix.

At 100 TB: rewrite only the partitions the predicate touches (pass
``partition_by`` — untouched partitions are never read or written,
mirroring dynamic partition overwrite), or adopt a table format with
row-level deletes (Delta/Iceberg) — same API, different sink.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def apply_update(df: DataFrame, set_cols: dict[str, Column], where: Column) -> DataFrame:
    """The UPDATE as a pure projection: rows matching ``where`` get the
    new column values, everything else passes through unchanged."""
    return df.withColumns(
        {name: F.when(where, new).otherwise(F.col(name)) for name, new in set_cols.items()}
    )


def update_table(
    spark: SparkSession,
    path: str,
    set_cols: dict[str, Column],
    where: Column,
    partition_by: list[str] | None = None,
) -> int:
    """UPDATE ... SET ... WHERE over a parquet table path, atomically.

    Returns the number of rows the predicate matched. Without
    ``partition_by`` the whole snapshot is rewritten and swapped; with
    it, only partitions containing matched rows are rewritten in place
    via dynamic partition overwrite (already session-default).
    """
    df = spark.read.option("mergeSchema", "true").parquet(path)
    n_matched = df.filter(where).count()
    if n_matched == 0:
        return 0
    updated = apply_update(df, set_cols, where)

    if partition_by:
        # rewrite ONLY the partitions that contain matched rows
        touched = updated.join(
            df.filter(where).select(*partition_by).distinct(), partition_by, "semi"
        )
        (
            touched.write.partitionBy(*partition_by)
            .mode("overwrite")
            .parquet(path)
        )
        return n_matched

    staging = f"{path.rstrip('/')}.__staging_{uuid.uuid4().hex[:8]}"
    updated.write.mode("overwrite").parquet(staging)
    backup = f"{path.rstrip('/')}.__old_{uuid.uuid4().hex[:8]}"
    os.rename(path, backup)
    try:
        os.rename(staging, path)
    except OSError:
        os.rename(backup, path)  # roll back
        raise
    shutil.rmtree(backup, ignore_errors=True)
    return n_matched


def merge_into(
    spark: SparkSession,
    target_path: str,
    source: DataFrame,
    keys: list[str],
    when_matched: str = "update",
) -> dict:
    """MERGE INTO over a parquet snapshot: upsert ``source`` into the
    table at ``target_path`` by ``keys``.

    - matched rows: replaced by the source row (``update``) or kept
      (``ignore``);
    - unmatched source rows: inserted.

    Plan: one full-outer join on the keys + coalesce projection, then the
    same atomic snapshot swap as :func:`update_table`. One shuffle on the
    merge keys; at 100 TB pre-bucket the target on the keys so the join
    is exchange-free, or adopt Delta/Iceberg for file-level merge-on-read
    — the API stays the same. Returns {"updated": n, "inserted": n}.
    """
    import os
    import shutil
    import uuid

    target = spark.read.parquet(target_path)
    t_cols = target.columns
    if sorted(source.columns) != sorted(t_cols):
        raise ValueError(f"source columns {source.columns} != target {t_cols}")
    # per-key upsert is only well-defined for a unique-key source: a
    # duplicate key would fan out through the full-outer join and land
    # duplicated in the rewritten snapshot
    dup = source.groupBy(*keys).count().filter(F.col("count") > 1).limit(1).collect()
    if dup:
        raise ValueError(
            f"merge source has duplicate merge keys, e.g. "
            f"{ {k: dup[0][k] for k in keys} } — dedup (keep_latest) first"
        )

    tgt = target.alias("t")
    src = source.alias("s")
    joined = tgt.join(src, keys, "full_outer")
    matched = F.lit(True)
    for k in keys:
        matched = matched & F.col(f"s.{k}").isNotNull() & F.col(f"t.{k}").isNotNull()
    n_updated = joined.filter(matched).count()
    n_inserted = source.join(target.select(*keys), keys, "anti").count()

    cols = []
    for c in t_cols:
        if c in keys:
            cols.append(F.coalesce(F.col(f"t.{c}"), F.col(f"s.{c}")).alias(c))
        elif when_matched == "update":
            # source wins when present, else keep target
            s_present = F.col(f"s.{keys[0]}").isNotNull()
            cols.append(
                F.when(s_present, F.col(f"s.{c}")).otherwise(F.col(f"t.{c}")).alias(c)
            )
        else:
            t_present = F.col(f"t.{keys[0]}").isNotNull()
            cols.append(
                F.when(t_present, F.col(f"t.{c}")).otherwise(F.col(f"s.{c}")).alias(c)
            )
    merged = joined.select(*cols)

    staging = f"{target_path.rstrip('/')}.__staging_{uuid.uuid4().hex[:8]}"
    merged.write.mode("overwrite").parquet(staging)
    backup = f"{target_path.rstrip('/')}.__old_{uuid.uuid4().hex[:8]}"
    os.rename(target_path, backup)
    try:
        os.rename(staging, target_path)
    except OSError:
        os.rename(backup, target_path)
        raise
    shutil.rmtree(backup, ignore_errors=True)
    return {"updated": n_updated, "inserted": n_inserted}


def _first_nonkey(cols: list[str], keys: list[str]) -> str:
    for c in cols:
        if c not in keys:
            return c
    return keys[0]
