"""Small-file compaction (the 100 TB hygiene job, SURVEY §4 last row).

Streaming sinks and per-day overwrite writers (the reference's one-
object-per-day layout; Firehose's 60 s buffers) accumulate small files;
at scale that means metadata-bound scans and tiny tasks. This job
rewrites a partitioned table into right-sized files, preserving the
Hive layout, using the same dynamic-partition-overwrite atomicity as
every other write in the engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_TARGET_BYTES = 128 * 1024 * 1024  # match files.maxPartitionBytes


def plan_compaction(
    spark: SparkSession,
    path: str,
    partition_by: list[str],
    target_bytes: int = DEFAULT_TARGET_BYTES,
    small_ratio: float = 0.5,
) -> DataFrame:
    """Inventory pass: per partition, file count / total bytes / small-
    file count (files under ``small_ratio×target``). Pure metadata —
    reads footers, not data. Partitions with ≤1 file or no small files
    need no work."""
    files = spark.read.format("binaryFile").load(path).select(
        "path", "length"
    )
    for key in partition_by:
        files = files.withColumn(
            key, F.regexp_extract("path", f"{key}=([^/]+)", 1)
        )
    return (
        files.groupBy(*partition_by)
        .agg(
            F.count(F.lit(1)).alias("n_files"),
            F.sum("length").alias("total_bytes"),
            F.sum(
                (F.col("length") < int(target_bytes * small_ratio)).cast("int")
            ).alias("n_small"),
        )
        .filter((F.col("n_files") > 1) & (F.col("n_small") > 0))
    )


def compact_partitions(
    spark: SparkSession,
    path: str,
    partition_by: list[str],
    target_bytes: int = DEFAULT_TARGET_BYTES,
) -> int:
    """Rewrite fragmented partitions into ~target_bytes files.

    Only partitions the inventory flags are read and rewritten (dynamic
    partition overwrite leaves the rest untouched); file count per
    partition = ceil(bytes/target). Returns partitions compacted.
    """
    todo = plan_compaction(spark, path, partition_by, target_bytes).collect()
    if not todo:
        return 0
    df = spark.read.parquet(path)
    keys = [r.asDict() for r in todo]
    pred = None
    for kv in keys:
        clause = None
        for key in partition_by:
            c = F.col(key).cast("string") == str(kv[key])
            clause = c if clause is None else (clause & c)
        pred = clause if pred is None else (pred | clause)
    fragment = df.filter(pred)

    # per-partition output fan-out = ceil(bytes/target); a key-only
    # repartition would collapse each partition to ONE task/file, so the
    # fan-out is materialized as a salt column joined in per partition
    need = spark.createDataFrame(
        [
            (
                *[str(kv[k]) for k in partition_by],
                int(kv["total_bytes"] // target_bytes) + 1,
            )
            for kv in keys
        ],
        [*[f"__k_{k}" for k in partition_by], "__n_out"],
    )
    cond = None
    for k in partition_by:
        c = F.col(k).cast("string") == F.col(f"__k_{k}")
        cond = c if cond is None else (cond & c)
    data_cols = [c for c in fragment.columns if c not in partition_by]
    salted = (
        fragment.join(F.broadcast(need), cond)
        .withColumn(
            "__salt",
            F.pmod(
                F.xxhash64(*data_cols, F.monotonically_increasing_id()),
                F.col("__n_out"),
            ),
        )
    )
    total_files = sum(int(kv["total_bytes"] // target_bytes) + 1 for kv in keys)
    (
        salted.repartition(total_files, *partition_by, F.col("__salt"))
        .drop("__salt", "__n_out", *[f"__k_{k}" for k in partition_by])
        .write.partitionBy(*partition_by)
        .mode("overwrite")
        .parquet(path)
    )
    return len(keys)
