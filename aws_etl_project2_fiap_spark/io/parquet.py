"""Partitioned parquet IO with schema-drift canonicalization.

The reference's raw zone has real per-partition schema drift: two writer
versions shipped different column sets (v1 adds ``data_hora``, the Glue
source schema leaks ``valor_limpo`` — reference src/scrapping_b3.py:113,
ETL_glue_pregao_B3.json:332-338). Reads therefore always go through
``mergeSchema`` + an explicit canonicalization step (SURVEY §1.4):
missing columns become nulls of the declared type, leaked temp columns
are dropped, and string timestamps are coerced to TimestampType.

Writes mirror the reference's Hive-partitioned overwrite-by-day layout
(K1/K2/K3) with dynamic partition overwrite, so rewriting one day never
clobbers the table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

STAR_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def read_partitioned(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    merge_schema: bool = True,
) -> DataFrame:
    """Read a (possibly drifted) Hive-partitioned parquet directory.

    ``mergeSchema=true`` unions per-partition footers (drifted partitions
    contribute nulls); if ``schema`` is given the result is canonicalized
    to exactly that shape.
    """
    reader = spark.read.option("mergeSchema", str(merge_schema).lower())
    df = reader.parquet(path)
    if schema is not None:
        df = canonicalize(df, schema)
    return df


def canonicalize(
    df: DataFrame,
    schema: T.StructType,
    drop_extras: bool = True,
    timestamp_format: str | None = None,
) -> DataFrame:
    """Project ``df`` onto ``schema``: add missing columns as typed nulls,
    cast mismatched types (string→timestamp honors ``timestamp_format``),
    drop leaked extra columns, order columns canonically.

    This is a plain projection — Catalyst folds it into the scan, so
    column pruning and predicate pushdown still reach parquet.
    """
    existing = {f.name: f for f in df.schema.fields}
    cols = []
    for field in schema.fields:
        if field.name not in existing:
            cols.append(F.lit(None).cast(field.dataType).alias(field.name))
            continue
        cur = existing[field.name]
        if cur.dataType == field.dataType:
            cols.append(F.col(field.name))
        elif (
            isinstance(field.dataType, T.TimestampType)
            and isinstance(cur.dataType, T.StringType)
            and timestamp_format
        ):
            cols.append(
                F.try_to_timestamp(F.col(field.name), F.lit(timestamp_format)).alias(
                    field.name
                )
            )
        else:
            cols.append(F.col(field.name).cast(field.dataType).alias(field.name))
    if not drop_extras:
        cols += [F.col(n) for n in existing if n not in {f.name for f in schema.fields}]
    return df.select(*cols)


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: list[str],
    mode: str = "overwrite",
    compression: str = "snappy",
) -> None:
    """Hive-partitioned parquet write (K1/K2/K3 semantics).

    With ``spark.sql.sources.partitionOverwriteMode=dynamic`` (set by
    ``session.build_session``), ``mode="overwrite"`` replaces only the
    partitions present in ``df`` — the reference's overwrite-by-day
    ``put_object`` behavior, but atomic per partition.
    """
    (
        df.write.partitionBy(*partition_by)
        .option("compression", compression)
        .mode(mode)
        .parquet(path)
    )


def read_star_schema(
    spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = STAR_TABLES
) -> dict[str, DataFrame]:
    """Load the driver's star-schema tables and register temp views."""
    out: dict[str, DataFrame] = {}
    for name in tables:
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        df.createOrReplaceTempView(name)
        out[name] = df
    return out


def write_clustered(
    df: DataFrame,
    path: str,
    cluster_by: list[str],
    num_files: int | None = None,
    mode: str = "overwrite",
    compression: str = "snappy",
) -> None:
    """Cluster-ordered parquet write: range-partition + sort on
    ``cluster_by`` before writing, so each file/row-group covers a
    narrow, near-disjoint range of the cluster key.

    This is what makes parquet min/max statistics actually PRUNE: a
    pushed-down range predicate skips every row group whose [min, max]
    misses the range. On an unordered layout each row group spans
    nearly the full key domain and min/max skipping degenerates to a
    full scan — same predicate, same stats machinery, zero skips. The
    one-time global sort is the price; amortized over every subsequent
    selective read (the Z-order/liquid-clustering idea restricted to a
    single leading key, which covers the dominant time-range access
    pattern of the reference's daily-partitioned tables).
    """
    spark = df.sparkSession
    if num_files is None:
        num_files = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    (
        df.repartitionByRange(num_files, *cluster_by)
        .sortWithinPartitions(*cluster_by)
        .write.option("compression", compression)
        .mode(mode)
        .parquet(path)
    )
