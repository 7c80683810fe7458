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


def _zorder_ordinal(col: "F.Column", dtype, name: str) -> "F.Column":
    """Order-preserving DOUBLE surrogate for a z-order key column.

    Numerics/booleans cast directly; date/timestamp go through epoch
    arithmetic (ANSI forbids a direct date→double cast); strings map to
    their first 7 bytes big-endian (14 hex chars → conv base 16 →
    int64, always < 2^56 so the signed cast cannot overflow), which
    preserves lexicographic prefix order. Anything else raises — a
    silent wrong ordering would quietly destroy pruning locality.
    """
    from pyspark.sql import types as T

    if isinstance(dtype, (T.NumericType, T.BooleanType)):
        return col.cast("double")
    if isinstance(dtype, T.DateType):
        return F.datediff(col, F.lit("1970-01-01")).cast("double")
    if isinstance(dtype, (T.TimestampType, T.TimestampNTZType)):
        return F.unix_micros(col.cast("timestamp")).cast("double")
    if isinstance(dtype, T.StringType):
        hex14 = F.rpad(F.substring(F.hex(col.cast("binary")), 1, 14), 14, "0")
        return F.conv(hex14, 16, 10).cast("double")
    raise ValueError(
        f"zorder_value: unsupported cluster column type {dtype} for {name!r}; "
        f"supported: numeric, boolean, date, timestamp, string"
    )


def zorder_value(
    df: DataFrame,
    cluster_by: list[str],
    bits_per_col: int = 8,
) -> "F.Column":
    """Z-order (Morton) key for ``cluster_by`` as a pure-codegen column.

    Each column is rank-normalized to a ``bits_per_col``-bit integer via
    approx-quantile bucket boundaries (one bounded-memory
    ``approxQuantile`` pass; at 100 TB run it on a TABLESAMPLE — the
    boundaries only steer layout, exactness is irrelevant), then the
    per-column bucket ids are bit-interleaved into a single int64.
    Sorting by that value gives every file/row-group a tight [min, max]
    envelope on EVERY cluster column simultaneously, so min/max
    skipping works for predicates on any of them — the multi-key
    generalization of ``write_clustered``'s single leading key.
    Bucketing is one ``size(filter(literal_array, ...))`` higher-order
    expression per column and interleaving a fixed shift/mask chain:
    JVM expressions throughout, no UDF, no shuffle beyond the write's
    own range partition.

    Rank-normalizing (instead of raw bit-twiddling the values) makes the
    curve distribution-robust: skewed or non-numeric-range keys still
    spread uniformly across the 2^bits grid, so no z-run is hot. 8 bits
    per column (256 ranks) is granular enough to separate thousands of
    output files; the default stays well under the int64 budget for up
    to 7 columns.

    Supported key types (Delta/Iceberg OPTIMIZE ZORDER parity): numeric,
    boolean, date, timestamp, and STRING. Strings order by an int64
    surrogate built from the first 7 bytes (big-endian), so the rank
    preserves lexicographic prefix order — min/max envelopes on the
    string column itself stay tight and prefix/range predicates prune.
    No raw ``cast('double')`` on non-numerics: under Spark 4 ANSI mode
    that throws CAST_INVALID_INPUT mid-``approxQuantile``. Unsupported
    types (binary, nested) raise ValueError up front.
    """
    n_cols = len(cluster_by)
    if n_cols < 2:
        raise ValueError("zorder_value needs >= 2 columns; use write_clustered for 1")
    if n_cols * bits_per_col > 63:
        bits_per_col = 63 // n_cols
    n_buckets = 1 << bits_per_col
    probs = [i / n_buckets for i in range(1, n_buckets)]
    dtypes = {f.name: f.dataType for f in df.schema.fields}
    bucket_cols = []
    for name in cluster_by:
        # NB: the rank filter below evaluates ``v`` once per BOUNDARY
        # element. For raw numeric columns that's a per-element cast of
        # an attribute (cheap); write_zordered pre-projects non-trivial
        # ordinals (string surrogates, epoch arithmetic) into real
        # columns first so this never re-evaluates an expensive chain
        # 2^bits times per row.
        v = _zorder_ordinal(F.col(name), dtypes.get(name), name)
        bounds = df.select(v.alias("v")).na.drop().stat.approxQuantile(
            "v", probs, 1.0 / n_buckets
        )
        # Dedup boundaries (low-cardinality keys yield repeats); keep order.
        uniq: list[float] = []
        for b in bounds:
            if not uniq or b > uniq[-1]:
                uniq.append(b)
        # rank = #boundaries strictly below the value: monotone, null -> 0
        bucket = F.size(F.filter(F.array(*[F.lit(b) for b in uniq]), lambda b: v > b))
        bucket = F.coalesce(bucket, F.lit(0)).cast("long")
        # Left-align LOW-cardinality ranks across the full 2^bits grid:
        # a 40-category key otherwise occupies only the LOW 6 bits, so
        # the interleave's high bits all come from the other columns and
        # range-partitioned files stop pruning this key at all (observed:
        # 26/32 row groups overlapping one category before scaling, 6/32
        # after). Scaling by a constant is monotone, so the dominance
        # invariant that makes pruning sound is unchanged. Only fires
        # below half-occupancy: near-full ranks gain nothing and the
        # floor() rank gaps would perturb bit boundaries.
        n_ranks = len(uniq) + 1
        if n_ranks <= n_buckets // 2:
            bucket = F.floor(bucket * F.lit(n_buckets) / F.lit(n_ranks)).cast(
                "long"
            )
        bucket_cols.append(bucket)
    one = F.lit(1).cast("long")
    z = F.lit(0).cast("long")
    for bit in range(bits_per_col):
        for ci, bucket in enumerate(bucket_cols):
            z = z.bitwiseOR(
                F.shiftleft(F.shiftright(bucket, bit).bitwiseAND(one), bit * n_cols + ci)
            )
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    cluster_by: list[str],
    num_files: int | None = None,
    bits_per_col: int = 8,
    mode: str = "overwrite",
    compression: str = "snappy",
) -> None:
    """Multi-column clustered parquet write on a Z-order curve.

    ``write_clustered`` makes min/max pruning work for the single
    leading key; this makes it work for each of ``cluster_by``
    independently (the Delta/Iceberg OPTIMIZE ZORDER layout). One global
    range shuffle on the z-value, files sorted within — the one-time
    cost buys row-group skipping for every subsequent selective read on
    any clustered column at 100 TB.
    """
    from pyspark.sql import types as T

    spark = df.sparkSession
    if num_files is None:
        num_files = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))

    def _temp(base: str, cols) -> str:
        name = base
        while name in cols:
            name += "_"
        return name

    # Pre-project NON-NUMERIC ordinals (string surrogates, epoch
    # arithmetic) into real columns: zorder_value's rank filter
    # evaluates its input per boundary element (up to 2^bits times per
    # row), which is fine for an attribute cast but ruinous for the
    # string surrogate's hex/conv chain. Numeric keys pass through
    # untouched.
    dtypes = {f.name: f.dataType for f in df.schema.fields}
    pre, zkeys, temps = df, [], []
    for name in cluster_by:
        if isinstance(dtypes.get(name), (T.NumericType, T.BooleanType)):
            zkeys.append(name)
            continue
        oc = _temp(f"__zord_{name}", pre.columns)
        pre = pre.withColumn(oc, _zorder_ordinal(F.col(name), dtypes.get(name), name))
        zkeys.append(oc)
        temps.append(oc)

    z = zorder_value(pre, zkeys, bits_per_col=bits_per_col)
    # collision-free temp column: a fixed "__z__" would silently swallow
    # a same-named input column through withColumn+drop
    zcol = _temp("__z__", pre.columns)
    (
        pre.withColumn(zcol, z)
        .repartitionByRange(num_files, zcol)
        .sortWithinPartitions(zcol)
        .drop(zcol, *temps)
        .write.option("compression", compression)
        .mode(mode)
        .parquet(path)
    )
