"""Clustered parquet write: row-group min/max ranges must become
near-disjoint so pushed-down range predicates actually skip IO.

The assertion reads the parquet footers directly (pyarrow): for a
range predicate covering ~10% of the key domain, the clustered layout
must leave most row groups prunable while the shuffled layout's row
groups all straddle the range.
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from aws_etl_project2_fiap_spark.io.parquet import write_clustered


def _row_groups_overlapping(path: str, col: str, lo, hi) -> tuple[int, int]:
    """(overlapping, total) row groups whose [min, max] intersects [lo, hi]."""
    total = overlapping = 0
    for fname in os.listdir(path):
        if not fname.endswith(".parquet"):
            continue
        meta = pq.ParquetFile(os.path.join(path, fname)).metadata
        idx = meta.schema.names.index(col)
        for rg in range(meta.num_row_groups):
            st = meta.row_group(rg).column(idx).statistics
            total += 1
            if st.min <= hi and st.max >= lo:
                overlapping += 1
    return overlapping, total


def test_clustered_layout_prunes_row_groups(spark, tmp_path):
    df = spark.range(0, 200_000).select(
        F.col("id").alias("k"),
        (F.col("id") * 37 % 1000).alias("noise"),
    )
    # shuffled layout: every output task sees the full key domain
    messy = str(tmp_path / "messy")
    df.repartition(16).write.parquet(messy)
    clustered = str(tmp_path / "clustered")
    write_clustered(df, clustered, ["k"], num_files=16)

    lo, hi = 100_000, 120_000  # 10% of the domain
    m_hit, m_total = _row_groups_overlapping(messy, "k", lo, hi)
    c_hit, c_total = _row_groups_overlapping(clustered, "k", lo, hi)
    assert m_hit == m_total  # unordered: nothing prunable
    assert c_hit <= max(2, c_total // 4), (c_hit, c_total)

    # and the data survives intact
    back = spark.read.parquet(clustered)
    assert back.count() == 200_000
    assert back.filter((F.col("k") >= lo) & (F.col("k") < hi)).count() == 20_000


def test_zorder_layout_prunes_both_columns(spark, tmp_path):
    """Z-order vs single-key clustering on two independent keys.

    Single-key clustering prunes on the leading key only — the second
    key spans the full domain in every file. The z-ordered layout must
    leave a majority of row groups prunable for a 10%-range predicate
    on EITHER column, and the data must round-trip bit-exact.
    """
    from aws_etl_project2_fiap_spark.io.parquet import write_zordered

    n = 200_000
    df = spark.range(0, n).select(
        F.col("id").alias("x"),
        # decorrelated second key: multiplicative hash over the same domain
        (F.col("id") * 48271 % n).alias("y"),
        (F.col("id") % 97).alias("payload"),
    )
    single = str(tmp_path / "single")
    write_clustered(df, single, ["x"], num_files=64)
    zpath = str(tmp_path / "zorder")
    # 64 z-range files = 3 bits per dimension: each file covers a 32x32
    # block of the 256x256 rank grid, so a 10%-wide predicate on either
    # column touches only the files whose block intersects ~2 of the 8
    # per-dimension stripes.
    write_zordered(df, zpath, ["x", "y"], num_files=64)

    lo, hi = n // 2, n // 2 + n // 10  # 10% of either domain
    for col in ("x", "y"):
        z_hit, z_total = _row_groups_overlapping(zpath, col, lo, hi)
        # majority-pruned bound, not the typical-case ~35%: under
        # full-suite load the approxQuantile boundaries drift a few
        # files (observed 28/64 once); the single-key layout below
        # hits 64/64 on the second key, so the signal survives
        assert z_hit <= z_total // 2, (col, z_hit, z_total)
    # single-key layout cannot prune the second key at all
    s_hit, s_total = _row_groups_overlapping(single, "y", lo, hi)
    assert s_hit == s_total

    back = spark.read.parquet(zpath)
    assert back.count() == n
    assert back.groupBy().sum("x", "y", "payload").collect() == \
        df.groupBy().sum("x", "y", "payload").collect()
    # pushed-down predicate returns exactly the right rows
    assert back.filter((F.col("y") >= lo) & (F.col("y") < hi)).count() == \
        df.filter((F.col("y") >= lo) & (F.col("y") < hi)).count()


def test_zorder_value_invariants_on_skew_and_nulls(spark):
    """zorder_value on a skewed, null-bearing distribution.

    Invariants: (a) the Morton key preserves component-wise dominance
    (x1<=x2 and y1<=y2 => z1<=z2) — the property that makes contiguous
    z-ranges map to bounded rectangles, i.e. the reason pruning works;
    (b) nulls land in the lowest bucket instead of erroring; (c) heavy
    value skew (90% one key) still yields a valid, total key order.
    """
    from aws_etl_project2_fiap_spark.io.parquet import zorder_value

    df = spark.range(0, 20_000).select(
        # 90% of x collapses onto one hot value; 2% nulls
        F.when(F.col("id") % 50 == 0, F.col("id"))
        .when(F.col("id") % 37 == 1, F.lit(None))
        .otherwise(F.lit(7_777)).alias("x"),
        (F.col("id") * 48271 % 20_000).alias("y"),
    )
    rows = (
        df.withColumn("z", zorder_value(df, ["x", "y"], bits_per_col=6))
        .collect()
    )
    assert all(r.z is not None and r.z >= 0 for r in rows)
    # dominance monotonicity on a deterministic sample of row pairs
    sample = rows[::97]
    for a in sample:
        for b in sample:
            if a.x is None or b.x is None:
                continue
            if a.x <= b.x and a.y <= b.y:
                assert a.z <= b.z, ((a.x, a.y, a.z), (b.x, b.y, b.z))


def test_zorder_string_keys(spark, tmp_path):
    """String cluster keys (the ADVICE r2 crash: cast('double') on
    'cat_93' threw CAST_INVALID_INPUT under ANSI mode mid-quantile).

    The byte-prefix surrogate must (a) not crash, (b) round-trip the
    data bit-exact, and (c) keep lexicographic locality: a one-prefix
    equality predicate leaves most row groups prunable on the string
    column's own min/max stats.
    """
    from aws_etl_project2_fiap_spark.io.parquet import write_zordered

    n = 100_000
    df = spark.range(0, n).select(
        F.concat(F.lit("cat_"), F.lpad((F.col("id") % 40).cast("string"), 2, "0"))
        .alias("cat"),
        (F.col("id") * 48271 % n).alias("y"),
    )
    zpath = str(tmp_path / "zstr")
    write_zordered(df, zpath, ["cat", "y"], num_files=32)

    back = spark.read.parquet(zpath)
    assert back.count() == n
    assert back.filter(F.col("cat") == "cat_07").count() == n // 40
    # locality: the equality point 'cat_07' intersects a minority of
    # row-group [min, max] envelopes on the clustered string column.
    # Threshold is a strict majority-pruned bound, not the typical-case
    # ~20%: approxQuantile boundary drift under full-suite session
    # state occasionally shifts the layout a few files (an unordered
    # layout still hits 100%, so the signal survives).
    hit, total = _row_groups_overlapping(zpath, "cat", "cat_07", "cat_07")
    assert hit <= total // 2, (hit, total)


def test_zorder_rejects_unsupported_type_up_front(spark):
    from aws_etl_project2_fiap_spark.io.parquet import zorder_value

    df = spark.range(0, 10).select(
        F.encode(F.col("id").cast("string"), "utf-8").alias("b"),
        F.col("id").alias("k"),
    )
    import pytest

    with pytest.raises(ValueError, match="unsupported cluster column type"):
        zorder_value(df, ["b", "k"])


def test_zorder_preserves_existing_dunder_z_column(spark, tmp_path):
    """A pre-existing __z__ input column must survive the write (the
    r2 ADVICE low: the fixed temp name silently replaced-then-dropped
    it)."""
    from aws_etl_project2_fiap_spark.io.parquet import write_zordered

    df = spark.range(0, 5_000).select(
        F.col("id").alias("x"),
        (F.col("id") * 7 % 5_000).alias("y"),
        (F.col("id") + 1).alias("__z__"),
    )
    zpath = str(tmp_path / "zkeep")
    write_zordered(df, zpath, ["x", "y"], num_files=4)
    back = spark.read.parquet(zpath)
    assert "__z__" in back.columns
    assert back.filter(F.col("__z__") == F.col("x") + 1).count() == 5_000
