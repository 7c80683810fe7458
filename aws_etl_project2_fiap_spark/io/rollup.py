"""Incremental rollup maintenance — materialized aggregates that fold
in new data without recomputing history.

The pattern (hypertable/continuous-aggregate style): a rollup table is
a partitioned parquet aggregate keyed by (partition_col, *dims). When a
new batch lands, only the partitions the batch touches are re-merged
and rewritten (dynamic partition overwrite); untouched history is never
read or written. This is the only rollup shape that works at 100 TB —
a full nightly recompute over the fact table is a full scan of
everything ever ingested, while the incremental fold scans just the
delta plus the (already tiny) rollup rows of the affected partitions.

Correctness hinges on the aggregates being ALGEBRAIC (mergeable from
partials): count/sum merge by sum, min/max by min/max. COUNT DISTINCT
is not algebraic — the rollup carries a mergeable HLL SKETCH instead
(kind ``approx_distinct``): the Datasketches binary from
``hll_sketch_agg`` lives in the rollup row, folds via
``hll_union_agg`` (set union — re-delivered values never double-count,
unlike a sum of partial counts), and reads back through
:func:`finalize_rollup`'s ``hll_sketch_estimate``. The incremental
estimate is BIT-IDENTICAL to a full recompute's, because sketch union
is associative/commutative/idempotent. Exact medians/distincts still
need a raw re-aggregation; the supported spec keeps that explicit.

Test coverage: tests/test_rollup.py (untouched partitions stay
byte-identical; merged result equals a full recompute); the
`rollup_incremental` workload component hash-checks the end-to-end
init → fold → read-back against DuckDB's full GROUP BY.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException

# out_name -> (kind, source column);
# kind ∈ {count, sum, min, max, approx_distinct}
AggSpec = dict[str, tuple[str, str | None]]

# Datasketches HLL precision: 2^12 registers ≈ 1.6% relative std error,
# 4 KB max per (group, column) sketch — rollup rows stay tiny
_HLL_LG_K = 12


def _init_exprs(aggs: AggSpec) -> list[Column]:
    out = []
    for name, (kind, src) in aggs.items():
        if kind == "count":
            out.append(F.count(F.lit(1)).alias(name))
        elif kind in ("sum", "min", "max"):
            out.append(getattr(F, kind)(src).alias(name))
        elif kind == "approx_distinct":
            out.append(F.hll_sketch_agg(src, _HLL_LG_K).alias(name))
        else:
            raise ValueError(f"non-mergeable aggregate kind: {kind}")
    return out


def _merge_exprs(aggs: AggSpec) -> list[Column]:
    # partial-to-final merge: counts and sums re-sum, min/max
    # re-min/max, HLL sketches set-union (idempotent: overlapping
    # deliveries never inflate the distinct estimate)
    merge_fn = {
        "count": F.sum,
        "sum": F.sum,
        "min": F.min,
        "max": F.max,
        "approx_distinct": lambda c: F.hll_union_agg(c, True),
    }
    return [merge_fn[kind](name).alias(name) for name, (kind, _) in aggs.items()]


def finalize_rollup(df: DataFrame, aggs: AggSpec) -> DataFrame:
    """Query-time view of a rollup: sketch columns estimate to BIGINT
    counts, everything else passes through. Keep the STORED rollup in
    sketch form — estimating is lossy and un-mergeable, so it happens
    only at the read edge."""
    cols = []
    for c in df.columns:
        if c in aggs and aggs[c][0] == "approx_distinct":
            cols.append(F.hll_sketch_estimate(F.col(c)).alias(c))
        else:
            cols.append(F.col(c))
    return df.select(*cols)


def init_rollup(
    df: DataFrame,
    rollup_path: str,
    partition_col: str,
    dims: list[str],
    aggs: AggSpec,
) -> None:
    """Materialize the rollup from scratch: one shuffle on the group
    keys, written partitioned by ``partition_col``."""
    (
        df.groupBy(partition_col, *dims)
        .agg(*_init_exprs(aggs))
        .write.partitionBy(partition_col)
        .mode("overwrite")
        .parquet(rollup_path)
    )


def incremental_rollup(
    spark: SparkSession,
    new_df: DataFrame,
    rollup_path: str,
    partition_col: str,
    dims: list[str],
    aggs: AggSpec,
) -> list[str]:
    """Fold a new batch into an existing rollup; returns the affected
    partition values.

    Plan shape: the delta aggregates with map-side partials (one
    shuffle over delta-sized data); the affected-partition list is a
    small distinct collected to the driver and inlined (the a1 scalar
    pattern) so the rollup read PRUNES to those partitions; the merge
    re-groups rollup-sized rows; dynamic partition overwrite rewrites
    only the affected directories.
    """
    inc = new_df.groupBy(partition_col, *dims).agg(*_init_exprs(aggs))
    affected = [
        r[0] for r in inc.select(partition_col).distinct().collect()
    ]
    if not affected:
        return []
    try:
        existing = spark.read.parquet(rollup_path).filter(
            F.col(partition_col).isin(affected)
        )
    except AnalysisException:
        # bootstrap: no rollup yet (empty history) — the delta IS the rollup
        existing = inc.filter(F.lit(False))
    merged = (
        existing.unionByName(inc)
        .groupBy(partition_col, *dims)
        .agg(*_merge_exprs(aggs))
    )
    # dynamic partition overwrite pinned at the writer (not the session,
    # which a host application may not have configured): only the
    # affected partition dirs are replaced, history is untouched
    (
        merged.write.option("partitionOverwriteMode", "dynamic")
        .partitionBy(partition_col)
        .mode("overwrite")
        .parquet(rollup_path)
    )
    return affected
