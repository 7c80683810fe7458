"""Window-function operators (SURVEY §2.8).

The reference has no window functions; these are the idiomatic patterns
its data shape implies (daily snapshots + tick streams): day-over-day
deltas, dedup-keep-latest, running totals, per-group top-n,
sessionization. Each is one hash-partition shuffle on its keys; windows
over the same (keys, order) share the shuffle in one plan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, WindowSpec
from pyspark.sql import functions as F


def by_key_ordered(keys: list[str], order: list[Column | str]) -> WindowSpec:
    return Window.partitionBy(*keys).orderBy(*order)


def lag_delta(
    df: DataFrame, keys: list[str], order: list, value_col: str, out_col: str = "delta"
) -> DataFrame:
    """Day-over-day (tick-over-tick) delta via lag."""
    w = by_key_ordered(keys, order)
    return df.withColumn(out_col, F.col(value_col) - F.lag(value_col).over(w))


def running_sum(
    df: DataFrame, keys: list[str], order: list, value_col: str, out_col: str = "rsum"
) -> DataFrame:
    w = by_key_ordered(keys, order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.withColumn(out_col, F.sum(value_col).over(w))


def top_n_per_group(
    df: DataFrame, keys: list[str], order: list, n: int, rank_col: str = "rnk"
) -> DataFrame:
    """Per-group top-n via row_number (deterministic when ``order`` ends
    with a unique key)."""
    w = by_key_ordered(keys, order)
    return df.withColumn(rank_col, F.row_number().over(w)).filter(
        F.col(rank_col) <= n
    )


def sessionize(
    df: DataFrame,
    key: str,
    ts_col: str,
    gap_minutes: int = 30,
    session_col: str = "session_id",
) -> DataFrame:
    """Gap-based sessionization: a new session starts when the time since
    the previous event exceeds the gap; session id = running count of
    session starts per key. Two stacked windows, one shuffle."""
    w = Window.partitionBy(key).orderBy(F.col(ts_col).asc())
    gap = F.col(ts_col).cast("double") - F.lag(F.col(ts_col).cast("double")).over(w)
    is_new = F.when(
        gap.isNull() | (gap > gap_minutes * 60), F.lit(1)
    ).otherwise(F.lit(0))
    return df.withColumn("__new", is_new).withColumn(
        session_col,
        F.sum("__new").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    ).drop("__new")


def grouped_global_rank(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[str],
    bins: int = 32,
    rel_err: float = 0.05,
    rank_col: str = "__grank",
    n_col: str = "__gn",
) -> DataFrame:
    """Exact per-group rank WITHOUT a whole-group sort in one task.

    ``Window.partitionBy(group).orderBy(order)`` sorts each group in a
    single task — with low-cardinality groups (e.g. 5 order priorities)
    that is 5-way parallelism no matter how big the data. This two-pass
    form restores full parallelism while staying bit-identical:

    1. bin rows by range of the LEADING order column, boundaries from
       one ``approxQuantile`` pass (equal values always share a bin, so
       ordering across bins is preserved by construction);
    2. ``row_number`` within the fine (group, bin) partitions — the one
       big-table shuffle, now spread over ``groups × bins`` tasks;
    3. per-(group, bin) counts (map-side partial agg on the SAME keys →
       tiny shuffle) → cumulative offsets per group via a window over
       the tiny aggregate → broadcast-joined back; global rank =
       bin offset + local rank.

    Requirements: ascending order ending in a unique tie-break (rank ≡
    row_number), numeric leading order column. Adds ``rank_col`` (1-based
    global rank) and ``n_col`` (group size)."""
    lead = order_cols[0]
    qs = [i / bins for i in range(1, bins)]
    bnds = sorted(set(df.approxQuantile(lead, qs, rel_err))) if qs else []
    if bnds:
        arr = F.array(*[F.lit(float(b)) for b in bnds])
        bin_col = F.size(F.filter(arr, lambda b: b <= F.col(lead)))
    else:
        bin_col = F.lit(0)
    d = df.withColumn("__bin", bin_col)

    w = Window.partitionBy(*group_cols, "__bin").orderBy(*order_cols)
    ranked = d.withColumn("__lr", F.row_number().over(w))

    counts = d.groupBy(*group_cols, "__bin").agg(F.count(F.lit(1)).alias("__c"))
    w_off = (
        Window.partitionBy(*group_cols)
        .orderBy("__bin")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.select(
        *group_cols,
        "__bin",
        F.coalesce(F.sum("__c").over(w_off), F.lit(0)).alias("__off"),
        F.sum("__c").over(Window.partitionBy(*group_cols)).alias(n_col),
    )
    return (
        ranked.join(F.broadcast(offsets), [*group_cols, "__bin"])
        .withColumn(rank_col, F.col("__off") + F.col("__lr"))
        .drop("__bin", "__lr", "__off")
    )


def percent_rank_grouped(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[str],
    out_col: str = "pr",
    bins: int = 32,
) -> DataFrame:
    """Scale-safe percent_rank: (rank−1)/(n−1) from
    :func:`grouped_global_rank` — identical values to the native window
    (unique tie-break ⇒ rank ≡ row_number), full parallelism."""
    r = grouped_global_rank(df, group_cols, order_cols, bins=bins)
    pr = F.when(F.col("__gn") <= 1, F.lit(0.0)).otherwise(
        (F.col("__grank") - 1).cast("double") / (F.col("__gn") - 1)
    )
    return r.withColumn(out_col, pr).drop("__grank", "__gn")


def ntile_grouped(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[str],
    n_tiles: int,
    out_col: str = "tile",
    bins: int = 32,
) -> DataFrame:
    """Scale-safe ntile: SQL-standard bucket arithmetic (first n mod T
    buckets get the extra row) over the global rank — matches the native
    window bit-for-bit under a unique ordering."""
    r = grouped_global_rank(df, group_cols, order_cols, bins=bins)
    n, rk, t = F.col("__gn"), F.col("__grank"), F.lit(n_tiles)
    q, rem = (n / t).cast("long"), n % t
    big_span = rem * (q + 1)  # rows covered by the (q+1)-sized buckets
    tile = F.when(q == 0, rk).otherwise(
        F.when(rk <= big_span, ((rk - 1) / (q + 1)).cast("long") + 1).otherwise(
            rem + ((rk - big_span - 1) / q).cast("long") + 1
        )
    )
    return r.withColumn(out_col, tile.cast("int")).drop("__grank", "__gn")


def autoincrement_id(df: DataFrame, order: list, id_col: str = "id") -> DataFrame:
    """K4's AUTOINCREMENT emulation — dense ids in a defined order.
    Single-partition window: only for driver-scale frames; at scale use
    (partition-key, row_number) compound identity."""
    return df.withColumn(id_col, F.row_number().over(Window.orderBy(*order)))


def resample_ffill(
    df: DataFrame,
    key: str,
    ts_col: str,
    val_col: str,
    step: str = "interval 1 hour",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Regular-grid resampling with forward fill — the hypertable
    ``time_bucket_gapfill``/pandas ``resample().ffill()`` shape: per
    key, generate an evenly-spaced timestamp grid spanning that key's
    observed range and carry the last observation forward onto each
    grid point.

    Mechanics: the grid rows (value = null) union with the raw rows;
    one per-key ordered window takes ``last(value, ignorenulls=True)``
    over rows-unbounded-preceding; grid rows are then kept. Raw rows
    sort BEFORE a grid point at the same timestamp (an observation at
    the boundary is already visible to it); ``tiebreak_col`` pins the
    order of equal-timestamp observations so the fill is deterministic.

    Scale: one shuffle on the key for the window; the grid is generated
    with ``sequence`` inside codegen (no driver loop), its size bounded
    by span/step per key. Keys are independent — skew only from a key
    whose span dwarfs the rest, which salting by coarse time ranges
    fixes (two-pass fill, same pattern as grouped_global_rank).

    Returns (key, ts, value) — grid rows only.
    """
    bounds = df.groupBy(key).agg(
        F.date_trunc("hour", F.min(ts_col)).alias("__mn"),
        F.max(ts_col).alias("__mx"),
    )
    grid = bounds.select(
        key, F.explode(F.expr(f"sequence(__mn, __mx, {step})")).alias(ts_col)
    )
    tb = tiebreak_col or ts_col
    g = grid.select(
        key,
        ts_col,
        F.lit(None).cast("double").alias("__v"),
        F.lit(1).alias("__is_grid"),
        F.lit(None).cast("long").alias("__tb"),
    )
    r = df.select(
        key,
        ts_col,
        F.col(val_col).cast("double").alias("__v"),
        F.lit(0).alias("__is_grid"),
        F.col(tb).cast("long").alias("__tb"),
    )
    w = (
        Window.partitionBy(key)
        .orderBy(ts_col, "__is_grid", "__tb")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        g.unionByName(r)
        .withColumn("__ff", F.last("__v", ignorenulls=True).over(w))
        .filter(F.col("__is_grid") == 1)
        .select(key, ts_col, F.col("__ff").alias(val_col))
    )


def ewma(
    df: DataFrame,
    key_cols: list[str],
    order_cols: str | list[str],
    value_col: str,
    alpha: float = 0.2,
    out_col: str = "ewma",
) -> DataFrame:
    """Exponentially-weighted moving average per key, exact recurrence
    ``y_0 = x_0; y_t = alpha·x_t + (1−alpha)·y_{t−1}`` (pandas
    ``ewm(adjust=False)`` semantics).

    The recurrence is inherently sequential per key, so it runs as ONE
    ``applyInPandas`` pass per key group — one shuffle on the keys,
    O(rows) compute, state is a single float. The float ops are applied
    in the exact literal order of the recurrence so a SQL oracle using
    the same expression (recursive CTE) reproduces it bit-for-bit.
    At 100 TB: keys partition the work; a single key's history must fit
    one task (same residency bound as any per-key ordered operator —
    for unbounded histories switch to the streaming form,
    streaming/pipelines.stateful_running_stats' pattern)."""
    import pandas as pd

    order_cols = [order_cols] if isinstance(order_cols, str) else list(order_cols)
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in df.select(*key_cols, *order_cols, value_col).schema.fields
    ) + f", {out_col} double"
    # alpha=0.2 pairs with the literal 0.8 (1.0-0.2 in IEEE is NOT the
    # double the SQL literal 0.8 denotes — the oracle writes literals,
    # so the engine must use the same doubles in the same order to be
    # bit-reproducible). Other alphas use the computed complement; an
    # oracle for them must write the same expression (1 - alpha), not a
    # decimal literal.
    a = float(alpha)
    b = 0.8 if alpha == 0.2 else 1.0 - a

    def _ewma_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_cols, kind="mergesort").reset_index(drop=True)
        xs = pdf[value_col].tolist()
        ys = []
        prev = None
        for x in xs:
            prev = float(x) if prev is None else a * float(x) + b * prev
            ys.append(prev)
        pdf[out_col] = ys
        return pdf

    return (
        df.select(*key_cols, *order_cols, value_col)
        .groupBy(*key_cols)
        .applyInPandas(_ewma_group, out_schema)
    )
