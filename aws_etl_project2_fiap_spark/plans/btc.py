"""The BTC price-tick pipeline (batch form).

Reference: one tick → SQLite insert → full ordered read-back →
daily-partitioned parquet (src/bitoin_coin_gecko_api.py). Spark-first:
ticks are a DataFrame with an ingestion-order id; the daily partitioned
layout comes from one partitioned write. The streaming form lives in
``streaming.pipelines``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..io.parquet import write_partitioned

TICK_COLUMNS = ("id", "data_hora", "preco_brl")


def assign_ids(df: DataFrame, ts_col: str = "data_hora") -> DataFrame:
    """K4's AUTOINCREMENT id, re-expressed.

    ``row_number`` over ingestion-time order gives dense per-run ids
    (documented semantic difference from a global autoincrement —
    SURVEY §7.3). The single-partition window is fine for the reference's
    1 Hz stream; bulk backfills should pre-partition by day and use
    (day, row_number) compound keys instead.
    """
    w = Window.orderBy(F.col(ts_col).asc())
    return df.withColumn("id", F.row_number().over(w)).select(*TICK_COLUMNS)


def to_daily_partitions(df: DataFrame, ts_col: str = "data_hora") -> DataFrame:
    """Derive ano/mes/dia partition keys from the tick timestamp
    (reference partitions local parquet by scrape date,
    src/bitoin_coin_gecko_api.py:80-95)."""
    ts = F.to_timestamp(ts_col)
    return (
        df.withColumn("ano", F.year(ts))
        .withColumn("mes", F.month(ts))
        .withColumn("dia", F.dayofmonth(ts))
    )


def write_ticks(df: DataFrame, path: str) -> None:
    write_partitioned(to_daily_partitions(df), path, ["ano", "mes", "dia"])


def latest_price(df: DataFrame) -> DataFrame:
    """S6/O2: newest-first read-back (``ORDER BY id DESC``)."""
    return df.orderBy(F.desc("id"))


def run_stream(
    spark,
    out_path: str,
    checkpoint: str,
    ticks_per_batch: int = 60,
    window: str = "1 minute",
    watermark: str = "2 minutes",
):
    """End-to-end streaming product: tick source → watermarked tumbling
    OHLC aggregate → checkpointed parquet (the pipeline the reference's
    design implies: poll loop ≙ custom source, Firehose buffer ≙
    trigger+sink, plus the aggregation it never wrote).

    Uses the engine's custom ``b3_ticks`` DataSource (deterministic
    fetch, exactly-once offsets) and drains what's available — call
    repeatedly for the batch-per-invocation cadence, or swap the trigger
    for processingTime in always-on deployments. Returns the query.
    """
    from ..streaming.datasource import TickDataSource
    from ..streaming.pipelines import tumbling_window_agg

    spark.dataSource.register(TickDataSource)
    ticks = (
        spark.readStream.format("b3_ticks")
        .option("ticks_per_batch", str(ticks_per_batch))
        .load()
    )
    agg = tumbling_window_agg(ticks, window=window, watermark=watermark)
    return (
        agg.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
