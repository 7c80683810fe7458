"""Streaming sources (T1/T3) re-expressed Spark-first.

The reference's stream is a 1 Hz ``while True`` poll of a price API
pushed record-at-a-time to Firehose (reference src/ingest_strem_btc.py:
44-58); its batch trigger is an S3 ObjectCreated event starting a Glue
run (reference src/sqs.py:63-87, src/trigger_glue.py:14-26). Here:

- :func:`tick_source` — the rate source paces micro-batches at N rows/s;
  the "fetch" is a deterministic synthetic price expression (a pure
  column function of the tick index), because the network fetch is a
  driver-side concern that does not belong inside the plan. A real
  deployment swaps the expression for a ``foreachBatch`` fetch or a
  Spark 4 custom Python DataSource — the downstream plan is identical.
- :func:`file_source` — file-arrival streaming over a landing directory:
  every new object is discovered and processed, which IS the
  S3-event→job pattern without the Lambda glue.
- :func:`parse_firehose_records` — the reference's Firehose record is a
  2-field JSON ``{timestamp, price}`` (src/ingest_strem_btc.py:52-56);
  this parses a raw ``value: string`` stream of such records into the
  typed tick schema.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TICK_SCHEMA = T.StructType(
    [
        T.StructField("data_hora", T.TimestampType(), False),
        T.StructField("preco_brl", T.DoubleType(), True),
    ]
)

# Firehose record shape: {"timestamp": "YYYY-MM-DD HH:MM:SS", "price": 1.0}
FIREHOSE_RECORD_SCHEMA = T.StructType(
    [
        T.StructField("timestamp", T.StringType(), True),
        T.StructField("price", T.DoubleType(), True),
    ]
)


def synthetic_price(tick: F.Column, base: float = 600_000.0) -> F.Column:
    """Deterministic stand-in for the CoinGecko fetch: a bounded
    pseudo-random walk that is a pure function of the tick index, so
    replays and test runs reproduce identical values."""
    jitter = (F.xxhash64(tick) % 10_000) / F.lit(100.0)  # [-100, 100)
    drift = F.sin(tick.cast("double") / F.lit(600.0)) * F.lit(5_000.0)
    return F.round(F.lit(base) + drift + jitter, 2)


def tick_source(
    spark: SparkSession, rows_per_second: int = 1, base_price: float = 600_000.0
) -> DataFrame:
    """T1: rate-paced tick stream ≙ the 1 Hz poll loop.

    Columns: ``data_hora timestamp, preco_brl double`` — the SQLite
    ``preco_bitcoin`` schema (reference src/bitoin_coin_gecko_api.py:
    23-29) minus the autoincrement id, which streaming replaces with
    event time + exactly-once semantics.
    """
    rate = spark.readStream.format("rate").option(
        "rowsPerSecond", str(rows_per_second)
    )
    return rate.load().select(
        F.col("timestamp").alias("data_hora"),
        synthetic_price(F.col("value"), base_price).alias("preco_brl"),
    )


def file_source(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    fmt: str = "parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """T3: file-arrival streaming over a landing directory.

    Each discovered file becomes part of the next micro-batch — the
    event-driven "object created → run the job" pattern with the event
    bus replaced by source-side file tracking (checkpointed, so files
    are processed exactly once even across restarts). File sources
    REQUIRE an explicit schema: at 100 TB the landing zone is too big to
    re-infer per trigger, and drifted files must canonicalize, not
    re-shape the stream.
    """
    reader = spark.readStream.format(fmt).schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.load(path)


def parse_firehose_records(
    raw: DataFrame, value_col: str = "value"
) -> DataFrame:
    """Parse one-JSON-per-record Firehose payloads into typed ticks.

    ``from_json`` with an explicit schema (P16's extraction, streaming
    form); unparseable records yield null struct fields rather than
    failing the query — they stay countable for a dead-letter filter.
    """
    rec = F.from_json(F.col(value_col).cast("string"), FIREHOSE_RECORD_SCHEMA)
    return raw.select(
        F.to_timestamp(rec["timestamp"]).alias("data_hora"),
        rec["price"].alias("preco_brl"),
    )
