"""SQLite source/sink (S5 / K4 / S6) — the reference's local RDBMS edge.

The reference reads with ``pd.read_sql_query("SELECT * FROM pregao_b3")``
(reference src/query_db.py:18-19) and writes row-at-a-time /
``executemany`` inserts (src/bitoin_coin_gecko_api.py:50-54,
src/scrapping_b3.py:140-148). Two Spark-first paths:

- :func:`read_sqlite` / :func:`write_sqlite` — stdlib ``sqlite3`` on the
  driver bridged through Arrow. SQLite is a single-file, single-writer
  store: it IS a driver-side edge, exactly like the reference treats it.
  The result immediately becomes a distributed DataFrame.
- :func:`read_jdbc` / :func:`write_jdbc` — the real-cluster path for
  server RDBMS (partitioned parallel reads via ``partitionColumn``).
  Needs the vendor JDBC jar on the classpath; raises a clear error
  otherwise (no jars ship in this container).
"""

from __future__ import annotations

import sqlite3

from pyspark.sql import DataFrame, SparkSession


def read_sqlite(
    spark: SparkSession, db_path: str, query: str, batch_rows: int = 50_000
) -> DataFrame:
    """S5/S6: SQL over a SQLite file → DataFrame (driver-side fetch,
    Arrow-batched into the JVM).

    The reference's pattern (`SELECT * FROM pregao_b3`,
    `... ORDER BY id DESC`) — plus anything else SQLite can answer.
    """
    import pandas as pd

    with sqlite3.connect(db_path) as conn:
        pdf = pd.read_sql_query(query, conn)
    # Arrow conversion path (spark.sql.execution.arrow.pyspark.enabled)
    return spark.createDataFrame(pdf)


def write_sqlite(
    df: DataFrame, db_path: str, table: str, mode: str = "append"
) -> int:
    """K4: batch insert into a SQLite table (``executemany`` semantics).

    Collects through ``toPandas`` (Arrow) on the driver — correct for
    the reference's scale (SQLite can't accept a distributed write
    anyway); server RDBMS at scale goes through :func:`write_jdbc`.
    Returns the number of rows written.
    """
    pdf = df.toPandas()
    with sqlite3.connect(db_path) as conn:
        pdf.to_sql(table, conn, if_exists={"append": "append", "overwrite": "replace"}[mode], index=False)
    return len(pdf)


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    num_partitions: int = 8,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    **options: str,
) -> DataFrame:
    """S5 at cluster scale: parallel partitioned JDBC read. With
    ``partition_column`` + bounds, Spark issues ``num_partitions`` range
    queries concurrently instead of one serial cursor."""
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("numPartitions", str(num_partitions))
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
        )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


def write_jdbc(
    df: DataFrame, url: str, table: str, mode: str = "append", **options: str
) -> None:
    """K4 at cluster scale: executors write partitions in parallel
    batches (`batchsize` option tunes the executemany chunk)."""
    writer = df.write.format("jdbc").option("url", url).option("dbtable", table).mode(mode)
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.save()
