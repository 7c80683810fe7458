"""The B3 pregão pipeline — the reference's Glue DAG, Spark-first.

Reference DAG (ETL_glue_pregao_B3.json, see SURVEY §3.2)::

    S3 parquet source (raw/, recurse)
      → gs_now: add `timestamp` (yyyy-MM-dd)
      → SparkSQL: 7-day SUM, top-5  (A1)
      → gs_now again → RenameField: timestamp → created_at
      → partitioned glueparquet sink + catalog upsert

Two semantic variants are implemented (SURVEY §7.4 item 2):

- ``reference``: the shipped behavior — the first gs_now stamps *read
  time* on every row, so the 7-day BETWEEN filter is vacuous and the
  aggregation covers every landed partition.
- ``intended``: filter on the data's own date (partition keys / embedded
  ``data_hora``), which prunes partitions at the parquet scan.

Both are pure DataFrame plans: scan → project → filter → partial
hash-agg → shuffle on (cod, acao) → final hash-agg →
TakeOrderedAndProject(5) → rename → partitioned write. At 100 TB the
``intended`` variant reads 7 partitions, not the table.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.registry import gs_now, rename_field
from ..io.parquet import canonicalize, read_partitioned, write_partitioned

# Canonical raw schema (SURVEY §1.2); `valor_limpo` is a leaked temp
# column (ETL_glue_pregao_B3.json:332-338) dropped by canonicalization.
RAW_SCHEMA = T.StructType(
    [
        T.StructField("cod", T.StringType()),
        T.StructField("acao", T.StringType()),
        T.StructField("tipo", T.StringType()),
        T.StructField("qtde_teorica", T.LongType()),
        T.StructField("part_teorica_porc", T.DoubleType()),
        T.StructField("data_hora", T.TimestampType()),
    ]
)

TOTAL_COL = "total_qtde_teorica_dos_ultimos_7_dias"


def read_raw(spark: SparkSession, raw_path: str) -> DataFrame:
    """S4 + §1.4: mergeSchema read and canonicalization of the raw zone."""
    df = spark.read.option("mergeSchema", "true").parquet(raw_path)
    return canonicalize(
        df, RAW_SCHEMA, drop_extras=False, timestamp_format="yyyy-MM-dd HH:mm:ss"
    ).drop("valor_limpo")


def top5_7day_sum(
    df: DataFrame,
    run_date: dt.date | None = None,
    semantics: str = "intended",
    date_col: Column | None = None,
) -> DataFrame:
    """A1: SUM(qtde_teorica) per (cod, acao) over the last 7 days, top 5.

    ``run_date`` is the injectable clock (tests stay deterministic);
    ``semantics`` picks reference-vs-intended filtering (module doc).
    """
    today = F.lit(run_date) if run_date else F.current_date()
    if semantics == "reference":
        # gs_now stamps read time → BETWEEN is a tautology (kept for parity)
        stamped = gs_now(df, "yyyy-MM-dd")
        filtered = stamped.filter(
            F.to_date("timestamp").between(F.date_sub(today, 7), today)
        )
    else:
        event_date = (
            date_col
            if date_col is not None
            else F.coalesce(
                F.to_date("data_hora"),
                F.make_date("ano", "mes", "dia"),
            )
        )
        # partition-key filter → PruneFileSourcePartitions at scan time
        filtered = df.filter(event_date.between(F.date_sub(today, 7), today))
    return (
        filtered.groupBy("cod", "acao")
        .agg(F.sum("qtde_teorica").alias(TOTAL_COL))
        .orderBy(F.desc(TOTAL_COL), "cod")
        .limit(5)
    )


def refined(
    df: DataFrame, run_date: dt.date | None = None, semantics: str = "intended"
) -> DataFrame:
    """Full refined-zone projection: A1 + created_at stamp + rename (P8/P9)."""
    today = F.lit(run_date) if run_date else F.current_date()
    out = top5_7day_sum(df, run_date=run_date, semantics=semantics)
    out = gs_now(out, "yyyy-MM-dd", now=today.cast("timestamp"))
    return rename_field(out, "timestamp", "created_at")


def run(
    spark: SparkSession,
    raw_path: str,
    refined_path: str,
    run_date: dt.date | None = None,
    semantics: str = "intended",
) -> DataFrame:
    """End-to-end: raw scan → refined write, partitioned by (acao,
    created_at) like the Glue sink (ETL_glue_pregao_B3.json:254)."""
    out = refined(read_raw(spark, raw_path), run_date=run_date, semantics=semantics)
    write_partitioned(out, refined_path, ["acao", "created_at"])
    return out
