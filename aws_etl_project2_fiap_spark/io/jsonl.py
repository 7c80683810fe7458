"""JSON-Lines source/sink — the interchange format of LLM corpus
pipelines (one document object per line).

The reference's only semi-structured ingestion is the CoinGecko JSON
point fetch (reference src/bitoin_coin_gecko_api.py:38-45); this module
generalizes it to corpus-scale JSONL with the two rules that matter at
100 TB:

- **Never infer the schema.** ``spark.read.json`` without a schema runs
  a full extra pass over the data just to guess types (and guesses
  differently as the corpus drifts). Every reader here requires an
  explicit ``StructType``; malformed lines are quarantined, not fatal.
- **Write many files.** Compressed text (gzip here — this build's JSON
  sink lacks zstd) is NOT splittable: a reader gets one task per file.
  The writer therefore fans out one file per task, so read parallelism
  tracks file count — size tasks at write time, or write
  ``compression='none'`` for byte-range-splittable raw lines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# the documents table's interchange schema (TESTDATA.md): doc objects
DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("lang", T.StringType()),
        T.StructField("text", T.StringType()),
    ]
)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    corrupt_col: str = "_corrupt_record",
) -> DataFrame:
    """Schema-explicit JSONL read: well-formed lines parse into typed
    columns, malformed lines land whole in ``corrupt_col`` for
    quarantine instead of failing the job (one bad line in a multi-TB
    crawl dump must not kill the read).

    Implemented as a splittable text scan + ``from_json`` expression
    rather than ``spark.read.json``: the raw-JSON reader forbids
    queries that touch only the corrupt column (so the quarantine
    branch would need a cache of the whole input), while ``from_json``
    is an ordinary codegen'd expression with the same PERMISSIVE
    corrupt-capture semantics."""
    full = T.StructType(
        list(schema.fields) + [T.StructField(corrupt_col, T.StringType())]
    )
    raw = spark.read.text(path)
    parsed = raw.select(
        F.from_json(
            F.col("value"),
            full,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": corrupt_col},
        ).alias("r")
    )
    return parsed.select("r.*")


def split_corrupt(
    df: DataFrame, corrupt_col: str = "_corrupt_record"
) -> tuple[DataFrame, DataFrame]:
    """(clean, quarantine) split: clean rows lose the corrupt column,
    quarantined rows keep only the raw line for reprocessing."""
    clean = df.filter(F.col(corrupt_col).isNull()).drop(corrupt_col)
    bad = df.filter(F.col(corrupt_col).isNotNull()).select(corrupt_col)
    return clean, bad


def write_jsonl(
    df: DataFrame,
    path: str,
    compression: str = "gzip",
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """JSONL sink. gzip by default (~6× smaller; parallelism via one
    file per task — see module note); pass ``compression='none'`` for
    line-splittable raw text, and ``partition_by`` for hive-layout
    pruning on read."""
    w = df.write.mode(mode).option("compression", compression)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.json(path)
