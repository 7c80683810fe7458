"""CSV source/sink — the flat-file edge of the ingestion surface.

The reference ingests tabular pages via ``pd.read_html`` (reference
src/etl.py:97-149) — already covered by io/extract.py — but any engine
replacing it also meets plain CSV drops. Same two scale rules as the
JSONL module:

- **Never infer the schema.** ``inferSchema=true`` runs an extra full
  pass over the data and drifts with it; every reader here takes an
  explicit ``StructType``. Malformed rows are quarantined via
  PERMISSIVE + ``columnNameOfCorruptRecord``, never fatal.
- **Splittability.** Uncompressed (and bzip2) CSV splits by byte range;
  gzip does not — one task per .gz file, so the writer fans out one
  file per task and read parallelism tracks file count.

The reader is a splittable text scan + ``from_csv`` expression, not
``spark.read.csv``: the native reader forbids queries whose referenced
columns are only the corrupt-record column (the quarantine branch!),
suggesting a full cache as the workaround — a non-starter at corpus
scale — while ``from_csv`` is an ordinary codegen'd expression with the
same PERMISSIVE corrupt-capture semantics and no such restriction.
Trade-off: quoted fields must not embed record delimiters (no
``multiLine``), the norm for machine-written corpus CSV.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _ddl(schema: T.StructType) -> str:
    return ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in schema.fields
    )


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    corrupt_col: str = "_corrupt_record",
    header: bool = True,
    sep: str = ",",
) -> DataFrame:
    """Schema-explicit CSV read with corrupt-row quarantine.

    Well-formed rows parse into typed columns; rows that fail to parse
    (wrong arity, bad casts) land whole in ``corrupt_col`` — split with
    ``jsonl.split_corrupt``, which is format-agnostic.

    ``header=True`` drops lines equal to the schema's header string
    (each task-written part file carries one); a data row that is
    byte-identical to the header is indistinguishable from one — as in
    every distributed CSV reader."""
    full = T.StructType(
        list(schema.fields) + [T.StructField(corrupt_col, T.StringType())]
    )
    raw = spark.read.text(path)
    if header:
        raw = raw.filter(
            F.col("value") != sep.join(f.name for f in schema.fields)
        )
    # hive-layout partition columns discovered by the text scan ride
    # alongside `value`; carry them through the parse
    part_cols = [c for c in raw.columns if c != "value"]
    parsed = raw.select(
        F.from_csv(
            F.col("value"),
            _ddl(full),
            {
                "mode": "PERMISSIVE",
                "columnNameOfCorruptRecord": corrupt_col,
                "sep": sep,
                # quoted fields may embed separators; escape per RFC 4180
                "quote": '"',
                "escape": '"',
            },
        ).alias("r"),
        *part_cols,
    )
    return parsed.select("r.*", *part_cols)


def write_csv(
    df: DataFrame,
    path: str,
    compression: str = "none",
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
    header: bool = True,
    sep: str = ",",
) -> None:
    """CSV sink. Uncompressed by default so the output stays
    byte-range-splittable; ``partition_by`` gives hive-layout pruning."""
    w = df.write.mode(mode).options(
        header=str(header).lower(),
        sep=sep,
        compression=compression,
        quote='"',
        escape='"',
    )
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.csv(path)
