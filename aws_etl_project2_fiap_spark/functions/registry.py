"""Registry of reusable, parameterized DataFrame→DataFrame transforms.

The reference's only UDF mechanism is the Glue Studio *dynamic transform*
— a named, versioned, parameterized whole-frame function (``gs_now`` with
``dateFormat`` parameter, reference ETL_glue_pregao_B3.json:33,52-64).
Spark-native equivalent: plain functions composed with
``DataFrame.transform``, kept in a name→callable registry so pipelines
can be declared as data (a list of (name, params) steps).
"""

from __future__ import annotations

from collections.abc import Callable
from functools import partial

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

Transform = Callable[..., DataFrame]

TRANSFORMS: dict[str, Transform] = {}


def register_transform(name: str) -> Callable[[Transform], Transform]:
    def deco(fn: Transform) -> Transform:
        TRANSFORMS[name] = fn
        return fn

    return deco


def transform(name: str, **params) -> Callable[[DataFrame], DataFrame]:
    """Look up a registered transform and bind its parameters, yielding a
    unary function suitable for ``DataFrame.transform``."""
    return partial(TRANSFORMS[name], **params)


@register_transform("gs_now")
def gs_now(
    df: DataFrame,
    date_format: str = "yyyy-MM-dd",
    column: str = "timestamp",
    now: Column | None = None,
) -> DataFrame:
    """Stamp the current time as a formatted-string column (P9).

    Mirrors the Glue ``gs_now`` dynamic transform (dateFormat parameter,
    applied pre- and post-aggregation in the reference DAG). ``now``
    injects a fixed clock for reproducible tests (SURVEY §7.4 item 3).
    """
    ts = now if now is not None else F.current_timestamp()
    return df.withColumn(column, F.date_format(ts, date_format))


@register_transform("rename_field")
def rename_field(df: DataFrame, old: str, new: str) -> DataFrame:
    """P8: the Glue RenameField node (timestamp → created_at)."""
    return df.withColumnRenamed(old, new)


@register_transform("drop_columns")
def drop_columns(df: DataFrame, columns: list[str]) -> DataFrame:
    """P11: drop leaked temp columns (e.g. ``valor_limpo``)."""
    return df.drop(*columns)


@register_transform("constant_overwrite")
def constant_overwrite(df: DataFrame, column: str, value) -> DataFrame:
    """P10: set a whole column to a literal (reference src/query_db.py:27-33)."""
    return df.withColumn(column, F.lit(value))


@register_transform("fill_null_with_yesterday")
def fill_null_with_yesterday(
    df: DataFrame, column: str, fmt: str = "yyyy-MM-dd HH:mm:ss"
) -> DataFrame:
    """K6 re-expressed: the reference's in-place SQL
    ``UPDATE ... SET data_hora = datetime('now','-1 day') WHERE data_hora
    IS NULL`` (src/query_db.py:36-43) becomes a coalesce projection —
    no mutable storage needed; callers rewrite the table atomically."""
    yesterday = F.date_format(
        F.timestamp_add("DAY", F.lit(-1), F.current_timestamp()), fmt
    )
    return df.withColumn(column, F.coalesce(F.col(column), yesterday))
