"""Scalar column helpers — all JVM-side built-ins, no Python UDFs.

Covers the reference's locale-sensitive parsing/formatting (SURVEY §7.4
item 4): pt-BR thousands separators on input (P4/P5/P6) and pt-BR
currency rendering on output (P15, reference src/bitoin_coin_gecko_api.py:66).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    """Column ref that treats a dotted string name as one literal column
    (``Qtde. Teórica``), not a struct-field path."""
    if isinstance(col, str):
        return F.col(f"`{col}`" if "." in col and "`" not in col else col)
    return col


def parse_ptbr_long(col: Column | str) -> Column:
    """P4+P5: strip ``.`` thousands separators then cast, null on failure.

    The reference does ``str.replace('.','')`` + ``pd.to_numeric(errors=
    'coerce')`` (src/etl.py:169-170). ``try_cast`` keeps null-on-error
    semantics under Spark 4's default ANSI mode.
    """
    c = _c(col)
    return F.regexp_replace(c.cast("string"), r"\.", "").try_cast("long")


def rescale_milli(col: Column | str) -> Column:
    """P6: the site renders ``0,494`` which lxml parses as ``494`` — the
    v1 writer divides by 1000 (src/scrapping_b3.py:109; shipped parquet
    proves v1 semantics are canonical)."""
    c = _c(col)
    return c.cast("double") / F.lit(1000.0)


def format_ptbr_currency(col: Column | str, symbol: str = "R$") -> Column:
    """P15: ``R$ 1.234.567,89`` — format_number gives en-US grouping,
    translate swaps ``,``/``.`` (the reference's X-swap trick,
    src/bitoin_coin_gecko_api.py:66), all JVM-side."""
    c = _c(col)
    return F.concat(F.lit(symbol + " "), F.translate(F.format_number(c, 2), ",.", ".,"))


def ts_string(col: Column | str, fmt: str = "yyyy-MM-dd HH:mm:ss") -> Column:
    """P14: timestamp → formatted string at the presentation edge."""
    c = _c(col)
    return F.date_format(c, fmt)
