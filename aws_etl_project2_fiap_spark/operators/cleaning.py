"""The B3 clean chain (P1/P4/P5/P6/P7/P11) as one lazy projection.

Re-expresses reference ``transform_b3_data`` (src/etl.py:153-187) and the
v1 variant (src/scrapping_b3.py:100-116): filter footer rows, strip pt-BR
thousands separators, cast null-on-error, rescale participation, rename
to snake_case. One ``select`` + one ``filter`` → Catalyst pushes the
footer-row predicate into the parquet scan when the input is a file
source; nothing here shuffles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.scalars import parse_ptbr_long, rescale_milli

# pandas-era header → engine column name (reference src/etl.py:176-183)
B3_RENAMES = {
    "Código": "cod",
    "Ação": "acao",
    "Tipo": "tipo",
    "Qtde. Teórica": "qtde_teorica",
    "Part. (%)": "part_teorica_porc",
}

# Footer/summary rows emitted by the scrape (reference src/etl.py:163-164)
B3_FOOTER_CODES = ("Redutor", "Quantidade Teórica Total")


def filter_footer_rows(df: DataFrame, code_col: str = "Código") -> DataFrame:
    """P1: drop the Redutor / grand-total pseudo-rows."""
    pred: Column = ~F.col(code_col).isin(*B3_FOOTER_CODES)
    return df.filter(pred)


def clean_b3(df: DataFrame, stamp_col: str | None = None) -> DataFrame:
    """Full clean chain over a raw scraped frame (F3 fixture shape).

    Input columns: ``Código, Ação, Tipo, Qtde. Teórica (ptBR string),
    Part. (%) (int ×1000)`` — output: ``cod, acao, tipo, qtde_teorica
    long, part_teorica_porc double`` (+ optional ``data_hora`` stamp,
    the v1 writer's extra column, src/scrapping_b3.py:113).
    """
    out = filter_footer_rows(df).select(
        F.col("Código").alias("cod"),
        F.col("Ação").alias("acao"),
        F.col("Tipo").alias("tipo"),
        parse_ptbr_long("Qtde. Teórica").alias("qtde_teorica"),
        rescale_milli("Part. (%)").alias("part_teorica_porc"),
    )
    if stamp_col:
        out = out.withColumn(
            stamp_col, F.date_format(F.current_timestamp(), "yyyy-MM-dd HH:mm:ss")
        )
    return out
