"""Python UDTFs (table-generating functions) — the third leg of the
§2.10 surface (scalar UDF / grouped UDAF / UDTF).

The reference has no UDTF (its only UDF mechanism is the Glue dynamic
transform, ETL_glue_pregao_B3.json:33,52-64); Spark 4's Python UDTF API
completes the surface for table-generating logic that doesn't decompose
into the built-in generators — stateful per-row expansion where each
output row depends on a running position/state within the input value.

Hot-path caveat (SCALE.md): a UDTF is row-at-a-time Python. Whenever
the expansion IS expressible as `split`+`posexplode` (codegen) or an
Arrow-batched `mapInPandas`, prefer those; `tests/test_udtf.py` proves
this module's span splitter equals the codegen formulation, which is
what the workload queries actually use.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.functions import udtf


@udtf(returnType="span: string, start: int, end: int")
class SentenceSpans:
    """Split text on '.' into trimmed spans WITH character offsets —
    the offset bookkeeping (a running position over the raw string,
    including the separators and whitespace the spans exclude) is the
    part plain `posexplode(split(...))` can't carry."""

    def eval(self, text: str):  # noqa: D102 — UDTF contract
        if text is None:
            return
        pos = 0
        for part in text.split("."):
            stripped = part.strip()
            if stripped:
                start = pos + (len(part) - len(part.lstrip()))
                yield stripped, start, start + len(stripped)
            pos += len(part) + 1


def register_udtfs(spark: SparkSession) -> None:
    """Expose the UDTFs to SQL: ``SELECT s.* FROM t, LATERAL
    sentence_spans(text) s``."""
    spark.udtf.register("sentence_spans", SentenceSpans)
