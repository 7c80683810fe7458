"""Driver-protocol contract gates.

The driver canonicalizes each query's output with pandas
``sort_values`` + per-cell string rendering. That imposes two hard
contracts on every driver-facing query (CORRECTNESS red/err otherwise,
even when the engine's values are correct — the r2 failure mode):

1. ATOMIC COLUMNS ONLY: array/map/struct columns make pandas
   ``sort_values`` throw ``unhashable type: 'list'`` (the r2
   ``suite_agg_grouping``/``suite_text`` errs). Queries that naturally
   produce arrays must serialize them (``array_join``) at the driver
   boundary.
2. INTEGER-KINDED ORACLES: DuckDB renders HUGEINT (any integer SUM)
   as float64 through ``.df()`` while Spark emits int64 — the driver
   string-renders ``4.0`` vs ``4`` and hash-mismatches (the r1/r2
   ``sessionize_30m`` red). Every oracle integer aggregate must CAST
   to BIGINT; this suite checks the *outcome* (dtype-kind parity
   between both pandas paths) rather than the SQL text.
"""

from __future__ import annotations

import duckdb
import pytest

from pyspark.sql import types as T

from aws_etl_project2_fiap_spark.io.parquet import STAR_TABLES
from aws_etl_project2_fiap_spark.workload import COMPONENTS, ordered_catalog

SF_DIR = "/root/testdata/sf0.001"

_NESTED = (T.ArrayType, T.MapType, T.StructType)

DRIVER_FACING = ordered_catalog()


@pytest.mark.parametrize("name", sorted(DRIVER_FACING))
def test_driver_query_schema_is_atomic(spark, name):
    """Contract 1 over every queries() entry (the driver hashes the
    first 50; applying it to all keeps appended entries safe too)."""
    sdf = DRIVER_FACING[name].spark(spark, SF_DIR)
    nested = [
        f.name for f in sdf.schema.fields if isinstance(f.dataType, _NESTED)
    ]
    assert not nested, (
        f"{name}: non-atomic driver-facing columns {nested} — the driver's "
        f"pandas canonicalization crashes on these; serialize with "
        f"array_join/to_json on BOTH the Spark and oracle sides"
    )


@pytest.mark.parametrize(
    "name", sorted(n for n, qd in COMPONENTS.items() if qd.oracle is not None)
)
def test_component_schema_is_atomic(spark, name):
    """Suite members surface to the driver through unionByName — a
    nested column in any member errs the whole suite row."""
    sdf = COMPONENTS[name].spark(spark, SF_DIR)
    nested = [
        f.name for f in sdf.schema.fields if isinstance(f.dataType, _NESTED)
    ]
    assert not nested, f"{name}: non-atomic component columns {nested}"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t_name in STAR_TABLES:
        con.execute(
            f"CREATE VIEW {t_name} AS SELECT * FROM '{SF_DIR}/{t_name}.parquet'"
        )
    yield con
    con.close()


@pytest.mark.parametrize(
    "name",
    sorted(n for n, qd in DRIVER_FACING.items() if qd.oracle is not None),
)
def test_oracle_dtype_kind_parity(spark, duck, name):
    """Contract 2: both pandas paths must agree on numeric KIND
    (int vs float) per column — the exact asymmetry behind the
    two-round HUGEINT red. NULL-promotion (int64→float64 when a column
    holds NULLs) affects both sides identically, so kinds still match
    on value-identical results; an uncast integer SUM does not."""
    qd = DRIVER_FACING[name]
    spark_pdf = qd.spark(spark, SF_DIR).toPandas()
    duck_pdf = duck.sql(qd.oracle).df()

    s_kinds = {c.lower(): d.kind for c, d in spark_pdf.dtypes.items()}
    d_kinds = {c.lower(): d.kind for c, d in duck_pdf.dtypes.items()}
    assert set(s_kinds) == set(d_kinds), f"{name}: column sets differ"
    mismatched = {
        c: (s_kinds[c], d_kinds[c])
        for c in s_kinds
        if {s_kinds[c], d_kinds[c]} == {"i", "f"}
    }
    assert not mismatched, (
        f"{name}: int-vs-float dtype mismatch {mismatched} — if the oracle "
        f"sums an INTEGER column, CAST(SUM(...) AS BIGINT)"
    )
