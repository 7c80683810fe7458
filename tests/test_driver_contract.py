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

import pytest

from pyspark.sql import types as T

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


# Contract 2 — dtype-KIND parity between the two pandas paths (the
# two-round HUGEINT red) — is asserted inside
# tests/test_oracle_parity.py::compare_via_pandas (r13): the parity
# matrix already executes every oracle query and holds both frames, so
# the kind check rides along instead of re-running the full matrix a
# second time (~4 min of suite wall-time, VERDICT r12 #1). Coverage is
# a superset: ORACLE_QUERIES spans CATALOG + COMPONENTS, while this
# file's matrix spanned ordered_catalog() only.
