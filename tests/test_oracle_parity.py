"""t2 correctness: differential testing against the DuckDB oracle.

Mimics the driver's comparison: for every workload query with an oracle,
run the Spark DataFrame plan AND the ANSI SQL on the same parquet
tables, then compare row count, column names, and an order-insensitive
canonical form of all values (columns sorted by name, rows sorted,
floats rounded) — the same contract as CORRECTNESS_r{N}.json.

CRITICAL: both sides go through PANDAS frames (DuckDB ``rel.df()``,
Spark ``toPandas()``), exactly like the driver — NOT ``fetchall()``.
``fetchall()`` hands DuckDB HUGEINT to Python as ``int`` and silently
hid a two-round hash red: an integer ``SUM`` is HUGEINT in DuckDB,
which ``.df()`` renders as float64, so the driver canonicalized
``4.0`` against Spark's bigint ``4`` and mismatched on values that
were numerically identical (VERDICT r2 #1). The canonicalization here
is dtype-sensitive on purpose so that class of red fails CI.
"""

from __future__ import annotations

import math

import duckdb
import numpy as np
import pandas as pd
import pytest

from aws_etl_project2_fiap_spark.io.parquet import STAR_TABLES
from aws_etl_project2_fiap_spark.workload import CATALOG, COMPONENTS

# every fused-suite component is still differentially checked one-by-one
DEFS = {**CATALOG, **COMPONENTS}

SF_DIR = "/root/testdata/sf0.001"  # small SF keeps the suite fast


def canon_pdf(pdf: pd.DataFrame) -> list[tuple[str, ...]]:
    """Driver-shaped canonical form over a PANDAS frame: columns sorted
    by (lowercased) name, every cell string-rendered dtype-sensitively
    (float64 4.0 renders differently from int64 4 — that asymmetry IS
    the driver's behavior and what this suite must reproduce), rows
    sorted. NaN/None → 'nan'."""
    pdf = pdf.rename(columns={c: c.lower() for c in pdf.columns})
    pdf = pdf[sorted(pdf.columns)]

    def norm(v) -> str:
        if v is None:
            return "nan"
        if isinstance(v, (float, np.floating)):
            if math.isnan(v):
                return "nan"
            return f"{round(float(v), 6):.6f}"
        if isinstance(v, (int, np.integer)):
            return repr(int(v))
        if isinstance(v, (bool, np.bool_)):
            return repr(bool(v))
        if isinstance(v, pd.Timestamp):
            return v.isoformat()
        if isinstance(v, bytes):
            return v.hex()
        try:
            if pd.isna(v):
                return "nan"
        except (TypeError, ValueError):
            pass
        return repr(v)

    return sorted(
        tuple(norm(v) for v in row) for row in pdf.itertuples(index=False, name=None)
    )


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for name in STAR_TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{SF_DIR}/{name}.parquet'"
        )
    yield con
    con.close()


ORACLE_QUERIES = sorted(n for n, qd in DEFS.items() if qd.oracle is not None)
ROWS_ONLY_QUERIES = sorted(n for n, qd in DEFS.items() if qd.oracle is None)


def compare_via_pandas(spark, con, qd, sf_dir: str, name: str, expect_rows=None):
    """The driver's compare, reproduced: Spark toPandas vs DuckDB .df(),
    schema by sorted column names, values via canon_pdf.

    Also asserts the dtype-KIND parity contract here (r13): both pandas
    paths must agree on numeric kind (int vs float) per column — the
    two-round HUGEINT red (an uncast integer SUM renders ``4.0`` vs
    ``4``). This lived as its own full matrix in
    tests/test_driver_contract.py, which re-executed every oracle query
    a second time (~4 min of the suite's wall-time, the exact budget
    overrun VERDICT r12 #1 flagged); the frames are already in hand
    here, so the assertion is free."""
    sdf = qd.spark(spark, sf_dir)
    spark_pdf = sdf.toPandas()
    duck_pdf = con.sql(qd.oracle).df()

    spark_cols = sorted(c.lower() for c in spark_pdf.columns)
    duck_cols = sorted(c.lower() for c in duck_pdf.columns)
    assert spark_cols == duck_cols, (
        f"{name}: column mismatch {spark_cols} vs {duck_cols}"
    )
    s_kinds = {c.lower(): d.kind for c, d in spark_pdf.dtypes.items()}
    d_kinds = {c.lower(): d.kind for c, d in duck_pdf.dtypes.items()}
    kind_mismatch = {
        c: (s_kinds[c], d_kinds[c])
        for c in s_kinds
        if {s_kinds[c], d_kinds[c]} == {"i", "f"}
    }
    assert not kind_mismatch, (
        f"{name}: int-vs-float dtype mismatch {kind_mismatch} — if the "
        f"oracle sums an INTEGER column, CAST(SUM(...) AS BIGINT)"
    )
    assert len(spark_pdf) == len(duck_pdf), (
        f"{name}: row count {len(spark_pdf)} vs {len(duck_pdf)}"
    )
    if expect_rows is not None:
        assert len(spark_pdf) == expect_rows
    s = canon_pdf(spark_pdf)
    d = canon_pdf(duck_pdf)
    if s != d:
        diff = [(a, b) for a, b in zip(s, d) if a != b][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diff}")


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_parity(spark, duck, name):
    compare_via_pandas(spark, duck, DEFS[name], SF_DIR, name)


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_queries_run(spark, name):
    """Non-SQL-expressible ops: assert they run and have a stable schema."""
    qd = DEFS[name]
    sdf = qd.spark(spark, SF_DIR)
    assert sdf.columns
    assert sdf.count() >= 0


def test_sessionize_30m_parity_at_driver_sf(spark):
    """Pinned regression at sf0.01 — the exact SF the driver hashes,
    through the exact pandas path the driver uses.

    The r1 version of this test used ``fetchall()``, which converts
    HUGEINT to Python ``int`` and passed while the driver stayed red
    for two rounds (the oracle's uncast ``SUM(is_new)``). This version
    goes through ``.df()``/``toPandas()`` + dtype-sensitive rendering:
    it FAILS on the r2 snapshot's oracle and passes with the
    ``CAST(... AS BIGINT)`` fix."""
    sf = "/root/testdata/sf0.01"
    con = duckdb.connect()
    try:
        for name in STAR_TABLES:
            con.execute(
                f"CREATE VIEW {name} AS SELECT * FROM '{sf}/{name}.parquet'"
            )
        compare_via_pandas(
            spark, con, DEFS["sessionize_30m"], sf, "sessionize_30m",
            expect_rows=10000,
        )
    finally:
        con.close()


def test_hugeint_renders_float_through_df_path():
    """Property pin of the driver-rendering bug class itself: an integer
    SUM in DuckDB is HUGEINT; ``fetchall()`` hands it to Python as int
    (hiding the red) while ``.df()`` renders float64 (what the driver
    hashes). CAST AS BIGINT restores int64 through ``.df()``. If a
    DuckDB upgrade ever changes this, the oracle-authoring convention
    ("CAST every integer SUM") gets revisited with it."""
    con = duckdb.connect()
    try:
        uncast = con.sql("SELECT SUM(x) AS s FROM (VALUES (1), (3)) t(x)")
        assert uncast.fetchall()[0][0] == 4  # fetchall: Python int — hides it
        assert uncast.df()["s"].dtype == np.float64  # .df(): the driver's view
        cast = con.sql(
            "SELECT CAST(SUM(x) AS BIGINT) AS s FROM (VALUES (1), (3)) t(x)"
        )
        assert cast.df()["s"].dtype == np.int64
        # and the canonical forms diverge exactly like the driver's hash did
        assert canon_pdf(uncast.df()) == [("4.000000",)]
        assert canon_pdf(cast.df()) == [("4",)]
    finally:
        con.close()


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=30, deadline=None)
@given(
    ints=st.lists(st.integers(min_value=-(2**40), max_value=2**40),
                  min_size=1, max_size=5),
    floats=st.lists(
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False),
        min_size=1, max_size=5,
    ),
    strings=st.lists(
        st.text(alphabet="abcXYZ09_", min_size=0, max_size=8),
        min_size=1, max_size=5,
    ),
)
def test_driver_canonicalization_property(ints, floats, strings):
    """Property pin of the compare semantics (VERDICT r2 #6): for any
    frame of int/float/string/timestamp columns, the canonical form of
    a DuckDB result through ``.df()`` (the driver's path) must equal
    the canonical form of the same values through a round-trip pandas
    frame — and an UNCAST integer SUM must violate it (the bug class
    that cost two rounds). Rendering, not values, is what the driver
    hashes; this test makes the rendering contract executable."""
    n = min(len(ints), len(floats), len(strings))
    ints, floats, strings = ints[:n], floats[:n], strings[:n]
    con = duckdb.connect()
    try:
        src = pd.DataFrame(
            {
                "i": pd.Series(ints, dtype="int64"),
                "f": pd.Series([round(f, 6) for f in floats], dtype="float64"),
                "s": pd.Series(strings, dtype="object"),
                "t": pd.to_datetime(
                    [1_700_000_000 + abs(i) % 10_000 for i in ints], unit="s"
                ),
            }
        )
        con.register("src", src)
        via_df = con.sql(
            "SELECT i, round(f, 6) AS f, s, t FROM src"
        ).df()
        assert canon_pdf(via_df) == canon_pdf(src.assign(f=src.f.round(6)))

        # the HUGEINT trap: SUM(int) renders differently through .df()
        # unless cast — exactly what every oracle must do
        uncast = con.sql("SELECT SUM(i) AS v FROM src").df()
        cast = con.sql("SELECT CAST(SUM(i) AS BIGINT) AS v FROM src").df()
        pinned = pd.DataFrame({"v": pd.Series([sum(ints)], dtype="int64")})
        assert canon_pdf(cast) == canon_pdf(pinned)
        assert canon_pdf(uncast) != canon_pdf(pinned)
    finally:
        con.close()
