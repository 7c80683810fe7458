"""Property-based differential testing (SURVEY §5 / Phase 5).

Hypothesis generates random filter+aggregate query specs; each spec is
compiled BOTH to a Spark DataFrame plan and to ANSI SQL for DuckDB, and
the results must agree. This probes the engine surface (pushdown, cast,
null handling, grouped aggregation) across a query space no hand-written
suite covers.
"""

from __future__ import annotations

import math

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"

NUM_COLS = ["l_quantity", "l_extendedprice", "l_discount"]
GROUP_COLS = ["l_returnflag", "l_linestatus"]
FILTER_SPECS = {
    "l_quantity": st.floats(min_value=1, max_value=50, allow_nan=False).map(
        lambda v: round(v, 2)
    ),
    "l_orderkey": st.integers(min_value=0, max_value=60_000),
    "l_returnflag": st.sampled_from(["A", "N", "R"]),
}
OPS = ["<", ">", "=", "<>"]
AGGS = ["sum", "avg", "min", "max", "count"]


@st.composite
def query_spec(draw):
    fcol = draw(st.sampled_from(sorted(FILTER_SPECS)))
    op = draw(st.sampled_from(OPS))
    val = draw(FILTER_SPECS[fcol])
    gcols = draw(
        st.lists(st.sampled_from(GROUP_COLS), min_size=0, max_size=2, unique=True)
    )
    agg = draw(st.sampled_from(AGGS))
    acol = draw(st.sampled_from(NUM_COLS))
    return (fcol, op, val, tuple(sorted(gcols)), agg, acol)


def spark_side(spark, spec):
    fcol, op, val, gcols, agg, acol = spec
    df = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    c = F.col(fcol)
    pred = {"<": c < val, ">": c > val, "=": c == val, "<>": c != val}[op]
    df = df.filter(pred)
    aggc = {
        "sum": F.round(F.sum(acol), 4),
        "avg": F.round(F.avg(acol), 4),
        "min": F.round(F.min(acol), 4),
        "max": F.round(F.max(acol), 4),
        "count": F.count(acol),
    }[agg].alias("res")
    return df.groupBy(*gcols).agg(aggc) if gcols else df.agg(aggc)


def sql_side(spec) -> str:
    fcol, op, val, gcols, agg, acol = spec
    lit = f"'{val}'" if isinstance(val, str) else repr(val)
    res = f"count({acol})" if agg == "count" else f"round({agg}({acol}), 4)"
    group = f" GROUP BY {', '.join(gcols)}" if gcols else ""
    sel = (", ".join(gcols) + ", ") if gcols else ""
    return (
        f"SELECT {sel}{res} AS res FROM lineitem"
        f" WHERE {fcol} {op} {lit}{group}"
    )


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def norm(v):
        if v is None:
            return "null"
        if isinstance(v, float):
            if math.isnan(v):
                return "nan"
            return f"{round(v, 4):.4f}"
        return repr(v)

    return sorted(tuple(norm(r[i]) for i in order) for r in rows)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM '{SF_DIR}/lineitem.parquet'"
    )
    yield con
    con.close()


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(spec=query_spec())
def test_random_filter_agg_matches_duckdb(spark, duck, spec):
    sdf = spark_side(spark, spec)
    srows = [tuple(r) for r in sdf.collect()]
    scols = [c.lower() for c in sdf.columns]
    rel = duck.sql(sql_side(spec))
    drows = rel.fetchall()
    dcols = [c.lower() for c in rel.columns]
    assert canon(srows, scols) == canon(drows, dcols), spec


@settings(max_examples=50, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(n=st.integers(min_value=0, max_value=10**15))
def test_ptbr_parse_roundtrip(spark, n):
    """parse_ptbr_long inverts pt-BR thousands formatting for any long."""
    from aws_etl_project2_fiap_spark.functions.scalars import parse_ptbr_long

    ptbr = f"{n:,}".replace(",", ".")
    got = (
        spark.createDataFrame([(ptbr,)], ["s"])
        .select(parse_ptbr_long("s").alias("v"))
        .first()
        .v
    )
    assert got == n
