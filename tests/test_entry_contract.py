"""__spark_entry__ contract invariants (cheap, no Spark jobs).

The driver consumes entry()/queries()/oracle_sql() blind — these pin
the structural guarantees it depends on before any engine work runs.
"""

from __future__ import annotations

import duckdb
import pytest

from aws_etl_project2_fiap_spark.io.parquet import STAR_TABLES
from aws_etl_project2_fiap_spark.workload import (
    CATALOG,
    COMPONENTS,
    SUITES,
    oracle_sql,
    ordered_catalog,
    queries,
)


def test_oracle_keys_subset_of_queries():
    q, o = queries(), oracle_sql()
    assert set(o) <= set(q)
    assert all(callable(fn) for fn in q.values())


def test_first_fifty_are_oracle_backed():
    """The driver hashes positions 1-50; a rows-only entry inside the
    window would waste a hash slot on a weaker check."""
    names = list(ordered_catalog())
    o = oracle_sql()
    assert all(n in o for n in names[:50]), [
        n for n in names[:50] if n not in o
    ]


def test_suite_members_exist_and_are_components():
    for suite, members in SUITES.items():
        assert suite in CATALOG
        for m in members:
            assert m in COMPONENTS, f"{suite} references unknown {m}"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for name in STAR_TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM "
            f"'/root/testdata/sf0.001/{name}.parquet'"
        )
    yield con
    con.close()


@pytest.mark.parametrize(
    "name",
    sorted(
        set(oracle_sql())
        | {n for n, qd in COMPONENTS.items() if qd.oracle is not None}
    ),
)
def test_every_oracle_parses(duck, name):
    """EXPLAIN (never execute): a dialect typo in any oracle — catalog
    or component — fails here in milliseconds instead of erring a
    driver correctness row."""
    sql = (
        oracle_sql().get(name)
        or COMPONENTS[name].oracle
    )
    duck.execute(f"EXPLAIN {sql}")
