"""Property-based differential test of versioned-table semantics.

Hypothesis drives random op sequences (append / update / merge /
rollback) against BOTH the real table (io/versioned.py) and a trivial
in-memory model (dict id -> row). After every op the full read must
equal the model, and at the end every retained historical version must
equal the model's snapshot from when that version was committed — the
time-travel contract under arbitrary interleavings, not just the
hand-written scenarios in test_versioned.py.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from aws_etl_project2_fiap_spark.io import versioned as V


def _op():
    return st.one_of(
        st.tuples(st.just("append"), st.integers(0, 2)),
        st.tuples(st.just("update"), st.integers(0, 3)),
        st.tuples(st.just("merge"), st.integers(0, 3)),
        st.tuples(st.just("rollback"), st.just(0)),
        # deletes in all three physical modes + the DV purge — the
        # model can't tell them apart, which is exactly the claim
        st.tuples(st.just("delete_cow"), st.integers(0, 6)),
        st.tuples(st.just("delete_dv"), st.integers(0, 6)),
        st.tuples(st.just("delete_auto"), st.integers(0, 6)),
        st.tuples(st.just("reorg"), st.just(0)),
    )


def _read_rows(spark, path, version=None):
    return {
        r["id"]: (r["g"], r["v"])
        for r in V.read_table(spark, path, version=version).collect()
    }


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=st.lists(_op(), min_size=1, max_size=4))
def test_versioned_ops_match_model(spark, tmp_path_factory, ops):
    path = str(tmp_path_factory.mktemp("vprop") / "tbl")
    base = spark.range(0, 30).select(
        F.col("id"), (F.col("id") % 3).alias("g"), (F.col("id") * 1.0).alias("v")
    )
    V.create_table(base.repartitionByRange(3, "g"), path)
    model = {i: (i % 3, float(i)) for i in range(30)}
    history = {1: dict(model)}
    next_id = 1000

    for kind, arg in ops:
        if kind == "append":
            rows = [(next_id + j, 5, -1.0) for j in range(arg + 1)]
            next_id += arg + 1
            df = spark.createDataFrame(rows, "id long, g long, v double")
            ver = V.append_table(df, path)
            model.update({r[0]: (r[1], r[2]) for r in rows})
        elif kind == "update":
            ver = V.update_table(
                spark, path, {"v": F.col("v") + 100}, F.col("g") == arg
            )["version"]
            model = {
                i: (g, v + 100 if g == arg else v)
                for i, (g, v) in model.items()
            }
            if ver in history:  # no-match update: no new version
                continue
        elif kind == "merge":
            # one existing id (if any in group arg) + one new key
            hit = [i for i, (g, _v) in sorted(model.items()) if g == arg][:1]
            rows = [(i, 7, -5.0) for i in hit] + [(next_id, 7, -5.0)]
            next_id += 1
            df = spark.createDataFrame(rows, "id long, g long, v double")
            ver = V.merge_table(spark, path, df, keys=["id"])["version"]
            model.update({r[0]: (r[1], r[2]) for r in rows})
        elif kind.startswith("delete_"):
            mode = kind.split("_", 1)[1]
            res = V.delete_from(
                spark, path, F.col("id") % 7 == arg, mode=mode,
            )
            ver = res["version"]
            expected = len([i for i in model if i % 7 == arg])
            assert res["n_deleted"] == expected, kind
            model = {i: r for i, r in model.items() if i % 7 != arg}
            if ver in history:  # no-match delete: no new version
                continue
        elif kind == "reorg":
            ver = V.reorg_table(spark, path)["version"]
            if ver in history:  # nothing DV'd: no new version
                continue
        else:  # rollback to v1
            ver = V.rollback(path, 1)
            model = dict(history[1])
        history[ver] = dict(model)
        assert _read_rows(spark, path) == model, f"after {kind}({arg})"

    # the time-travel contract: every retained version == its snapshot
    for ver, snap in history.items():
        assert _read_rows(spark, path, version=ver) == snap, f"v{ver}"
