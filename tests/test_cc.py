"""Connected components (operators/cc.py) vs a driver-side union-find."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from aws_etl_project2_fiap_spark.operators.cc import connected_components


def _union_find_labels(edges: list[tuple[int, int]]) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    return {node: find(node) for node in parent}


def _check(spark, edges: list[tuple[int, int]]) -> None:
    df = spark.createDataFrame(edges, "id1: long, id2: long")
    got = {
        (r["id"], r["cluster_id"])
        for r in connected_components(df).collect()
    }
    want = set(_union_find_labels(edges).items())
    assert got == want


def test_cc_chain(spark):
    # a 100-node path: worst case for label propagation depth
    _check(spark, [(i, i + 1) for i in range(100)])


def test_cc_disjoint_and_star(spark):
    edges = [(1, 2), (2, 3), (10, 11), (20, 21), (20, 22), (20, 23), (5, 5)]
    edges = [(u, v) for u, v in edges if u != v]
    _check(spark, edges)


def test_cc_random_graphs(spark):
    rng = random.Random(7)
    for trial in range(3):
        n = 200
        edges = [
            (rng.randrange(n), rng.randrange(n))
            for _ in range(150 + 50 * trial)
        ]
        edges = [(u, v) for u, v in edges if u != v]
        _check(spark, edges)


def test_cc_converges_from_reversed_ids(spark):
    # descending chains exercise the large-star direction swap
    _check(spark, [(i + 1, i) for i in range(50, 0, -1)])


@pytest.mark.slow  # exact-edges differential replay; oracle gate covers dedup_cluster_lsh (r13)
def test_cluster_lsh_matches_exact_edges(spark):
    """The LSH-edge clustering (scale path) must produce the same
    component labels as the exact-Jaccard-edge clustering at test SF —
    the band parameters are tuned so a missed true pair is ~1e-6."""
    from aws_etl_project2_fiap_spark.workload import CATALOG

    sf = "/root/testdata/sf0.01"
    exact = {
        (r["doc_id"], r["cluster_id"])
        for r in CATALOG["dedup_cluster_assign"].spark(spark, sf).collect()
    }
    lsh = {
        (r["doc_id"], r["cluster_id"])
        for r in CATALOG["dedup_cluster_lsh"].spark(spark, sf).collect()
    }
    assert lsh == exact


def test_cc_label_is_component_min(spark):
    edges = [(7, 3), (3, 9), (9, 2), (40, 41)]
    df = spark.createDataFrame(edges, "id1: long, id2: long")
    labels = {r["id"]: r["cluster_id"] for r in connected_components(df).collect()}
    assert labels == {7: 2, 3: 2, 9: 2, 2: 2, 40: 40, 41: 40}
