"""IVF ANN index: determinism, exactness at full probe, recall under
partial probe."""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_etl_project2_fiap_spark.operators import similarity as sim

SF = "/root/testdata/sf0.01"


def _embeddings(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def test_kmeans_deterministic(spark):
    e = _embeddings(spark)
    c1 = sim.kmeans_fit(e, k=8, iters=2)
    c2 = sim.kmeans_fit(e, k=8, iters=2)
    assert c1 == c2


def test_full_probe_equals_brute_force(spark):
    """nprobe = k_clusters degrades to exact search — same top-10 as the
    brute-force scan."""
    e = _embeddings(spark)
    cents = sim.kmeans_fit(e, k=8, iters=2)
    idx = sim.ivf_assign(e, cents)
    q = list(e.filter(F.col("vec_id") == 0).first()["embedding"])
    ann = [(r.id, r.sim) for r in sim.ivf_search(idx, cents, q, k=10, nprobe=8).collect()]
    exact = [(r.id, r.sim) for r in sim.knn_brute_force(e, q, k=10).collect()]
    assert ann == exact


def test_partial_probe_recall(spark):
    """nprobe=2 of 8 cells must still find most true neighbors — the
    query's own cell plus one neighbor cell carry the near vectors."""
    e = _embeddings(spark)
    cents = sim.kmeans_fit(e, k=8, iters=3)
    idx = sim.ivf_assign(e, cents)
    q = list(e.filter(F.col("vec_id") == 0).first()["embedding"])
    ann = {r.id for r in sim.ivf_search(idx, cents, q, k=10, nprobe=2).collect()}
    exact = {r.id for r in sim.knn_brute_force(e, q, k=10).collect()}
    assert len(ann) == 10
    assert len(ann & exact) >= 5  # recall@10 ≥ 0.5 with 1/4 of cells probed


def test_assignment_covers_all_rows(spark):
    e = _embeddings(spark)
    cents = sim.kmeans_fit(e, k=8, iters=1)
    idx = sim.ivf_assign(e, cents)
    assert idx.count() == e.count()
    assert idx.filter(F.col("cluster").isNull()).count() == 0
    assert idx.select("cluster").distinct().count() > 1


def test_persisted_index_probe_prunes_partitions(spark, tmp_path):
    from aws_etl_project2_fiap_spark.operators.similarity import (
        ivf_assign,
        ivf_search,
        kmeans_fit,
        load_ivf_index,
        save_ivf_index,
    )

    e = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    cents = kmeans_fit(e, k=8, iters=3)
    save_ivf_index(e, str(tmp_path / "ivf"), cents)
    indexed, loaded_cents = load_ivf_index(spark, str(tmp_path / "ivf"))
    assert loaded_cents == cents

    qv = [float(x) for x in e.filter("vec_id = 0").collect()[0]["embedding"]]
    fresh = ivf_search(ivf_assign(e, cents), cents, qv, k=10, nprobe=3).collect()
    persisted = ivf_search(indexed, cents, qv, k=10, nprobe=3).collect()
    assert [tuple(r) for r in fresh] == [tuple(r) for r in persisted]

    # the probe must prune inverted-list partitions, not scan them all
    probe_plan = spark._jvm.PythonSQLUtils.explainString(
        ivf_search(indexed, cents, qv, k=10, nprobe=3)
        ._jdf.queryExecution(),
        "formatted",
    )
    assert "PartitionFilters" in probe_plan
    pf = [ln for ln in probe_plan.splitlines() if "PartitionFilters" in ln]
    assert any("cluster" in ln for ln in pf), pf
