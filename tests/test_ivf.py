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


# ---------------------------------------------------------------------
# Distributed Lloyd refinement + SemDeDup semantic dedup
# ---------------------------------------------------------------------


def _clustered_vectors():
    """3 tight clusters around orthogonal anchors + exact dup pairs."""
    import numpy as np

    rows = []
    anchors = np.eye(3)
    vid = 0
    for a in range(3):
        for j in range(8):
            # period-23 pseudo-noise: no two vids in a group share an
            # offset vector, so the only exact dups are the explicit ones
            v = anchors[a] + np.array(
                [((vid * 31 + i * 17) % 23 - 11) / 60 for i in range(3)]
            )
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    # exact duplicates of vec 0 and vec 8
    rows.append((100, rows[0][1]))
    rows.append((101, rows[8][1]))
    return rows


def test_kmeans_refine_distributed_improves_inertia(spark):
    import numpy as np

    from aws_etl_project2_fiap_spark.operators.similarity import (
        kmeans_fit,
        kmeans_refine_distributed,
    )

    rows = _clustered_vectors()
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    # mediocre but non-degenerate start: one seed leaning toward each
    # anchor (Lloyd is a local optimizer; a start with two seeds in one
    # cluster can stay stuck, which is kmeans_fit's sample-init job to
    # avoid — here we test the refinement math, not the init)
    cent0 = [[0.6, 0.3, 0.1], [0.1, 0.6, 0.3], [0.3, 0.1, 0.6]]
    cent1 = kmeans_refine_distributed(df, cent0, iters=3)

    def inertia(cent):
        C = np.asarray(cent)
        M = np.asarray([r[1] for r in rows])
        d2 = ((M[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        return d2.min(axis=1).sum()

    assert inertia(cent1) <= inertia(cent0) + 1e-12
    # converged refinement separates the 3 anchors: every cluster
    # centroid is dominated by a distinct coordinate
    dom = sorted(int(np.argmax(c)) for c in cent1)
    assert dom == [0, 1, 2]


def test_kmeans_refine_empty_cluster_keeps_centroid(spark):
    from aws_etl_project2_fiap_spark.operators.similarity import (
        kmeans_refine_distributed,
    )

    df = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [1.1, 0.0])], "vec_id long, embedding array<float>"
    )
    far = [100.0, 100.0]
    cent = kmeans_refine_distributed(df, [[1.0, 0.0], far], iters=2)
    assert cent[1] == far  # never assigned -> unchanged, not NaN


def test_semantic_dedup_drops_within_cluster_dups(spark):
    from aws_etl_project2_fiap_spark.operators.similarity import semantic_dedup

    rows = _clustered_vectors()
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r["id"]: r for r in semantic_dedup(df, k=3, threshold=0.9999).collect()}
    assert len(out) == len(rows)  # every vector classified
    # exact dups of 0 and 8 are dropped toward their originals
    assert out[100]["keep"] == 0 and out[100]["dup_of"] == 0
    assert out[101]["keep"] == 0 and out[101]["dup_of"] == 8
    # originals survive
    assert out[0]["keep"] == 1 and out[0]["dup_of"] is None
    assert out[8]["keep"] == 1
    # near-but-not-identical cluster members survive at this threshold
    assert sum(r["keep"] for r in out.values()) == len(rows) - 2


def test_semantic_dedup_deterministic(spark):
    from aws_etl_project2_fiap_spark.operators.similarity import semantic_dedup

    rows = _clustered_vectors()
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    a = sorted(map(tuple, semantic_dedup(df, k=3, threshold=0.99).collect()))
    b = sorted(map(tuple, semantic_dedup(df, k=3, threshold=0.99).collect()))
    assert a == b


def test_ivf_incremental_append(spark, tmp_path):
    """append_to_ivf_index: new vectors join the saved index under the
    frozen quantizer; probes see old+new through partition discovery
    and exact-at-full-probe still holds over the union."""
    from aws_etl_project2_fiap_spark.operators.similarity import (
        append_to_ivf_index,
        ivf_search,
        kmeans_fit,
        knn_brute_force,
        load_ivf_index,
        save_ivf_index,
    )

    e = _embeddings(spark)
    first = e.filter(F.col("vec_id") < 250)
    later = e.filter(F.col("vec_id") >= 250)
    cents = kmeans_fit(first, k=8, iters=3)
    path = str(tmp_path / "ivf")
    save_ivf_index(first, path, cents)

    append_to_ivf_index(later, path)
    indexed, loaded = load_ivf_index(spark, path)
    assert loaded == cents
    assert indexed.count() == e.count()

    q = list(e.filter(F.col("vec_id") == 0).first()["embedding"])
    ann = [(r.id, r.sim) for r in ivf_search(indexed, cents, q, k=10, nprobe=8).collect()]
    exact = [(r.id, r.sim) for r in knn_brute_force(e, q, k=10).collect()]
    assert ann == exact  # full probe over old+new == brute force


# -- product quantization (IVF-PQ) -------------------------------------


def test_pq_deterministic(spark):
    e = _embeddings(spark)
    cents = sim.kmeans_fit(e, k=8, iters=2)
    b1 = sim.pq_train(e, cents, m=8, ksub=16, iters=3)
    b2 = sim.pq_train(e, cents, m=8, ksub=16, iters=3)
    assert b1 == b2


def test_pq_code_is_m_bytes_per_vector(spark):
    e = _embeddings(spark)
    cents = sim.kmeans_fit(e, k=8, iters=2)
    books = sim.pq_train(e, cents, m=8, ksub=32)
    enc = sim.pq_encode(e, cents, books)
    rows = enc.collect()
    assert len(rows) == e.count()
    for r in rows[:20]:
        assert len(r["code"]) == 8
        assert all(0 <= c < 32 for c in r["code"])


def test_pq_rejects_indivisible_dim(spark):
    import pytest as _pytest

    e = _embeddings(spark)
    cents = sim.kmeans_fit(e, k=4, iters=1)
    with _pytest.raises(ValueError, match="not divisible"):
        sim.pq_train(e, cents, m=7)


def test_ivfpq_rerank_recall(spark):
    """full probe + rerank: the exact-cosine rerank of ADC candidates
    recovers >= 8 of the true top-10 (candidate list = 4k)."""
    e = _embeddings(spark)
    cents = sim.kmeans_fit(e, k=8, iters=3)
    books = sim.pq_train(e, cents, m=8, ksub=32)
    enc = sim.pq_encode(e, cents, books)
    hits = 0
    for qid in (0, 7, 99):
        q = list(e.filter(F.col("vec_id") == qid).first()["embedding"])
        exact = {r["id"] for r in sim.knn_brute_force(e, q, k=10).collect()}
        got = {
            r["id"]
            for r in sim.ivf_pq_search(
                enc, cents, books, q, k=10, nprobe=8, rerank=e
            ).collect()
        }
        hits += len(exact & got)
    assert hits >= 24  # >= 80% mean recall@10 across queries


def test_ivfpq_adc_self_match(spark):
    """ADC without rerank still puts the query vector itself first
    (its own code has the minimal table distance)."""
    e = _embeddings(spark)
    cents = sim.kmeans_fit(e, k=8, iters=3)
    books = sim.pq_train(e, cents, m=8, ksub=32)
    enc = sim.pq_encode(e, cents, books)
    q = list(e.filter(F.col("vec_id") == 42).first()["embedding"])
    top = sim.ivf_pq_search(enc, cents, books, q, k=3, nprobe=8).collect()
    assert top[0]["id"] == 42


def test_ivfpq_index_persists_and_prunes(spark, tmp_path):
    """save/load round-trip; the probe plan prunes cluster partitions
    (PartitionFilters on the codes scan) and results match in-memory."""
    e = _embeddings(spark)
    cents = sim.kmeans_fit(e, k=8, iters=3)
    books = sim.pq_train(e, cents, m=8, ksub=32)
    path = str(tmp_path / "pq_idx")
    sim.save_ivf_pq_index(e, path, cents, books)
    enc2, cents2, books2 = sim.load_ivf_pq_index(spark, path)
    assert cents2 == cents and books2 == books
    q = list(e.filter(F.col("vec_id") == 7).first()["embedding"])
    mem = sim.ivf_pq_search(
        sim.pq_encode(e, cents, books), cents, books, q, k=5, nprobe=2,
        rerank=e,
    ).collect()
    disk = sim.ivf_pq_search(
        enc2, cents2, books2, q, k=5, nprobe=2, rerank=e
    ).collect()
    assert [r["id"] for r in mem] == [r["id"] for r in disk]
    # partition pruning: the probe filter lands in PartitionFilters
    probe_df = enc2.filter(F.col("cluster").isin([0, 1]))
    s = probe_df._sc._jvm.PythonSQLUtils.explainString(
        probe_df._jdf.queryExecution(), "formatted"
    )
    pf = [ln for ln in s.splitlines() if "PartitionFilters" in ln]
    assert pf and any("cluster" in ln for ln in pf), s


def test_kmeans_md5_order_hash_deterministic_and_guarded(spark):
    """order_hash='md5' (the portable-oracle sample ordering) is
    deterministic, trains a usable quantizer (full probe == brute
    force, same as the xxhash64 path), and bad values fail loud."""
    import pytest

    e = _embeddings(spark)
    c1 = sim.kmeans_fit(e, k=8, iters=2, order_hash="md5")
    c2 = sim.kmeans_fit(e, k=8, iters=2, order_hash="md5")
    assert c1 == c2
    # a different sample order trains different (but valid) centroids
    cx = sim.kmeans_fit(e, k=8, iters=2, order_hash="xxhash64")
    assert c1 != cx
    idx = sim.ivf_assign(e, c1)
    q = list(e.filter(F.col("vec_id") == 0).first()["embedding"])
    ann = [
        (r.id, r.sim)
        for r in sim.ivf_search(idx, c1, q, k=10, nprobe=8).collect()
    ]
    exact = [
        (r.id, r.sim) for r in sim.knn_brute_force(e, q, k=10).collect()
    ]
    assert ann == exact
    with pytest.raises(ValueError, match="order_hash"):
        sim.kmeans_fit(e, k=8, iters=2, order_hash="sha1")


def test_pq_md5_order_hash_deterministic_and_guarded(spark):
    """order_hash='md5' on pq_train (the IVF-PQ portable gate):
    deterministic codebooks, full-probe search still exact after
    rerank, bad values fail loud."""
    import pytest

    e = _embeddings(spark)
    cents = sim.kmeans_fit(e, k=8, iters=2, order_hash="md5")
    b1 = sim.pq_train(e, cents, m=8, ksub=16, iters=2, order_hash="md5")
    b2 = sim.pq_train(e, cents, m=8, ksub=16, iters=2, order_hash="md5")
    assert b1 == b2
    enc = sim.pq_encode(e, cents, b1)
    q = list(e.filter(F.col("vec_id") == 0).first()["embedding"])
    got = [
        (r.id, r.sim)
        for r in sim.ivf_pq_search(
            enc, cents, b1, q, k=5, nprobe=8, rerank=e
        ).collect()
    ]
    exact = [
        (r.id, r.sim) for r in sim.knn_brute_force(e, q, k=5).collect()
    ]
    # ADC is lossy even at full probe (candidates are cut on APPROX
    # distance before the exact rerank): assert the self-match and
    # recall, same contract as test_ivfpq_rerank_recall
    assert got[0] == exact[0]
    assert len({i for i, _ in got} & {i for i, _ in exact}) >= 3
    with pytest.raises(ValueError, match="order_hash"):
        sim.pq_train(e, cents, order_hash="sha1")
