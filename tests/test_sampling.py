"""Deterministic hash sampling: reproducibility, append-stability,
rate accuracy, and leak-free splits."""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_etl_project2_fiap_spark.operators.sampling import (
    hash_sample,
    stratified_hash_sample,
    train_test_split,
)


def _docs(spark, n=5000):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 3 == 0, "web")
        .when(F.col("id") % 3 == 1, "code")
        .otherwise("books")
        .alias("source"),
    )


def test_hash_sample_rate_and_determinism(spark):
    df = _docs(spark)
    s1 = {r.doc_id for r in hash_sample(df, 0.2, "doc_id").collect()}
    s2 = {r.doc_id for r in hash_sample(df, 0.2, "doc_id").collect()}
    assert s1 == s2
    assert 0.15 < len(s1) / 5000 < 0.25
    # different salt → different membership
    s3 = {r.doc_id for r in hash_sample(df, 0.2, "doc_id", salt="other").collect()}
    assert s3 != s1


def test_hash_sample_stable_under_append(spark):
    """Membership is per-row: sampling a superset keeps the subset's
    verdicts unchanged (df.sample() breaks this)."""
    small = _docs(spark, 1000)
    big = _docs(spark, 5000)
    in_small = {r.doc_id for r in hash_sample(small, 0.3, "doc_id").collect()}
    in_big = {
        r.doc_id
        for r in hash_sample(big, 0.3, "doc_id").collect()
        if r.doc_id < 1000
    }
    assert in_small == in_big


def test_hash_sample_rate_monotone(spark):
    """A higher rate strictly contains the lower rate's sample (same
    salt) — lets pipelines grow a sample without resampling."""
    df = _docs(spark)
    s20 = {r.doc_id for r in hash_sample(df, 0.2, "doc_id").collect()}
    s50 = {r.doc_id for r in hash_sample(df, 0.5, "doc_id").collect()}
    assert s20 < s50


def test_stratified_rates(spark):
    df = _docs(spark)
    got = stratified_hash_sample(
        df, "source", {"web": 0.1, "code": 1.0}, "doc_id"
    )
    by_source = {
        r.source: r.n
        for r in got.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert by_source["code"] == 1667  # keep-all stratum: exact
    assert 100 < by_source["web"] < 250  # ~10% of 1667
    assert "books" not in by_source  # default_rate=0


def test_train_test_split_disjoint_exhaustive(spark):
    df = _docs(spark)
    train, test = train_test_split(df, "doc_id", test_frac=0.25)
    n_train, n_test = train.count(), test.count()
    assert n_train + n_test == 5000
    assert train.join(test, "doc_id").count() == 0
    assert 0.2 < n_test / 5000 < 0.3
    # same key → same side on a rerun
    train2, _ = train_test_split(df, "doc_id", test_frac=0.25)
    assert train.exceptAll(train2).count() == 0


def test_approx_distinct_error_bound(spark):
    """The HLL++ sketch estimate must land within 3×rsd of the exact
    per-group distinct count (rsd=0.01 → 3% tolerance)."""
    from aws_etl_project2_fiap_spark.workload import CATALOG
    from pyspark.sql import functions as F

    sf = "/root/testdata/sf0.01"
    approx = {
        r["o_orderpriority"]: r["n_cust_approx"]
        for r in CATALOG["agg_approx_distinct"].spark(spark, sf).collect()
    }
    exact = {
        r["o_orderpriority"]: r["n_exact"]
        for r in spark.read.parquet(f"{sf}/orders.parquet")
        .groupBy("o_orderpriority")
        .agg(F.countDistinct("o_custkey").alias("n_exact"))
        .collect()
    }
    assert set(approx) == set(exact)
    for k, est in approx.items():
        assert abs(est - exact[k]) <= max(3, 0.03 * exact[k]), (k, est, exact[k])


def test_heavy_hitters_exact_vs_brute_force(spark):
    from aws_etl_project2_fiap_spark.operators.sampling import heavy_hitters
    from pyspark.sql import functions as F

    # skewed synthetic keys: two hot values, a long uniform tail
    df = spark.range(10_000).select(
        F.when(F.col("id") % 10 < 3, F.lit("hot_a"))
        .when(F.col("id") % 10 < 5, F.lit("hot_b"))
        .otherwise(F.concat(F.lit("tail_"), (F.col("id") % 500).cast("string")))
        .alias("k")
    )
    got = {(r["k"], r["n"]) for r in heavy_hitters(df, "k", 0.05).collect()}
    want = {
        (r["k"], r["n"])
        for r in df.groupBy("k").agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 0.05 * 10_000)
        .collect()
    }
    assert got == want
    assert {k for k, _ in got} == {"hot_a", "hot_b"}


def test_cluster_aware_split_never_splits_a_cluster(spark):
    from aws_etl_project2_fiap_spark.operators.cc import connected_components
    from aws_etl_project2_fiap_spark.operators.dedup import (
        ngram_jaccard_pairs_prefix,
    )
    from aws_etl_project2_fiap_spark.operators.sampling import cluster_aware_split
    from pyspark.sql import functions as F

    d = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    pairs = ngram_jaccard_pairs_prefix(d, threshold=0.9).select("id1", "id2")
    labels = (
        d.select("doc_id")
        .join(
            connected_components(pairs).withColumnRenamed("id", "doc_id"),
            "doc_id",
            "left",
        )
        .select(
            "doc_id", F.coalesce("cluster_id", "doc_id").alias("cluster_id")
        )
    )
    out = cluster_aware_split(labels)
    # every cluster maps to exactly one split
    assert (
        out.groupBy("cluster_id")
        .agg(F.countDistinct("split").alias("k"))
        .filter(F.col("k") > 1)
        .count()
        == 0
    )
    # rough proportions by cluster (hash-uniform over clusters)
    frac = {
        r["split"]: r["n"]
        for r in out.select("cluster_id", "split")
        .distinct()
        .groupBy("split")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    total = sum(frac.values())
    assert 0.6 < frac.get("train", 0) / total < 0.95
    assert frac.get("val", 0) > 0 and frac.get("test", 0) > 0


def test_approx_distinct_portable_accuracy_and_determinism(spark):
    """The portable HLL (round 10, the sketch family's hash gate):
    estimate within the p=12 error envelope of the exact count, and
    bit-identical across runs (pure hash arithmetic, no RNG)."""
    from aws_etl_project2_fiap_spark.operators.sampling import (
        approx_distinct_portable,
    )

    o = spark.read.parquet("/root/testdata/sf0.01/orders.parquet")
    got = {
        r["o_orderpriority"]: r["approx_distinct"]
        for r in approx_distinct_portable(
            o, ["o_orderpriority"], "o_custkey", p=12
        ).collect()
    }
    exact = {
        r["o_orderpriority"]: r["n"]
        for r in o.groupBy("o_orderpriority")
        .agg(F.countDistinct("o_custkey").alias("n"))
        .collect()
    }
    assert set(got) == set(exact)
    for g in exact:
        # SE at m=4096 is ~1.6%; 5 sigma headroom for the fixed corpus
        assert abs(got[g] - exact[g]) / exact[g] < 0.08, (
            g, got[g], exact[g],
        )
    again = {
        r["o_orderpriority"]: r["approx_distinct"]
        for r in approx_distinct_portable(
            o, ["o_orderpriority"], "o_custkey", p=12
        ).collect()
    }
    assert again == got
