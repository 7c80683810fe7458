"""Trainable quality classifier (operators/quality_model).

Invariants: the model separates an obviously-separable synthetic
corpus on HELD-OUT docs, training is bit-deterministic, the
distributed Arrow apply agrees with driver-side numpy scoring, and the
scoring plan adds no shuffle.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from aws_etl_project2_fiap_spark.operators import quality_model as Q


def _corpus(n_per_class, offset=0):
    rows = []
    good_words = ["the", "science", "of", "language", "models", "shows",
                  "that", "clean", "prose", "improves", "training"]
    for i in range(n_per_class):
        k = offset + i
        body = " ".join(good_words[(k + j) % len(good_words)] for j in range(30))
        rows.append((2 * k, f"{body} document {k}.", 1))
        spamw = ["buy", "now!!!", "$$$", "click", "FREE", "WIN",
                 "@@@", "####", "offer", "limited"]
        spam = " ".join(spamw[(k + j) % len(spamw)] for j in range(30))
        rows.append((2 * k + 1, spam, 0))
    return rows


@pytest.fixture(scope="module")
def model(spark):
    train = spark.createDataFrame(
        _corpus(60), "doc_id long, text string, label long"
    )
    return Q.quality_train(train, "label", sample_limit=200, dim=1 << 14)


def test_separates_held_out_docs(spark, model):
    held = spark.createDataFrame(
        _corpus(25, offset=500), "doc_id long, text string, label long"
    )
    scored = Q.quality_score(held, model).collect()
    acc = sum(int(r["q_keep"] == r["label"]) for r in scored) / len(scored)
    assert acc >= 0.9, f"held-out accuracy {acc}"


def test_training_is_deterministic(spark):
    train = spark.createDataFrame(
        _corpus(40), "doc_id long, text string, label long"
    )
    m1 = Q.quality_train(train, "label", sample_limit=100, dim=1 << 13)
    m2 = Q.quality_train(
        train.repartition(7), "label", sample_limit=100, dim=1 << 13
    )
    assert m1["b"] == m2["b"]
    assert np.array_equal(m1["w"], m2["w"])


def test_distributed_apply_matches_driver_reference(spark, model):
    docs = spark.createDataFrame(
        _corpus(20, offset=900), "doc_id long, text string, label long"
    ).drop("label")
    got = {
        r["doc_id"]: r["q_score"]
        for r in Q.quality_score(docs.repartition(5), model).collect()
    }
    local = docs.orderBy("doc_id").collect()
    ref = Q._score_texts(
        [r["text"] for r in local],
        model["w"].astype(np.float64),
        model["b"],
        model["dim"],
    )
    for r, s in zip(local, ref):
        assert got[r["doc_id"]] == pytest.approx(round(float(s), 6))


def test_empty_and_null_text_score_at_bias(spark, model):
    docs = spark.createDataFrame(
        [(1, ""), (2, None)], "doc_id long, text string"
    )
    rows = Q.quality_score(docs, model).collect()
    expect = 1.0 / (1.0 + np.exp(-model["b"]))
    for r in rows:
        assert r["q_score"] == pytest.approx(round(float(expect), 6))


def test_score_plan_has_no_shuffle(spark, model):
    docs = spark.createDataFrame(
        _corpus(5), "doc_id long, text string, label long"
    )
    df = Q.quality_score(docs, model)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "Exchange" not in plan
    assert "MapInPandas" in plan


def test_untrainable_without_labels(spark):
    empty = spark.createDataFrame([], "doc_id long, text string, label long")
    with pytest.raises(ValueError):
        Q.quality_train(empty, "label")


def test_threshold_calibrates_on_imbalanced_sample(spark):
    # 10:1 imbalance with weak separation: the calibrated threshold must
    # beat the naive 0.5 on the TRAIN sample itself
    rows = []
    for i in range(100):
        rows.append((i, f"good clean prose number {i} with words", 1))
    for i in range(10):
        rows.append((1000 + i, f"spam $$$ spam {i} !!!", 0))
    df = spark.createDataFrame(rows, "doc_id long, text string, label long")
    m = Q.quality_train(df, "label", sample_limit=200, dim=1 << 13, epochs=3)
    assert 0.0 <= m["threshold"] <= 1.0
    scored = Q.quality_score(df, m).collect()
    acc = sum(int(r["q_keep"] == r["label"]) for r in scored) / len(scored)
    assert acc >= 0.9


def test_md5_twin_deterministic_and_separates(spark):
    """The engine-portable twin (feature_hash='md5'): bit-deterministic
    across partitionings, still separates the synthetic corpus, and
    records its hash family in the model."""
    train = spark.createDataFrame(
        _corpus(40), "doc_id long, text string, label long"
    )
    m1 = Q.quality_train(
        train, "label", sample_limit=64, dim=1024, epochs=3, l2=0.0,
        feature_hash="md5", order_hash="md5",
    )
    m2 = Q.quality_train(
        train.repartition(7), "label", sample_limit=64, dim=1024,
        epochs=3, l2=0.0, feature_hash="md5", order_hash="md5",
    )
    assert m1["b"] == m2["b"]
    assert np.array_equal(m1["w"], m2["w"])
    assert m1["feature_hash"] == "md5"
    held = spark.createDataFrame(
        _corpus(25, offset=500), "doc_id long, text string, label long"
    )
    scored = Q.quality_score(held, m1).collect()
    acc = sum(int(r["q_keep"] == r["label"]) for r in scored) / len(scored)
    assert acc >= 0.9, f"md5-twin held-out accuracy {acc}"


def test_md5_twin_scoring_is_pure_codegen(spark):
    """The md5 scorer must compile to a Python-free, shuffle-free
    projection (the fold over the inlined weight literal)."""
    train = spark.createDataFrame(
        _corpus(20), "doc_id long, text string, label long"
    )
    m = Q.quality_train(
        train, "label", sample_limit=40, dim=512, epochs=2, l2=0.0,
        feature_hash="md5", order_hash="md5",
    )
    df = Q.quality_score(train.drop("label"), m)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "Exchange" not in plan
    assert "InPandas" not in plan and "EvalPython" not in plan
    # scores agree with the driver-side aggregated reference
    got = {r["doc_id"]: r["q_score"] for r in df.collect()}
    w = np.asarray(m["w"], dtype=np.float64)
    for r in train.collect():
        counts, n = Q._md5_feature_counts(r["text"], m["dim"])
        uf = np.array(sorted(counts), dtype=np.int64)
        cnts = np.array([counts[f] for f in sorted(counts)], float)
        ref = Q._portable_score_one(uf, cnts, n, w, m["b"])
        assert got[r["doc_id"]] == pytest.approx(round(float(ref), 6))


def test_md5_twin_guards(spark):
    train = spark.createDataFrame(
        _corpus(5), "doc_id long, text string, label long"
    )
    with pytest.raises(ValueError, match="feature_hash"):
        Q.quality_train(train, "label", feature_hash="sha1")
    with pytest.raises(ValueError, match="order_hash"):
        Q.quality_train(train, "label", order_hash="sha1")
    # the inlined-literal scorer refuses silly dims instead of
    # building a 2^17-element literal
    m = Q.quality_train(
        train, "label", sample_limit=10, dim=1 << 14, epochs=1,
        feature_hash="md5",
    )
    with pytest.raises(ValueError, match="inlines"):
        Q.quality_score(train, m)
