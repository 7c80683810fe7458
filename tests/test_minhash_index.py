"""Incremental MinHash near-dup index (operators/dedup.py): persisted
signature index over a corpus, probed by deliveries without touching
corpus text.

Claims under test:

- an exact re-delivery of an indexed doc probes at est_jaccard = 1.0;
- a lightly edited copy still probes above threshold; an unrelated doc
  does not probe at all;
- accepted novel docs APPEND to the index (one versioned commit) and
  are findable by the next probe — the incremental loop closes;
- the probe plan broadcasts the delivery side: the index (corpus) side
  has no shuffle exchange — the 100 TB posture;
- the estimator agrees with exact Jaccard within the K=16 std-err on a
  controlled pair.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from aws_etl_project2_fiap_spark.operators.dedup import (
    append_to_minhash_index,
    build_minhash_index,
    minhash_index_signatures,
    probe_minhash_index,
)

CORPUS = [
    (1, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (2, "structured streaming processes micro batches of data with exactly once sinks"),
    (3, "partition pruning and predicate pushdown make selective scans cheap at scale"),
]


@pytest.fixture()
def index(spark, tmp_path):
    path = str(tmp_path / "mh_index")
    df = spark.createDataFrame(CORPUS, "doc_id long, text string")
    assert build_minhash_index(df, path) == 1
    return path


def test_probe_exact_copy_and_novel(spark, index):
    batch = spark.createDataFrame(
        [
            (101, CORPUS[0][1]),  # exact copy of doc 1
            (102, "completely unrelated words about cooking pasta with garlic butter sauce"),
        ],
        "doc_id long, text string",
    )
    hits = {
        (r["batch_id"], r["index_id"]): r["est_jaccard"]
        for r in probe_minhash_index(spark, index, batch, threshold=0.5).collect()
    }
    assert hits[(101, 1)] == 1.0
    assert all(b != 102 for (b, _i) in hits)


def test_probe_light_edit_matches(spark, index):
    edited = CORPUS[1][1].replace("micro batches", "tiny batches")
    batch = spark.createDataFrame([(201, edited)], "doc_id long, text string")
    hits = probe_minhash_index(spark, index, batch, threshold=0.3).collect()
    assert [(h["batch_id"], h["index_id"]) for h in hits] == [(201, 2)]
    assert 0.3 <= hits[0]["est_jaccard"] < 1.0


def test_append_closes_incremental_loop(spark, index):
    novel = spark.createDataFrame(
        [(301, "broadcast joins avoid shuffling the large fact side entirely when dims are small")],
        "doc_id long, text string",
    )
    # before: not in the index
    assert probe_minhash_index(spark, index, novel, threshold=0.5).count() == 0
    assert append_to_minhash_index(novel, index) == 2  # one more commit
    redelivery = novel.withColumn("doc_id", F.col("doc_id") + 1000)
    hits = probe_minhash_index(spark, index, redelivery, threshold=0.5).collect()
    assert [(h["batch_id"], h["index_id"], h["est_jaccard"]) for h in hits] == [
        (1301, 301, 1.0)
    ]


def test_probe_plan_broadcasts_delivery_not_index(spark, index):
    batch = spark.createDataFrame([(401, CORPUS[2][1])], "doc_id long, text string")
    plan = probe_minhash_index(spark, index, batch)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_estimator_tracks_exact_jaccard(spark, tmp_path):
    """est = matching-minhash fraction is the unbiased Jaccard estimator;
    on a half-overlapping pair it must land within ~2 std-errs
    (2*sqrt(J(1-J)/16) ≈ 0.25) of the true shingle Jaccard."""
    base = [f"w{i}" for i in range(40)]
    a = " ".join(base)
    b = " ".join(base[:20] + [f"x{i}" for i in range(20)])
    path = str(tmp_path / "idx")
    build_minhash_index(
        spark.createDataFrame([(1, a)], "doc_id long, text string"), path
    )
    probe = probe_minhash_index(
        spark,
        path,
        spark.createDataFrame([(2, b)], "doc_id long, text string"),
        threshold=0.0,
    ).collect()
    # true shingle (3-gram) Jaccard: 18 shared of 38+38-18=58 ≈ 0.31
    if probe:  # banding may or may not surface a 0.31 pair — if it does:
        assert abs(probe[0]["est_jaccard"] - 18 / 58) <= 0.25


def test_signature_frame_shape(spark):
    df = spark.createDataFrame(CORPUS, "doc_id long, text string")
    sig = minhash_index_signatures(df, num_hashes=16, bands=4)
    assert sig.columns == ["id", "mh", "band", "sig"]
    rows = sig.collect()
    assert len(rows) == 3 * 4  # one row per (doc, band)
    assert all(len(r["mh"]) == 16 for r in rows)


def test_probe_with_mismatched_params_raises(spark, index):
    """Probing with different signature parameters would silently match
    nothing — the persisted params make it a hard error instead."""
    batch = spark.createDataFrame([(1, CORPUS[0][1])], "doc_id long, text string")
    with pytest.raises(ValueError, match="built with"):
        probe_minhash_index(spark, index, batch, num_hashes=32, bands=8)
    with pytest.raises(ValueError, match="built with"):
        append_to_minhash_index(batch, index, shingle_n=5)


def test_md5_portable_variant_roundtrip(spark, tmp_path):
    """token_hash='md5' (the engine-portable signature pipeline behind
    the oracle-backed near-dup ingest gate): exact copies match at
    est=1.0, unrelated docs don't, the params sidecar pins the variant
    (an xxhash64 probe against an md5 index is a hard error), and the
    60-bit md5-derived hash is bit-equal to DuckDB's recomputation."""
    path = str(tmp_path / "mh_md5")
    df = spark.createDataFrame(CORPUS, "doc_id long, text string")
    assert build_minhash_index(df, path, token_hash="md5") == 1
    batch = spark.createDataFrame(
        [
            (101, CORPUS[1][1]),  # exact copy of doc 2
            (102, "completely unrelated words about cooking pasta with garlic butter sauce"),
        ],
        "doc_id long, text string",
    )
    hits = {
        (r["batch_id"], r["index_id"]): r["est_jaccard"]
        for r in probe_minhash_index(
            spark, path, batch, threshold=0.5, token_hash="md5"
        ).collect()
    }
    assert hits[(101, 2)] == 1.0
    assert all(b != 102 for (b, _i) in hits)
    # variant mismatch is loud, both directions
    with pytest.raises(ValueError, match="built with"):
        probe_minhash_index(spark, path, batch)  # default xxhash64
    with pytest.raises(ValueError, match="built with"):
        append_to_minhash_index(batch, path)
    # cross-engine bit-equality of the portable hash primitive
    import duckdb

    from pyspark.sql import functions as F
    from aws_etl_project2_fiap_spark.operators.dedup import _portable_hash64

    got = (
        spark.createDataFrame([("abc xyz 42",)], "s string")
        .select(_portable_hash64(F.col("s")).alias("h"))
        .collect()[0]["h"]
    )
    exp = duckdb.sql(
        "SELECT ('0x' || substring(md5('abc xyz 42'), 1, 15))::BIGINT"
    ).fetchone()[0]
    assert got == exp


def test_minhash_lsh_pairs_md5_variant(spark):
    """minhash_lsh_pairs(token_hash='md5') — the oracle-backed portable
    variant: exact copies pair at jaccard 1.0, unrelated docs don't,
    and a bad token_hash is a loud error."""
    from aws_etl_project2_fiap_spark.operators.dedup import (
        minhash_lsh_pairs,
    )

    df = spark.createDataFrame(
        CORPUS + [(101, CORPUS[0][1])], "doc_id long, text string"
    )
    pairs = {
        (r["id1"], r["id2"]): r["jaccard"]
        for r in minhash_lsh_pairs(
            df, num_hashes=8, bands=4, threshold=0.5, token_hash="md5"
        ).collect()
    }
    assert pairs[(1, 101)] == 1.0
    assert all({a, b} == {1, 101} for a, b in pairs)
    with pytest.raises(ValueError, match="token_hash"):
        minhash_lsh_pairs(df, token_hash="sha1")
