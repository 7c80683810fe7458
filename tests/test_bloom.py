"""Bloom-filter incremental dedup (operators/dedup.py).

Contracts under test:

1. NO FALSE NEGATIVES — every key that was folded into the bitmap
   probes positive (the property that makes the pre-filter
   exactness-preserving: a missed dup would silently survive dedup).
2. FALSE-POSITIVE RATE — at ~10 bits/key the FPR on disjoint keys
   stays well under a loose 5% ceiling (theoretical ~1%); this is the
   shuffle-volume guarantee the operator exists for.
3. END-TO-END EQUALITY — ``bloom_incremental_dedup`` returns exactly
   the plain hash-join answer on the documents table (bit-identical
   output is the operator's whole claim).
4. PLAN SHAPE — the exact-verify join input is the candidate sliver,
   not the full delivery: bloom-negative rows reach the output through
   a join-free branch.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F

from aws_etl_project2_fiap_spark.operators.dedup import (
    bloom_bits_for,
    bloom_build,
    bloom_incremental_dedup,
    bloom_might_contain,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bitmap_and_keys(spark):
    member = spark.range(0, 5000).select(
        F.xxhash64((F.col("id") * 7919).cast("string")).alias("fp64")
    )
    m_bits = bloom_bits_for(5000)
    bitmap = bloom_build(member, "fp64", m_bits)
    return bitmap, m_bits, member


def test_no_false_negatives(spark, bitmap_and_keys):
    bitmap, m_bits, member = bitmap_and_keys
    probe = bloom_might_contain(spark, bitmap, m_bits)
    misses = member.select(probe(F.col("fp64")).alias("hit")).filter(
        ~F.col("hit")
    )
    assert misses.count() == 0


def test_false_positive_rate_bounded(spark, bitmap_and_keys):
    bitmap, m_bits, _ = bitmap_and_keys
    probe = bloom_might_contain(spark, bitmap, m_bits)
    # disjoint key universe (different pre-hash salt)
    outsiders = spark.range(0, 20000).select(
        F.xxhash64((F.col("id") * 104729 + 13).cast("string")).alias("fp64")
    )
    fp = outsiders.select(probe(F.col("fp64")).alias("hit")).filter(
        F.col("hit")
    ).count()
    assert fp / 20000 < 0.05, f"FPR {fp / 20000:.4f} exceeds the 5% ceiling"


def test_bloom_bits_power_of_two_and_floor():
    assert bloom_bits_for(0) == 1024
    m = bloom_bits_for(12345)
    assert m >= 12345 * 10 and (m & (m - 1)) == 0


def test_equals_plain_join_on_documents(spark):
    d = spark.read.parquet(f"{SF}/documents.parquet")
    new = d.filter(F.col("doc_id") % 10 == 0)
    corpus = d.filter(F.col("doc_id") % 10 != 0)

    got = {
        (r["doc_id"], r["is_dup"])
        for r in bloom_incremental_dedup(new, corpus).collect()
    }
    fp = F.md5(F.col("text").cast("binary")).alias("fp")
    plain = (
        new.select("doc_id", fp)
        .join(
            corpus.select(fp).distinct().withColumn("__hit", F.lit(1)),
            "fp",
            "left",
        )
        .select("doc_id", F.col("__hit").isNotNull().alias("is_dup"))
    )
    want = {(r["doc_id"], r["is_dup"]) for r in plain.collect()}
    assert got == want and len(got) == new.count()


def test_probe_vectorized_roundtrip_numpy():
    """The probe's bit math mirrors the builder's (same splitmix64
    double-hash positions) — checked in pure numpy, no Spark."""
    from aws_etl_project2_fiap_spark.operators.dedup import _bloom_positions

    m_bits = 1 << 14
    keys = np.arange(100, dtype=np.int64).view(np.uint64) * np.uint64(
        0x9E3779B97F4A7C15
    )
    bits = np.zeros(m_bits // 8, dtype=np.uint8)
    for pos in _bloom_positions(keys, m_bits, 6):
        np.bitwise_or.at(
            bits, pos >> 3, np.left_shift(1, (pos & 7)).astype(np.uint8)
        )
    hit = np.ones(len(keys), dtype=bool)
    for pos in _bloom_positions(keys, m_bits, 6):
        hit &= (bits[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1 == 1
    assert hit.all()


def test_bloom_build_invariant_to_partition_count(spark):
    """The tree merge must yield the SAME bitmap for any partitioning
    and any fan-in — and equal a single-partition build (the numpy
    ground truth: one partition's fold IS the reference bitmap)."""
    from aws_etl_project2_fiap_spark.operators.dedup import bloom_build

    df = spark.range(0, 5000).select(F.xxhash64("id").alias("fp"))
    m_bits = 1 << 14
    ref = bloom_build(df.repartition(1), "fp", m_bits)
    for n_parts, fan in [(7, 2), (13, 8), (32, 4), (3, 16)]:
        got = bloom_build(df.repartition(n_parts), "fp", m_bits, fan_in=fan)
        assert got == ref, f"bitmap differs at {n_parts} parts fan {fan}"


def test_bloom_merge_driver_receives_one_bitmap(spark, monkeypatch):
    """The docstring's promise is structural: collect() during
    bloom_build must return exactly ONE row (one bitmap), regardless
    of how many partitions folded — the log-depth applyInPandas tree
    does every other merge cluster-side."""
    # patch the CLASSIC concrete class: pyspark.sql.DataFrame is the
    # abstract base in Spark 4 and its subclass overrides collect
    from pyspark.sql.classic.dataframe import DataFrame

    from aws_etl_project2_fiap_spark.operators.dedup import bloom_build

    seen = []
    orig = DataFrame.collect

    def spy(self, *a, **kw):
        rows = orig(self, *a, **kw)
        seen.append(len(rows))
        return rows

    monkeypatch.setattr(DataFrame, "collect", spy)
    df = spark.range(0, 2000).select(F.xxhash64("id").alias("fp"))
    bloom_build(df.repartition(24), "fp", 1 << 13)
    monkeypatch.undo()
    assert seen == [1], f"driver collected {seen} rows, expected [1]"


def test_bloom_build_segmented_bitmap_identical(spark):
    """Big bitmaps ride as fixed-size SEGMENT rows (Arrow caps a binary
    cell at 2 GB): forcing tiny segments must reproduce the unsegmented
    bitmap bit-for-bit, across partitionings."""
    from aws_etl_project2_fiap_spark.operators.dedup import bloom_build

    df = spark.range(0, 3000).select(F.xxhash64("id").alias("fp"))
    m_bits = 1 << 14  # 2048 bytes
    ref = bloom_build(df.repartition(1), "fp", m_bits)
    got = bloom_build(
        df.repartition(9), "fp", m_bits, segment_bytes=256
    )  # 8 segments
    assert got == ref
