"""Streaming continuous aggregate (rollup_sink): stream-fold equals a
batch recompute, new files fold incrementally, replays don't double-count."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from aws_etl_project2_fiap_spark.streaming.sinks import rollup_sink

SF = "/root/testdata/sf0.001"

AGGS = {"n_orders": ("count", None), "revenue": ("sum", "o_totalprice")}


def _orders(spark):
    return spark.read.parquet(f"{SF}/orders.parquet").withColumn(
        "om", F.date_format("o_orderdate", "yyyy-MM")
    )


def _rollup_dict(spark, path):
    # underscore-prefixed entries (_committed_batches, _SUCCESS) are
    # invisible to the parquet reader by Hadoop convention
    return {
        (r["om"], r["o_orderpriority"]): (r["n_orders"], round(r["revenue"], 2))
        for r in spark.read.parquet(path).collect()
    }


def _expected(df):
    return {
        (r["om"], r["o_orderpriority"]): (r["n_orders"], round(r["revenue"], 2))
        for r in df.groupBy("om", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"), F.sum("o_totalprice").alias("revenue"))
        .collect()
    }


def test_stream_fold_matches_batch_and_resumes(spark, tmp_path):
    o = _orders(spark)
    schema = o.schema
    inp = str(tmp_path / "in")
    os.makedirs(inp)
    rollup = str(tmp_path / "rollup")
    ckpt = str(tmp_path / "ckpt")

    first = o.filter(F.col("om") < "1997-06")
    first.write.parquet(f"{inp}/batch0.parquet")

    stream = spark.readStream.schema(schema).option(
        "recursiveFileLookup", "true"
    ).parquet(inp)
    q = rollup_sink(stream, rollup, "om", ["o_orderpriority"], AGGS, ckpt)
    q.awaitTermination(120)
    assert _rollup_dict(spark, rollup) == _expected(first)

    # a second delivery lands; a fresh availableNow pass folds ONLY it
    second = o.filter(F.col("om") >= "1997-06")
    second.write.parquet(f"{inp}/batch1.parquet")
    stream = spark.readStream.schema(schema).option(
        "recursiveFileLookup", "true"
    ).parquet(inp)
    q = rollup_sink(stream, rollup, "om", ["o_orderpriority"], AGGS, ckpt)
    q.awaitTermination(120)
    assert _rollup_dict(spark, rollup) == _expected(o)

    # replaying the whole stream against the same checkpoint+markers
    # must be a no-op (no double counting)
    stream = spark.readStream.schema(schema).option(
        "recursiveFileLookup", "true"
    ).parquet(inp)
    q = rollup_sink(stream, rollup, "om", ["o_orderpriority"], AGGS, ckpt)
    q.awaitTermination(120)
    assert _rollup_dict(spark, rollup) == _expected(o)


def test_replayed_batch_id_is_skipped(spark, tmp_path):
    # simulate a foreachBatch replay: fold the same (batch_df, batch_id)
    # twice through the sink's guard by re-running with a wiped
    # checkpoint but kept markers — batch 0 replays and must be skipped
    o = _orders(spark)
    schema = o.schema
    inp = str(tmp_path / "in")
    os.makedirs(inp)
    rollup = str(tmp_path / "rollup")

    o.write.parquet(f"{inp}/batch0.parquet")
    stream = spark.readStream.schema(schema).option(
        "recursiveFileLookup", "true"
    ).parquet(inp)
    q = rollup_sink(stream, rollup, "om", ["o_orderpriority"], AGGS, str(tmp_path / "ckpt1"))
    q.awaitTermination(120)
    expected = _expected(o)
    assert _rollup_dict(spark, rollup) == expected

    # new checkpoint -> Structured Streaming re-delivers batch 0; the
    # marker dir persists under the rollup, so the fold is skipped
    stream = spark.readStream.schema(schema).option(
        "recursiveFileLookup", "true"
    ).parquet(inp)
    q = rollup_sink(stream, rollup, "om", ["o_orderpriority"], AGGS, str(tmp_path / "ckpt2"))
    q.awaitTermination(120)
    assert _rollup_dict(spark, rollup) == expected
