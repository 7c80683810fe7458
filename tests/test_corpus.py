"""Corpus-assembly operators: PII scrub patterns, mixture-weight math
with an explicit target, and sequence-packing edge cases."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from aws_etl_project2_fiap_spark.operators import corpus

from conftest import SF_ORACLE as SF


def test_scrub_pii_patterns(spark):
    rows = [
        (1, "mail me at a.b+c@ex-ample.org today"),
        (2, "server 192.168.001.1 then +55 11 9876-5432 done"),
        (3, "no pii here"),
    ]
    df = spark.createDataFrame(rows, "id long, t string")
    out = {
        r["id"]: (r["clean"], r["hits"])
        for r in df.select(
            "id",
            corpus.scrub_pii("t").alias("clean"),
            corpus.pii_hits("t").alias("hits"),
        ).collect()
    }
    assert out[1] == ("mail me at [PII] today", 1)
    assert out[2] == ("server [PII] then [PII] done", 2)
    assert out[3] == ("no pii here", 0)


def test_mixture_weights_explicit_target(spark):
    # 6 a's, 2 b's; target 50/50 -> a underweighted, b overweighted
    df = spark.createDataFrame(
        [(i, "a" if i < 6 else "b") for i in range(8)], "id long, dom string"
    )
    got = {
        r["dom"]: (r["n_docs"], r["actual_share"], r["weight"])
        for r in corpus.mixture_weights(
            df, "dom", target={"a": 0.5, "b": 0.5}
        ).collect()
    }
    assert got["a"][0] == 6 and math.isclose(got["a"][1], 0.75)
    assert math.isclose(got["a"][2], 0.5 / 0.75)
    assert math.isclose(got["b"][2], 0.5 / 0.25)


def test_mixture_weights_unknown_domain_gets_zero(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "mystery")], "id long, dom string"
    )
    got = {
        r["dom"]: r["weight"]
        for r in corpus.mixture_weights(
            df, "dom", target={"a": 0.7, "b": 0.3}
        ).collect()
    }
    assert got["mystery"] == 0.0


def test_pack_sequences_stride_semantics(spark):
    # budget 10, one shard, in-order token counts 4,4,4,12,1:
    # start offsets 0,4,8,12,24 -> seq ids 0,0,0,1,2
    df = spark.createDataFrame(
        [(i, "s", n) for i, n in enumerate([4, 4, 4, 12, 1])],
        "id long, shard string, n_tok long",
    )
    out = corpus.pack_sequences(
        df, shard_col="shard", order_cols=["id"], tokens_col="n_tok", budget=10
    )
    got = {r["id"]: r["seq_id"] for r in out.collect()}
    assert got == {0: 0, 1: 0, 2: 0, 3: 1, 4: 2}


def test_pack_sequences_shards_independent(spark):
    df = spark.createDataFrame(
        [(1, "x", 7), (2, "y", 7), (3, "x", 7), (4, "y", 7)],
        "id long, shard string, n_tok long",
    )
    out = corpus.pack_sequences(
        df, shard_col="shard", order_cols=["id"], tokens_col="n_tok", budget=10
    )
    got = {r["id"]: r["seq_id"] for r in out.collect()}
    # each shard restarts at offset 0: second doc in each shard starts
    # at offset 7 -> still sequence 0
    assert got == {1: 0, 2: 0, 3: 0, 4: 0}
    total = out.filter(F.col("shard") == "x").agg(F.sum("n_tok")).first()[0]
    assert total == 14


def test_paragraph_dedup_drops_repeats_keeps_first(spark):
    from aws_etl_project2_fiap_spark.operators.text import paragraph_dedup

    docs = spark.createDataFrame(
        [
            (1, "intro A\n\nLICENSE BLOCK\n\nbody one"),
            (2, "LICENSE BLOCK\n\nbody two"),
            (3, "body two\n\n\n\nintro A"),  # empty paragraph + all-dup doc
        ],
        "doc_id: long, text: string",
    )
    rows = {r["doc_id"]: r for r in paragraph_dedup(docs).collect()}
    assert rows[1]["text"] == "intro A\n\nLICENSE BLOCK\n\nbody one"
    assert rows[1]["n_kept"] == 3
    assert rows[2]["text"] == "body two"  # license block already seen
    assert rows[2]["n_kept"] == 1
    assert 3 not in rows  # every paragraph of doc 3 was seen before


def test_paragraph_dedup_within_doc_repeat(spark):
    from aws_etl_project2_fiap_spark.operators.text import paragraph_dedup

    docs = spark.createDataFrame(
        [(7, "x\n\ny\n\nx\n\nz")], "doc_id: long, text: string"
    )
    row = paragraph_dedup(docs).collect()[0]
    assert row["text"] == "x\n\ny\n\nz"
    assert row["n_kept"] == 3


def test_gopher_rules_flags_and_keep(spark):
    """Published Gopher/RefinedWeb gate: each rule trips on its own
    crafted violator; a clean paragraph passes every rule."""
    from aws_etl_project2_fiap_spark.operators.text import gopher_rules

    good = (
        "the quick brown fox jumps over the lazy dog and then decides "
        "that it would have been wiser to rest with friends beside the "
        "river bank for the remainder of the afternoon session today "
        "while the sun slowly set behind those gentle rolling hills and "
        "every bird returned home to roost in the old oak trees nearby"
    )
    rows = [
        (1, good),
        (2, "too short to pass"),                        # n_words < 50
        (3, " ".join(["####"] * 60)),                    # symbol ratio + alpha
        (4, "\n".join(["- bullet line the of and"] * 40)),  # bullet ratio
        (5, " ".join(["x"] * 60)),                       # mean word len < 3
    ]
    out = {
        r["doc_id"]: r.asDict()
        for r in gopher_rules(
            spark.createDataFrame(rows, "doc_id long, text string"),
            min_words=50,
        ).collect()
    }
    assert out[1]["keep"] == 1
    assert out[1]["n_stopwords"] >= 2
    assert out[2]["keep"] == 0 and out[2]["n_words"] < 50
    assert out[3]["keep"] == 0 and out[3]["symbol_ratio"] > 0.1
    assert out[3]["alpha_word_ratio"] == 0.0
    assert out[4]["keep"] == 0 and out[4]["bullet_ratio"] == 1.0
    assert out[5]["keep"] == 0 and out[5]["mean_word_len"] < 3


def test_chunk_documents_overlap_invariants(spark):
    """Chunker contract: full coverage, exact overlap between
    consecutive chunks, short-but-novel tail, short docs = 1 chunk."""
    from aws_etl_project2_fiap_spark.operators.text import chunk_documents

    toks = [f"t{i}" for i in range(113)]
    df = spark.createDataFrame(
        [(1, " ".join(toks)), (2, "a b c")], "doc_id long, text string"
    )
    out = chunk_documents(df, chunk_tokens=64, overlap=16)
    chunks = {
        (r["doc_id"], r["chunk_idx"]): r["chunk_text"].split(" ")
        for r in out.collect()
    }
    # doc 1: n=113, stride=48 -> ceil(97/48)=3 chunks
    assert {i for (d, i) in chunks if d == 1} == {0, 1, 2}
    c0, c1, c2 = chunks[(1, 0)], chunks[(1, 1)], chunks[(1, 2)]
    assert c0 == toks[0:64] and c1 == toks[48:112] and c2 == toks[96:113]
    assert c0[-16:] == c1[:16]  # exact overlap
    assert len(c2) == 17  # tail: 16 overlap + 1 novel
    # reassembly covers every token in order
    assert c0 + c1[16:] + c2[16:] == toks
    # short doc: single chunk, intact
    assert {i for (d, i) in chunks if d == 2} == {0}
    assert chunks[(2, 0)] == ["a", "b", "c"]


def test_chunk_documents_rejects_bad_overlap(spark):
    import pytest as _pytest

    from aws_etl_project2_fiap_spark.operators.text import chunk_documents

    df = spark.createDataFrame([(1, "x y")], "doc_id long, text string")
    with _pytest.raises(ValueError):
        chunk_documents(df, chunk_tokens=16, overlap=16)


def test_referential_check_counts_orphans(spark):
    from aws_etl_project2_fiap_spark.operators.quality import referential_check

    parent = spark.createDataFrame([(1,), (2,)], "pk long")
    child = spark.createDataFrame(
        [(10, 1), (11, 2), (12, 99), (13, None), (14, 98)],
        "id long, fk long",
    )
    row = referential_check(child, "fk", parent, "pk", "fk_rule").collect()[0]
    # 99 and 98 are orphans; NULL fk is NOT an orphan (SQL FK semantics)
    assert (row["rule"], row["violations"]) == ("fk_rule", 2)

    clean = referential_check(
        child.filter("fk IS NOT NULL AND fk < 3"), "fk", parent, "pk"
    ).collect()[0]
    assert clean["violations"] == 0


# -- deterministic shard export (assign_shards / write_shards) ---------


def test_assign_shards_deterministic_and_uniform(spark):
    from aws_etl_project2_fiap_spark.operators.corpus import assign_shards

    d = spark.read.parquet(f"{SF}/documents.parquet")
    a = assign_shards(d, "doc_id", 8, seed=42)
    b = assign_shards(d.repartition(13), "doc_id", 8, seed=42)
    # partitioning-independent: identical (id -> shard, order) mapping
    assert (
        a.select("doc_id", "shard", "shard_order")
        .exceptAll(b.select("doc_id", "shard", "shard_order"))
        .count()
        == 0
    )
    counts = [r["count"] for r in a.groupBy("shard").count().collect()]
    n = d.count()
    assert len(counts) == 8
    assert max(counts) < 2 * n / 8  # no pathological skew
    # a different seed reshuffles
    c = assign_shards(d, "doc_id", 8, seed=7)
    moved = (
        a.select("doc_id", "shard")
        .join(c.select("doc_id", F.col("shard").alias("s2")), "doc_id")
        .filter(F.col("shard") != F.col("s2"))
        .count()
    )
    assert moved > n / 2


def test_write_shards_layout_and_order(spark, tmp_path):
    from aws_etl_project2_fiap_spark.operators.corpus import write_shards

    d = spark.read.parquet(f"{SF}/documents.parquet")
    out = str(tmp_path / "shards")
    write_shards(d, out, "doc_id", 4, seed=1)
    back = spark.read.parquet(out)
    assert back.count() == d.count()
    assert {r["shard"] for r in back.select("shard").distinct().collect()} == {
        0, 1, 2, 3,
    }
    # rows inside each shard file are in shard_order (read order = file
    # order for a single parquet file)
    import pandas as pd
    from pathlib import Path

    for part_dir in Path(out).glob("shard=*"):
        files = list(part_dir.glob("*.parquet"))
        assert len(files) == 1  # one file per shard
        pdf = pd.read_parquet(files[0])
        assert list(pdf["shard_order"]) == sorted(pdf["shard_order"])
