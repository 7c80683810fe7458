"""Trainable BPE tokenizer (operators/tokenizer.py).

Invariants: deterministic training, lossless segmentation, distributed
apply ≡ driver-side reference, and compression monotonicity (more
merges never yields more tokens).
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from aws_etl_project2_fiap_spark.operators import tokenizer as T

from conftest import SF_ORACLE as SF


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_train_deterministic(spark):
    d = _docs(spark)
    m1 = T.bpe_train(d, num_merges=50, sample_limit=200)
    m2 = T.bpe_train(d.repartition(13), num_merges=50, sample_limit=200)
    assert m1 == m2 and len(m1) == 50


def test_encode_lossless_and_matches_reference(spark):
    d = _docs(spark).limit(50)
    merges = T.bpe_train(d, num_merges=100, sample_limit=200)
    ranks = {p: i for i, p in enumerate(merges)}
    got = {
        r["id"]: (r["n_tokens"], r["tokens"])
        for r in T.bpe_tokenize(d, merges, with_tokens=True).collect()
    }
    rows = d.select("doc_id", "text").collect()
    assert len(got) == len(rows)
    for r in rows:
        n, toks = got[r["doc_id"]]
        # driver-side reference encode
        ref = []
        for w in T._WORD_RE.findall(r["text"] or ""):
            ref.extend(T.bpe_encode_word(w, ranks))
        assert n == len(ref)
        assert toks == [s.replace(T._EOW, "") for s in ref]
        # lossless: concatenating a word's tokens reproduces the word
        words = T._WORD_RE.findall(r["text"] or "")
        assert "".join(toks) == "".join(words)


def test_more_merges_never_more_tokens(spark):
    d = _docs(spark).limit(100)
    small = T.bpe_train(d, num_merges=20, sample_limit=200)
    big = T.bpe_train(d, num_merges=120, sample_limit=200)
    assert small == big[:20]  # merge list is prefix-stable
    n_small = (
        T.bpe_tokenize(d, small).agg(F.sum("n_tokens")).collect()[0][0]
    )
    n_big = T.bpe_tokenize(d, big).agg(F.sum("n_tokens")).collect()[0][0]
    assert n_big <= n_small


@settings(max_examples=30, deadline=None)
@given(
    word=st.text(
        alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd")),
        min_size=1,
        max_size=12,
    )
)
def test_encode_word_lossless_property(word):
    # random ranks over random adjacent pairs must never break the
    # concatenation invariant
    pairs = [(word[i], word[i + 1]) for i in range(len(word) - 1)]
    ranks = {p: i for i, p in enumerate(dict.fromkeys(pairs))}
    toks = T.bpe_encode_word(word, ranks)
    assert "".join(toks).replace(T._EOW, "") == word


def test_md5_order_hash_deterministic_and_guarded(spark):
    """order_hash='md5' (the text_bpe_tokens_portable sample ordering):
    bit-deterministic across partitionings, trains a different (but
    valid, still lossless) merge list than the xxhash64 sample, and
    bad values fail loud."""
    import pytest

    d = _docs(spark)
    m1 = T.bpe_train(d, num_merges=20, sample_limit=64, order_hash="md5")
    m2 = T.bpe_train(
        d.repartition(13), num_merges=20, sample_limit=64,
        order_hash="md5",
    )
    assert m1 == m2 and len(m1) == 20
    rows = (
        T.bpe_tokenize(d.limit(50), m1, with_tokens=True)
        .join(d.select(F.col("doc_id").alias("id"), "text"), "id")
        .collect()
    )
    for r in rows:  # lossless under the portable merges too
        joined = "".join(r["tokens"])
        ref = "".join(T._WORD_RE.findall(r["text"] or ""))
        assert joined == ref
    with pytest.raises(ValueError, match="order_hash"):
        T.bpe_train(d, num_merges=5, order_hash="sha1")
