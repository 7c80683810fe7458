"""Hot-bucket cap: one degenerate bucket (boilerplate shared by
thousands of docs/vectors) must not go quadratic.

Over-cap buckets are thinned to a star around the bucket's min-id
member: output stays linear in bucket size and every member remains
connected to the representative (so keep-min-id dedup is unchanged),
while buckets at or under the cap keep exact pair enumeration —
asserted here by comparing capped vs uncapped output on a normal
corpus.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_etl_project2_fiap_spark.operators.dedup import minhash_lsh_pairs
from aws_etl_project2_fiap_spark.operators.similarity import (
    near_dup_pairs_bucketed,
)

SF = "/root/testdata/sf0.001"
N_BOILER = 3000
BOILER = "terms of service apply to all content on this page please read carefully"


def test_minhash_boilerplate_bucket_is_linear(spark):
    """3000 identical docs: uncapped banding would emit ~3000²/2·bands
    candidates; the cap must yield exactly the n-1 star pairs, all at
    jaccard 1, all anchored at the min id."""
    docs = spark.range(N_BOILER).select(
        F.col("id").alias("doc_id"), F.lit(BOILER).alias("text")
    )
    pairs = minhash_lsh_pairs(docs, max_bucket=100).collect()
    assert len(pairs) == N_BOILER - 1
    assert all(r.id1 == 0 and r.jaccard == 1.0 for r in pairs)
    assert {r.id2 for r in pairs} == set(range(1, N_BOILER))


def test_minhash_cap_leaves_normal_corpus_unchanged(spark):
    """Under-cap buckets must keep exact pair enumeration: capped and
    effectively-uncapped runs agree on the real documents table."""
    d = spark.read.parquet(f"{SF}/documents.parquet")
    capped = {
        (r.id1, r.id2) for r in minhash_lsh_pairs(d, max_bucket=1000).collect()
    }
    uncapped = {
        (r.id1, r.id2)
        for r in minhash_lsh_pairs(d, max_bucket=10**9).collect()
    }
    assert capped == uncapped
    assert capped  # the corpus has planted near-dups


def test_minhash_mixed_corpus_keeps_real_pairs_and_star(spark):
    """Boilerplate flood + genuinely near-dup distinct docs in the same
    run: the cap must bound the flood without costing the real pairs."""
    boiler = spark.range(500).select(
        F.col("id").alias("doc_id"), F.lit(BOILER).alias("text")
    )
    a = "the quick brown fox jumps over the lazy dog near the river bank today"
    b = "the quick brown fox jumps over the lazy dog near the river bank now"
    extra = spark.createDataFrame(
        [(10_000, a), (10_001, b)], ["doc_id", "text"]
    )
    pairs = {
        (r.id1, r.id2): r.jaccard
        for r in minhash_lsh_pairs(
            boiler.unionByName(extra), max_bucket=100, threshold=0.5
        ).collect()
    }
    assert (10_000, 10_001) in pairs  # the real near-dup survived
    star = [k for k in pairs if k[0] == 0]
    assert len(star) == 499  # flood thinned to the star


def test_vector_boilerplate_bucket_is_linear(spark):
    """2000 identical embeddings: star output, anchored at min id, sim 1."""
    base = [float((i * 37) % 19 - 9) for i in range(64)]
    vecs = spark.range(2000).select(
        F.col("id").alias("vec_id"),
        F.array(*[F.lit(x) for x in base]).alias("embedding"),
    )
    pairs = near_dup_pairs_bucketed(
        vecs, threshold=0.9, planes=4, tables=4, max_bucket=100
    ).collect()
    assert len(pairs) == 1999
    assert all(r.id1 == 0 and r.sim == 1.0 for r in pairs)


def test_vector_cap_leaves_normal_corpus_unchanged(spark):
    """Real embeddings never hit the default cap: capped == uncapped."""
    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    capped = {
        (r.id1, r.id2)
        for r in near_dup_pairs_bucketed(e, threshold=0.4).collect()
    }
    uncapped = {
        (r.id1, r.id2)
        for r in near_dup_pairs_bucketed(
            e, threshold=0.4, max_bucket=10**9
        ).collect()
    }
    assert capped == uncapped
    assert capped


def test_prefix_filtered_jaccard_equals_naive(spark):
    """The prefix-filtered exact join must return exactly the pairs of
    the naive all-pairs formulation at every threshold tried."""
    from aws_etl_project2_fiap_spark.operators.dedup import (
        ngram_jaccard_pairs,
        ngram_jaccard_pairs_prefix,
    )

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    for t in (0.7, 0.9):
        naive = {
            (r["id1"], r["id2"], round(r["jaccard"], 9))
            for r in ngram_jaccard_pairs(d, threshold=t).collect()
        }
        pref = {
            (r["id1"], r["id2"], round(r["jaccard"], 9))
            for r in ngram_jaccard_pairs_prefix(d, threshold=t).collect()
        }
        assert pref == naive
