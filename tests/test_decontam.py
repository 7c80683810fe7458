"""Benchmark-decontamination operator: exact semantics on a handcrafted
corpus, plan shape (benchmark side broadcast), and n-gram edge cases."""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_etl_project2_fiap_spark.operators import decontam, text


def _plan(df) -> str:
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_contamination_hits_exact(spark):
    corpus = _docs(
        spark,
        [
            # shares "quick brown fox jumps" + "brown fox jumps over"
            (1, "the quick brown fox jumps over the lazy dog"),
            # no 4-gram overlap (different word order)
            (2, "dog lazy the over jumps fox brown quick the"),
            # shares exactly one 4-gram, repeated twice in the doc:
            # distinct count must still be 1
            (3, "quick brown fox jumps and quick brown fox jumps again"),
            (4, "completely unrelated text about spark partitions"),
        ],
    )
    bench = _docs(spark, [(100, "a quick brown fox jumps over me")])
    hits = {
        r["doc_id"]: r["n_shared"]
        for r in decontam.contamination_hits(corpus, bench, n=4).collect()
    }
    assert hits == {1: 2, 3: 1}


def test_decontaminate_drops_only_contaminated(spark):
    corpus = _docs(
        spark,
        [
            (1, "alpha beta gamma delta epsilon"),
            (2, "one two three four five"),
            (3, "alpha beta gamma delta zeta"),
        ],
    )
    bench = _docs(spark, [(9, "alpha beta gamma delta")])
    kept = sorted(
        r["doc_id"] for r in decontam.decontaminate(corpus, bench, n=4).collect()
    )
    assert kept == [2]


def test_short_docs_produce_no_grams(spark):
    # fewer tokens than n: word_ngrams must yield [], never a descending
    # sequence() blow-up
    df = _docs(spark, [(1, "only three words"), (2, ""), (3, "a b c d")])
    grams = df.select(
        "doc_id", text.word_ngrams(text.word_tokens("text"), 4).alias("g")
    ).collect()
    by_id = {r["doc_id"]: r["g"] for r in grams}
    assert by_id[1] == [] and by_id[2] == []
    assert by_id[3] == ["a b c d"]


def test_benchmark_side_is_broadcast(spark, sf_oracle):
    from aws_etl_project2_fiap_spark.workload import COMPONENTS

    df = COMPONENTS["text_decontaminate"].spark(spark, sf_oracle)
    p = _plan(df)
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p
