"""Benchmark decontamination: flag corpus documents that share word
n-grams with an evaluation/benchmark set.

Standard LLM training-data hygiene (no reference analogue — part of the
added large-scale pipeline surface, SURVEY.md §2.12): before training,
every document that overlaps an eval benchmark by >= 1 n-gram must be
flagged (and usually dropped) so benchmark scores measure generalization,
not memorization.

Scale shape (the part that matters at 100 TB):

- Both sides tokenize JVM-side (`text.word_tokens` / `text.word_ngrams`,
  whole-stage codegen) — no Python in the per-document hot path.
- The benchmark gram set is SMALL by construction (eval suites are
  orders of magnitude smaller than a training corpus), so it is
  broadcast: the corpus side is one scan -> explode -> map-side hash
  probe. The corpus text payload never shuffles; only surviving
  (doc_id, gram) hits move into the final partial-agg groupBy.
- Per-doc dedup of grams is folded into `count_distinct` in the single
  aggregation rather than a separate `dropDuplicates` shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import text


def doc_ngrams(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
) -> DataFrame:
    """Explode a document frame to (id, gram) rows. NOT deduplicated —
    callers aggregate with ``count_distinct`` (one shuffle instead of
    dropDuplicates + groupBy's two)."""
    # tokenize in its OWN projection: passing the split+filter chain
    # straight into word_ngrams makes the slice lambda re-evaluate the
    # whole tokenizer per gram index — O(len²) per row (measured 2×
    # end-to-end on the decontamination query at sf0.1)
    pre = df.select(F.col(id_col), text.word_tokens(text_col).alias("__toks"))
    return pre.select(
        F.col(id_col),
        F.explode(text.word_ngrams(F.col("__toks"), n)).alias("gram"),
    )


def contamination_hits(
    corpus: DataFrame,
    benchmark: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    hit_col: str = "n_shared",
) -> DataFrame:
    """Per-corpus-document count of DISTINCT n-grams shared with the
    benchmark set. Only contaminated documents appear in the output
    (inner join semantics); join the result back to the corpus with a
    left-anti join to drop them.

    The benchmark gram set is broadcast — assert stays a hash join, not
    a sort-merge, in tests/test_decontam.py."""
    bench_grams = (
        doc_ngrams(benchmark, id_col=id_col, text_col=text_col, n=n)
        .select("gram")
        .distinct()
    )
    return (
        doc_ngrams(corpus, id_col=id_col, text_col=text_col, n=n)
        .join(F.broadcast(bench_grams), "gram")
        .groupBy(id_col)
        .agg(F.count_distinct("gram").alias(hit_col))
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
) -> DataFrame:
    """The corpus minus contaminated documents (left-anti join on the
    hit set — doc ids only shuffle, never text payloads)."""
    hits = contamination_hits(
        corpus, benchmark, id_col=id_col, text_col=text_col, n=n
    )
    return corpus.join(hits, id_col, "left_anti")
