"""Corpus-assembly operators: the last mile of a training-data
pipeline, after cleaning/dedup — redact PII, balance the domain mix,
pack documents into fixed-token-budget training sequences.

No reference analogue (the reference ends at parquet landing,
src/etl.py:191-221); this is added large-scale surface (SURVEY §2.12).
Everything here is codegen'd expressions or partial-agg-friendly
aggregations — no Python in the hot path, nothing collected to the
driver.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# deliberately simple, auditable patterns: emails, dotted-quad IPs, and
# international-ish phone numbers; production would swap in a vetted set
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ip": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "phone": r"\+\d[\d\- ]{7,}\d",
}


def scrub_pii(col: Column | str, token: str = "[PII]") -> Column:
    """Replace every PII match with ``token``. A chain of JVM
    ``regexp_replace`` calls — one codegen'd projection, no shuffle, the
    per-document hot path stays in Tungsten."""
    c = F.col(col) if isinstance(col, str) else col
    for pat in PII_PATTERNS.values():
        c = F.regexp_replace(c, pat, token)
    return c


def pii_hits(col: Column | str) -> Column:
    """Total PII matches (for audit metrics / drop thresholds)."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.lit(0)
    for pat in PII_PATTERNS.values():
        out = out + F.regexp_count(c, F.lit(pat))
    return out.cast("long")


def mixture_weights(
    df: DataFrame,
    domain_col: str,
    target: dict[str, float] | None = None,
) -> DataFrame:
    """Per-domain sampling weights to morph the corpus's actual mix into
    ``target`` (domain -> share; default uniform): weight =
    target_share / actual_share. Feed the weights to a Bernoulli/
    repetition sampler to materialize the mix.

    Scale: one partial-agg groupBy over the corpus, then an unbounded
    window over the handful of domain rows (cardinality = n_domains, so
    the single-partition window is on an already-tiny frame)."""
    counts = df.groupBy(domain_col).agg(F.count("*").alias("n_docs"))
    total = F.sum("n_docs").over(Window.partitionBy())
    n_dom = F.count("*").over(Window.partitionBy())
    share = F.col("n_docs") / total
    if target is None:
        target_share = F.lit(1.0) / n_dom
    else:
        target_share = F.coalesce(
            *[
                F.when(F.col(domain_col) == k, F.lit(v))
                for k, v in target.items()
            ],
            F.lit(0.0),
        )
    return counts.select(
        domain_col,
        "n_docs",
        share.alias("actual_share"),
        (target_share / share).alias("weight"),
    )


def pack_sequences(
    df: DataFrame,
    *,
    shard_col: str,
    order_cols: list[str],
    tokens_col: str,
    budget: int,
    seq_col: str = "seq_id",
) -> DataFrame:
    """Assign each document to a training sequence of ~``budget`` tokens
    within its shard: fixed-stride packing — a doc starts the sequence
    its running start-offset falls in (``floor(start_offset / budget)``).

    This is the streaming-friendly approximation of greedy bin packing
    (greedy "close the bin early" needs a sequential scan per shard; the
    stride rule is a pure prefix-sum, so it stays one shuffle + one
    per-partition sort at any scale). Docs longer than ``budget`` get a
    sequence of their own either way.
    """
    w = (
        Window.partitionBy(shard_col)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start_offset = F.sum(tokens_col).over(w) - F.col(tokens_col)
    return df.withColumn(
        seq_col, F.floor(start_offset / F.lit(budget)).cast("long")
    )


def assign_shards(
    df: DataFrame,
    id_col: str,
    n_shards: int,
    seed: int = 0,
    shard_col: str = "shard",
    order_col: str = "shard_order",
) -> DataFrame:
    """Deterministic training-shard assignment: every row gets a shard
    in [0, n_shards) and a stable intra-shard order key, both pure
    functions of (seed, id) — the global-shuffle-then-shard step of a
    training-data export, with three properties RNG-based shuffles
    can't give:

    - REPRODUCIBLE across runs, engines, and partitionings (no RNG
      state per executor; `sample_md5_per_source` uses the same
      hash-rank trick for sampling);
    - UNIFORM: md5 bits are equidistributed, so shards balance to
      ~±sqrt(n) regardless of id clustering (sequential crawl ids,
      hot sources);
    - SHUFFLED: hash order is uncorrelated with every natural order
      (source, time, id), so each shard and each intra-shard sequence
      is an unbiased sample of the corpus — what curriculum-free
      training wants.

    Changing ``seed`` reshuffles everything. Scale: one codegen
    projection — the downstream write repartitions on ``shard_col``
    (one shuffle) and sorts within partitions on ``order_col``.
    """
    key = F.md5(
        F.concat_ws(":", F.lit(str(seed)), F.col(id_col).cast("string"))
    )
    shard = F.conv(F.substring(key, 1, 8), 16, 10).cast("long") % n_shards
    return df.withColumn(shard_col, shard.cast("int")).withColumn(
        order_col, key
    )


def write_shards(
    df: DataFrame,
    path: str,
    id_col: str,
    n_shards: int,
    seed: int = 0,
) -> None:
    """Materialize a deterministic shard export: one directory per
    shard (``shard=K/``), rows inside each file in shard order. One
    shuffle on the shard key + per-partition sort; re-running with the
    same seed is byte-stable up to parquet encoding."""
    out = assign_shards(df, id_col, n_shards, seed)
    (
        # the dynamic-partition writer requires a sort on the partition
        # column and would otherwise re-sort (unstably) over our order —
        # sorting by (shard, order) satisfies that requirement exactly,
        # so the writer elides its sort and the order key survives
        out.repartition(n_shards, F.col("shard"))
        .sortWithinPartitions("shard", "shard_order")
        .write.partitionBy("shard")
        .mode("overwrite")
        .parquet(path)
    )
