"""Similarity search over embedding columns (``array<float>``).

Two tiers:

- **brute-force cosine top-k** — the exact baseline. Dot products via
  ``F.zip_with`` + ``F.aggregate`` (JVM higher-order functions, no
  Python); the query vector rides along as a broadcast literal, so the
  scan is embarrassingly parallel and LIMIT k plans as
  TakeOrderedAndProject.
- **LSH-bucketed (random hyperplanes)** — the scale path for pairwise
  near-dup: sign-bit sketch over D deterministic pseudo-random
  hyperplanes, candidates only form inside a bucket. Cost tracks bucket
  occupancy, not n².

At 100 TB the brute-force variant stays viable for *single-query* top-k
(one scan, no shuffle); all-pairs work must go through the bucketed
variant (or IVF with a learned coarse quantizer, same plumbing).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def knn_brute_force(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact cosine top-k against a constant query vector.
    Returns (id, sim) — sim rounded to 6 d.p. for cross-engine stability."""
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    return (
        df.select(
            F.col(id_col).alias("id"),
            F.round(cosine(F.col(vec_col), q), 6).alias("sim"),
        )
        .orderBy(F.desc("sim"), F.asc("id"))
        .limit(k)
    )


def hyperplane_sketch(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    planes: int = 16,
    dim: int = 64,
) -> DataFrame:
    """Sign-bit sketch over ``planes`` deterministic pseudo-random
    hyperplanes. Plane weights come from a hash of (plane, dim-index) —
    reproducible with no RNG state, computed entirely JVM-side."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))

    def plane_bit(p: int) -> Column:
        # weight_j = hash(p, j) scaled to [-1, 1); deterministic
        proj = F.aggregate(
            F.zip_with(
                v,
                F.sequence(F.lit(0), F.lit(dim - 1)),
                lambda x, j: x * (F.xxhash64(F.lit(p), j) / F.lit(float(1 << 63))),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        return F.when(proj >= 0, F.lit(1)).otherwise(F.lit(0))

    sketch = None
    for p in range(planes):
        bit = plane_bit(p) * F.lit(1 << p)
        sketch = bit if sketch is None else sketch + bit
    return df.select(F.col(id_col).alias("id"), F.col(vec_col), sketch.alias("bucket"))


def near_dup_pairs_bucketed(
    df: DataFrame,
    threshold: float = 0.9,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    planes: int = 8,
    dim: int = 64,
) -> DataFrame:
    """Approximate cosine near-dup pairs: bucket by hyperplane sketch,
    exact-verify within buckets. Returns (id1, id2, sim)."""
    sk = hyperplane_sketch(df, vec_col, id_col, planes, dim)
    a, b = sk.alias("a"), sk.alias("b")
    return (
        a.join(b, on="bucket")
        .filter(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id1"),
            F.col("b.id").alias("id2"),
            F.round(cosine(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}")), 6).alias(
                "sim"
            ),
        )
        .filter(F.col("sim") >= threshold)
    )


def near_dup_pairs_exact(
    df: DataFrame,
    threshold: float = 0.9,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact all-pairs cosine near-dup (the oracle-checkable ground truth;
    quadratic — test-SF only, LSH-bucketed is the scale path)."""
    a = df.select(F.col(id_col).alias("id1"), F.col(vec_col).alias("__v1"))
    b = df.select(F.col(id_col).alias("id2"), F.col(vec_col).alias("__v2"))
    return (
        a.crossJoin(b)
        .filter(F.col("id1") < F.col("id2"))
        .select(
            "id1",
            "id2",
            F.round(cosine(F.col("__v1"), F.col("__v2")), 6).alias("sim"),
        )
        .filter(F.col("sim") >= threshold)
    )
