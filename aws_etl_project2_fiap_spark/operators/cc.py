"""Connected components over near-duplicate pair graphs.

Near-dup detection (MinHash/SimHash/Jaccard/embedding LSH) emits PAIRS;
acting on them — keep one representative per duplicate *group* — needs
the transitive closure: if A~B and B~C, then {A,B,C} is one cluster even
when A~C was never emitted. This module computes per-node cluster labels
(the minimum node id in each component) with the alternating
large-star/small-star algorithm of Kiveris et al., "Connected Components
in MapReduce and Beyond" (SoCC'14) — the standard shuffle-based CC used
at web scale.

Why this shape at 100 TB:

- Each round is two groupBy-style shuffles keyed on node id (uniform
  hash keys, no skew beyond genuine star nodes, which the algorithm
  itself flattens), converging in O(log^2 n) rounds — single digits in
  practice even for billion-node graphs.
- No driver-side graph state: edges stay distributed end to end; the
  only driver traffic is the per-round convergence checksum (2 longs).
- ``localCheckpoint`` truncates lineage each round, so the plan doesn't
  grow with iteration count (the classic iterative-DataFrame trap).

The reference has no graph operator (it has no joins at all — SURVEY
§2.7); this is part of the round-2 LLM-pipeline surface (SURVEY §2.12).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _large_star(edges: DataFrame) -> DataFrame:
    """Large-star: connect every strictly-larger neighbor of u to
    min(N(u) ∪ {u}). Operates on the undirected neighborhood."""
    both = edges.union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = both.groupBy("u").agg(F.min("v").alias("nbr_min"))
    return (
        both.join(mins, "u")
        .where(F.col("v") > F.col("u"))
        .select(
            F.col("v").alias("u"),
            F.least("nbr_min", "u").alias("v"),
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Small-star: orient edges toward the larger endpoint, then connect
    every (≤) neighbor — and the center itself — to the minimum."""
    oriented = edges.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    )
    mins = oriented.groupBy("u").agg(F.min("v").alias("nbr_min"))
    nbrs = oriented.join(mins, "u").select(
        F.col("v").alias("node"), F.col("nbr_min")
    )
    centers = mins.select(F.col("u").alias("node"), F.col("nbr_min"))
    return (
        nbrs.union(centers)
        .where(F.col("node") != F.col("nbr_min"))
        .select(F.col("node").alias("u"), F.col("nbr_min").alias("v"))
        .distinct()
    )


def _signature(edges: DataFrame) -> tuple[int, int]:
    """Order-insensitive fixpoint detector: (edge count, hash xor).
    bit_xor aggregates without overflow under ANSI mode (a sum of
    xxhash64 values can exceed long range); edges are distinct, so the
    xor can't cancel duplicate rows."""
    row = edges.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.bit_xor(F.xxhash64("u", "v")), F.lit(0)).alias("h"),
    ).collect()[0]
    return int(row["n"]), int(row["h"])


def connected_components(
    pairs: DataFrame,
    src: str = "id1",
    dst: str = "id2",
    max_iter: int = 25,
) -> DataFrame:
    """Cluster labels for every node appearing in ``pairs``.

    Returns (id, cluster_id) where cluster_id is the minimum node id in
    the node's connected component. Nodes absent from ``pairs``
    (singletons) are not returned — callers left-join and coalesce with
    the node's own id (see ``workload.dedup_cluster_assign``).
    """
    # Lazy checkpoints: the per-round signature action materializes
    # them, so each round runs one fused job (shuffles + checkpoint +
    # convergence check) instead of two separate actions.
    e = (
        pairs.select(
            F.col(src).cast("long").alias("u"), F.col(dst).cast("long").alias("v")
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    sig = _signature(e)
    for _ in range(max_iter):
        e_next = _small_star(_large_star(e)).localCheckpoint(eager=False)
        sig_next = _signature(e_next)
        e = e_next
        if sig_next == sig:
            break
        sig = sig_next
    # At the fixpoint every edge points node → component-min; the min
    # itself appears only on the right. A final groupBy(min) guards the
    # (never observed) case of max_iter stopping one round short.
    members = e.select(F.col("u").alias("id"), F.col("v").alias("cluster_id"))
    roots = e.select(F.col("v").alias("id"), F.col("v").alias("cluster_id"))
    return (
        members.union(roots)
        .groupBy("id")
        .agg(F.min("cluster_id").alias("cluster_id"))
    )
