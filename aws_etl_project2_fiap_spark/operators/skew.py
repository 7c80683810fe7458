"""Skew mitigation: salting for hot keys (SURVEY §7.4 item 7).

AQE's skew-join splitting handles most cases at runtime; salting is the
explicit fallback for the two places AQE can't help:

- a groupBy where one key dominates (the partial aggregate on that key
  still lands on one reducer) → :func:`salted_agg` splits the hot key
  across N sub-keys, aggregates, then re-aggregates the N partials;
- a shuffle join where one LEFT key explodes → :func:`salted_join`
  salts the left side and replicates each right row N× (right must be
  the smaller side), turning one hot partition into N warm ones.

Both are semantics-preserving rewrites, verified in tests against the
unsalted plans.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT = "__salt"


def with_salt(df: DataFrame, n_salts: int, cols: list[str] | None = None) -> DataFrame:
    """Salt in [0, n_salts): hash of the row's (given or all) columns
    MIXED with a per-row counter — byte-identical duplicate rows are the
    archetypal hot key, and a pure content hash would give them all the
    SAME salt, defeating the split. The counter keeps the salt stable
    for a fixed input partitioning (task retries replay identically);
    any salt assignment is semantically valid for the rewrites below."""
    basis = [F.col(c) for c in (cols or df.columns)]
    return df.withColumn(
        SALT,
        F.pmod(F.xxhash64(*basis, F.monotonically_increasing_id()), F.lit(n_salts)),
    )


def salted_agg(
    df: DataFrame,
    keys: list[str],
    partial: dict[str, Column],
    final: Callable[[DataFrame], DataFrame],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation over (keys + salt) then keys.

    ``partial`` maps output-column → aggregate expression for phase 1;
    ``final`` re-aggregates the n_salts partial rows per key (it receives
    the phase-1 frame). E.g. count = sum of partial counts, avg = sum of
    partial sums / sum of partial counts.
    """
    salted = with_salt(df, n_salts)
    phase1 = salted.groupBy(*keys, SALT).agg(
        *[expr.alias(name) for name, expr in partial.items()]
    )
    return final(phase1.drop(SALT) if SALT in phase1.columns else phase1)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: salt the (large, skewed) left side, explode
    the (small) right side across all salts, join on keys+salt.

    Right-side cost is n_salts× its size — use only when right ≪ left
    (the usual hot-key shape: a huge fact key against a dimension row).
    Supported ``how``: inner / left / left_semi / left_anti. Right and
    full outer are rejected — an unmatched right row exists as n_salts
    exploded copies, so the rewrite can't preserve their multiplicity.
    """
    if how in {"right", "rightouter", "right_outer", "full", "outer", "fullouter", "full_outer"}:
        raise ValueError(
            f"salted_join cannot preserve how={how!r}: unmatched right rows "
            "are replicated per salt; flip the sides or use AQE skew join"
        )
    l_salted = with_salt(left, n_salts)
    r_exploded = right.withColumn(
        SALT, F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    ).withColumn(SALT, F.col(SALT).cast("bigint"))
    return l_salted.join(r_exploded, [*on, SALT], how).drop(SALT)
