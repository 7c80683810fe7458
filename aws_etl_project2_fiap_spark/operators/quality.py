"""Single-pass data-quality validation (the Deequ / expectations shape,
Spark-first).

Every rule compiles to an aggregate expression over ONE scan — a
violation counter (`count_if(~predicate)`), a uniqueness deficit
(`count(*) - count(distinct key)`), or any user-supplied aggregate —
and the whole rule set evaluates as a single partial+final aggregation:
no per-rule scans, no driver loops, O(rules) state per task. The wide
one-row result unpivots (one Expand node, no shuffle) into the
(rule, violations) report every ingest gate consumes.

At 100 TB this is exactly one pass over the table regardless of how
many rules are attached — the property that makes per-delivery
validation affordable inside the incremental-ingest sink.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def violations(predicate: Column) -> Column:
    """Rows violating ``predicate`` (NULL predicate counts as a
    violation — an unknown is not a pass)."""
    return F.count_if(~F.coalesce(predicate, F.lit(False)))


def not_null(col: str) -> Column:
    return violations(F.col(col).isNotNull())


def unique(col: str) -> Column:
    """Duplicate-row deficit for a key column: 0 iff the key is unique.
    count_distinct merges like any sketchless exact aggregate; at
    extreme cardinality swap for approx_count_distinct and a tolerance."""
    return F.count(F.lit(1)) - F.count_distinct(F.col(col))


def in_range(col: str, lo, hi) -> Column:
    return violations(F.col(col).between(lo, hi))


def matches(col: str, pattern: str) -> Column:
    return violations(F.col(col).rlike(pattern))


def check_rules(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """Evaluate every rule in ONE aggregation pass; returns the report
    frame (rule string, violations long), one row per rule."""
    wide = df.agg(
        *[expr.cast("long").alias(name) for name, expr in rules.items()]
    )
    return wide.unpivot(
        ids=[], values=list(rules), variableColumnName="rule",
        valueColumnName="violations",
    )


def referential_check(
    child: DataFrame,
    child_key: str,
    parent: DataFrame,
    parent_key: str,
    rule: str | None = None,
) -> DataFrame:
    """Cross-table expectation: count child rows whose foreign key has
    no parent (orphans). NULL keys are not orphans (SQL FK semantics —
    use :func:`not_null` separately to forbid them).

    Plan: distinct parent keys → LEFT ANTI join → count. Catalyst
    broadcasts the key set when it is dimension-sized; a fact-sized
    parent degrades to one shuffled anti join — either way a single
    pass over the child. Returns (rule, violations)."""
    name = rule or f"{child_key}_references_{parent_key}"
    orphans = (
        child.select(F.col(child_key))
        .filter(F.col(child_key).isNotNull())
        .join(
            parent.select(F.col(parent_key).alias(child_key)).distinct(),
            child_key,
            "left_anti",
        )
    )
    return orphans.agg(
        F.lit(name).alias("rule"),
        F.count(F.lit(1)).alias("violations"),
    )
