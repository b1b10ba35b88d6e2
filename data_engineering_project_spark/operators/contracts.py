"""Declarative data-contract checks (Great-Expectations-shaped).

Beyond-reference capability: the reference hard-codes its DQ rules in
the pipeline (etl/tasks/quality checks — null counts, duplicate keys);
production lakes declare them as a CONTRACT evaluated mechanically so
new tables get coverage by listing expectations, not writing code.

Every expectation compiles to ONE conditional-count column over a
single scan — the whole contract is one map-side aggregate regardless
of how many rules it has (no per-rule pass, no driver loop over rows).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class BlockSizeExceeded(ValueError):
    """A blocked operator's block exceeds its declared bound — the
    O(|block|²) stage would blow up. One shared exception type so
    every fail-loudly block guard (linkage.blocked_edit_pairs,
    similarity.embedding_near_dups, …) raises the same catchable
    contract: fix the block key or raise the bound deliberately;
    never let a degenerate key schedule a quadratic straggler task."""


@dataclass(frozen=True)
class Expectation:
    """One rule: ``name`` labels it, ``violated`` is a boolean Column
    that is True on rows BREAKING the rule. ``kind`` routes evaluation
    explicitly — "row" rules fuse into the single aggregate pass,
    "unique" rules group by ``key`` — so a hand-built row rule whose
    name happens to end in ``_unique`` is never mis-routed."""

    name: str
    violated: Column
    kind: str = "row"
    key: str | None = None


def not_null(col: str) -> Expectation:
    return Expectation(f"{col}_not_null", F.col(col).isNull())


def unique_key(col: str) -> Expectation:
    """Uniqueness rule — evaluated separately (needs a group-by, not a
    row predicate)."""
    return Expectation(f"{col}_unique", F.lit(None), kind="unique", key=col)


def in_range(col: str, lo, hi) -> Expectation:
    c = F.col(col)
    return Expectation(
        f"{col}_in_range", c.isNotNull() & ((c < F.lit(lo)) | (c > F.lit(hi)))
    )


def in_set(col: str, allowed: list) -> Expectation:
    c = F.col(col)
    return Expectation(
        f"{col}_in_set", c.isNotNull() & ~c.isin(allowed)
    )


def matches(col: str, pattern: str) -> Expectation:
    c = F.col(col)
    return Expectation(
        f"{col}_matches", c.isNotNull() & ~c.rlike(pattern)
    )


def evaluate(df: DataFrame, expectations: list[Expectation]) -> DataFrame:
    """→ (rule, n_violations, n_rows) — one row per expectation.

    Row-predicate rules fuse into a single aggregate pass; uniqueness
    rules (key duplication) each add one group-by on their key, with
    the violation count = rows beyond the first per duplicated key.
    An empty contract evaluates to an empty (rule, n_violations,
    n_rows) frame rather than raising.
    """
    if not expectations:
        return df.sparkSession.createDataFrame(
            [], "rule string, n_violations long, n_rows long"
        )
    row_rules = [e for e in expectations if e.kind == "row"]
    key_rules = [e for e in expectations if e.kind == "unique"]
    aggs = [F.count("*").cast("long").alias("n_rows")] + [
        F.sum(F.when(e.violated, 1).otherwise(0)).cast("long").alias(e.name)
        for e in row_rules
    ]
    wide = df.agg(*aggs)
    parts = []
    for e in row_rules:
        parts.append(
            wide.select(
                F.lit(e.name).alias("rule"),
                F.col(e.name).alias("n_violations"),
                "n_rows",
            )
        )
    for e in key_rules:
        key = e.key if e.key is not None else e.name[: -len("_unique")]
        dup = df.groupBy(key).agg(F.count("*").alias("c"))
        parts.append(
            dup.agg(
                F.lit(e.name).alias("rule"),
                F.sum(F.when(F.col("c") > 1, F.col("c") - 1).otherwise(0))
                .cast("long")
                .alias("n_violations"),
                F.sum("c").cast("long").alias("n_rows"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out
