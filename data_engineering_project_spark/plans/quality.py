"""Declarative data-quality gates — the Pandera-equivalent layer
(reference etl/tasks/silver.py:7-19,42,58 and the incremental DQC at
scripts/bronze_incremental.py:68-106).

The reference pulls whole silver tables into Pandas and runs Pandera
checks — a driver-side materialization that cannot work at 100 TB. The
same semantics here are **one aggregate pass per table**: every check
compiles to a conditional count inside a single ``agg``, so the gate
costs one scan regardless of check count, and nothing but one row of
violation counters reaches the driver. Fail-fast contract preserved:
:func:`validate` raises ``DataQualityError`` before downstream layers
run (README_FASE1.md:61-70).
"""

from __future__ import annotations

from collections.abc import Sequence
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F


class DataQualityError(ValueError):
    """A DQ gate failed; downstream layers must not run."""


@dataclass(frozen=True)
class Check:
    """One declarative row-level constraint: rows where ``violation``
    is true are counted against the check."""

    name: str
    violation: Column


def not_null(col: str) -> Check:
    return Check(f"{col}_not_null", F.col(col).isNull())


def isin(col: str, allowed: Sequence[str]) -> Check:
    """Closed-domain check (Pandera ``isin``, silver.py:8-11).
    Nulls count as violations, matching ``nullable=False`` + isin."""
    return Check(
        f"{col}_in_domain",
        F.col(col).isNull() | ~F.col(col).isin(list(allowed)),
    )


def ge(col: str, bound: float) -> Check:
    """Lower-bound check (Pandera ``ge(0)``, silver.py:15-17).
    Null passes (Pandera's ge skips NA unless nullable=False)."""
    return Check(f"{col}_ge_{bound}", F.col(col) < bound)


def unique(cols: Sequence[str]) -> "UniqueCheck":
    return UniqueCheck(cols)


@dataclass(frozen=True)
class UniqueCheck:
    """Natural-key uniqueness (the reference's duplicate probe,
    test.py:4-14). Needs its own groupBy pass, so it is kept separate
    from the single-scan row checks."""

    cols: Sequence[str]


def profile(df: DataFrame, checks: Sequence[Check]) -> dict[str, int]:
    """Violation counts for all row-level checks in ONE scan."""
    aggs = [F.count("*").alias("__rows")]
    aggs += [
        F.sum(F.when(c.violation, 1).otherwise(0)).cast("long").alias(c.name)
        for c in checks
    ]
    return df.agg(*aggs).collect()[0].asDict()


def observe_checks(
    df: DataFrame, checks: Sequence[Check], name: str = "dq"
) -> tuple[DataFrame, Observation]:
    """Attach the row-level checks to ``df`` as an ``Observation``.

    Unlike :func:`profile` (its own aggregate job), the observation
    rides whatever action the caller runs next — typically the write
    that materializes the table — so at 100 TB the DQ gate costs ZERO
    extra scans. Pattern::

        gated, obs = observe_checks(silver, silver_orders_checks())
        gated.write.parquet(path)        # one pass: write + metrics
        assert_observed(obs)             # raises DataQualityError

    The trade-off vs :func:`validate` is ordering: the data is already
    written when the gate fires, so pair it with a transactional sink
    (sources/txlog.py) or a pre-publish staging dir when downstream
    must never see a bad table.
    """
    aggs = [F.count(F.lit(1)).alias("__rows")]
    aggs += [
        F.sum(F.when(c.violation, 1).otherwise(0)).cast("long").alias(c.name)
        for c in checks
    ]
    obs = Observation(name)
    return df.observe(obs, *aggs), obs


def assert_observed(obs: Observation, allow_empty: bool = False) -> dict[str, int]:
    """Check an :func:`observe_checks` observation after its action ran;
    raises :class:`DataQualityError` like :func:`validate`."""
    counts = {k: (v or 0) for k, v in obs.get.items()}
    if not allow_empty and counts.get("__rows", 0) == 0:
        raise DataQualityError("empty input")
    bad = {k: v for k, v in counts.items() if k != "__rows" and v}
    if bad:
        raise DataQualityError(f"DQ violations: {bad}")
    return counts


def validate(
    df: DataFrame,
    checks: Sequence[Check] = (),
    unique_keys: Sequence[UniqueCheck] = (),
    allow_empty: bool = False,
) -> dict[str, int]:
    """Run all gates; raise :class:`DataQualityError` on any violation.

    Returns the violation profile (all zeros on success) so callers can
    log it to the ledger.
    """
    counts = profile(df, checks) if checks else {"__rows": df.count()}
    if not allow_empty and counts["__rows"] == 0:
        raise DataQualityError("empty input")
    bad = {k: v for k, v in counts.items() if k != "__rows" and v}
    for uc in unique_keys:
        dupes = (
            df.groupBy(*uc.cols).count().filter(F.col("count") > 1).count()
        )
        if dupes:
            bad[f"unique_{'_'.join(uc.cols)}"] = dupes
    if bad:
        raise DataQualityError(f"DQ violations: {bad}")
    return counts


# The reference's concrete silver gates (etl/tasks/silver.py:7-19) in
# declarative form, for an Olist-shaped orders/items pair.
ORDER_STATUS_DOMAIN = (
    "delivered",
    "shipped",
    "canceled",
    "invoiced",
    "processing",
    "approved",
    "unavailable",
    "created",
)


def silver_orders_checks() -> list[Check]:
    return [
        not_null("order_id"),
        isin("order_status", ORDER_STATUS_DOMAIN),
    ]


def silver_items_checks() -> list[Check]:
    return [
        not_null("order_id"),
        ge("price", 0),
        ge("freight_value", 0),
    ]


def profile_columns(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Per-column profile — null count and exact distinct count — as a
    tall (column_name, null_count, distinct_count) relation.

    All null counters come from ONE aggregate pass (conditional counts,
    like the DQ gates above); the exact distinct counts are per-column
    aggregates Spark plans as a single multi-distinct via Expand. At
    lake scale swap ``countDistinct`` for ``approx_count_distinct`` —
    the profile is a triage artifact, not an oracle-checked result —
    but the exact form is what a cross-engine check can verify."""
    aggs: list[Column] = []
    for c in cols:
        aggs.append(
            F.count(F.when(F.col(c).isNull(), 1)).alias(f"__null_{c}")
        )
        aggs.append(F.countDistinct(c).alias(f"__dist_{c}"))
    row = df.agg(*aggs)
    stacked = ", ".join(
        f"'{c}', __null_{c}, __dist_{c}" for c in cols
    )
    return row.select(
        F.expr(
            f"stack({len(cols)}, {stacked}) AS "
            "(column_name, null_count, distinct_count)"
        )
    )
