"""Ordered-funnel and cohort-retention analytics over an event stream.

Two staples of product/event analytics engines, expressed as pure
DataFrame compositions:

- :func:`funnel_stages` / :func:`funnel_counts` — strictly-ordered
  conversion funnel: a user counts for stage k only if their earliest
  qualifying stage-k event is LATER than their earliest qualifying
  stage-(k-1) event. Each stage is a filtered per-user ``min(ts)``
  aggregate joined to the previous stage — k small shuffles on
  user_id, each output one row per surviving user, so stage frames
  shrink monotonically and the joins get cheaper as the funnel
  narrows. At 100 TB the event scan partial-aggregates map-side per
  user before any exchange.
- :func:`cohort_retention` — users bucketed by first-activity month
  (the cohort), counted per (cohort, month-offset). Two aggregates and
  one join, all keyed on user_id / month ints; no windows needed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def funnel_stages(
    events: DataFrame,
    steps: list[tuple[str, Column]],
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> list[DataFrame]:
    """Per-stage survivor frames: ``(user, first_ts)`` for each step.

    ``steps`` is an ordered list of (stage name, row predicate). Stage
    k keeps a user iff some event satisfies predicate k strictly after
    the user's stage-(k-1) first-ts.
    """
    if not steps:
        raise ValueError("funnel needs at least one step")
    stages: list[DataFrame] = []
    prev: DataFrame | None = None
    for name, pred in steps:
        filtered = events.filter(pred)
        if prev is not None:
            filtered = filtered.join(prev, user_col).filter(
                F.col(ts_col) > F.col("__prev_ts")
            )
        stage = filtered.groupBy(user_col).agg(F.min(ts_col).alias(f"ts_{name}"))
        stages.append(stage)
        prev = stage.select(
            F.col(user_col), F.col(f"ts_{name}").alias("__prev_ts")
        )
    return stages


def funnel_counts(
    events: DataFrame,
    steps: list[tuple[str, Column]],
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """One row per stage: (stage index, stage name, users reaching it)."""
    stages = funnel_stages(events, steps, user_col, ts_col)
    parts = [
        stage.agg(
            F.lit(i + 1).alias("stage"),
            F.lit(name).alias("step"),
            F.count("*").cast("long").alias("n_users"),
        )
        for i, (stage, (name, _)) in enumerate(zip(stages, steps))
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """(cohort_month, month_offset, n_users): how many of each first-
    activity-month cohort were active again k months later."""
    month = F.date_trunc("month", F.col(ts_col)).cast("date")
    activity = events.select(
        F.col(user_col), month.alias("activity_month")
    ).distinct()
    cohorts = activity.groupBy(user_col).agg(
        F.min("activity_month").alias("cohort_month")
    )
    offset = (
        (F.year("activity_month") - F.year("cohort_month")) * 12
        + (F.month("activity_month") - F.month("cohort_month"))
    ).cast("int")
    return (
        activity.join(cohorts, user_col)
        .groupBy("cohort_month", offset.alias("month_offset"))
        .agg(F.countDistinct(user_col).cast("long").alias("n_users"))
    )
