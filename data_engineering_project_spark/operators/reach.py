"""Sliding-window distinct-user reach (exact trailing-N-day uniques).

The classic "7-day active users per day" metric. The naive plan is a
range join (every day joined to 7 days of raw events) or a giant
collect_set window — both scale-killers. The Spark-first shape is a
BOUNDED EXPLODE: each distinct (day, user) contribution row fans out to
the ≤N report days it counts toward (`sequence(day, day+N-1)`), then one
equi-shuffle on the report day counts distinct users. Expansion factor
is exactly the window length — constant, independent of data volume —
and every operator after the explode is a plain hash aggregate, so the
plan survives a 100× scale-up where a range join's O(days × events)
probe does not. The approximate twin at scale swaps countDistinct for
HLL sketch union (see reach_rollup_sketch in plans/workload.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def rolling_reach(
    events: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    window_days: int = 7,
) -> DataFrame:
    """(day, reach) — distinct users seen in the trailing
    ``window_days`` ending at each day that has activity.

    Two-stage distinct: (day, user) pairs dedup BEFORE the fan-out so
    the explode multiplies unique pairs, not raw events; the final
    distinct count shuffles (report_day, user) once more. Days with no
    events are dropped (semi-join against observed days) so the output
    matches the "days present in the data" contract."""
    day_user = events.select(
        F.to_date(ts_col).alias("day"), F.col(user_col).alias("user")
    ).distinct()
    contributions = day_user.select(
        F.explode(
            F.sequence(
                F.col("day"),
                F.date_add(F.col("day"), window_days - 1),
            )
        ).alias("report_day"),
        "user",
    )
    observed = day_user.select("day").distinct()
    return (
        contributions.join(
            observed, contributions.report_day == observed.day, "left_semi"
        )
        .groupBy("report_day")
        .agg(F.countDistinct("user").alias("reach"))
        .select(F.col("report_day").alias("day"), "reach")
    )
