"""As-of (point-in-time) join — an operator Spark lacks natively.

Semantics: for each left row, attach the most recent right row with
``right.ts <= left.ts`` within the same key group (DuckDB/kdb "ASOF
JOIN", backward direction).

Implementation is the scalable merge formulation, NOT a range
cross-join: union both sides tagged, sort within key by (ts, side),
and carry the last-seen right values forward with a running
``last(ignorenulls)`` window. Cost = one shuffle on the key + an
in-partition sort — exactly what a sort-merge join would pay, with no
quadratic blowup on dense keys, and it scales to 100 TB the same way
any keyed window does. (A broadcast-range variant only wins when the
right side is tiny; Catalyst can already do that via a range condition
+ broadcast hint.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str] | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Backward as-of join of ``right`` onto ``left``.

    Left rows with no prior right row keep nulls (left-outer
    semantics, matching DuckDB ``ASOF LEFT JOIN``).
    """
    value_cols = value_cols or [
        c for c in right.columns if c not in (on, right_ts)
    ]
    lhs = left.select(
        F.col(on),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__is_left"),
        *[F.col(c) for c in left.columns if c not in (on,)],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in value_cols],
    )
    rhs = right.select(
        F.col(on),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_left"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns if c not in (on,)],
        *[F.col(c).alias(f"__r_{c}") for c in value_cols],
    )
    # Right rows sort before left rows at equal ts (__is_left asc), so a
    # right row AT the left timestamp is visible — `<=` semantics.
    w = (
        Window.partitionBy(on)
        .orderBy(F.col("__ts").asc(), F.col("__is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = lhs.unionByName(rhs).select(
        "*",
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"{c}{suffix}")
            for c in value_cols
        ],
    )
    keep = [on] + [c for c in left.columns if c != on] + [f"{c}{suffix}" for c in value_cols]
    return carried.filter(F.col("__is_left") == 1).select(*keep)
