"""Robust statistics: median / MAD outlier flagging with an exact and
a sketch-backed production path.

Beyond-reference capability (the reference's DQ layer stops at null /
duplicate counts): median-absolute-deviation outlier detection is the
robust-statistics workhorse that survives the heavy tails that wreck
z-scores. The shape is two scalar aggregates (median, then MAD around
it) collected as control-plane one-row jobs, then a map-only flagging
predicate — no shuffle of the data on the flagging pass.

Two percentile backends:

- ``exact=True`` — Spark's ``percentile`` (exact interpolated rank).
  Sorts each aggregation group's values; at 100 TB the two full sorts
  ARE the query cost. This is the path the DuckDB oracle can replay
  bit-for-bit, so the driver-checked workload entry uses it.
- ``exact=False`` — ``approx_percentile`` (KLL-style sketch,
  ``accuracy`` = 1/eps): constant-memory, map-side-mergeable, rank
  error <= n/accuracy, one pass per scalar. The production default at
  lake scale; estimates are engine-specific so this path is covered by
  pytest (flag agreement vs the exact path) rather than a value oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# consistency constant: MAD * 1.4826 estimates sigma under normality
MAD_SIGMA = 1.4826


def median_mad(
    df: DataFrame,
    value_col: str,
    exact: bool = True,
    accuracy: int = 10000,
) -> tuple[float, float]:
    """→ (median, mad) of ``value_col`` as driver scalars — two one-row
    control-plane jobs (the MAD must re-aggregate |x - median| and so
    cannot fuse with the median's own pass)."""
    if exact:
        med_expr = f"percentile({value_col}, 0.5)"
    else:
        med_expr = f"approx_percentile({value_col}, 0.5, {accuracy})"
    med = df.agg(F.expr(med_expr).alias("m")).collect()[0]["m"]
    dev = f"abs({value_col} - {med!r})"
    if exact:
        mad_expr = f"percentile({dev}, 0.5)"
    else:
        mad_expr = f"approx_percentile({dev}, 0.5, {accuracy})"
    mad = df.agg(F.expr(mad_expr).alias("m")).collect()[0]["m"]
    return float(med), float(mad)


def mad_outlier_flags(
    df: DataFrame,
    value_col: str,
    k: float = 3.0,
    exact: bool = True,
    accuracy: int = 10000,
) -> DataFrame:
    """``df`` plus an ``is_out`` int column: 1 where
    ``|x - median| > k * 1.4826 * MAD``. The flagging pass is map-only
    (median/MAD are inlined literals), so this composes with any
    downstream aggregate without an extra shuffle."""
    med, mad = median_mad(df, value_col, exact=exact, accuracy=accuracy)
    cut = F.lit(k) * F.lit(MAD_SIGMA) * F.lit(mad)
    return df.withColumn(
        "is_out",
        (F.abs(F.col(value_col) - F.lit(med)) > cut).cast("int"),
    )
