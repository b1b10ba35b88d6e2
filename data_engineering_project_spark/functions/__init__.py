"""Scalar expression helpers — the reference's SQL function surface.

Each helper mirrors a function used by the reference (SURVEY.md §2.7) with
DuckDB-equivalent semantics, expressed as Catalyst expressions (JVM-side,
codegen-friendly — never Python UDFs):

- F6  ``date_diff('day', a, b)``   → :func:`delivery_days` (day-boundary
      crossings, reference etl/tasks/gold.py:61)
- F5/F8 ``DAYNAME`` / ``strftime('%A')`` → :func:`day_name`
- F7  ``strftime(ts,'%Y-%m')``     → :func:`month_period`
- F9  ``year || '-' || LPAD(month,2,'0')`` → :func:`period_key`
- F14 ``fillna('').astype(str)``   → :func:`canon_str`
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def delivery_days(start_ts: Column | str, end_ts: Column | str) -> Column:
    """Day-boundary-crossing diff between two timestamps.

    DuckDB's ``date_diff('day', a, b)`` (reference etl/tasks/gold.py:61)
    counts midnight crossings, NOT 24h intervals — so it must be computed
    on DATEs. Spark's ``datediff`` on dates has exactly those semantics.
    """
    return F.datediff(F.to_date(end_ts), F.to_date(start_ts))


def day_name(col: Column | str) -> Column:
    """Full English weekday name ('Monday'...). DuckDB ``dayname`` /
    ``strftime('%A')`` equivalent (reference etl/tasks/gold.py:45,
    dashboard/queries.py:140)."""
    return F.date_format(col, "EEEE")


def month_period(col: Column | str) -> Column:
    """'YYYY-MM' period label. DuckDB ``strftime(ts,'%Y-%m')``
    (reference dashboard/queries.py:125)."""
    return F.date_format(col, "yyyy-MM")


def period_key(year_col: Column | str, month_col: Column | str) -> Column:
    """``year || '-' || lpad(month, 2, '0')`` (reference test_gold.py:29)."""
    y = F.col(year_col) if isinstance(year_col, str) else year_col
    m = F.col(month_col) if isinstance(month_col, str) else month_col
    return F.concat(y.cast("string"), F.lit("-"), F.lpad(m.cast("string"), 2, "0"))


def canon_str(col: Column | str) -> Column:
    """Null-safe string canonicalization: ``coalesce(cast(x as string),'')``
    (reference scripts/esplosione_dati.py:61,92 fingerprint prep)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(c.cast("string"), F.lit(""))


def weekday_index(day_name_col: Column | str) -> Column:
    """Monday=1 … Sunday=7 ordering column for weekday sorts — the
    reference's ORDER BY CASE ladder (dashboard/queries.py:146-154)."""
    c = F.col(day_name_col) if isinstance(day_name_col, str) else day_name_col
    return (
        F.when(c == "Monday", 1)
        .when(c == "Tuesday", 2)
        .when(c == "Wednesday", 3)
        .when(c == "Thursday", 4)
        .when(c == "Friday", 5)
        .when(c == "Saturday", 6)
        .when(c == "Sunday", 7)
    )


def money(col: Column | str, scale: int = 2) -> Column:
    """Round a monetary double for stable cross-engine comparison.

    Double SUM order differs between Spark partial aggregation and the
    DuckDB oracle; the reference itself only ever displays 2-decimal
    currency (dashboard/app_fase1.py:148-152), so comparisons are pinned
    at that precision.
    """
    return F.round(col, scale)


def money_sum(col: Column | str) -> Column:
    """Order-independent monetary SUM: accumulate in DECIMAL(38,6).

    A double SUM's value depends on partial-aggregation order; when the
    group total is large (≥~1e7) the drift can straddle a half-cent and
    flip ``round(2)`` between engines (observed at sf0.01). Rounding
    each term to 6dp (identical half-up on both engines), summing
    exactly in decimal, rounding to cents, and casting back to double
    is bit-stable at any magnitude and any partitioning. SQL twin:
    ``CAST(ROUND(SUM(CAST(x AS DECIMAL(38,6))), 2) AS DOUBLE)``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.round(F.sum(c.cast("decimal(38,6)")), 2).cast("double")
