"""Sessionization of an event stream (batch formulation).

Beyond-reference capability: gap-based sessions via the classic
lag → new-session flag → running sum pattern. One shuffle
(partitionBy user); the running sum stays within each user partition.
The streaming formulation lives in ``streaming/events.py``
(applyInPandasWithState / session_window).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def with_session_ids(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_tiebreak: str = "event_id",
    gap_seconds: int = 3600,
) -> DataFrame:
    """Assign ``session_id`` (1-based per user) via gap threshold.

    Gap semantics: a new session starts when the second-boundary
    difference from the previous event exceeds ``gap_seconds`` (floor
    semantics, matching SQL ``date_diff('second', ...)``).

    TIMESTAMP_NTZ inputs: the epoch hop below interprets the wall
    clock in the session time zone, so NTZ callers must run with a
    fixed-offset ``spark.sql.session.timeZone`` (the engine pins UTC —
    session.py). A DST-observing zone would skew gaps that span a
    transition.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, order_tiebreak)
    prev_ts = F.lag(ts_col).over(w)
    # TIMESTAMP_NTZ has no direct long cast; hop through TIMESTAMP
    # (no-op for LTZ, session-UTC epoch for NTZ — callers pin UTC).
    as_epoch = lambda c: c.cast("timestamp").cast("long")  # noqa: E731
    new_session = F.when(
        prev_ts.isNull()
        | ((as_epoch(F.col(ts_col)) - as_epoch(prev_ts)) > gap_seconds),
        1,
    ).otherwise(0)
    return events.withColumn("is_new_session", new_session).withColumn(
        "session_id", F.sum("is_new_session").over(w)
    )


def session_counts(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_tiebreak: str = "event_id",
    gap_seconds: int = 3600,
) -> DataFrame:
    """(user_id, n_sessions, n_events) per user."""
    tagged = with_session_ids(events, user_col, ts_col, order_tiebreak, gap_seconds)
    return tagged.groupBy(user_col).agg(
        F.sum("is_new_session").alias("n_sessions"),
        F.count("*").alias("n_events"),
    )
