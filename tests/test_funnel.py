"""Funnel ordering semantics and cohort retention invariants."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from data_engineering_project_spark.operators import funnel


def _ev(spark, rows):
    return spark.createDataFrame(
        [(u, datetime(2024, 1, d, h), t) for u, d, h, t in rows],
        "user_id long, ts timestamp, event_type string",
    )


def _steps():
    return [
        ("view", F.col("event_type") == "view"),
        ("click", F.col("event_type") == "click"),
        ("purchase", F.col("event_type") == "purchase"),
    ]


def test_funnel_requires_strict_order(spark):
    ev = _ev(
        spark,
        [
            # u1 completes in order
            (1, 1, 9, "view"), (1, 1, 10, "click"), (1, 2, 9, "purchase"),
            # u2 clicked BEFORE viewing — click must not count
            (2, 1, 10, "click"), (2, 2, 9, "view"),
            # u3 only views
            (3, 1, 9, "view"),
            # u4 purchase without click — stops at stage 1
            (4, 1, 9, "view"), (4, 1, 10, "purchase"),
        ],
    )
    got = {r.step: r.n_users for r in funnel.funnel_counts(ev, _steps()).collect()}
    assert got == {"view": 4, "click": 1, "purchase": 1}


def test_funnel_same_timestamp_does_not_advance(spark):
    ev = _ev(spark, [(1, 1, 9, "view"), (1, 1, 9, "click")])
    got = {r.step: r.n_users for r in funnel.funnel_counts(ev, _steps()).collect()}
    assert got["click"] == 0  # strictly-after semantics


def test_funnel_counts_monotone_on_corpus(spark, sf_dir):
    from data_engineering_project_spark.sources.parquet import read_testdata

    ev = read_testdata(spark, sf_dir, "events")
    rows = sorted(funnel.funnel_counts(ev, _steps()).collect(), key=lambda r: r.stage)
    ns = [r.n_users for r in rows]
    assert ns == sorted(ns, reverse=True), f"funnel widened: {ns}"


def test_cohort_retention_offsets(spark):
    ev = _ev(
        spark,
        [
            (1, 1, 9, "view"),              # cohort Jan, active Jan
            (2, 1, 9, "view"), (2, 31, 9, "view"),  # Jan only (both days in Jan)
        ],
    )
    # add a February activity for user 1
    feb = spark.createDataFrame(
        [(1, datetime(2024, 2, 5), "view")],
        "user_id long, ts timestamp, event_type string",
    )
    got = {
        (str(r.cohort_month), r.month_offset): r.n_users
        for r in funnel.cohort_retention(ev.unionByName(feb)).collect()
    }
    assert got[("2024-01-01", 0)] == 2
    assert got[("2024-01-01", 1)] == 1
    assert ("2024-02-01", 0) not in got  # user 1 belongs to the Jan cohort


def test_empty_steps_raise(spark):
    with pytest.raises(ValueError):
        funnel.funnel_stages(_ev(spark, [(1, 1, 9, "view")]), [])
