"""Round-3 batch 21: HLL intersection estimates and windowed funnel."""

from __future__ import annotations

import datetime as dt

from data_engineering_project_spark.plans import workload


def test_overlap_sketch_within_bound_and_set_algebra_holds(spark, sf_dir):
    rows = workload.QUERIES["event_type_overlap_sketch"](spark, sf_dir).collect()
    assert len(rows) == 10  # C(5,2) event-type pairs
    for r in rows:
        assert 0 <= r["n_both"] <= min(r["n_a"], r["n_b"])
        assert r["estimate_within_bound"] == 1


def test_funnel_window_counts_planted_conversions(spark, tmp_path):
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        # user 1: converts in 2 days -> ever + 7d
        (1, t0, 1, "signup", 0.0, "{}"),
        (2, t0 + dt.timedelta(days=2), 1, "purchase", 1.0, "{}"),
        # user 2: converts in 20 days -> ever only
        (3, t0, 2, "signup", 0.0, "{}"),
        (4, t0 + dt.timedelta(days=20), 2, "purchase", 1.0, "{}"),
        # user 3: signup, never buys
        (5, t0, 3, "signup", 0.0, "{}"),
        # user 4: purchase BEFORE signup -> not a conversion
        (6, t0, 4, "purchase", 1.0, "{}"),
        (7, t0 + dt.timedelta(days=1), 4, "signup", 0.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    d = str(tmp_path / "fw")
    df.coalesce(1).write.parquet(d + "/events.parquet")
    r = workload.QUERIES["funnel_within_window"](spark, d).collect()[0]
    assert r["n_signups"] == 4
    assert r["n_converted_ever"] == 2
    assert r["n_converted_7d"] == 1
    assert r["cvr_7d"] == 0.25
