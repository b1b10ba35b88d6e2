"""Round-3 batch 4: idempotent dedup, Wilson CIs, PMI, trend slopes,
session-length histogram."""

from __future__ import annotations

import datetime as dt
import math

import pytest
from pyspark.sql import functions as F

from data_engineering_project_spark.plans import workload


def _write_events(spark, tmp_path, rows, name):
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    d = str(tmp_path / name)
    df.coalesce(1).write.parquet(d + "/events.parquet")
    return d


def test_idempotent_dedup_drops_same_minute_retries(spark, tmp_path):
    t0 = dt.datetime(2024, 1, 1, 10, 0, 0)
    rows = [
        (1, t0, 1, "click", 0.0, "{}"),
        (2, t0 + dt.timedelta(seconds=30), 1, "click", 0.0, "{}"),  # retry
        (3, t0 + dt.timedelta(minutes=2), 1, "click", 0.0, "{}"),   # new key
        (4, t0, 2, "view", 0.0, "{}"),
    ]
    d = _write_events(spark, tmp_path, rows, "idem")
    out = {
        r["event_type"]: (r["n_kept"], r["n_dropped"])
        for r in workload.QUERIES["events_dedup_idempotent"](spark, d).collect()
    }
    assert out == {"click": (2, 1), "view": (1, 0)}


def test_wilson_interval_brackets_rate_and_stays_in_unit(spark, sf_dir):
    rows = workload.QUERIES["purchase_rate_wilson"](spark, sf_dir).collect()
    assert len(rows) == 24
    for r in rows:
        assert 0.0 <= r["wilson_lo"] <= r["rate"] <= r["wilson_hi"] <= 1.0
        # spot-check the closed form against python floats
        p, n, z = r["k"] / r["n"], r["n"], 1.96
        lo = (p + z * z / (2 * n) - z * math.sqrt(p * (1 - p) / n + z * z / (4 * n * n))) / (
            1 + z * z / n
        )
        assert r["wilson_lo"] == pytest.approx(round(lo, 4), abs=1e-9)


def test_pmi_is_symmetric_function_of_counts(spark, sf_dir):
    rows = workload.QUERIES["token_pmi_top"](spark, sf_dir).collect()
    assert len(rows) == 25
    assert all(r["n_ab"] >= 20 for r in rows)
    pmis = [r["pmi"] for r in rows]
    assert pmis == sorted(pmis, reverse=True)


def test_nation_trend_covers_all_nations_with_sane_r2(spark, sf_dir):
    rows = workload.QUERIES["nation_trend_slope"](spark, sf_dir).collect()
    assert len(rows) == 25
    for r in rows:
        assert r["n_months"] > 12
        assert 0.0 <= r["r2"] <= 1.0


def test_session_histogram_buckets_are_log2(spark, tmp_path):
    t0 = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    # user 1: one session of 1 event; user 2: one session of 5 events
    eid += 1
    rows.append((eid, t0, 1, "view", 0.0, "{}"))
    for i in range(5):
        eid += 1
        rows.append((eid, t0 + dt.timedelta(minutes=i), 2, "view", 0.0, "{}"))
    d = _write_events(spark, tmp_path, rows, "hist")
    out = {
        r["bucket"]: r["n_sessions"]
        for r in workload.QUERIES["session_length_histogram"](spark, d).collect()
    }
    # 1 event -> bin length 1; 5 events -> bin '101' length 3
    assert out == {1: 1, 3: 1}
