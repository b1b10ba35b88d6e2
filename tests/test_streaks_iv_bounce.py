"""Round-3 batch 9: gaps-and-islands streaks, Spearman, information
value, bounce rates."""

from __future__ import annotations

import datetime as dt

import pytest

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


def test_streaks_split_on_gap_days(spark, tmp_path):
    rows = []
    eid = 0
    # user 1: days 1,2,3 then 5,6 -> longest 3, active 5
    for day in (1, 2, 3, 5, 6):
        eid += 1
        rows.append((eid, dt.datetime(2024, 1, day, 12), 1, "view", 0.0, "{}"))
    # user 2: single day, two events -> longest 1, active 1
    for _ in range(2):
        eid += 1
        rows.append((eid, dt.datetime(2024, 1, 10, 9), 2, "view", 0.0, "{}"))
    d = _write_events(spark, tmp_path, rows, "streaks")
    out = {
        r["user_id"]: (r["longest_streak"], r["n_active_days"])
        for r in workload.QUERIES["user_activity_streaks"](spark, d).collect()
    }
    assert out == {1: (3, 5), 2: (1, 1)}


def test_spearman_is_one_for_identical_rankings(spark, tmp_path):
    d = str(tmp_path / "docs_rho")
    rows = [
        (i, " ".join(f"w{j}" for j in range(i + 2)), "en", "s", 1)
        for i in range(20)
    ]  # all tokens distinct -> s1 == s2 -> identical ranks
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(d + "/documents.parquet")
    r = workload.QUERIES["ranking_rank_correlation"](spark, d).collect()[0]
    assert r["spearman"] == pytest.approx(1.0, abs=1e-9)
    assert r["n_docs"] == 20


def test_information_value_zero_when_value_uninformative(spark, tmp_path):
    rows = []
    eid = 0
    # purchases and views identically distributed over two buckets
    for v in (10.0, 110.0):
        for et in ("purchase", "view"):
            for _ in range(50):
                eid += 1
                rows.append((eid, dt.datetime(2024, 1, 2), 1, et, v, "{}"))
    d = _write_events(spark, tmp_path, rows, "iv0")
    r = workload.QUERIES["value_information_value"](spark, d).collect()[0]
    assert abs(r["information_value"]) < 0.01


def test_bounce_rate_counts_single_event_sessions(spark, tmp_path):
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        # user 1: 2-event session entered via view
        (1, t0, 1, "view", 0.0, "{}"),
        (2, t0 + dt.timedelta(minutes=1), 1, "click", 0.0, "{}"),
        # user 1: bounce session (view), >1h later
        (3, t0 + dt.timedelta(hours=3), 1, "view", 0.0, "{}"),
        # user 2: bounce entered via signup
        (4, t0, 2, "signup", 0.0, "{}"),
    ]
    d = _write_events(spark, tmp_path, rows, "bounce")
    out = {
        r["entry_type"]: (r["n_sessions"], r["n_bounces"], r["bounce_rate"])
        for r in workload.QUERIES["bounce_rate_by_entry"](spark, d).collect()
    }
    assert out == {"view": (2, 1, 0.5), "signup": (1, 1, 1.0)}


def test_position_weighted_credits_sum_to_conversions(spark, sf_dir):
    rows = workload.QUERIES["position_weighted_attribution"](spark, sf_dir).collect()
    total_credit = sum(r["attributed_conversions"] for r in rows)
    # credits per converting user (with >=1 prior touch) sum to 1
    ev = workload.load(spark, sf_dir, "events")
    from pyspark.sql import functions as F
    fp = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("ts").alias("fp"))
    )
    n_attributed_users = (
        ev.join(fp, "user_id").filter(F.col("ts") < F.col("fp"))
        .select("user_id").distinct().count()
    )
    import pytest as _pt
    assert total_credit == _pt.approx(n_attributed_users, abs=0.05)
