"""Round-3 batch 19: A/B z-test, trigram paths, Neyman allocation."""

from __future__ import annotations

import datetime as dt

import pytest

from data_engineering_project_spark.plans import workload


def test_ab_null_split_is_insignificant_on_testdata(spark, sf_dir):
    r = workload.QUERIES["ab_test_zscore"](spark, sf_dir).collect()[0]
    assert r["na"] + r["nb"] == workload.load(spark, sf_dir, "events").count()
    # hash split of an untreated population: usually |z| < 4 (a very
    # loose band; the exact z is oracle-checked separately)
    assert abs(r["zscore"]) < 4.0
    assert 0 <= r["rate_a"] <= 1 and 0 <= r["rate_b"] <= 1


def test_trigrams_count_planted_sequence(spark, tmp_path):
    t0 = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for u in (1, 2):
        for i, et in enumerate(["view", "click", "purchase", "view"]):
            eid += 1
            rows.append(
                (eid, t0 + dt.timedelta(minutes=i), u, et, 0.0, "{}")
            )
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    d = str(tmp_path / "tri")
    df.coalesce(1).write.parquet(d + "/events.parquet")
    out = {
        r["trigram"]: r["n"]
        for r in workload.QUERIES["event_trigrams_top"](spark, d).collect()
    }
    assert out == {"view>click>purchase": 2, "click>purchase>view": 2}


def test_neyman_allocation_spends_the_budget_on_variable_strata(spark, sf_dir):
    rows = workload.QUERIES["neyman_allocation_sample"](spark, sf_dir).collect()
    assert rows
    total_alloc = sum(r["allocated"] for r in rows)
    # rounding each share to integer keeps the total near the 100 budget
    assert 95 <= total_alloc <= 105
    for r in rows:
        assert r["sampled"] == min(r["allocated"], r["stratum_size"])
        assert r["sampled"] > 0
