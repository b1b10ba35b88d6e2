"""Round-3 batch 6: ratio-to-report shares, conversion latency,
HHI concentration, acquisition curve."""

from __future__ import annotations

from collections import defaultdict

import pytest

from data_engineering_project_spark.plans import workload


def test_brand_shares_sum_to_one_within_each_type(spark, sf_dir):
    rows = workload.QUERIES["brand_share_within_type"](spark, sf_dir).collect()
    by_type = defaultdict(float)
    for r in rows:
        assert 0.0 <= r["share_in_type"] <= 1.0
        by_type[r["part_type"]] += r["share_in_type"]
    assert by_type
    for t, s in by_type.items():
        # 4-dp rounding perturbs each addend by <= 5e-5
        assert s == pytest.approx(1.0, abs=5e-3), t


def test_time_to_conversion_percentiles_are_ordered(spark, sf_dir):
    r = workload.QUERIES["time_to_conversion"](spark, sf_dir).collect()[0]
    assert r["n_converted"] > 0
    assert 0 <= r["p50_secs"] <= r["p90_secs"] <= r["max_secs"]


def test_hhi_bounds(spark, sf_dir):
    rows = workload.QUERIES["supplier_hhi"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        # n equal shares give 10000/n; monopoly gives 10000
        assert 10000.0 / r["n_suppliers"] - 1e-6 <= r["hhi"] <= 10000.0 + 1e-6


def test_acquisition_curve_is_cumulative_and_total(spark, sf_dir):
    rows = workload.QUERIES["user_acquisition_curve"](spark, sf_dir).collect()
    assert rows
    running = 0
    for r in rows:
        running += r["new_users"]
        assert r["cumulative_users"] == running
    n_users = (
        workload.load(spark, sf_dir, "events").select("user_id").distinct().count()
    )
    assert rows[-1]["cumulative_users"] == n_users
