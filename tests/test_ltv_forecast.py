"""Round-3 batch 13: cohort LTV, new-vs-returning, forecast baseline."""

from __future__ import annotations

from collections import defaultdict

import pytest

from data_engineering_project_spark.plans import workload


def test_ltv_curves_are_cumulative_per_cohort(spark, sf_dir):
    rows = workload.QUERIES["cohort_ltv_curve"](spark, sf_dir).collect()
    assert rows
    by_cohort = defaultdict(list)
    for r in rows:
        by_cohort[r["cohort_m"]].append((r["month_idx"], r["cumulative_revenue"]))
    assert len(by_cohort) <= 6
    for cohort, pts in by_cohort.items():
        idxs = [i for i, _ in pts]
        vals = [v for _, v in pts]
        assert idxs == sorted(idxs)
        assert all(0 <= i <= 11 for i in idxs)
        assert vals == sorted(vals), cohort  # cumulative never decreases


def test_new_vs_returning_splits_month_revenue(spark, sf_dir):
    rows = workload.QUERIES["new_vs_returning_revenue"](spark, sf_dir).collect()
    assert {r["segment"] for r in rows} == {"new", "returning"}
    orders = workload.load(spark, sf_dir, "orders")
    assert sum(r["n_orders"] for r in rows) == orders.count()
    # the earliest month can contain only 'new' orders
    first_ym = min(r["ym"] for r in rows)
    segs = {r["segment"] for r in rows if r["ym"] == first_ym}
    assert "new" in segs


def test_forecast_baseline_scores_are_positive_and_finite(spark, sf_dir):
    r = workload.QUERIES["forecast_baseline_mae"](spark, sf_dir).collect()[0]
    assert r["n_months"] > 12
    assert r["mae"] > 0
    assert 0 < r["mape"] < 100


def test_theil_sen_pairs_count_matches_rollup(spark, sf_dir):
    from pyspark.sql import functions as F

    r = workload.QUERIES["theil_sen_revenue_trend"](spark, sf_dir).collect()[0]
    months = (
        workload.load(spark, sf_dir, "orders")
        .select(
            ((F.year("o_orderdate") - 1990) * 12 + F.month("o_orderdate")).alias("x")
        )
        .distinct()
        .count()
    )
    assert r["n_pairs"] == months * (months - 1) // 2
    assert r["theil_sen_slope"] is not None


def test_five_number_summary_is_ordered(spark, sf_dir):
    rows = workload.QUERIES["value_five_number_summary"](spark, sf_dir).collect()
    assert len(rows) == 5
    for r in rows:
        assert r["v_min"] <= r["q1"] <= r["median"] <= r["q3"] <= r["v_max"]
