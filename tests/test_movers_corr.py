"""Round-3 batch 16: rank movers and weekly correlation."""

from __future__ import annotations

from data_engineering_project_spark.plans import workload


def test_rank_movers_sorted_by_abs_delta(spark, sf_dir):
    rows = workload.QUERIES["part_rank_movers"](spark, sf_dir).collect()
    assert rows
    deltas = [abs(r["rank_gain"]) for r in rows]
    assert deltas == sorted(deltas, reverse=True)
    for r in rows:
        assert r["rank_gain"] == r["rank_1996"] - r["rank_1997"]
        assert r["rank_1996"] >= 1 and r["rank_1997"] >= 1


def test_weekly_corr_in_valid_range_and_positive(spark, sf_dir):
    r = workload.QUERIES["weekly_rev_count_corr"](spark, sf_dir).collect()[0]
    assert r["n_weeks"] > 50
    assert -1.0 <= r["corr_orders_revenue"] <= 1.0
    # more orders in a week mechanically produces more revenue
    assert r["corr_orders_revenue"] > 0.5
