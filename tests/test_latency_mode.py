"""Round-3 batch 15: latency trend and grouped mode."""

from __future__ import annotations

from data_engineering_project_spark.plans import workload


def test_ship_latency_percentiles_ordered_per_year(spark, sf_dir):
    rows = workload.QUERIES["ship_latency_by_year"](spark, sf_dir).collect()
    assert rows
    years = [r["year"] for r in rows]
    assert years == sorted(years)
    for r in rows:
        # synthetic ship dates are not constrained to follow the order
        # date, so medians can be negative; only the ordering invariant
        # holds
        assert r["median_days"] <= r["p90_days"]
        assert r["n_items"] > 0


def test_modal_flag_share_is_plurality(spark, sf_dir):
    rows = workload.QUERIES["return_flag_mix"](spark, sf_dir).collect()
    assert len(rows) == 5
    for r in rows:
        # the modal class of >= 2 classes has share in (1/k, 1]
        assert 0.2 < r["share"] <= 1.0
        assert r["modal_flag"] in {"A", "N", "R", "F", "O", "P"}
