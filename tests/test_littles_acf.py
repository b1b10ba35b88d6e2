"""Round-3 batch 28: Little's law identity and daily autocorrelation."""

from __future__ import annotations

import pytest

from data_engineering_project_spark.plans import workload


def test_littles_law_identity_holds(spark, sf_dir):
    r = workload.QUERIES["littles_law_check"](spark, sf_dir).collect()[0]
    assert r["n_sessions"] > 0 and r["horizon_secs"] > 0
    # L == lambda * W by construction (both sides are the same exact
    # ratio before independent rounding)
    assert r["time_avg_concurrency_l"] == pytest.approx(
        r["lambda_rate"] * r["avg_duration_w"], rel=1e-2
    )


def test_autocorrelation_bounded(spark, sf_dir):
    r = workload.QUERIES["daily_count_autocorrelation"](spark, sf_dir).collect()[0]
    assert r["n_days"] > 14
    for k in ("acf_lag1", "acf_lag7"):
        if r[k] is not None:
            assert -1.0 <= r[k] <= 1.0


def test_markov_stationary_is_a_probability_vector(spark, sf_dir):
    rows = workload.QUERIES["event_markov_stationary"](spark, sf_dir).collect()
    assert len(rows) == 5
    total = sum(r["stationary_prob"] for r in rows)
    assert total == pytest.approx(1.0, abs=0.01)
    assert all(r["stationary_prob"] >= 0 for r in rows)


def test_anova_f_nonnegative_and_df_consistent(spark, sf_dir):
    r = workload.QUERIES["value_anova_f"](spark, sf_dir).collect()[0]
    assert r["n_groups"] == 5
    assert r["n_events"] > r["n_groups"]
    assert r["f_statistic"] >= 0.0
