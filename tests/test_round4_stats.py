"""Round-4 batch: invariant tests for the statistical/graph additions.

Cross-engine value equality is covered by test_oracle_parity; these
tests pin the MATHEMATICAL invariants each query's semantics promise,
so a future edit that stays hash-consistent between engines but breaks
the statistic itself still fails loudly.
"""

from __future__ import annotations

import math

from data_engineering_project_spark.plans import workload


def test_benford_shares_partition_the_orders(spark, sf_dir):
    rows = workload.QUERIES["benford_price_digits"](spark, sf_dir).collect()
    digits = {r["digit"] for r in rows}
    assert digits <= set(range(1, 10))
    assert abs(sum(r["obs_share"] for r in rows) - 1.0) < 1e-3
    # Benford reference shares are a fixed distribution summing to 1
    assert abs(sum(r["benford_share"] for r in rows) - 1.0) < 2e-2


def test_ks_statistic_is_a_probability_gap(spark, sf_dir):
    (row,) = workload.QUERIES["ks_priority_value"](spark, sf_dir).collect()
    assert 0.0 <= row["d_stat"] <= 1.0
    assert row["d_num"] <= row["n1"] * row["n2"]
    assert row["z_stat"] >= 0.0


def test_kcore_peel_is_monotone(spark, sf_dir):
    rows = sorted(
        workload.QUERIES["copurchase_kcore"](spark, sf_dir).collect(),
        key=lambda r: r["round"],
    )
    assert [r["round"] for r in rows] == [1, 2, 3]
    for prev, cur in zip(rows, rows[1:]):
        assert cur["n_nodes"] <= prev["n_nodes"]
        assert cur["n_edges"] <= prev["n_edges"]


def test_bloom_prefilter_has_no_false_negatives(spark, sf_dir):
    (row,) = workload.QUERIES["bloom_prefilter_stats"](spark, sf_dir).collect()
    # every exact hit passes the filter by construction
    assert row["n_bloom_pass"] >= row["n_exact"]
    assert row["n_false_pos"] == row["n_bloom_pass"] - row["n_exact"]
    assert 0.0 <= row["fp_rate"] <= 1.0


def test_qq_deciles_are_monotone_within_each_group(spark, sf_dir):
    rows = sorted(
        workload.QUERIES["qq_priority_value"](spark, sf_dir).collect(),
        key=lambda r: r["decile"],
    )
    assert [r["decile"] for r in rows] == list(range(1, 10))
    for prev, cur in zip(rows, rows[1:]):
        assert cur["v_urgent"] >= prev["v_urgent"]
        assert cur["v_low"] >= prev["v_low"]


def test_weekday_decomposition_covers_the_week(spark, sf_dir):
    rows = workload.QUERIES["orders_weekday_decomposition"](
        spark, sf_dir
    ).collect()
    assert {r["weekday"] for r in rows} == set(range(1, 8))
    assert all(r["resid_var"] >= 0.0 for r in rows)


def test_geomean_never_exceeds_arithmetic_mean(spark, sf_dir):
    rows = workload.QUERIES["brand_geomean_price"](spark, sf_dir).collect()
    assert rows
    for r in rows:  # AM-GM inequality, strict for non-constant prices
        assert r["geomean_price"] <= r["mean_price"] + 0.01


def test_crosscorr_is_a_correlation(spark, sf_dir):
    rows = workload.QUERIES["events_count_value_crosscorr"](
        spark, sf_dir
    ).collect()
    assert {r["lag_days"] for r in rows} == {0, 1, 2, 3}
    for r in rows:
        assert r["n"] > 0
        assert -1.0 <= r["pearson_r"] <= 1.0


def test_cms_estimate_never_undercounts(spark, sf_dir):
    rows = workload.QUERIES["cms_token_counts"](spark, sf_dir).collect()
    assert len(rows) == 10
    for r in rows:  # one-sided CMS error guarantee
        assert r["cms_est"] >= r["exact_n"]
        assert r["overcount"] == r["cms_est"] - r["exact_n"]


def test_poisson_bootstrap_ci_brackets_the_point_estimate(spark, sf_dir):
    (row,) = workload.QUERIES["poisson_bootstrap_ci"](spark, sf_dir).collect()
    assert row["ci_lo"] <= row["ci_hi"]
    assert row["boot_sd"] > 0.0
    # 95% percentile CI of the mean should contain the full-sample mean
    # comfortably at any tested SF
    assert row["ci_lo"] <= row["point_est"] <= row["ci_hi"]


def test_lorenz_curve_is_convex_and_below_the_diagonal(spark, sf_dir):
    rows = sorted(
        workload.QUERIES["revenue_lorenz_deciles"](spark, sf_dir).collect(),
        key=lambda r: r["decile"],
    )
    assert [r["decile"] for r in rows] == list(range(1, 11))
    # deciles are ranked ascending, so shares must be non-decreasing,
    # the cumulative curve must sit on/below the equality diagonal,
    # and it must end at 1
    for prev, cur in zip(rows, rows[1:]):
        assert cur["rev_share"] >= prev["rev_share"] - 1e-9
    for r in rows[:-1]:
        assert r["cum_share"] <= r["decile"] / 10.0 + 1e-6
    assert abs(rows[-1]["cum_share"] - 1.0) < 1e-6


def test_jackknife_influences_oppose_group_weight(spark, sf_dir):
    rows = workload.QUERIES["nation_jackknife_influence"](
        spark, sf_dir
    ).collect()
    assert rows
    for r in rows:
        # dropping a below-average nation raises the mean and vice versa;
        # sign(influence) must oppose sign(nation mean - global mean)
        # whenever the nation is not exactly average
        assert r["loo_avg"] > 0
        assert abs(r["influence"] - round(r["loo_avg"] - r["global_avg"], 4)) < 1e-9


def test_updown_runs_are_consistent(spark, sf_dir):
    (row,) = workload.QUERIES["revenue_updown_runs"](spark, sf_dir).collect()
    assert row["longest_up"] >= 1
    assert row["longest_down"] >= 1
    assert row["n_runs"] >= 2


def test_granger_regression_r2_is_a_fraction(spark, sf_dir):
    (row,) = workload.QUERIES["granger_daily_events"](spark, sf_dir).collect()
    assert row["n_days"] > 2
    # OLS with an intercept cannot do worse than the mean model
    assert -1e-6 <= row["r2"] <= 1.0


def test_edit_distance_respects_length_bounds(spark, sf_dir):
    rows = workload.QUERIES["user_path_edit_distance"](
        spark, sf_dir
    ).collect()
    assert rows
    for r in rows:
        assert abs(r["len_a"] - r["len_b"]) <= r["edit_dist"]
        assert r["edit_dist"] <= max(r["len_a"], r["len_b"])
        assert r["user_a"] < r["user_b"]


def test_runs_test_counts_are_consistent(spark, sf_dir):
    (row,) = workload.QUERIES["runs_test_z"](spark, sf_dir).collect()
    # runs of a two-symbol sequence: between 1 and n1+n2, and the
    # above/below-median split is near-balanced by construction
    assert 1 <= row["r_runs"] <= row["n1"] + row["n2"]
    assert abs(row["n1"] - row["n2"]) <= 1


def test_conformal_coverage_lands_near_nominal(spark, sf_dir):
    (row,) = workload.QUERIES["conformal_price_interval"](
        spark, sf_dir
    ).collect()
    assert row["n_train"] > 0 and row["n_cal"] > 0 and row["n_test"] > 0
    assert row["q95_resid"] > 0
    # split-conformal guarantee: coverage ~ 95%, generous slack for
    # the small sf0.001 split
    assert 0.85 <= row["coverage"] <= 1.0


def test_kendall_tau_is_a_correlation(spark, sf_dir):
    (row,) = workload.QUERIES["kendall_tau_nation_metrics"](
        spark, sf_dir
    ).collect()
    assert row["n_pairs"] == 300  # C(25, 2) nation pairs
    assert row["concordant"] + row["discordant"] <= row["n_pairs"]
    assert -1.0 <= row["tau_b"] <= 1.0


def test_effect_size_sign_matches_mean_order(spark, sf_dir):
    (row,) = workload.QUERIES["effect_size_priority_value"](
        spark, sf_dir
    ).collect()
    assert (row["cohen_d"] > 0) == (row["mean_urgent"] > row["mean_low"]) or (
        row["cohen_d"] == 0
    )
    # Hedges correction shrinks toward zero
    assert abs(row["hedges_g"]) <= abs(row["cohen_d"]) + 1e-9


def test_sprt_reports_a_consistent_decision_row(spark, sf_dir):
    (row,) = workload.QUERIES["sprt_urgent_share"](spark, sf_dir).collect()
    assert row["decision"] in {"accept_h0", "accept_h1", "continue"}
    assert 0 <= row["k_urgent"] <= row["n_trials"]
    recomputed = row["k_urgent"] * 0.223144 + (
        row["n_trials"] - row["k_urgent"]
    ) * (-0.064539)
    assert math.isclose(recomputed, row["llr"], abs_tol=1e-4)
    if row["decision"] == "accept_h0":
        assert row["llr"] <= -2.944439
    elif row["decision"] == "accept_h1":
        assert row["llr"] >= 2.944439
