"""Round-4 batch: Kaplan-Meier, Cohen's kappa, calibration ECE,
Mann-Whitney U."""

from __future__ import annotations

from data_engineering_project_spark.plans import workload


def test_km_survival_is_monotone_nonincreasing_in_unit_interval(spark, sf_dir):
    rows = workload.QUERIES["kaplan_meier_repurchase"](
        spark, sf_dir
    ).collect()
    assert len(rows) > 0
    s_prev = 1.0
    for r in rows:  # already ordered by t_days
        assert 0.0 <= r["survival"] <= 1.0
        assert r["survival"] <= s_prev + 1e-9
        assert 0 < r["d_events"] <= r["n_risk"]
        s_prev = r["survival"]


def test_km_risk_sets_shrink(spark, sf_dir):
    rows = workload.QUERIES["kaplan_meier_repurchase"](
        spark, sf_dir
    ).collect()
    risks = [r["n_risk"] for r in rows]
    assert risks == sorted(risks, reverse=True)


def test_kappa_bounded_and_cells_partition(spark, sf_dir):
    r = workload.QUERIES["rater_agreement_kappa"](spark, sf_dir).collect()[0]
    assert (
        r["n_both_pos"] + r["n_both_neg"] + r["n_only_a"] + r["n_only_b"]
        == r["n_docs"]
    )
    assert -1.0 <= r["kappa"] <= 1.0
    assert 0.0 <= r["rate_agree"] <= 1.0


def test_ece_bounded_by_worst_bin_gap(spark, sf_dir):
    rows = workload.QUERIES["score_calibration_ece"](spark, sf_dir).collect()
    assert 1 <= len(rows) <= 10
    worst = max(abs(r["confidence"] - r["emp_rate"]) for r in rows)
    ece = rows[0]["ece"]
    assert all(r["ece"] == ece for r in rows)  # one global value
    assert 0.0 <= ece <= worst + 1e-9


def test_mannwhitney_u_in_range(spark, sf_dir):
    r = workload.QUERIES["mannwhitney_priority_value"](
        spark, sf_dir
    ).collect()[0]
    # 0 <= U1 <= n1*n2 always
    assert 0 <= r["two_u1"] <= 2 * r["n1"] * r["n2"]
    # doubled rank-sum bounds: n1(n1+1) <= 2R1 <= n1(n1+2n2+1)
    assert r["n1"] * (r["n1"] + 1) <= r["two_r1"]
    assert r["two_r1"] <= r["n1"] * (r["n1"] + 2 * r["n2"] + 1)
