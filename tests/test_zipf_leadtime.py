"""Round-3 batch 23: Zipf fit and supplier lead-time consistency."""

from __future__ import annotations

import pytest

from data_engineering_project_spark.plans import workload


def test_zipf_exponent_shallow_for_near_uniform_corpus(spark, sf_dir):
    r = workload.QUERIES["zipf_fit"](spark, sf_dir).collect()[0]
    assert r["vocab_size"] > 10
    # synthetic word soup is near-uniform: far from natural text's -1
    assert -0.6 < r["zipf_exponent"] <= 0.0
    assert 0.0 <= r["fit_r2"] <= 1.0


def test_zipf_detects_planted_power_law(spark, tmp_path):
    # frequencies ~ 1/rank for 20 tokens: exponent ~ -1
    words = []
    for rank in range(1, 21):
        words += [f"w{rank}"] * max(1, int(1000 / rank))
    d = str(tmp_path / "zipf")
    spark.createDataFrame(
        [(1, " ".join(words), "en", "s", len(words))],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.parquet(d + "/documents.parquet")
    r = workload.QUERIES["zipf_fit"](spark, d).collect()[0]
    assert r["zipf_exponent"] == pytest.approx(-1.0, abs=0.05)
    assert r["fit_r2"] > 0.99


def test_lead_time_consistency_sorted_and_thresholded(spark, sf_dir):
    rows = workload.QUERIES["supplier_lead_time_consistency"](spark, sf_dir).collect()
    assert rows
    sds = [r["sd_lead_days"] for r in rows]
    assert sds == sorted(sds)
    assert all(r["n_items"] >= 50 for r in rows)
