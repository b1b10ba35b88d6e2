"""Round-3 batch 10: TWAP, embedding fold drift, curriculum tiers."""

from __future__ import annotations

import datetime as dt

import pytest

from data_engineering_project_spark.plans import workload


def test_twap_weights_by_holding_time(spark, tmp_path):
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        # user 1: value 10 held 100s, value 90 held 300s, final dropped
        (1, t0, 1, "view", 10.0, "{}"),
        (2, t0 + dt.timedelta(seconds=100), 1, "view", 90.0, "{}"),
        (3, t0 + dt.timedelta(seconds=400), 1, "view", 55.0, "{}"),
        # user 2: single event -> no holding period -> excluded
        (4, t0, 2, "view", 7.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    d = str(tmp_path / "twap")
    df.coalesce(1).write.parquet(d + "/events.parquet")
    out = {
        r["user_id"]: (r["total_secs"], r["twap"])
        for r in workload.QUERIES["user_value_twap"](spark, d).collect()
    }
    expect = round((10.0 * 100 + 90.0 * 300) / 400, 4)
    assert out == {1: (400, expect)}


def test_fold_drift_zero_for_mirrored_folds_positive_for_shifted(spark, tmp_path):
    rows = []
    # label 0: identical vectors in both folds -> drift 0
    for i in range(8):
        rows.append((i, [1.0, 2.0, 3.0, 4.0], 0))
    # label 1: even ids at origin-ish, odd ids shifted by +1 in dim 0
    for i in range(8):
        base = [0.0, 0.0, 0.0, 0.0]
        if i % 2 == 1:
            base[0] = 1.0
        rows.append((100 + i, base, 1))
    d = str(tmp_path / "drift")
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.parquet(d + "/embeddings.parquet")
    out = {
        r["label"]: r
        for r in workload.QUERIES["embedding_fold_drift"](spark, d).collect()
    }
    assert out[0]["centroid_l2_drift"] == pytest.approx(0.0, abs=1e-9)
    assert out[1]["centroid_l2_drift"] == pytest.approx(1.0, abs=1e-9)
    assert out[0]["n_fold0"] + out[0]["n_fold1"] == 8


def test_curriculum_tiers_partition_corpus_and_order_by_quality(spark, sf_dir):
    rows = workload.QUERIES["curriculum_token_budget"](spark, sf_dir).collect()
    docs = workload.load(spark, sf_dir, "documents")
    assert sum(r["n_docs"] for r in rows) == docs.count()
    tiers = [r["tier"] for r in rows]
    assert tiers == sorted(tiers)
    rich = [r["avg_richness"] for r in rows]
    assert rich == sorted(rich)  # higher tier => higher avg richness
    assert all(r["total_tokens"] > 0 for r in rows)
