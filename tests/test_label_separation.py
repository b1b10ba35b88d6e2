"""Label separation score on planted separable / mixed clusters."""

from __future__ import annotations

import pytest

from data_engineering_project_spark.plans import workload


def _write(spark, tmp_path, rows, name):
    d = str(tmp_path / name)
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.parquet(d + "/embeddings.parquet")
    return d


def test_orthogonal_clusters_separate_cleanly(spark, tmp_path):
    rows = []
    for i in range(6):
        rows.append((i, [1.0, 0.0, 0.0, 0.0], 0))
        rows.append((100 + i, [0.0, 1.0, 0.0, 0.0], 1))
    d = _write(spark, tmp_path, rows, "sep")
    out = {
        r["label"]: r["separation"]
        for r in workload.QUERIES["label_separation_score"](spark, d).collect()
    }
    # own-centroid cos = 1, other-centroid cos = 0 -> separation = 1
    assert out[0] == pytest.approx(1.0, abs=1e-6)
    assert out[1] == pytest.approx(1.0, abs=1e-6)


def test_identical_clusters_do_not_separate(spark, tmp_path):
    rows = []
    for i in range(6):
        rows.append((i, [1.0, 1.0, 0.0, 0.0], 0))
        rows.append((100 + i, [1.0, 1.0, 0.0, 0.0], 1))  # same direction
    d = _write(spark, tmp_path, rows, "mix")
    out = {
        r["label"]: r["separation"]
        for r in workload.QUERIES["label_separation_score"](spark, d).collect()
    }
    assert out[0] == pytest.approx(0.0, abs=1e-6)
    assert out[1] == pytest.approx(0.0, abs=1e-6)


def test_testdata_labels_have_bounded_scores(spark, sf_dir):
    rows = workload.QUERIES["label_separation_score"](spark, sf_dir).collect()
    assert len(rows) == 10
    for r in rows:
        assert -2.0 <= r["separation"] <= 2.0
