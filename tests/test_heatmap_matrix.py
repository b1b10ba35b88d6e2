"""Round-3 batch 18: activity heatmap and near-dup source matrix."""

from __future__ import annotations

from data_engineering_project_spark.plans import workload


def test_heatmap_covers_the_full_week_grid(spark, sf_dir):
    rows = workload.QUERIES["hourly_heatmap"](spark, sf_dir).collect()
    # empty cells are simply absent (no zero-fill), so <= 168 cells
    assert 0 < len(rows) <= 7 * 24
    assert {r["dow"] for r in rows} <= set(range(1, 8))
    assert {r["hour_of_day"] for r in rows} <= set(range(24))
    total = sum(r["n_events"] for r in rows)
    assert total == workload.load(spark, sf_dir, "events").count()


def test_neardup_matrix_pairs_are_canonical_and_positive(spark, sf_dir):
    rows = workload.QUERIES["neardup_source_matrix"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["source_a"] <= r["source_b"]
        assert r["n_pairs"] > 0
    counts = [r["n_pairs"] for r in rows]
    assert counts == sorted(counts, reverse=True)
