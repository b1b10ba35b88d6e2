"""Round-3 batch 22: footer-stats pruning, seasonality, elasticity."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_engineering_project_spark.plans import workload
from data_engineering_project_spark.sources.layout import write_clustered
from data_engineering_project_spark.sources.stats import (
    file_stats,
    pruning_fraction,
)


def test_clustered_layout_prunes_shuffled_does_not(spark, tmp_path):
    df = spark.range(100_000).select(
        F.col("id"), (F.col("id") % 997).alias("noise")
    )
    clustered = str(tmp_path / "clustered")
    shuffled = str(tmp_path / "shuffled")
    write_clustered(df, clustered, cluster_by=["id"], num_files=8)
    df.repartition(8, "noise").write.parquet(shuffled)

    # point-ish range on the cluster column: clustered skips ~7/8 of
    # rows on stats alone, shuffled skips nothing
    c = pruning_fraction(clustered, "id", 0, 10_000)
    s = pruning_fraction(shuffled, "id", 0, 10_000)
    assert c["row_fraction_skipped"] > 0.8
    assert s["row_fraction_skipped"] == 0.0
    assert c["n_files"] == s["n_files"] == 8


def test_file_stats_cover_all_rows(spark, tmp_path):
    p = str(tmp_path / "t")
    spark.range(1000).write.parquet(p)
    stats = file_stats(p, "id")
    assert sum(s.n_rows for s in stats) == 1000
    assert min(s.col_min for s in stats) == 0
    assert max(s.col_max for s in stats) == 999


def test_seasonality_indexes_average_to_one(spark, sf_dir):
    rows = workload.QUERIES["monthly_seasonality_index"](spark, sf_dir).collect()
    assert [r["month"] for r in rows] == list(range(1, 13))
    mean_idx = sum(r["seasonality_index"] for r in rows) / 12
    # indexes are ratios to the yearly mean, so they average to ~1
    assert mean_idx == pytest.approx(1.0, abs=0.02)


def test_elasticity_has_full_brand_coverage(spark, sf_dir):
    rows = workload.QUERIES["discount_elasticity"](spark, sf_dir).collect()
    n_brands = (
        workload.load(spark, sf_dir, "part").select("p_brand").distinct().count()
    )
    assert len(rows) == n_brands
    for r in rows:
        assert 0.0 <= r["r2"] <= 1.0
