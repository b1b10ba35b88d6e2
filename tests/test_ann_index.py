"""Persisted IVF index (operators/ann_index.py): build / probe /
append semantics and the partition-pruning contract."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_engineering_project_spark.operators import ann_index, similarity
from data_engineering_project_spark.plans import workload


@pytest.fixture(scope="module")
def index_path(spark, sf_dir, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ivf") / "index")
    emb = workload.load(spark, sf_dir, "embeddings")
    ann_index.build_index(emb, path, k_cells=8, iters=2)
    return path


def test_persisted_probe_matches_on_the_fly_ivf(spark, sf_dir, index_path):
    emb = workload.load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    cents = spark.read.parquet(index_path + "/centroids")
    on_the_fly = similarity.ivf_topk(emb, queries, cents, k=5, n_probe=3)
    persisted = ann_index.query_index(
        spark, index_path, queries, k=5, n_probe=3
    )
    a = sorted(map(tuple, on_the_fly.collect()))
    b = sorted(map(tuple, persisted.collect()))
    assert a == b and len(a) > 0


def test_probe_scan_is_partition_pruned(spark, sf_dir, index_path):
    emb = workload.load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 3)
    out = ann_index.query_index(spark, index_path, queries, k=5, n_probe=2)
    plan = out._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    seg = plan.split("PartitionFilters")[1].split("]")[0]
    assert "cell" in seg, "probe scan lost its partition filter"
    # and the pruned read really returns rows only from probed cells
    n_probed = (
        similarity.probe_assignments(
            queries, spark.read.parquet(index_path + "/centroids"), n_probe=2
        )
        .select("cell")
        .distinct()
        .count()
    )
    assert 0 < n_probed <= 3 * 2  # <= n_queries * n_probe, and tiny vs 8


def test_append_under_frozen_centroids_is_findable(spark, sf_dir, tmp_path):
    path = str(tmp_path / "index")
    emb = workload.load(spark, sf_dir, "embeddings")
    ann_index.build_index(emb, path, k_cells=8, iters=2)
    # plant a near-duplicate of vector 0 with a fresh id
    v0 = emb.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    planted = spark.createDataFrame(
        [(10_000_000, list(v0))],
        "vec_id long, embedding array<float>",
    )
    ann_index.add_to_index(spark, path, planted)
    hits = ann_index.query_index(
        spark,
        path,
        emb.filter(F.col("vec_id") == 0),
        k=5,
        n_probe=2,
    ).collect()
    by_rank = [r["neighbor_id"] for r in hits]
    # an exact copy lands in the same cell and reranks to the top
    assert by_rank and by_rank[0] == 10_000_000
    top = [r for r in hits if r["neighbor_id"] == 10_000_000][0]
    assert top["cosine"] == pytest.approx(1.0, abs=1e-6)
