"""Round-3 batch 27: k-core peeling and degree assortativity."""

from __future__ import annotations

import pytest

from data_engineering_project_spark.operators.graph import k_core
from data_engineering_project_spark.plans import workload


def _both_dirs(spark, pairs):
    both = list({(a, b) for a, b in pairs} | {(b, a) for a, b in pairs})
    return spark.createDataFrame(both, "src long, dst long")


def test_kcore_peels_tail_keeps_clique(spark):
    # triangle {1,2,3} (each degree 2) + pendant chain 3-4-5
    edges = _both_dirs(spark, [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)])
    core2 = {r["node"]: r["core_degree"] for r in k_core(edges, k=2).collect()}
    # the chain peels away (5 has degree 1, then 4 drops to 1, ...);
    # the triangle is the 2-core
    assert set(core2) == {1, 2, 3}
    assert all(d == 2 for d in core2.values())


def test_kcore_of_sparse_graph_is_empty(spark):
    edges = _both_dirs(spark, [(1, 2), (2, 3), (3, 4)])  # a path
    assert k_core(edges, k=2).count() == 0


def test_kcore_keeps_whole_clique_at_k_equals_size_minus_one(spark):
    pairs = [(a, b) for a in range(1, 6) for b in range(a + 1, 6)]  # K5
    core4 = k_core(_both_dirs(spark, pairs), k=4)
    assert core4.count() == 5


def test_assortativity_in_valid_range(spark, sf_dir):
    r = workload.QUERIES["copurchase_assortativity"](spark, sf_dir).collect()[0]
    assert r["n_edges"] > 0
    assert -1.0 <= r["assortativity"] <= 1.0
