"""PageRank value iteration — known-graph invariants."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_engineering_project_spark.operators.graph import pagerank


def _edges(spark, pairs):
    """Undirected input: feed both directions, distinct."""
    both = list({(a, b) for a, b in pairs} | {(b, a) for a, b in pairs})
    return spark.createDataFrame(both, "src long, dst long")


def test_triangle_stays_uniform(spark):
    pr = pagerank(_edges(spark, [(1, 2), (2, 3), (1, 3)]), iterations=3)
    rows = {r["node"]: r for r in pr.collect()}
    assert set(rows) == {1, 2, 3}
    for r in rows.values():
        assert r["deg"] == 2
        assert r["pr"] == pytest.approx(1 / 3, abs=1e-12)


def test_star_center_dominates_and_mass_conserved(spark):
    pr = pagerank(_edges(spark, [(1, 2), (1, 3)]), iterations=2)
    rows = {r["node"]: r["pr"] for r in pr.collect()}
    # no dangling nodes (both directions fed) -> total rank mass is 1
    assert sum(rows.values()) == pytest.approx(1.0, abs=1e-9)
    assert rows[1] > rows[2] == pytest.approx(rows[3], abs=1e-12)
    # hand-computed first iteration fixpoint direction: center collects
    # both leaves' full rank, leaves split the center's
    assert rows[2] < 1 / 3 < rows[1]


def test_empty_edge_frame_returns_empty(spark):
    empty = spark.createDataFrame([], "src long, dst long")
    pr = pagerank(empty, iterations=2)
    assert pr.columns == ["node", "deg", "pr"]
    assert pr.count() == 0


def test_iteration_zero_is_uniform_init(spark):
    pr = pagerank(_edges(spark, [(1, 2), (3, 4)]), iterations=0)
    for r in pr.collect():
        assert r["pr"] == pytest.approx(0.25, abs=1e-12)
