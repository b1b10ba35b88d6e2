"""Round-3 batch 3: Misra–Gries heavy hitters, MMR re-ranking,
winsorized means, JL random projection."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_engineering_project_spark.operators import frequency
from data_engineering_project_spark.operators.similarity import mmr_select
from data_engineering_project_spark.plans import workload


# -------------------------------------------------------- Misra–Gries


def test_heavy_hitters_exact_on_planted_zipf(spark):
    # 'a' x 500, 'b' x 300, then 200 singletons: N=1000, k=4 -> 250
    rows = (
        [("a",)] * 500 + [("b",)] * 300 + [(f"rare{i}",) for i in range(200)]
    )
    toks = spark.createDataFrame(rows, "tok string").repartition(4)
    out = {r["tok"]: r["cnt"] for r in frequency.heavy_hitters(toks, "tok", k=4).collect()}
    assert out == {"a": 500, "b": 300}


def test_mg_candidates_are_bounded_and_cover_heavies(spark):
    rows = [("hot",)] * 400 + [(f"x{i % 50}",) for i in range(600)]
    toks = spark.createDataFrame(rows, "tok string").repartition(3)
    cands = [r["tok"] for r in frequency.misra_gries_candidates(toks, "tok", k=5).collect()]
    assert "hot" in cands          # guaranteed recall for count > N/k
    assert len(cands) <= 5 * toks.rdd.getNumPartitions()


def test_heavy_hitter_query_matches_brute_force(spark, sf_dir):
    got = [
        (r["tok"], r["cnt"])
        for r in workload.QUERIES["heavy_hitter_tokens"](spark, sf_dir).collect()
    ]
    toks = workload.load(spark, sf_dir, "documents").select(
        F.explode(F.split("text", " ")).alias("tok")
    )
    n = toks.count()
    want = [
        (r["tok"], r["cnt"])
        for r in toks.groupBy("tok")
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") * 30 > F.lit(n))
        .orderBy(F.desc("cnt"), F.asc("tok"))
        .collect()
    ]
    assert got == want and len(got) > 0


# ---------------------------------------------------------------- MMR


def test_mmr_skips_near_duplicate_of_selected(spark):
    # candidates for one query: two nearly-identical high-relevance
    # vectors and one orthogonal mid-relevance vector. Plain top-2 by
    # relevance picks the twins; MMR must swap in the diverse one.
    rows = [
        (1, 101, [1.0, 0.0, 0.0], 0.99),
        (1, 102, [0.999, 0.001, 0.0], 0.98),  # near-dup of 101
        (1, 103, [0.0, 1.0, 0.0], 0.80),      # diverse
    ]
    df = spark.createDataFrame(
        rows, "query_id long, neighbor_id long, embedding array<double>, relevance double"
    )
    out = mmr_select(df, k=2, lam=0.5).orderBy("rank").collect()
    assert [r["neighbor_id"] for r in out] == [101, 103]
    assert out[0]["rank"] == 1 and out[1]["rank"] == 2


def test_mmr_rank1_is_pure_relevance_and_scores_decrease(spark):
    rows = [
        (7, i, [float(i == j) for j in range(4)], 0.5 + 0.1 * i)
        for i in range(4)
    ]
    df = spark.createDataFrame(
        rows, "query_id long, neighbor_id long, embedding array<double>, relevance double"
    )
    out = mmr_select(df, k=4, lam=0.7).orderBy("rank").collect()
    # rank 1 = max lam*relevance (neighbor 3); orthogonal candidates
    # then follow in relevance order with a constant diversity penalty
    assert out[0]["neighbor_id"] == 3
    assert [r["neighbor_id"] for r in out] == [3, 2, 1, 0]


def test_mmr_zero_embedding_is_deterministic_not_nan(spark):
    # an all-zero embedding must behave as 0-cosine to everything, not
    # inject NaN rows into the similarity matrix (NaN max_sim would
    # make the greedy order nondeterministic)
    rows = [
        (5, 201, [1.0, 0.0], 0.9),
        (5, 202, [0.0, 0.0], 0.8),  # zero vector
        (5, 203, [0.0, 1.0], 0.7),
    ]
    df = spark.createDataFrame(
        rows,
        "query_id long, neighbor_id long, embedding array<double>, relevance double",
    )
    out = mmr_select(df, k=3, lam=0.5).orderBy("rank").collect()
    assert [r["neighbor_id"] for r in out] == [201, 202, 203]
    assert all(r["mmr_score"] == r["mmr_score"] for r in out)  # no NaN


# --------------------------------------------------------- winsorize


def test_winsorized_mean_shrinks_toward_center(spark, sf_dir):
    rows = workload.QUERIES["winsorized_revenue_stats"](spark, sf_dir).collect()
    assert len(rows) == 10
    for r in rows:
        assert r["n_orders"] > 0
        # clamping the top tail of a right-skewed distribution can only
        # lower (or keep) the mean; it must never raise it by much
        assert r["mean_winsorized"] <= r["mean_raw"] * 1.001


# ------------------------------------------------------ JL projection


def test_random_projection_preserves_norms_on_average(spark, sf_dir):
    rows = workload.QUERIES["random_projection_check"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        # E[ratio] = 1 with O(1/sqrt(8)) per-vector noise; label means
        # average over many vectors, so a generous band suffices
        assert 0.7 < r["avg_norm_ratio"] < 1.3
