"""Round-5 batch: invariant tests for the sketch-audit and weighted
sampling additions.

Cross-engine value equality is covered by test_oracle_parity; these
tests pin the MATHEMATICAL invariants each query's semantics promise.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from data_engineering_project_spark.plans import workload


def test_quantile_sketch_audit_flags_hold_and_values_are_order_stats(
    spark, sf_dir
):
    rows = workload.QUERIES["quantile_sketch_audit"](spark, sf_dir).collect()
    assert [r["q"] for r in rows] == [0.5, 0.95, 0.99]
    li = workload.load(spark, sf_dir, "lineitem")
    n = li.count()
    for r in rows:
        assert r["n_rows"] == n
        assert r["rank_err_within_bound"] is True
        # the exact value really is the ceil(q*n)-th order statistic:
        # count(v < x) < k <= count(v <= x)
        import math

        k = math.ceil(r["q"] * n)
        lt = li.filter(F.col("l_extendedprice") < r["exact_value"]).count()
        le = li.filter(F.col("l_extendedprice") <= r["exact_value"]).count()
        assert lt < k <= le
    # quantile values are monotone in q
    vals = [r["exact_value"] for r in rows]
    assert vals == sorted(vals)


def test_weighted_sample_ares_is_a_valid_wor_sample(spark, sf_dir):
    out = workload.QUERIES["weighted_sample_ares"](spark, sf_dir)
    rows = out.collect()
    docs = workload.load(spark, sf_dir, "documents")
    n_eligible = docs.filter(F.col("n_chars") > 0).count()
    assert len(rows) == min(50, n_eligible)
    # without replacement: all distinct
    assert len({r["doc_id"] for r in rows}) == len(rows)
    # keys are ln(u)/w with u in (0,1] and w > 0 -> all <= 0, and the
    # output is ranked best-first
    keys = [r["es_key"] for r in rows]
    assert all(k <= 0 for k in keys)
    assert keys == sorted(keys, reverse=True)
    # the cut is real: every kept key beats every dropped key (modulo
    # the 10dp rounding tie broken by doc_id)
    kept_min = min(keys)
    dropped_max = (
        docs.filter(F.col("n_chars") > 0)
        .join(
            out.select("doc_id").withColumn("_k", F.lit(1)),
            "doc_id",
            "left_anti",
        )
        .select(
            F.round(
                F.log(
                    (
                        F.conv(
                            F.substring(
                                F.md5(F.col("doc_id").cast("string")), 1, 15
                            ),
                            16,
                            10,
                        ).cast("long")
                        + F.lit(1.0)
                    )
                    / F.lit(float(1 << 60))
                )
                / F.col("n_chars"),
                10,
            ).alias("k")
        )
        .agg(F.max("k"))
        .collect()[0][0]
    )
    if dropped_max is not None:
        assert dropped_max <= kept_min


def test_weighted_sample_ares_favors_heavier_docs(spark, sf_dir):
    """Length-weighted sampling must skew the sample toward longer
    docs: the sample's mean n_chars should exceed the corpus mean."""
    out = workload.QUERIES["weighted_sample_ares"](spark, sf_dir)
    docs = workload.load(spark, sf_dir, "documents").filter(
        F.col("n_chars") > 0
    )
    sample_mean = (
        docs.join(out.select("doc_id"), "doc_id")
        .agg(F.avg("n_chars"))
        .collect()[0][0]
    )
    corpus_mean = docs.agg(F.avg("n_chars")).collect()[0][0]
    assert sample_mean > corpus_mean


def test_ivf_cell_balance_flags_and_counts(spark, sf_dir):
    row = workload.QUERIES["ivf_cell_balance"](spark, sf_dir).collect()[0]
    n_emb = workload.load(spark, sf_dir, "embeddings").count()
    assert row["n_vecs"] == n_emb
    assert 2 <= row["n_cells"] <= 16
    assert row["partition_of_unity"] is True
    assert row["max_share_le_25pct"] is True


def test_embedding_pca_trace_equals_sum_of_dim_variances(spark, sf_dir):
    row = workload.QUERIES["embedding_pca_power"](spark, sf_dir).collect()[0]
    emb = workload.load(spark, sf_dir, "embeddings")
    assert row["n_dims"] == len(emb.limit(1).collect()[0]["embedding"])
    assert row["lambda1_within_bounds"] is True
    assert row["explained_share_valid"] is True
    # trace re-derived with population variance per dim
    elems = emb.select(F.posexplode("embedding").alias("i", "e")).select(
        "i", F.col("e").cast("double").alias("e")
    )
    ref = (
        elems.groupBy("i")
        .agg(
            (
                F.avg(F.col("e") * F.col("e"))
                - F.avg("e") * F.avg("e")
            ).alias("v")
        )
        .agg(F.sum("v"))
        .collect()[0][0]
    )
    assert abs(row["trace_var"] - ref) < 1e-3


def test_adamic_adar_predictions_are_nonedges_with_positive_scores(
    spark, sf_dir
):
    out = workload.QUERIES["copurchase_adamic_adar"](spark, sf_dir)
    rows = out.collect()
    assert 0 < len(rows) <= 20
    edges = {
        (r["part_a"], r["part_b"])
        for r in workload._copurchase_pair_counts(spark, sf_dir)
        .filter(F.col("n_both") >= 2)
        .select("part_a", "part_b")
        .collect()
    }
    scores = [r["aa_score"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    for r in rows:
        assert (r["part_a"], r["part_b"]) not in edges
        assert r["part_a"] < r["part_b"]
        assert r["n_common"] >= 1
        # each common neighbor contributes at most 1/ln(2)
        assert 0 < r["aa_score"] <= r["n_common"] / 0.693 + 1e-6


def test_fd_audit_key_dependencies_hold_and_violations_counted(
    spark, sf_dir
):
    rows = {
        r["fd"]: r
        for r in workload.QUERIES["functional_dependency_audit"](
            spark, sf_dir
        ).collect()
    }
    assert len(rows) == 6
    # key-backed FDs are positive controls
    for fd in (
        "customer.c_custkey->c_nationkey",
        "nation.n_nationkey->n_regionkey",
    ):
        assert rows[fd]["fd_holds"] is True
        assert rows[fd]["n_violating_keys"] == 0
        assert rows[fd]["max_rhs_per_key"] == 1
    for r in rows.values():
        assert r["n_violating_keys"] <= r["n_keys"]
        assert (r["n_violating_keys"] == 0) == r["fd_holds"]
        assert (r["max_rhs_per_key"] > 1) == (not r["fd_holds"])


def test_waterfill_exhausts_budget_and_respects_caps(spark, sf_dir):
    rows = workload.QUERIES["mixture_waterfill_rates"](spark, sf_dir).collect()
    toks = {r["lang"]: r["n_tokens"] for r in rows}
    total = sum(toks.values())
    budget = (6 * total) // 10
    allocated = sum(r["rate"] * r["n_tokens"] for r in rows)
    # closed-form cap spends the budget exactly (modulo 6dp rounding)
    assert abs(allocated - budget) <= 1e-4 * total
    for r in rows:
        assert 0 < r["rate"] <= 1.0
        if not r["capped"]:
            assert r["rate"] == 1.0
    # uncapped languages are exactly the ones at or under the cap
    capped_toks = [r["n_tokens"] for r in rows if r["capped"]]
    uncapped_toks = [r["n_tokens"] for r in rows if not r["capped"]]
    if capped_toks and uncapped_toks:
        assert min(capped_toks) >= max(uncapped_toks)
