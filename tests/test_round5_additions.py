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


def test_boilerplate_run_report_is_ranked_and_consistent(spark, sf_dir):
    rows = workload.QUERIES["boilerplate_longest_dup_run"](
        spark, sf_dir
    ).collect()
    assert 0 < len(rows) <= 20
    runs = [r["longest_run"] for r in rows]
    assert runs == sorted(runs, reverse=True)
    for r in rows:
        assert r["longest_run"] >= 1
        assert r["longest_dup_span_tokens"] == r["longest_run"] + 4


def test_permutation_test_obs_diff_and_pvalue_shape(spark, sf_dir):
    row = workload.QUERIES["permutation_test_priority_value"](
        spark, sf_dir
    ).collect()[0]
    orders = workload.load(spark, sf_dir, "orders")
    n = orders.count()
    assert row["n_a"] + row["n_b"] == n
    assert row["n_reps"] == 100
    assert 0 < row["p_value"] <= 1
    # add-one p-value granularity: k/101 for integer k in [1, 101]
    k = row["p_value"] * 101
    assert abs(k - round(k)) < 0.03
    # obs_diff re-derived directly
    from pyspark.sql import functions as F2

    g = orders.groupBy(
        F2.col("o_orderpriority").isin("1-URGENT", "2-HIGH").alias("a")
    ).agg(F2.avg("o_totalprice").alias("m"))
    m = {r["a"]: r["m"] for r in g.collect()}
    assert abs(row["obs_diff"] - (m[True] - m[False])) < 0.02


def test_cusum_matches_sequential_recursion(spark, sf_dir):
    rows = workload.QUERIES["events_value_cusum"](spark, sf_dir).collect()
    assert len(rows) == 10
    stats = [r["cusum_stat"] for r in rows]
    assert stats == sorted(stats, reverse=True)
    assert all(s >= 0 for s in stats)
    # replay the textbook recursion S_t = max(0, S_{t-1} + d_t)
    events = workload.load(spark, sf_dir, "events")
    daily = sorted(
        events.groupBy(F.to_date("ts").alias("day"))
        .agg(F.round(F.avg("value"), 6).alias("x"))
        .collect(),
        key=lambda r: r["day"],
    )
    xs = [r["x"] for r in daily]
    n = len(xs)
    mu = sum(xs) / n
    sd = (sum((v - mu) ** 2 for v in xs) / (n - 1)) ** 0.5
    k = sd / 2
    s, by_day = 0.0, {}
    for r, x in zip(daily, xs):
        s = max(0.0, s + (x - mu - k))
        by_day[r["day"]] = s
    for r in rows:
        assert abs(r["cusum_stat"] - by_day[r["day"]]) < 1e-2
    # the reported rows are the global top-10 of the recursion
    top10 = sorted(by_day.values(), reverse=True)[:10]
    for got, want in zip(stats, top10):
        assert abs(got - want) < 1e-2


def test_quality_prune_curve_is_monotone_and_anchored(spark, sf_dir):
    rows = workload.QUERIES["quality_prune_tradeoff"](spark, sf_dir).collect()
    assert [r["threshold"] for r in rows] == [i / 10 for i in range(10)]
    docs = workload.load(spark, sf_dir, "documents")
    assert rows[0]["n_docs_kept"] == docs.count()
    assert rows[0]["token_share"] == 1.0
    kept = [r["tokens_kept"] for r in rows]
    assert kept == sorted(kept, reverse=True)
    for r in rows:
        assert 0 <= r["token_share"] <= 1


def test_ewma_forecast_naive_mae_matches_lag_derivation(spark, sf_dir):
    row = workload.QUERIES["ewma_daily_forecast"](spark, sf_dir).collect()[0]
    assert row["n_days"] > 0
    assert row["mae_ewma"] >= 0 and row["mae_naive"] >= 0
    # naive MAE re-derived: |x_t - x_{t-1}| over consecutive-day pairs
    from pyspark.sql import Window as W2

    orders = workload.load(spark, sf_dir, "orders")
    daily = orders.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.round(F.sum(F.col("o_totalprice").cast("decimal(38,6)")), 4)
        .cast("double")
        .alias("x")
    )
    w = W2.orderBy("day")
    cons = (
        daily.select(
            "day",
            "x",
            F.lag("x").over(w).alias("px"),
            F.lag("day").over(w).alias("pd"),
        )
        .filter(F.datediff("day", "pd") == 1)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.avg(F.abs(F.col("x") - F.col("px"))).alias("mae"),
        )
        .collect()[0]
    )
    assert cons["n"] == row["n_days"]
    assert abs(cons["mae"] - row["mae_naive"]) < 1e-2


def test_rrf_fusion_scores_are_consistent_with_ranks(spark, sf_dir):
    rows = workload.QUERIES["hybrid_rank_fusion"](spark, sf_dir).collect()
    assert len(rows) == 20
    scores = [r["rrf_score"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    for r in rows:
        want = 1.0 / (60 + r["r_quality"]) + 1.0 / (60 + r["r_length"])
        assert abs(r["rrf_score"] - want) < 1e-6
        assert r["r_quality"] >= 1 and r["r_length"] >= 1


def test_hill_tail_index_threshold_and_identity(spark, sf_dir):
    row = workload.QUERIES["order_value_tail_index"](spark, sf_dir).collect()[0]
    assert row["k"] == 100
    orders = workload.load(spark, sf_dir, "orders")
    vals = [
        r["o_totalprice"]
        for r in orders.orderBy(
            F.desc("o_totalprice"), F.asc("o_orderkey")
        )
        .limit(101)
        .collect()
    ]
    assert abs(row["threshold"] - vals[100]) < 1e-3
    assert row["hill_mean_logratio"] > 0
    assert row["tail_alpha"] > 0
    assert abs(row["tail_alpha"] * row["hill_mean_logratio"] - 1) < 1e-2


def test_transition_entropy_information_identities(spark, sf_dir):
    row = workload.QUERIES["event_transition_entropy"](
        spark, sf_dir
    ).collect()[0]
    assert row["n_transitions"] > 0
    # 0 <= H(next|prev) <= H(next) <= ln(|types|); gain = difference
    n_types = (
        workload.load(spark, sf_dir, "events")
        .select("event_type")
        .distinct()
        .count()
    )
    import math

    assert 0 <= row["h_cond"] <= row["h_next"] + 1e-9
    assert row["h_next"] <= math.log(n_types) + 1e-9
    assert abs(row["info_gain"] - (row["h_next"] - row["h_cond"])) < 2e-6


def test_transitivity_bounds_and_wedge_identity(spark, sf_dir):
    row = workload.QUERIES["copurchase_transitivity"](
        spark, sf_dir
    ).collect()[0]
    assert row["n_nodes"] > 0 and row["n_edges"] > 0
    assert 0 <= row["transitivity"] <= 1
    # every triangle closes 3 wedges
    assert 3 * row["n_triangles"] <= row["n_wedges"]
