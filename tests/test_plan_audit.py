"""Physical-plan audit over the whole workload.

Correctness tests prove the numbers; these prove the PLANS stay
scale-safe: no accidental cartesian products, no row-at-a-time Python
UDFs in any declared query, and the star-schema dimension joins stay
broadcast. A regression here is invisible at sf0.001 and fatal at
100 TB, which is exactly why it's asserted mechanically.
"""

from __future__ import annotations

import pytest

from data_engineering_project_spark.plans import workload

# Queries whose physical plan is *expected* to contain a Python-side
# stage (Arrow-batched kernels — not row-at-a-time UDFs).
ARROW_KERNELS = {
    "cosine_topk_fast",
    "embedding_similar_pairs",
    "pack_documents",
    "media_featurize",
    # Misra-Gries sketch pass: a bounded per-partition mapInPandas
    # summary (O(k) state) feeding a JVM-side exact verify.
    "heavy_hitter_tokens",
    # Exact-KNN label audit: the BLAS top-k kernel with the corpus as
    # its own (bounded) query set.
    "knn_label_agreement",
    # Mergeable t-digest: per-day applyInPandas digests (O(delta)
    # output per calendar-bounded group) + one digest-table rollup.
    "value_quantile_sketch",
    # Trained-BPE encoding pass: broadcast merge ranks, one
    # mapInPandas sweep with a per-batch word cache (r9).
    "bpe_fertility_audit",
    # PNG decode pipeline (r11): two Arrow stages — the planted-image
    # encode kernel and decode_and_featurize — both map-only.
    "media_decode_png",
}

# The one query whose JOB is a Python table function: doc_chunks_udtf
# exists to prove the SURVEY.md §2.10 UDTF surface against the same
# oracle as its Catalyst twin (doc_chunks, which stays JVM-only and IS
# plan-audited strictly). Every other query must not plan a UDTF.
DECLARED_UDTF = {"doc_chunks_udtf"}


def _formatted_plan(spark, df) -> str:
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


# Queries whose remaining unpartitioned windows run over frames whose
# row count is BOUNDED BY CONSTRUCTION — not by the data volume — so
# the single partition they serialize onto holds a control-plane-sized
# frame at any corpus scale. Every entry names its bound. Anything NOT
# listed here that plans an unpartitioned window over distributed data
# fails the audit: entity-scale ranks/cumulatives must use
# operators/order_stats (see the round-6 rewires: order_value_deciles,
# rfm_segments, customer_revenue_gini, ranking_rank_correlation,
# zipf_fit, peak_concurrent_sessions, part_abc_classes,
# revenue_lorenz_deciles, score_decile_lift, hybrid_rank_fusion,
# ks_priority_value, mannwhitney_priority_value).
BOUNDED_GLOBAL_WINDOWS = {
    # calendar-bounded: windows over a per-day (or per-month) rollup —
    # rows scale with the date span, not the data
    "daily_count_autocorrelation",
    "events_value_cusum",
    "granger_daily_events",
    "orders_trailing_7d_range",
    "orders_weekday_decomposition",
    "revenue_7d_moving",
    "revenue_changepoint",
    "revenue_updown_runs",
    "running_monthly_revenue",
    "runs_test_z",
    "seasonal_adjusted_anomalies",
    "sprt_urgent_share",
    "user_acquisition_curve",
    # bucket/stratum/replicate-bounded: fixed digit ladders, score
    # bins, language strata, bootstrap replicate counts
    "benford_price_digits",  # 9 first-digit buckets
    "poisson_bootstrap_ci",  # fixed bootstrap replicate count
    "mixture_waterfill_rates",  # language strata
    "neyman_allocation_sample",  # language strata
    "score_calibration_ece",  # 10 confidence bins
    # decile-frame shares AFTER the entity-scale rank was rewired onto
    # order_stats: the remaining windows see exactly 10 rows
    "revenue_lorenz_deciles",
    "score_decile_lift",
    # event-time-bounded: survival-curve windows over distinct
    # day-gap values (rows scale with the day span)
    "kaplan_meier_repurchase",
    "reorder_survival_km",
}

# Physical nodes that bound their output to a driver-checked constant
# row count: a global-order window over one of these is a top-k
# formality (bm25_topk20's rank over 20 rows), not a serialization.
_BOUNDING_NODES = {
    "TakeOrderedAndProjectExec",
    "GlobalLimitExec",
    "CollectLimitExec",
    "LocalLimitExec",
    "LocalTableScanExec",
}


def _unpartitioned_window_violations(df) -> list[str]:
    """Names of WindowExec nodes with an EMPTY partition spec whose
    unary child chain reaches an Exchange SinglePartition before any
    row-bounding node — i.e. the plan funnels distributed data onto
    one partition to run the window. This is the shape that retired
    round-6's global-rank weak class (operators/order_stats is the
    scale-safe replacement); the audit makes regressing to it a test
    failure rather than a docstring caveat."""

    def walk(node):
        yield node
        ch = node.children()
        for i in range(ch.size()):
            yield from walk(ch.apply(i))

    plan = df._jdf.queryExecution().executedPlan()
    if plan.getClass().getSimpleName() == "AdaptiveSparkPlanExec":
        plan = plan.initialPlan()
    bad = []
    for node in walk(plan):
        if node.getClass().getSimpleName() != "WindowExec":
            continue
        if not node.partitionSpec().isEmpty():
            continue
        # follow the unary chain below the window
        cur = node
        while True:
            ch = cur.children()
            if ch.size() != 1:
                break  # leaf or binary node before any exchange: allow
            cur = ch.apply(0)
            cls = cur.getClass().getSimpleName()
            if cls in _BOUNDING_NODES:
                break
            if cls == "ShuffleExchangeExec":
                if cur.outputPartitioning().toString() == "SinglePartition":
                    bad.append(node.toString().splitlines()[0][:200])
                break
    return bad


@pytest.mark.parametrize("name", sorted(workload.QUERIES))
def test_no_cartesian_or_rowwise_udf(spark, sf_dir, name):
    df = workload.QUERIES[name](spark, sf_dir)
    plan = _formatted_plan(spark, df)
    assert "CartesianProduct" not in plan, f"{name} plans a cartesian product"
    if name not in DECLARED_UDTF:
        assert "BatchEvalPython" not in plan, f"{name} uses a row-at-a-time Python UDF"
    if name not in ARROW_KERNELS:
        assert "ArrowEvalPython" not in plan and "FlatMapGroupsInPandas" not in plan and (
            "MapInPandas" not in plan
        ), f"{name} unexpectedly leaves the JVM"
    if name not in BOUNDED_GLOBAL_WINDOWS:
        viol = _unpartitioned_window_violations(df)
        assert not viol, (
            f"{name} plans an unpartitioned window over distributed data "
            f"(single-partition sort at scale) — use operators/order_stats "
            f"or justify an entry in BOUNDED_GLOBAL_WINDOWS: {viol}"
        )


def test_gold_dim_joins_are_broadcast(spark, sf_dir):
    """Every dashboard query joining fact to a dim must broadcast the
    dim side — a shuffle join on a small dim wastes a full exchange of
    the fact table."""
    for name in ("kpis", "top_categories", "orders_by_state", "monthly_trend"):
        plan = _formatted_plan(spark, workload.QUERIES[name](spark, sf_dir))
        assert "BroadcastHashJoin" in plan, f"{name} lost its broadcast join"


def test_scans_prune_columns_and_push_filters(spark, sf_dir):
    """The wide-scan aggregate must column-prune the lineitem read and
    push its date predicate into the parquet scan."""
    plan = _formatted_plan(spark, workload.QUERIES["pricing_summary"](spark, sf_dir))
    assert "l_suppkey" not in plan, "pricing_summary reads unused columns"
    assert "PushedFilters" in plan and "l_shipdate" in plan.split("PushedFilters")[1].split("]")[0], (
        "date predicate not pushed to the scan"
    )
