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


@pytest.mark.parametrize("name", sorted(workload.QUERIES))
def test_no_cartesian_or_rowwise_udf(spark, sf_dir, name):
    plan = _formatted_plan(spark, workload.QUERIES[name](spark, sf_dir))
    assert "CartesianProduct" not in plan, f"{name} plans a cartesian product"
    if name not in DECLARED_UDTF:
        assert "BatchEvalPython" not in plan, f"{name} uses a row-at-a-time Python UDF"
    if name not in ARROW_KERNELS:
        assert "ArrowEvalPython" not in plan and "FlatMapGroupsInPandas" not in plan and (
            "MapInPandas" not in plan
        ), f"{name} unexpectedly leaves the JVM"


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
