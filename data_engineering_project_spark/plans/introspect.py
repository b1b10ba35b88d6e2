"""Physical-plan introspection: the plan-audit rules as a library.

tests/test_plan_audit.py asserts these rules over the registered
workload; this module exposes the same checks to USERS so a pipeline
can lint its own frames before launching a 1000-executor job (the
cheapest performance review is reading the plan, mechanically).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    """explain('formatted') as a string (what .explain prints)."""
    spark = df.sparkSession
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


@dataclass(frozen=True)
class PlanReport:
    n_exchanges: int
    n_broadcasts: int
    has_cartesian: bool
    has_nested_loop: bool
    has_rowwise_python_udf: bool
    has_arrow_python_stage: bool
    pushed_filters: bool

    @property
    def warnings(self) -> list[str]:
        out = []
        if self.has_cartesian or self.has_nested_loop:
            out.append(
                "CartesianProduct/BroadcastNestedLoopJoin: O(n*m) pair "
                "materialization — replace with an equi-join on a derived "
                "key (bucketing/banding)"
            )
        if self.has_rowwise_python_udf:
            out.append(
                "BatchEvalPython: row-at-a-time Python UDF — use built-in "
                "functions or an Arrow-batched pandas UDF (10-100x)"
            )
        if self.n_exchanges > 6:
            out.append(
                f"{self.n_exchanges} exchanges: consider reusing one "
                "partitioning across stages (repartition once, bucketed "
                "layout, or combining aggregates)"
            )
        return out


def lint(df: DataFrame) -> PlanReport:
    """Static plan lint — no execution, planning cost only."""
    # NOTE: whole-stage-codegen spans are NOT statically derivable here:
    # under AQE the pre-execution plan is an AdaptiveSparkPlan wrapper
    # and codegen fusion is decided per stage at runtime. The audit for
    # "stays JVM-side" is the has_*_python_* pair below.
    plan = formatted_plan(df)
    return PlanReport(
        n_exchanges=plan.count("Exchange"),
        n_broadcasts=plan.count("BroadcastExchange"),
        has_cartesian="CartesianProduct" in plan,
        has_nested_loop="BroadcastNestedLoopJoin" in plan,
        has_rowwise_python_udf="BatchEvalPython" in plan,
        has_arrow_python_stage=(
            "ArrowEvalPython" in plan
            or "MapInPandas" in plan
            or "FlatMapGroupsInPandas" in plan
        ),
        pushed_filters="PushedFilters: [" in plan
        and "PushedFilters: []" not in plan,
    )
