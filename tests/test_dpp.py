"""Dynamic partition pruning (workload.dynamic_partition_pruning_join
+ the month-partitioned fact builder): the runtime subquery filter
must appear on the fact scan, and pruning must never change the
answer vs the unpartitioned formulation."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_engineering_project_spark.plans import workload


def test_dpp_fires_and_answer_matches_unpartitioned(spark, sf_dir):
    out = workload.QUERIES["dynamic_partition_pruning_join"](
        spark, sf_dir
    ).collect()
    assert out, "no Q1 months"
    # the mechanical attestation column is computed from the executed
    # plan inside the entry — all rows must carry True
    assert all(r.partition_pruned_dynamically for r in out)
    # answer parity with the plain unpartitioned formulation
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    want = {
        (r.order_month, r.n_orders, r.revenue)
        for r in orders.withColumn(
            "order_month", F.date_format("o_orderdate", "yyyy-MM")
        )
        .filter(F.quarter("o_orderdate") == 1)
        .groupBy("order_month")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
        .collect()
    }
    assert {(r.order_month, r.n_orders, r.revenue) for r in out} == want


def test_partitioned_fact_scan_reads_only_matching_directories(
    spark, sf_dir
):
    # directory-level evidence: the fact scan's PartitionFilters carry
    # a dynamicpruning expression (not a static IN-list, not absent)
    path = workload._dpp_fact_path(spark, sf_dir)
    fact = spark.read.parquet(path)
    dim = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select(
            F.date_format("o_orderdate", "yyyy-MM").alias("order_month"),
            F.quarter("o_orderdate").alias("qtr"),
        )
        .distinct()
    )
    joined = fact.join(
        F.broadcast(dim.filter(F.col("qtr") == 1)), "order_month", "inner"
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower()
