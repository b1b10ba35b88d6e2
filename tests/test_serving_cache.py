"""Serving-layer cache: dashboard queries answer from memory."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from data_engineering_project_spark.plans import workload
from data_engineering_project_spark.serving.sql import (
    cache_gold_views,
    run_readonly_sql,
    uncache_gold_views,
)


def test_cached_views_plan_inmemory_scans_and_stay_queryable(spark, sf_dir):
    gold = workload.gold(spark, sf_dir)
    try:
        cache_gold_views(spark, gold)
        df = run_readonly_sql(
            spark,
            "SELECT COUNT(*) AS n, SUM(price) AS rev FROM fact_sales",
        )
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "InMemoryTableScan" in plan
        row = df.collect()[0]
        assert row["n"] > 0
        # repeated dashboard interactions reuse the cache (no rescan):
        # second run must not be dramatically slower than first
        t0 = time.time()
        run_readonly_sql(
            spark, "SELECT COUNT(DISTINCT customer_id) FROM fact_sales"
        ).collect()
        assert time.time() - t0 < 30
    finally:
        uncache_gold_views(spark, list(gold))


def test_uncache_restores_scan_plans(spark, sf_dir):
    gold = workload.gold(spark, sf_dir)
    cache_gold_views(spark, gold, eager=False)
    uncache_gold_views(spark, list(gold))
    df = spark.sql("SELECT COUNT(*) FROM fact_sales")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "InMemoryTableScan" not in plan
