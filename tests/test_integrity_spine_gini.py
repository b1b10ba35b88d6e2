"""Round-3 batch 8: referential integrity, date spine, duplicate
provenance, Gini concentration."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_engineering_project_spark.plans import workload


def test_referential_integrity_clean_on_testdata(spark, sf_dir):
    rows = workload.QUERIES["referential_integrity_report"](spark, sf_dir).collect()
    assert len(rows) == 4
    assert all(r["n_orphans"] == 0 for r in rows)


def test_referential_integrity_counts_planted_orphans(spark, tmp_path):
    d = str(tmp_path / "orph")
    spark.createDataFrame(
        [(1, 10), (2, 99)], "l_orderkey long, l_partkey long"
    ).withColumn("l_suppkey", F.lit(1)).write.parquet(d + "/lineitem.parquet")
    spark.createDataFrame([(10,)], "p_partkey long").write.parquet(d + "/part.parquet")
    spark.createDataFrame([(1,)], "s_suppkey long").write.parquet(d + "/supplier.parquet")
    spark.createDataFrame(
        [(1, 5)], "o_orderkey long, o_custkey long"
    ).write.parquet(d + "/orders.parquet")
    spark.createDataFrame(
        [(5, 0)], "c_custkey long, c_nationkey long"
    ).write.parquet(d + "/customer.parquet")
    spark.createDataFrame([(0,)], "n_nationkey long").write.parquet(d + "/nation.parquet")
    out = {
        r["relation"]: r["n_orphans"]
        for r in workload.QUERIES["referential_integrity_report"](spark, d).collect()
    }
    assert out["lineitem.partkey->part"] == 1  # partkey 99 is orphaned
    assert out["lineitem.suppkey->supplier"] == 0
    assert out["orders.custkey->customer"] == 0
    assert out["customer.nationkey->nation"] == 0


def test_date_spine_spans_every_year_without_gaps(spark, sf_dir):
    rows = workload.QUERIES["date_spine_coverage"](spark, sf_dir).collect()
    years = [r["year"] for r in rows]
    assert years == list(range(min(years), max(years) + 1))
    total_orders = workload.load(spark, sf_dir, "orders").count()
    assert sum(r["n_orders"] for r in rows) == total_orders
    for r in rows:
        assert 0 <= r["days_without_orders"] <= r["n_days"] <= 366


def test_cross_source_dup_histogram_accounts_for_all_dup_docs(spark, sf_dir):
    rows = workload.QUERIES["cross_source_exact_dups"](spark, sf_dir).collect()
    docs = workload.load(spark, sf_dir, "documents")
    dup_docs = (
        docs.groupBy(F.md5("text").alias("h"))
        .agg(F.count("*").alias("c"))
        .filter(F.col("c") > 1)
        .agg(F.sum("c"))
        .collect()[0][0]
    )
    histo_docs = sum(r["n_copies"] * r["n_groups"] for r in rows)
    assert histo_docs == (dup_docs or 0)
    for r in rows:
        assert r["n_sources"] <= r["n_copies"]


def test_gini_bounds_and_known_uniform_case(spark, tmp_path, sf_dir):
    r = workload.QUERIES["customer_revenue_gini"](spark, sf_dir).collect()[0]
    assert 0.0 <= r["gini"] <= 1.0
    assert r["n_customers"] > 0

    # equal revenues -> gini == 0 exactly (closed form collapses)
    d = str(tmp_path / "uni")
    spark.createDataFrame(
        [(i, 100.0) for i in range(10)], "o_custkey long, o_totalprice double"
    ).write.parquet(d + "/orders.parquet")
    r0 = workload.QUERIES["customer_revenue_gini"](spark, d).collect()[0]
    assert r0["gini"] == pytest.approx(0.0, abs=1e-9)


def test_dead_inventory_fraction_consistent(spark, sf_dir):
    r = workload.QUERIES["parts_never_ordered"](spark, sf_dir).collect()[0]
    assert 0 <= r["n_never_ordered"] <= r["n_parts"]
    assert r["dead_fraction"] == round(r["n_never_ordered"] / r["n_parts"], 4)


def test_category_breadth_accounts_for_every_buyer(spark, sf_dir):
    rows = workload.QUERIES["customer_category_breadth"](spark, sf_dir).collect()
    buyers = sum(r["n_customers"] for r in rows)
    orders = workload.load(spark, sf_dir, "orders")
    li = workload.load(spark, sf_dir, "lineitem").select("l_orderkey")
    with_items = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select("o_custkey").distinct().count()
    )
    assert buyers == with_items
