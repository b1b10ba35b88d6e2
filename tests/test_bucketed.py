"""Bucketed co-located joins (sources/bucketed.py): the bucketed pair
joins with ZERO Exchange, the plain-parquet contrast DOES shuffle,
and the answers are identical either way."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_engineering_project_spark.sources import bucketed


@pytest.fixture(scope="module")
def pair(spark, sf_dir, tmp_path_factory):
    base = tmp_path_factory.mktemp("bucketed")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    bucketed.write_bucketed(
        orders, "t_orders_bkt", str(base / "orders"), "o_orderkey", 8
    )
    bucketed.write_bucketed(
        lineitem, "t_lineitem_bkt", str(base / "lineitem"), "l_orderkey", 8
    )
    yield orders, lineitem
    spark.sql("DROP TABLE IF EXISTS t_orders_bkt")
    spark.sql("DROP TABLE IF EXISTS t_lineitem_bkt")


def test_bucketed_join_has_no_exchange(spark, pair):
    joined = bucketed.colocated_join(
        spark, "t_orders_bkt", "t_lineitem_bkt", "o_orderkey", "l_orderkey"
    )
    assert bucketed.join_is_shuffle_free(joined)
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan


def test_plain_parquet_join_does_shuffle(spark, pair):
    # the contrast case: identical data read as plain parquet (no
    # bucketing metadata) with the same merge strategy MUST exchange
    # both sides — this is the cost bucketing deletes
    orders, lineitem = pair
    joined = orders.hint("merge").join(
        lineitem, orders["o_orderkey"] == lineitem["l_orderkey"], "inner"
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" in plan
    assert not bucketed.join_is_shuffle_free(joined)


def test_bucketed_join_answer_matches_plain_join(spark, pair):
    orders, lineitem = pair
    colocated = bucketed.colocated_join(
        spark, "t_orders_bkt", "t_lineitem_bkt", "o_orderkey", "l_orderkey"
    )
    want = orders.join(
        lineitem, orders["o_orderkey"] == lineitem["l_orderkey"], "inner"
    )
    assert colocated.count() == want.count()
    a = (
        colocated.groupBy("o_orderpriority")
        .agg(F.round(F.sum("l_extendedprice"), 2).alias("s"))
        .collect()
    )
    b = (
        want.groupBy("o_orderpriority")
        .agg(F.round(F.sum("l_extendedprice"), 2).alias("s"))
        .collect()
    )
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_sorted_buckets_skip_the_sort(spark, pair):
    # sortBy at write time means the merge join needs no Sort either:
    # bucket files are already key-ordered (Spark still sorts when a
    # bucket holds >1 file per task; with our single write both tables
    # produce one file per bucket, so the plan's Sort nodes vanish)
    joined = bucketed.colocated_join(
        spark, "t_orders_bkt", "t_lineitem_bkt", "o_orderkey", "l_orderkey"
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
