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


def test_point_lookup_prunes_to_hashed_buckets(spark, pair):
    """r13: an equality/IN predicate on the bucket key scans ONLY the
    buckets the literals hash into (SelectedBucketsCount on the scan
    node), and the answer equals the plain-parquet lookup."""
    orders, _ = pair
    keys = [int(r[0]) for r in orders.select("o_orderkey").limit(3).collect()]
    look, sel, tot = bucketed.bucket_pruned_lookup(
        spark, "t_orders_bkt", "o_orderkey", keys[:1]
    )
    assert tot == 8 and sel == 1
    want = orders.filter(F.col("o_orderkey") == keys[0]).collect()
    assert sorted(map(tuple, look.collect())) == sorted(map(tuple, want))
    # IN-list: at most one bucket per literal, never the full scan
    look3, sel3, tot3 = bucketed.bucket_pruned_lookup(
        spark, "t_orders_bkt", "o_orderkey", keys
    )
    assert tot3 == 8 and 1 <= sel3 <= len(keys)
    assert look3.count() == orders.filter(F.col("o_orderkey").isin(keys)).count()


def test_point_lookup_restores_auto_bucketed_scan_conf(spark, pair):
    conf_key = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    before = spark.conf.get(conf_key)
    bucketed.bucket_pruned_lookup(spark, "t_orders_bkt", "o_orderkey", [1])
    assert spark.conf.get(conf_key) == before
    # and restored even when the lookup raises (bad column name)
    with pytest.raises(Exception):
        bucketed.bucket_pruned_lookup(spark, "t_orders_bkt", "nope", [1])
    assert spark.conf.get(conf_key) == before


def test_point_lookup_on_unbucketed_scan_reports_none(spark, pair, tmp_path):
    """A table without bucketing metadata yields (None, None) counts —
    the caller's attestation column goes False instead of lying."""
    orders, _ = pair
    orders.limit(100).write.mode("overwrite").parquet(str(tmp_path / "plain"))
    spark.read.parquet(str(tmp_path / "plain")).createOrReplaceTempView(
        "t_plain_view"
    )
    look, sel, tot = bucketed.bucket_pruned_lookup(
        spark, "t_plain_view", "o_orderkey", [1]
    )
    assert sel is None and tot is None
