"""Round-3 batch 12: SLA compliance, basket economics, reorder cadence,
streaming top-k view maintenance."""

from __future__ import annotations

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F

from data_engineering_project_spark.plans import workload
from data_engineering_project_spark.streaming.events import (
    ingest_files_exactly_once,
    topk_view_maintenance,
)
from pyspark.sql.types import StructType


def test_sla_rates_bounded_and_cover_all_priorities(spark, sf_dir):
    rows = workload.QUERIES["shipping_sla_compliance"](spark, sf_dir).collect()
    assert len(rows) == 5
    for r in rows:
        assert 0.0 <= r["sla_rate"] <= 1.0
        assert r["n_within_sla"] <= r["n_items"]


def test_basket_sizes_partition_all_orders(spark, sf_dir):
    rows = workload.QUERIES["basket_size_revenue"](spark, sf_dir).collect()
    li = workload.load(spark, sf_dir, "lineitem")
    n_orders = li.select("l_orderkey").distinct().count()
    assert sum(r["n_orders"] for r in rows) == n_orders
    sizes = [r["basket_size"] for r in rows]
    assert sizes == sorted(sizes)


def test_reorder_percentiles_ordered(spark, sf_dir):
    r = workload.QUERIES["reorder_interval_percentiles"](spark, sf_dir).collect()[0]
    assert r["n_reorders"] > 0
    assert 0 <= r["p25_days"] <= r["p50_days"] <= r["p90_days"]


def test_streaming_topk_view_equals_batch_recompute(spark, tmp_path):
    src = str(tmp_path / "src")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    schema = "event_id long, ts timestamp, user_id long, value double"
    t0 = dt.datetime(2024, 1, 1)

    def write_batch(rows, name):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    # batch 1
    write_batch(
        [(1, t0, 1, 10.0), (2, t0, 2, 5.0), (3, t0, 1, 1.0)], "b1"
    )
    q = ingest_files_exactly_once(
        spark,
        src,
        StructType.fromDDL(schema),
        ckpt,
        topk_view_maintenance(spark, state, k=2),
    )
    q.awaitTermination(120)

    # batch 2 arrives later; user 3 overtakes user 2
    write_batch([(4, t0, 3, 50.0), (5, t0, 2, 2.0)], "b2")
    q2 = ingest_files_exactly_once(
        spark,
        src,
        StructType.fromDDL(schema),
        ckpt,
        topk_view_maintenance(spark, state, k=2),
    )
    q2.awaitTermination(120)

    totals = {
        r["user_id"]: (r["n_events"], float(r["total_value"]))
        for r in spark.read.parquet(state + "/totals").collect()
    }
    assert totals == {1: (2, 11.0), 2: (2, 7.0), 3: (1, 50.0)}
    topk = [
        r["user_id"]
        for r in spark.read.parquet(state + "/topk")
        .orderBy(F.desc("total_value"))
        .collect()
    ]
    assert topk == [3, 1]


def test_topk_view_replayed_batch_is_skipped(spark, tmp_path):
    """foreachBatch is at-least-once: re-delivering a batch with the
    same batch_id (driver died between state write and checkpoint
    commit) must NOT double-count."""
    state = str(tmp_path / "state")
    schema = "event_id long, ts timestamp, user_id long, value double"
    t0 = dt.datetime(2024, 1, 1)
    merge = topk_view_maintenance(spark, state, k=2)
    b0 = spark.createDataFrame([(1, t0, 1, 10.0), (2, t0, 2, 5.0)], schema)
    merge(b0, 0)
    merge(b0, 0)  # replay of batch 0
    b1 = spark.createDataFrame([(3, t0, 1, 1.0)], schema)
    merge(b1, 1)
    merge(b1, 1)  # replay of batch 1
    totals = {
        r["user_id"]: (r["n_events"], float(r["total_value"]))
        for r in spark.read.parquet(state + "/totals").collect()
    }
    assert totals == {1: (2, 11.0), 2: (1, 5.0)}


def test_topk_view_recovers_from_crash_between_renames(spark, tmp_path):
    """A crash between 'totals -> backup' and 'staged -> totals' leaves
    only the .__old__ backup; the next batch must restore it and apply
    cleanly on top."""
    import shutil

    state = str(tmp_path / "state")
    schema = "event_id long, ts timestamp, user_id long, value double"
    t0 = dt.datetime(2024, 1, 1)
    merge = topk_view_maintenance(spark, state, k=2)
    merge(spark.createDataFrame([(1, t0, 1, 10.0)], schema), 0)
    # simulate the torn swap: totals moved aside, new dir never landed
    os.rename(state + "/totals", state + "/totals.__old__")
    merge(spark.createDataFrame([(2, t0, 2, 5.0)], schema), 1)
    totals = {
        r["user_id"]: (r["n_events"], float(r["total_value"]))
        for r in spark.read.parquet(state + "/totals").collect()
    }
    assert totals == {1: (1, 10.0), 2: (1, 5.0)}
    assert not os.path.exists(state + "/totals.__old__")
    # crash AFTER the swap but before backup delete: new state wins
    shutil.copytree(state + "/totals", state + "/totals.__old__")
    merge(spark.createDataFrame([(3, t0, 3, 2.0)], schema), 2)
    totals = {
        r["user_id"]: (r["n_events"], float(r["total_value"]))
        for r in spark.read.parquet(state + "/totals").collect()
    }
    assert totals == {1: (1, 10.0), 2: (1, 5.0), 3: (1, 2.0)}
    assert not os.path.exists(state + "/totals.__old__")
