"""Two-phase global ordering (operators/order_stats.py): exact equivalence
with the single-partition window forms it replaces, across partition
counts that do and don't divide the data, descending keys, frames
smaller than the partition count, and empty frames — plus a plan
assertion that the row-number path really contains no WindowExec.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from data_engineering_project_spark.operators import order_stats


def _frame(spark, n=997, seed=7):
    # deterministic pseudo-random values with duplicates in `v` (the
    # tiebreak column `i` restores a total order — the module contract)
    return spark.range(n).select(
        F.col("id").alias("i"),
        (F.xxhash64(F.col("id") + seed) % 113).alias("v"),
        (F.xxhash64(F.col("id") * 31 + seed) % 1000).cast("double").alias("x"),
    )


@pytest.mark.parametrize("p", [1, 4, 7])
def test_global_row_number_matches_window(spark, p):
    df = _frame(spark)
    order = [F.asc("v"), F.asc("i")]
    got = {
        r["i"]: r["rn"]
        for r in order_stats.global_row_number(df, order, num_partitions=p).collect()
    }
    w = Window.orderBy(F.asc("v"), F.asc("i"))
    want = {
        r["i"]: r["rn"]
        for r in df.select("i", F.row_number().over(w).alias("rn")).collect()
    }
    assert got == want


def test_global_row_number_desc_order(spark):
    df = _frame(spark, n=500)
    order = [F.desc("x"), F.asc("i")]
    got = {
        r["i"]: r["rn"]
        for r in order_stats.global_row_number(df, order, num_partitions=5).collect()
    }
    w = Window.orderBy(F.desc("x"), F.asc("i"))
    want = {
        r["i"]: r["rn"]
        for r in df.select("i", F.row_number().over(w).alias("rn")).collect()
    }
    assert got == want


@pytest.mark.parametrize("n_tiles", [4, 10, 13])
def test_global_ntile_matches_window(spark, n_tiles):
    df = _frame(spark, n=1003)
    order = [F.asc("v"), F.asc("i")]
    got = {
        r["i"]: r["t"]
        for r in order_stats.global_ntile(
            df, order, n_tiles, out="t", num_partitions=6
        ).collect()
    }
    w = Window.orderBy(F.asc("v"), F.asc("i"))
    want = {
        r["i"]: r["t"]
        for r in df.select("i", F.ntile(n_tiles).over(w).alias("t")).collect()
    }
    assert got == want


def test_global_ntile_fewer_rows_than_tiles(spark):
    df = _frame(spark, n=3)
    got = sorted(
        r["t"]
        for r in order_stats.global_ntile(
            df, [F.asc("i")], 10, out="t", num_partitions=4
        ).collect()
    )
    assert got == [1, 2, 3]


def test_global_cumsum_matches_window(spark):
    df = _frame(spark, n=800)
    order = [F.asc("v"), F.asc("i")]
    got = {
        r["i"]: r["c"]
        for r in order_stats.global_cumsum(
            df, order, "x", out="c", num_partitions=5
        ).collect()
    }
    w = Window.orderBy(F.asc("v"), F.asc("i")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    want = {
        r["i"]: r["c"]
        for r in df.select("i", F.sum("x").over(w).alias("c")).collect()
    }
    assert got.keys() == want.keys()
    for k in got:
        assert got[k] == pytest.approx(want[k], rel=1e-12)


def test_global_cumsum_long_values_exact(spark):
    # the sweep-line use case: ±1 deltas, running sum must be EXACT
    df = spark.range(600).select(
        F.col("id").alias("i"),
        F.when(F.col("id") % 3 == 0, -1).otherwise(1).alias("d"),
    )
    got = {
        r["i"]: r["c"]
        for r in order_stats.global_cumsum(
            df, [F.asc("i")], "d", out="c", num_partitions=7
        ).collect()
    }
    w = Window.orderBy(F.asc("i")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    want = {
        r["i"]: r["c"]
        for r in df.select("i", F.sum("d").over(w).alias("c")).collect()
    }
    assert got == want


def test_global_cumsum_multi_column(spark):
    df = spark.range(300).select(
        F.col("id").alias("i"),
        (F.col("id") % 5).alias("a"),
        (F.col("id") % 7).alias("b"),
    )
    got = {
        r["i"]: (r["ca"], r["cb"])
        for r in order_stats.global_cumsum(
            df, [F.asc("i")], ["a", "b"], out=["ca", "cb"], num_partitions=4
        ).collect()
    }
    w = Window.orderBy(F.asc("i")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    want = {
        r["i"]: (r["ca"], r["cb"])
        for r in df.select(
            "i", F.sum("a").over(w).alias("ca"), F.sum("b").over(w).alias("cb")
        ).collect()
    }
    assert got == want


def test_global_cumsum_decimal_exact(spark):
    from decimal import Decimal

    df = spark.range(200).select(
        F.col("id").alias("i"),
        (F.col("id").cast("decimal(38,6)") / 7).cast("decimal(38,6)").alias("d"),
    )
    got = {
        r["i"]: r["c"]
        for r in order_stats.global_cumsum(
            df, [F.asc("i")], "d", out="c", num_partitions=5
        ).collect()
    }
    w = Window.orderBy(F.asc("i")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    want = {
        r["i"]: r["c"]
        for r in df.select("i", F.sum("d").over(w).alias("c")).collect()
    }
    assert got == want
    assert all(isinstance(v, Decimal) for v in got.values())


def test_empty_frame(spark):
    df = _frame(spark, n=0)
    assert order_stats.global_row_number(df, [F.asc("i")], num_partitions=4).count() == 0
    assert order_stats.global_ntile(df, [F.asc("i")], 4, num_partitions=4).count() == 0
    assert order_stats.global_cumsum(df, [F.asc("i")], "x", num_partitions=4).count() == 0


def test_row_number_plan_has_no_window(spark):
    """The whole point: the row-number path must plan WITHOUT any
    WindowExec (and therefore without Exchange SinglePartition)."""
    df = _frame(spark, n=100)
    out = order_stats.global_row_number(df, [F.asc("v"), F.asc("i")], num_partitions=4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "Exchange SinglePartition" not in plan


def test_cumsum_plan_window_is_partitioned(spark):
    df = _frame(spark, n=100)
    out = order_stats.global_cumsum(df, [F.asc("v"), F.asc("i")], "x", num_partitions=4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange SinglePartition" not in plan
    # the local-cumsum window partitions by _gpid
    assert "windowspecdefinition(_gpid" in plan


def test_global_cumsum_null_values_match_window(spark):
    """SQL NULL semantics (ADVICE r06): rows whose entire global
    prefix is NULL stay NULL; an all-NULL prefix INSIDE a later range
    partition still carries the prior partitions' running total."""
    # first ~150 rows NULL (covers whole leading partitions at p=5),
    # then alternating NULL/value so later partitions open with NULLs
    df = spark.range(600).select(
        F.col("id").alias("i"),
        F.when(
            (F.col("id") < 150) | (F.col("id") % 2 == 0), F.lit(None)
        )
        .otherwise(F.col("id").cast("double"))
        .alias("x"),
    )
    got = {
        r["i"]: r["c"]
        for r in order_stats.global_cumsum(
            df, [F.asc("i")], "x", out="c", num_partitions=5
        ).collect()
    }
    w = Window.orderBy(F.asc("i")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    want = {
        r["i"]: r["c"]
        for r in df.select("i", F.sum("x").over(w).alias("c")).collect()
    }
    assert got.keys() == want.keys()
    for k in got:
        if want[k] is None:
            assert got[k] is None
        else:
            assert got[k] == pytest.approx(want[k], rel=1e-12)


def test_global_ntile_multi_matches_chained(spark):
    """Concurrent multi-NTILE == three chained single NTILEs (and
    therefore == the single-window SQL form each already matches)."""
    df = _frame(spark, n=503).withColumn(
        "y", (F.xxhash64(F.col("i") * 7 + 1) % 321).cast("double")
    )
    multi = {
        r["i"]: (r["a"], r["b"])
        for r in order_stats.global_ntile_multi(
            df,
            ["i"],
            [
                ([F.asc("v"), F.asc("i")], 4, "a"),
                ([F.desc("y"), F.asc("i")], 7, "b"),
            ],
            num_partitions=5,
        ).collect()
    }
    chained = {
        r["i"]: (r["a"], r["b"])
        for r in order_stats.global_ntile(
            order_stats.global_ntile(
                df, [F.asc("v"), F.asc("i")], 4, out="a", num_partitions=5
            ),
            [F.desc("y"), F.asc("i")],
            7,
            out="b",
            num_partitions=5,
        ).collect()
    }
    assert multi == chained
