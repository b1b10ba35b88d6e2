"""operators/robust.py: exact vs approx-percentile MAD paths."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_engineering_project_spark.operators import robust
from data_engineering_project_spark.plans import workload


def test_exact_median_mad_on_known_values(spark):
    df = spark.createDataFrame(
        [(float(v),) for v in [1, 2, 3, 4, 100]], "v double"
    )
    med, mad = robust.median_mad(df, "v", exact=True)
    assert med == 3.0
    # deviations |v-3| = [2,1,0,1,97] → median 1
    assert mad == 1.0


def test_approx_path_matches_exact_at_small_n(spark, sf_dir):
    """approx_percentile guarantees rank error <= n/accuracy; with
    accuracy >> n the sketch is exact, so both backends must flag the
    identical outlier set."""
    orders = workload.load(spark, sf_dir, "orders")
    exact = robust.mad_outlier_flags(orders, "o_totalprice", exact=True)
    approx = robust.mad_outlier_flags(
        orders, "o_totalprice", exact=False, accuracy=1_000_000
    )
    ne = exact.agg(F.sum("is_out")).collect()[0][0]
    na = approx.agg(F.sum("is_out")).collect()[0][0]
    assert ne == na
    assert exact.count() == approx.count() == orders.count()


def test_approx_path_flags_planted_outliers(spark):
    rows = [(float(v),) for v in range(1000)] + [(1e9,), (-1e9,)]
    df = spark.createDataFrame(rows, "v double")
    flagged = robust.mad_outlier_flags(df, "v", exact=False)
    out = flagged.filter("is_out = 1").select("v").collect()
    vals = sorted(r["v"] for r in out)
    assert vals[0] == -1e9 and vals[-1] == 1e9


def test_workload_entry_uses_exact_path(spark, sf_dir):
    rows = workload.QUERIES["order_price_mad_outliers"](
        spark, sf_dir
    ).collect()
    assert len(rows) == 5
    for r in rows:
        assert 0 <= r["n_outliers"] <= r["n_orders"]


def test_exact_order_statistic_small_path_matches_sorted(spark):
    import random

    rng = random.Random(7)
    vals = [round(rng.uniform(0, 100), 2) for _ in range(5000)]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    s = sorted(vals)
    for k in (1, 17, 2500, 4750, 5000):
        assert robust.exact_order_statistic(df, "v", k, len(vals)) == s[k - 1]


def test_exact_order_statistic_sketch_path_matches_sorted(spark):
    import random

    rng = random.Random(11)
    # ties on purpose: 2dp rounding collapses many values
    vals = [round(rng.uniform(0, 50), 2) for _ in range(30000)]
    df = spark.createDataFrame([(v,) for v in vals], "v double").repartition(8)
    s = sorted(vals)
    n = len(vals)
    # accuracy=1000 forces the sketch+band path (n > 10*accuracy)
    for k in (1, n // 2, int(0.95 * n), n):
        got = robust.exact_order_statistic(df, "v", k, n, accuracy=1000)
        assert got == s[k - 1], k


def test_exact_quantile_disc_matches_rank_formula(spark):
    import math
    import random

    rng = random.Random(3)
    vals = [round(rng.gauss(0, 10), 3) for _ in range(20000)]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    s = sorted(vals)
    for q in (0.5, 0.95, 0.99):
        n, got = robust.exact_quantile_disc(df, "v", q, accuracy=1000)
        assert n == len(vals)
        assert got == s[math.ceil(q * n) - 1], q


def test_exact_quantile_disc_empty_frame(spark):
    df = spark.createDataFrame([], "v double")
    n, got = robust.exact_quantile_disc(df, "v", 0.95)
    assert n == 0 and got is None


def test_exact_order_statistics_multi_matches_single(spark):
    """r13: the fused multi-rank path returns exactly what the
    single-rank path returns, on both the small (distinct-counts) and
    the sketch-bracketed code paths, ties included."""
    import math

    vals = [float(x % 97) for x in range(3000)] + [5.0] * 40
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    n = len(vals)
    ks = [1, math.ceil(0.5 * n), math.ceil(0.95 * n), n]
    # small path (n <= 10*accuracy)
    multi = robust.exact_order_statistics(df, "v", ks, n)
    singles = [robust.exact_order_statistic(df, "v", k, n) for k in ks]
    assert multi == singles
    # sketch path (accuracy small enough that n > 10*accuracy)
    multi_sk = robust.exact_order_statistics(df, "v", ks, n, accuracy=100)
    singles_sk = [
        robust.exact_order_statistic(df, "v", k, n, accuracy=100)
        for k in ks
    ]
    assert multi_sk == singles_sk
