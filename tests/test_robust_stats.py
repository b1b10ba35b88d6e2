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
