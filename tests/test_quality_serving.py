"""DQ gates (M4) and the read-only SQL serving surface (M6)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_engineering_project_spark.plans import quality
from data_engineering_project_spark.plans.workload import gold
from data_engineering_project_spark.serving import sql as serving_sql


def test_profile_single_pass_counts(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    counts = quality.profile(
        li,
        [
            quality.not_null("l_orderkey"),
            quality.ge("l_extendedprice", 0),
            quality.isin("l_returnflag", ("A", "N", "R")),
        ],
    )
    assert counts["__rows"] == li.count()
    assert counts["l_orderkey_not_null"] == 0
    assert counts["l_extendedprice_ge_0"] == 0
    assert counts["l_returnflag_in_domain"] == 0


def test_validate_fail_fast(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    with pytest.raises(quality.DataQualityError, match="in_domain"):
        quality.validate(orders, [quality.isin("o_orderstatus", ("X",))])
    with pytest.raises(quality.DataQualityError, match="empty"):
        quality.validate(orders.filter(F.lit(False)))
    # uniqueness gate: o_orderkey unique, (l_orderkey) not
    quality.validate(orders, unique_keys=[quality.unique(["o_orderkey"])])
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    with pytest.raises(quality.DataQualityError, match="unique_l_orderkey"):
        quality.validate(li, unique_keys=[quality.unique(["l_orderkey"])])


def test_sanitizer_accepts_llm_output():
    raw = "Here is the query:\n```sql\nSELECT 1 AS x;\n```"
    assert serving_sql.sanitize_sql(raw) == "SELECT 1 AS x"
    with_cte = "```WITH t AS (SELECT 1 AS x) SELECT * FROM t```"
    assert serving_sql.sanitize_sql(with_cte).startswith("WITH t AS")


@pytest.mark.parametrize(
    "bad",
    [
        "DROP TABLE fact_sales",
        "SELECT 1; DROP TABLE fact_sales",
        "INSERT INTO fact_sales VALUES (1)",
        "no sql here at all",
        "SELECT * FROM t; SELECT 2",
        "WITH t AS (SELECT 1) INSERT INTO x SELECT * FROM t",
    ],
)
def test_guard_rejects_writes(bad):
    with pytest.raises(serving_sql.UnsafeSQLError):
        serving_sql.guard_select_only(serving_sql.sanitize_sql(bad))


def test_sanitizer_strips_leading_ddl_prose():
    """Prose (or DDL text) before the first SELECT is stripped — the
    surviving statement is the harmless SELECT (ai_utils.py behavior)."""
    assert (
        serving_sql.guard_select_only(
            serving_sql.sanitize_sql("The answer: SELECT 1 AS x")
        )
        == "SELECT 1 AS x"
    )


def test_text_to_sql_execution_path(spark, sf_dir):
    """End-to-end: register gold views, run a 'generated' query."""
    serving_sql.register_gold_views(spark, gold(spark, sf_dir))
    raw = (
        "```sql\n"
        "SELECT c.customer_state, SUM(f.price) AS total_revenue,\n"
        "       COUNT(DISTINCT f.order_id) AS total_orders\n"
        "FROM fact_sales f JOIN dim_customers c ON f.customer_id = c.customer_id\n"
        "GROUP BY c.customer_state ORDER BY total_revenue DESC;\n"
        "```"
    )
    out = serving_sql.run_readonly_sql(spark, raw)
    rows = out.collect()
    assert len(rows) == 5  # 5 mktsegments play customer_state
    assert rows[0].total_revenue >= rows[-1].total_revenue

    # dim_time join path via to_date (SURVEY §1.4 key-mismatch fix)
    out2 = serving_sql.run_readonly_sql(
        spark,
        "SELECT t.year, SUM(f.price) AS total_revenue "
        "FROM fact_sales f JOIN dim_time t ON to_date(f.order_purchase_timestamp) = t.order_date "
        "GROUP BY t.year",
    )
    assert out2.count() >= 2


def test_observed_checks_ride_the_write_pass(spark, tmp_path):
    """observe_checks: metrics come from the write action itself —
    no second scan — and assert_observed gates like validate."""
    df = spark.createDataFrame(
        [(1, "delivered", 5.0), (2, "delivered", -1.0), (3, "bogus", 2.0)],
        "order_id long, order_status string, price double",
    )
    gated, obs = quality.observe_checks(
        df,
        [quality.isin("order_status", ["delivered", "shipped"]), quality.ge("price", 0)],
    )
    gated.write.mode("overwrite").parquet(str(tmp_path / "out"))
    with pytest.raises(quality.DataQualityError) as err:
        quality.assert_observed(obs)
    assert "order_status_in_domain" in str(err.value)
    assert "price_ge_0" in str(err.value)

    clean = df.filter((F.col("order_status") == "delivered") & (F.col("price") >= 0))
    gated2, obs2 = quality.observe_checks(
        clean,
        [quality.isin("order_status", ["delivered", "shipped"]), quality.ge("price", 0)],
        name="dq2",
    )
    gated2.write.mode("overwrite").parquet(str(tmp_path / "out2"))
    counts = quality.assert_observed(obs2)
    assert counts["__rows"] == 1 and counts["price_ge_0"] == 0
