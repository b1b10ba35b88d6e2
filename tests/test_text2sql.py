"""Rule-based text-to-SQL over the gold views (serving/text2sql.py)
and the remaining serving-surface odds and ends (S13, F17, A9)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_engineering_project_spark.plans import analytics
from data_engineering_project_spark.plans.workload import gold
from data_engineering_project_spark.serving import text2sql
from data_engineering_project_spark.serving.sql import register_gold_views


@pytest.fixture(scope="module")
def gold_views(spark, sf_dir):
    g = gold(spark, sf_dir)
    register_gold_views(spark, g)
    return g


def test_revenue_by_category_matches_dataframe(spark, sf_dir, gold_views):
    df = text2sql.answer(spark, "What is the revenue by category?")
    got = {r.product_category_name: r.total_revenue for r in df.collect()}
    expected = {
        r.product_category_name: r.revenue
        for r in analytics.top_categories(
            gold_views["fact_sales"], gold_views["dim_products"], gold_views["dim_customers"], k=100
        ).collect()
    }
    assert got == expected


def test_filters_and_topk(spark, gold_views):
    df = text2sql.answer(spark, "top 3 categories by revenue... I mean revenue by category, top 3")
    assert df.count() == 3

    df2 = text2sql.answer(spark, "orders by state in state BU")  # mktsegment codes aren't 2 letters; empty ok
    assert df2.columns == ["customer_state", "total_orders"]

    df3 = text2sql.answer(spark, "average delivery by month")
    rows = df3.collect()
    assert rows and df3.columns == ["period", "avg_delivery_days"]


def test_untranslatable_raises():
    with pytest.raises(text2sql.UntranslatableQuestion):
        text2sql.translate("tell me a joke")
    with pytest.raises(text2sql.UntranslatableQuestion):
        text2sql.translate("top 5 revenue")  # top-N without a dimension


def test_groupby_ordinal_and_format_number(spark, gold_views):
    """A9 (GROUP BY ordinal) + F17 (client-side formatting) + S13
    (toPandas serving hop)."""
    df = spark.sql(
        "SELECT c.customer_state, ROUND(SUM(f.price), 2) AS total_revenue "
        "FROM fact_sales f JOIN dim_customers c ON f.customer_id = c.customer_id "
        "GROUP BY 1 ORDER BY 2 DESC"
    )
    rows = df.collect()
    assert len(rows) == 5 and rows[0].total_revenue >= rows[-1].total_revenue

    formatted = df.select(
        "customer_state", F.format_number("total_revenue", 2).alias("display")
    )
    pdf = formatted.toPandas()  # the serving hop — only ever at the edge
    assert len(pdf) == 5 and "," in pdf["display"].iloc[0]


def test_time_window_shapes(spark, gold_views):
    sql = text2sql.translate("revenue by month from 2023-01 to 2023-06")
    assert "BETWEEN '2023-01' AND '2023-06'" in sql
    df = text2sql.answer(spark, "revenue by month from 2023-01 to 2023-06")
    periods = [r.period for r in df.collect()]
    assert all("2023-01" <= p <= "2023-06" for p in periods)

    sql_year = text2sql.translate("total revenue in 2023")
    assert "year(f.order_purchase_timestamp) = 2023" in sql_year

    sql_since = text2sql.translate("orders by state since 2023-05")
    assert ">= '2023-05'" in sql_since


def test_bottom_n_orders_ascending(spark, gold_views):
    sql = text2sql.translate("bottom 3 states by revenue ... revenue by state, bottom 3")
    assert "ASC" in sql.split("ORDER BY")[1] and sql.endswith("LIMIT 3")
    df = text2sql.answer(spark, "revenue by state, bottom 3")
    vals = [r.total_revenue for r in df.collect()]
    assert vals == sorted(vals) and len(vals) == 3
    # bottom-N without a dimension is rejected like top-N
    with pytest.raises(text2sql.UntranslatableQuestion):
        text2sql.translate("bottom 5 revenue")


def test_llm_client_hook_valid_generation_executes(spark, gold_views):
    """generate_fn: the injectable LLM client (reference ai_utils.py:44-47).
    A well-behaved stub's output (markdown fences and all) flows through
    sanitize→guard→execute and returns real results."""
    prompts_seen = []

    def stub_llm(prompt: str) -> str:
        prompts_seen.append(prompt)
        return (
            "Here is your query:\n```sql\n"
            "SELECT ROUND(SUM(f.price), 2) AS total_revenue FROM fact_sales f;\n"
            "```"
        )

    df = text2sql.answer(spark, "what is the total revenue?", generate_fn=stub_llm)
    rows = df.collect()
    assert len(rows) == 1 and rows[0].total_revenue > 0
    # the hook received the full generation prompt with the question inlined
    assert len(prompts_seen) == 1
    assert "what is the total revenue?" in prompts_seen[0]
    assert "fact_sales" in prompts_seen[0]


def test_llm_client_hook_hostile_generation_rejected(spark, gold_views):
    """A hostile/hallucinating generator cannot reach the session: DML,
    multi-statement, and prose-only generations all raise UnsafeSQLError."""
    from data_engineering_project_spark.serving.sql import UnsafeSQLError

    hostile = [
        "DROP TABLE fact_sales",
        "SELECT 1; DROP TABLE fact_sales",
        "WITH x AS (SELECT 1) INSERT INTO fact_sales SELECT * FROM x",
        "I'm sorry, I can't help with that.",
    ]
    for generation in hostile:
        with pytest.raises(UnsafeSQLError):
            text2sql.answer(
                spark, "total revenue", generate_fn=lambda _p, g=generation: g
            )
