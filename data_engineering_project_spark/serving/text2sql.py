"""Deterministic text-to-SQL for the gold star schema.

The reference sends questions to Gemini and executes the returned SQL
read-only (dashboard/ai_utils.py). This module supplies the in-repo,
network-free half of that surface: a rule-based translator for the
question shapes the dashboard actually answers (metric × dimension ×
state-filter × top-k), emitting Spark-SQL with the reference's
canonical aliases (ai_utils.py:34-41). An external LLM can still be
used — its output goes through the same sanitize→guard→execute path
(serving/sql.py); this translator is the deterministic fallback and
the test harness for the execution surface.
"""

from __future__ import annotations

import re
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from data_engineering_project_spark.serving.sql import (
    TEXT_TO_SQL_PROMPT,
    run_readonly_sql,
)

# metric keyword → (SELECT expression, canonical alias)
_METRICS = {
    "revenue": ("ROUND(SUM(f.price), 2)", "total_revenue"),
    "sales": ("ROUND(SUM(f.price), 2)", "total_revenue"),
    "orders": ("COUNT(DISTINCT f.order_id)", "total_orders"),
    "delivery": ("ROUND(AVG(f.delivery_time_days), 2)", "avg_delivery_days"),
    "freight": ("ROUND(AVG(f.freight_value), 2)", "avg_freight"),
}

# dimension keyword → (GROUP BY expression, output alias, needed join)
_DIMENSIONS = {
    "category": ("p.product_category_name", "product_category_name", "products"),
    "state": ("c.customer_state", "customer_state", "customers"),
    "city": ("c.customer_city", "customer_city", "customers"),
    "month": ("date_format(f.order_purchase_timestamp, 'yyyy-MM')", "period", None),
    "weekday": ("date_format(f.order_purchase_timestamp, 'EEEE')", "day_of_week", None),
    "year": ("year(f.order_purchase_timestamp)", "year", None),
}

_JOINS = {
    "customers": "JOIN dim_customers c ON f.customer_id = c.customer_id",
    "products": "JOIN dim_products p ON f.product_id = p.product_id",
}


class UntranslatableQuestion(ValueError):
    pass


def translate(question: str) -> str:
    """Question → Spark SQL over the gold views.

    Understands: a metric (revenue/sales/orders/delivery/freight),
    optionally "by <dimension>", optionally "in state XX[, YY]",
    optionally "top N" / "bottom N", optionally a time window
    ("in 2023", "from 2023-01 to 2023-06", "since 2023-05").
    """
    q = question.lower()
    metric = next((m for m in _METRICS if m in q), None)
    if metric is None:
        raise UntranslatableQuestion(
            f"no metric keyword in {question!r}; known: {sorted(_METRICS)}"
        )
    expr, alias = _METRICS[metric]

    dim = next((d for d in _DIMENSIONS if re.search(rf"\b(by|per)\s+{d}", q)), None)
    joins: list[str] = []
    select = [f"{expr} AS {alias}"]
    group = ""
    order = ""
    bottom = re.search(r"\b(bottom|lowest|worst)\s+(\d+)", q)
    if dim:
        dim_expr, dim_alias, join = _DIMENSIONS[dim]
        select.insert(0, f"{dim_expr} AS {dim_alias}")
        group = f"GROUP BY {dim_expr}"
        direction = "ASC" if bottom else "DESC"
        order = f"ORDER BY {alias} {direction}, {dim_alias} ASC"
        if join:
            joins.append(_JOINS[join])

    conds: list[str] = []
    states = re.search(r"in state[s]?\s+((?:[a-z]{2})(?:\s*,\s*[a-z]{2})*)", q)
    if states:
        codes = ", ".join(f"'{s.strip().upper()}'" for s in states.group(1).split(","))
        if _JOINS["customers"] not in joins:
            joins.append(_JOINS["customers"])
        conds.append(f"c.customer_state IN ({codes})")

    # month range: "from 2023-01 to 2023-06" / "between 2023-01 and 2023-06"
    span = re.search(
        r"(?:from|between)\s+(\d{4}-\d{2})\s+(?:to|and)\s+(\d{4}-\d{2})", q
    )
    if span:
        lo, hi = span.group(1), span.group(2)
        conds.append(
            f"date_format(f.order_purchase_timestamp, 'yyyy-MM') BETWEEN '{lo}' AND '{hi}'"
        )
    else:
        # bare year filter: "in 2023" (but not the year-dimension case)
        year = re.search(r"\b(?:in|during|for)\s+(\d{4})\b", q)
        if year:
            conds.append(f"year(f.order_purchase_timestamp) = {int(year.group(1))}")
        since = re.search(r"since\s+(\d{4}-\d{2})", q)
        if since:
            conds.append(
                f"date_format(f.order_purchase_timestamp, 'yyyy-MM') >= '{since.group(1)}'"
            )

    where = f"WHERE {' AND '.join(conds)}" if conds else ""

    limit = ""
    top = re.search(r"top\s+(\d+)", q) or bottom
    if top:
        if not dim:
            raise UntranslatableQuestion("top-N/bottom-N needs a 'by <dimension>'")
        limit = f"LIMIT {int(top.group(top.lastindex or 1))}"

    parts = ["SELECT", ", ".join(select), "FROM fact_sales f", *joins, where, group, order, limit]
    return " ".join(p for p in parts if p)


def answer(
    spark: SparkSession,
    question: str,
    generate_fn: Callable[[str], str] | None = None,
) -> DataFrame:
    """Translate and execute through the read-only guard path.

    ``generate_fn`` is the injectable LLM-client hook (the reference's
    Gemini call, dashboard/ai_utils.py:44-47): it receives the full
    generation prompt (TEXT_TO_SQL_PROMPT with the question inlined)
    and returns the raw model text. Whatever it returns — markdown
    fences, prose, or a hostile statement — flows through the SAME
    sanitize→guard→execute path as the deterministic translator, so a
    malicious or malformed generation raises UnsafeSQLError instead of
    reaching the session. With no ``generate_fn`` the deterministic
    rule-based translator is used (network-free default).
    """
    if generate_fn is not None:
        raw = generate_fn(TEXT_TO_SQL_PROMPT.format(question=question))
        return run_readonly_sql(spark, raw)
    return run_readonly_sql(spark, translate(question))
