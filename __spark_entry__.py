"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship KPI query (two-level aggregate over the gold
                star schema built from sf0.001).
queries()     — every implemented operator from SURVEY.md §2 plus the
                beyond-reference LLM-data-pipeline extensions.
oracle_sql()  — DuckDB twins of each query (see
                data_engineering_project_spark/plans/workload.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from data_engineering_project_spark.plans import workload


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return workload.QUERIES["kpis"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return workload.queries()


def oracle_sql() -> dict[str, str]:
    return workload.oracle_sql()
