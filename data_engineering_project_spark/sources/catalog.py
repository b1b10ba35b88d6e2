"""Catalog introspection helpers — S11 in SURVEY.md §2.1.

The reference probes ``information_schema.tables`` and ``DESCRIBE``
output for existence/column checks (scripts/bronze_incremental.py:56-63,
dashboard/app_fase2.py:56-65, CI smoke checks). Spark equivalents over
``spark.catalog`` plus lake-directory probes for path-registered tables.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession
from pyspark.sql.types import StructType


def table_exists(spark: SparkSession, name: str) -> bool:
    """Temp-view or catalog-table existence probe."""
    return spark.catalog.tableExists(name)


def lake_table_exists(lake_dir: str, layer: str, name: str) -> bool:
    """Existence probe for a path-registered lake table (the reference's
    information_schema check against its DB file)."""
    path = os.path.join(lake_dir, layer, name)
    return os.path.isdir(path) and any(
        f.endswith(".parquet") for f in os.listdir(path)
    )


def columns_of(spark: SparkSession, name: str) -> list[str]:
    """DESCRIBE-equivalent column list."""
    return [f.name for f in spark.table(name).schema.fields]


def schema_of_parquet(spark: SparkSession, path: str) -> StructType:
    """Schema probe used for LIMIT-0 schema freezing (S6,
    scripts/bronze_incremental.py:163-173)."""
    return spark.read.parquet(path).schema


def assert_gold_present(spark: SparkSession, tables: tuple[str, ...] = (
    "fact_sales", "dim_customers", "dim_products", "dim_time",
)) -> None:
    """The CI smoke gate (.github/workflows/pipeline.yml:51-83): all gold
    tables must exist before serving starts."""
    missing = [t for t in tables if not table_exists(spark, t)]
    if missing:
        raise RuntimeError(f"gold tables missing: {missing}")
