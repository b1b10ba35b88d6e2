"""Parquet source/sink — S3/S4/S5 in SURVEY.md §2.1.

The reference's lake is one parquet file per table (plus one per
order-month, scripts/esplosione_dati.py:144-191). At 100 TB the same
layout becomes directory-per-table with explicit partition columns, so
the writer here exposes ``partition_by`` and the reader accepts globs.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Parquet scan (glob-capable). Column pruning and predicate pushdown
    are delegated to Catalyst — callers should ``select``/``filter`` on
    the returned frame and let the optimizer reach the scan."""
    return spark.read.parquet(path)


def read_parquet_merged(spark: SparkSession, path: str) -> DataFrame:
    """Parquet scan with schema evolution: union the footers' schemas
    (``mergeSchema``) so files written before a column was added read
    as NULL in that column instead of failing. Costs one footer read
    per file at planning time — enable only on tables that actually
    evolved; steady-state tables should pin a read schema."""
    return spark.read.option("mergeSchema", "true").parquet(path)


def normalize_nanos(df: DataFrame, col: str) -> DataFrame:
    """Convert a nanos-since-epoch long (parquet TIMESTAMP(NANOS) read
    under ``spark.sql.legacy.parquet.nanosAsLong``) to TimestampType.

    ``DIV 1000`` is exact integer division — a double round-trip would
    lose sub-microsecond precision at 2024-era epochs (>2^53 ns).
    Matches DuckDB's ns→µs truncation.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    if isinstance(df.schema[col].dataType, LongType):
        return df.withColumn(col, F.timestamp_micros(F.expr(f"{col} DIV 1000")))
    return df


def read_testdata(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    """Load one driver-generated table from an sf directory."""
    df = spark.read.parquet(os.path.join(sf_dir, f"{table}.parquet"))
    if table == "events":
        df = normalize_nanos(df, "ts")
    return df


def register_testdata_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view (serving/SQL surface)."""
    for table in TESTDATA_TABLES:
        path = os.path.join(sf_dir, f"{table}.parquet")
        if os.path.exists(path):
            read_parquet(spark, path).createOrReplaceTempView(table)


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    """Parquet sink (the reference's universal CTAS materialization, S5).

    ``partition_by`` maps the reference's one-file-per-month layout to a
    partitioned directory that Catalyst can partition-prune at read time.
    """
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)
