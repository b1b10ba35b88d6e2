"""Bucketed tables — shuffle-free co-located joins.

At 100 TB the orders⋈items fact build is the dominant shuffle. Writing
both sides bucketed (and sorted) by the join key means Spark's
sort-merge join reads co-located buckets with **zero exchange on
either side** — the shuffle is paid once at write time and amortized
over every downstream join/aggregation on that key.

Bucketing requires the session catalog (``saveAsTable``) — plain
``.parquet(path)`` writes drop bucket metadata.
"""

from __future__ import annotations

import shutil
from urllib.parse import urlparse

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
) -> None:
    """Materialize as a bucketed (+sorted) managed table. Equal
    ``num_buckets`` on both join sides is required for exchange-free
    joins; sorting within buckets additionally removes the sort stage."""
    spark = df.sparkSession
    # DROP leaves the managed location behind when the catalog is fresh
    # (new session, old warehouse dir) — clear both.
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    if warehouse:
        shutil.rmtree(f"{warehouse.rstrip('/')}/{table.lower()}", ignore_errors=True)
    writer = df.write.mode("overwrite").bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.format("parquet").saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str | list[str]
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key; with matching
    bucket counts the plan shows SortMergeJoin with no Exchange."""
    return spark.table(left_table).join(spark.table(right_table), key)
