"""ORC source/sink — the second columnar format big lakes actually mix.

Spark ships native ORC support (no extra package): the same Catalyst
scan machinery — column pruning, predicate pushdown into ORC's
stripe/row-group statistics, partition-directory pruning — applies
unchanged, so every operator in this engine runs identically over ORC
inputs. This module exists so pipelines migrating between formats (or
reading a mixed lake) go through one seam.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)


def write_orc(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)
