"""Data-layout control for parquet lakes: clustered (range + sorted)
writes.

The reference's lake is one file per order-month
(scripts/esplosione_dati.py:144-154) — partition pruning by month and
nothing else. At 100 TB a second layout lever matters: parquet
row-group min/max statistics only prune a scan when values are
*clustered*, i.e. each row group covers a narrow range of the filter
column. A shuffle-randomized write gives every row group the full
value range — statistics become useless and a point query reads the
whole table.

``write_clustered`` = ``repartitionByRange(cluster_by)`` (each output
file owns a contiguous, disjoint range — Spark samples the column to
build balanced range bounds) + ``sortWithinPartitions`` (row groups
WITHIN a file are sub-clustered, so even intra-file pruning works).
That is exactly the layout Delta's OPTIMIZE ZORDER BY degenerates to
for a single cluster column, without the table format: a point or
range predicate touches ~1/N of the files instead of all of them.

Composes with hive partitioning: ``partition_by`` gives coarse
directory pruning (e.g. month), ``cluster_by`` fine-grained stat
pruning within each directory (e.g. user id).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_clustered(
    df: DataFrame,
    path: str,
    cluster_by: list[str],
    partition_by: list[str] | None = None,
    num_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Write parquet clustered on ``cluster_by``.

    ``num_files`` bounds output file count (defaults to Spark's range
    partitioning of ``spark.sql.shuffle.partitions``). One shuffle —
    the same cost a plain repartition write would pay, but the range
    exchange buys pruning forever after.
    """
    cols = [df[c] for c in cluster_by]
    if num_files is not None:
        clustered = df.repartitionByRange(num_files, *cols)
    else:
        clustered = df.repartitionByRange(*cols)
    clustered = clustered.sortWithinPartitions(*cols)
    writer = clustered.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)
