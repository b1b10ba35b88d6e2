"""SparkSession factory.

The reference connects to an in-process DuckDB file (etl/utils.py:7-11) —
our equivalent "engine handle" is a SparkSession configured for the
workload:

- **AQE on** (runtime re-planning, skew-join splitting, partition
  coalescing) — replaces DuckDB's adaptive vectorized execution.
- **UTC session timezone** — parquet timestamps in the lake are naive;
  pinning UTC makes date/“dayname” semantics deterministic and identical
  to the DuckDB oracle.
- **Arrow enabled** — cheap toPandas() at the serving edge and fast
  pandas_udf batches.
- **shuffle.partitions** sized by env for local runs; on a real cluster
  AQE coalesces post-shuffle partitions anyway, so an over-estimate is
  safe at 100 TB while a hardcoded small value is not — hence the env
  override rather than a constant.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_DEFAULTS = {
    # Adaptive execution: coalesce shuffle partitions, convert to broadcast
    # joins at runtime, split skewed partitions. Essential at 100 TB.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Deterministic time semantics (naive parquet timestamps == UTC),
    # matching the DuckDB oracle.
    "spark.sql.session.timeZone": "UTC",
    # Arrow for pandas_udf / toPandas.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Parquet TIMESTAMP(NANOS) (e.g. the events table) surfaces as a
    # nanos-since-epoch long; sources.parquet.normalize_nanos converts
    # to a proper timestamp with exact integer division.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # 'EEEE'/weekday patterns etc. behave like java.text with en locale.
    "spark.sql.legacy.timeParserPolicy": "CORRECTED",
    # Relocate derby/warehouse junk out of the repo.
    "spark.sql.warehouse.dir": os.environ.get(
        "SPARK_GRAFT_WAREHOUSE", "/tmp/spark-warehouse"
    ),
    "spark.ui.enabled": "false",
    # No console progress bar: its \r-terminated repaints interleave
    # with stdout when a harness merges streams, breaking one-line
    # machine-readable output contracts (bench.py).
    "spark.ui.showConsoleProgress": "false",
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
}


def get_spark(app_name: str = "data-engineering-project-spark") -> SparkSession:
    """Build (or reuse) the session.

    ``SPARK_GRAFT_CPUS`` controls local parallelism (default ``*``);
    ``spark.sql.shuffle.partitions`` defaults to 2× cores locally — on a
    real cluster this should be set to ~2-3× total executor cores and AQE
    will coalesce down.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    master = os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")
    builder = SparkSession.builder.appName(app_name).master(master)
    n_shuffle = os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32")
    builder = builder.config("spark.sql.shuffle.partitions", n_shuffle)
    for key, value in _DEFAULTS.items():
        builder = builder.config(key, value)
    return builder.getOrCreate()


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
