"""data_engineering_project_spark — a PySpark-native analytics engine.

A ground-up re-expression of the capabilities of the reference repo
``AlessiaSanfi/Data-Engineering-Project`` (a DuckDB/Polars/Pandas medallion
ETL + dashboard system; see SURVEY.md) as an idiomatic Apache Spark
library:

- ``session``     — SparkSession factory tuned for the workload (AQE,
                    sensible shuffle partitioning, UTC session time).
- ``sources``     — CSV/Parquet readers & writers, catalog helpers, the
                    file-ingestion manifest, and the processing-ledger
                    control table (reference: scripts/esplosione_dati.py,
                    scripts/bronze_incremental.py).
- ``functions``   — scalar expression helpers mirroring the reference's
                    SQL surface (date_diff day semantics, dayname, period
                    keys) plus text-analysis expressions.
- ``operators``   — reusable dataflow operators: broadcast dim joins,
                    two-level (order-grain collapse) aggregation,
                    dedup (exact / MinHash-LSH / SimHash / n-gram
                    Jaccard), similarity search, sessionization.
- ``plans``       — the medallion pipeline (bronze → silver → gold star
                    schema), the 7-query analytics workload, and the
                    incremental ingestion plan.
- ``streaming``   — Structured Streaming equivalents of the reference's
                    micro-batch incremental path, plus windowed event
                    aggregation.
- ``multimodal``  — opaque-binary column plumbing (decode stubs).
- ``serving``     — read-only SQL surface (text-to-SQL execution target).

Everything here is DataFrame/SQL-first: logical plans are declared
declaratively and Catalyst/Tungsten pick the physical strategy. Python
UDFs appear only where Spark's built-ins genuinely cannot express the
semantics, and then always as Arrow-batched pandas UDFs.
"""

__version__ = "0.1.0"

from data_engineering_project_spark.session import get_spark, stop_spark  # noqa: F401
