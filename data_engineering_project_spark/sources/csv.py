"""CSV source — S1/S2 in SURVEY.md §2.1.

The reference reads raw CSVs two ways: Polars ``read_csv`` for bronze
(etl/tasks/bronze.py:26-30) and BOM-safe Pandas ``read_csv(encoding=
'utf-8-sig')`` + column-name strip (scripts/esplosione_dati.py:122-123).
Bronze keeps everything string-typed ("preserve original fidelity",
README_FASE1.md:36-38); typing happens at silver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

_BOM = "﻿"


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | None = None,
    infer: bool = False,
) -> DataFrame:
    """Header-aware, BOM-tolerant CSV scan with name normalization.

    With neither ``schema`` nor ``infer`` the frame is all-string —
    bronze-layer fidelity (no silent type guesses; silver casts
    explicitly). Column names are stripped of BOM/whitespace like the
    reference's ``columns.str.strip()``.
    """
    reader = spark.read.option("header", "true").option("encoding", "UTF-8")
    if schema is not None:
        reader = reader.schema(schema)
    elif infer:
        reader = reader.option("inferSchema", "true")
    df = reader.csv(path)
    cleaned = [c.replace(_BOM, "").strip() for c in df.columns]
    if cleaned != df.columns:
        df = df.toDF(*cleaned)
    return df
