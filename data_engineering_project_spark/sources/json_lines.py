"""JSON-lines source/sink.

Beyond the reference's CSV/Parquet surface (SURVEY.md §2.1): event
feeds and LLM training corpora commonly arrive as newline-delimited
JSON. Spark's native json reader is splittable per line, so a single
100 GB .jsonl file still scans in parallel — but schema inference
requires an extra full pass, so at scale the schema MUST be supplied.
These wrappers make the explicit-schema path the default and keep
corrupt records observable instead of silently dropped.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

CORRUPT_COL = "_corrupt_record"


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType | None = None,
    keep_corrupt: bool = False,
) -> DataFrame:
    """Read newline-delimited JSON.

    With ``schema`` (the scale path) the scan is a single pass and rows
    that fail to parse land in ``_corrupt_record`` (PERMISSIVE mode)
    instead of vanishing; ``keep_corrupt=False`` filters them out after
    counting is possible downstream. Without a schema Spark runs an
    inference pass first — acceptable for small control files only.
    """
    reader = spark.read.option("mode", "PERMISSIVE")
    if schema is not None:
        with_corrupt = StructType(list(schema.fields)).add(CORRUPT_COL, "string")
        reader = reader.schema(with_corrupt).option(
            "columnNameOfCorruptRecord", CORRUPT_COL
        )
    df = reader.json(path)
    if schema is not None and not keep_corrupt:
        df = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    return df


def corrupt_count(spark: SparkSession, path: str, schema: StructType) -> int:
    """DQ probe: how many lines fail the declared schema.

    Spark disallows queries that touch ONLY ``_corrupt_record`` on a raw
    JSON scan (QUERY_ONLY_CORRUPT_RECORD_COLUMN), so the parsed frame is
    cached for the count then released — the sanctioned pattern. For a
    100 TB feed, prefer folding this count into the main read as an
    ``Observation`` on the already-parsed frame instead of a second scan.
    """
    df = read_jsonl(spark, path, schema, keep_corrupt=True).cache()
    try:
        return df.filter(F.col(CORRUPT_COL).isNotNull()).count()
    finally:
        df.unpersist()


def write_jsonl(
    df: DataFrame, path: str, mode: str = "overwrite", partition_by: list[str] | None = None
) -> None:
    """Write newline-delimited JSON (one object per line, one file per
    partition — the interchange format for downstream tokenizer/
    training jobs that don't read parquet)."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.json(path)
