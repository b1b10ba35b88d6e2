"""Round-3 batch 5: small-file compaction, ORC source/sink, schema
evolution, streaming PII redaction."""

from __future__ import annotations

import datetime as dt
import os

from pyspark.sql import functions as F

from data_engineering_project_spark.operators import pii
from data_engineering_project_spark.sources.layout import compact_small_files
from data_engineering_project_spark.sources.orc import read_orc, write_orc
from data_engineering_project_spark.sources.parquet import read_parquet_merged


def _parquet_files(path):
    return [
        os.path.join(dp, f)
        for dp, _, fs in os.walk(path)
        for f in fs
        if f.endswith(".parquet")
    ]


def test_compaction_reduces_file_count_and_preserves_rows(spark, tmp_path):
    path = str(tmp_path / "many")
    df = spark.range(10_000).withColumn("v", F.col("id") * 2)
    df.repartition(20).write.parquet(path)
    assert len(_parquet_files(path)) == 20
    before = sorted(r["id"] for r in spark.read.parquet(path).collect())

    stats = compact_small_files(spark, path, target_bytes=1 << 30)
    assert stats["files_before"] == 20
    assert stats["files_after"] == 1
    assert len(_parquet_files(path)) == 1
    after_df = spark.read.parquet(path)
    assert sorted(r["id"] for r in after_df.collect()) == before
    assert after_df.filter(F.col("v") != F.col("id") * 2).count() == 0


def test_compaction_with_sort_clusters_rows(spark, tmp_path):
    path = str(tmp_path / "clust")
    spark.range(1000).withColumn(
        "key", (F.col("id") * 7919) % 1000
    ).repartition(8).write.parquet(path)
    compact_small_files(spark, path, target_bytes=1 << 30, sort_within_by=["key"])
    keys = [r["key"] for r in spark.read.parquet(path).collect()]
    assert keys == sorted(keys)


def test_orc_roundtrip_and_filter_pushdown(spark, tmp_path):
    path = str(tmp_path / "orc_tbl")
    df = spark.range(5000).withColumn("bucket", F.col("id") % 10)
    write_orc(df, path)
    back = read_orc(spark, path)
    assert back.count() == 5000
    filtered = back.filter(F.col("bucket") == 3)
    assert filtered.count() == 500
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "bucket" in plan


def test_orc_partitioned_write_prunes_directories(spark, tmp_path):
    path = str(tmp_path / "orc_part")
    df = spark.range(100).withColumn("p", F.col("id") % 4)
    write_orc(df, path, partition_by=["p"])
    assert read_orc(spark, path).filter(F.col("p") == 1).count() == 25


def test_merged_schema_read_unions_old_and_new_files(spark, tmp_path):
    path = str(tmp_path / "evolving")
    spark.range(10).select(F.col("id")).write.parquet(path + "/batch=1")
    spark.range(10).select(
        F.col("id"), F.lit("new").alias("extra")
    ).write.parquet(path + "/batch=2")
    merged = read_parquet_merged(spark, path)
    assert set(merged.columns) >= {"id", "extra"}
    assert merged.count() == 20
    # pre-evolution rows surface as NULL, not as a read failure
    assert merged.filter(F.col("extra").isNull()).count() == 10


def test_streaming_pii_redaction_composes(spark, tmp_path):
    src = str(tmp_path / "stream_src")
    out_rows = []
    spark.createDataFrame(
        [(1, "write to a@b.co now"), (2, "no pii here")],
        "id long, text string",
    ).write.parquet(src)
    stream = spark.readStream.schema("id long, text string").parquet(src)
    redacted = stream.withColumn("redacted", pii.redact(F.col("text")))

    def sink(batch_df, _epoch):
        out_rows.extend(batch_df.select("id", "redacted").collect())

    q = (
        redacted.writeStream.foreachBatch(sink)
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(120)
    got = {r["id"]: r["redacted"] for r in out_rows}
    assert got == {1: "write to [EMAIL] now", 2: "no pii here"}
