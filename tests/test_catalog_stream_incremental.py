"""Catalog helpers (S11) + the streaming×incremental composition:
file-level exactly-once from the stream checkpoint, row-level anti-dup
from the batch anti-join, together."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from data_engineering_project_spark.plans.workload import gold
from data_engineering_project_spark.sources import catalog
from data_engineering_project_spark.streaming import events as stream_ops


def test_catalog_helpers(spark, sf_dir, tmp_path):
    for name, df in gold(spark, sf_dir).items():
        df.limit(1).createOrReplaceTempView(name)
    catalog.assert_gold_present(spark)
    assert catalog.table_exists(spark, "fact_sales")
    assert "delivery_time_days" in catalog.columns_of(spark, "fact_sales")

    lake = tmp_path / "lake"
    (lake / "gold" / "fact_sales").mkdir(parents=True)
    assert not catalog.lake_table_exists(str(lake), "gold", "fact_sales")  # empty dir
    spark.range(1).write.mode("overwrite").parquet(str(lake / "gold" / "fact_sales"))
    assert catalog.lake_table_exists(str(lake), "gold", "fact_sales")

    schema = catalog.schema_of_parquet(spark, os.path.join(sf_dir, "orders.parquet"))
    assert "o_orderkey" in [f.name for f in schema.fields]

    spark.catalog.dropTempView("dim_time")
    try:
        catalog.assert_gold_present(spark)
        raise AssertionError("should have raised")
    except RuntimeError as e:
        assert "dim_time" in str(e)


def test_stream_plus_antijoin_dedup(spark, sf_dir, tmp_path):
    """A changed file redelivers old rows: the checkpoint alone would
    re-append them; composing the anti-join inside foreachBatch keeps
    row-level exactly-once (the reference's two dedup layers,
    scripts/bronze_incremental.py:266-284)."""
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet")).limit(200)
    first, second = orders.limit(120), orders.subtract(orders.limit(120))
    src, ckpt, bronze = str(tmp_path / "src"), str(tmp_path / "ckpt"), str(tmp_path / "bronze")
    first.coalesce(1).write.mode("append").parquet(src)

    def dedup_append(batch_df, batch_id):
        if os.path.exists(bronze):
            existing = spark.read.parquet(bronze).select("o_orderkey")
            batch_df = batch_df.join(existing, "o_orderkey", "left_anti")
        batch_df = batch_df.localCheckpoint(eager=True)
        if batch_df.count():
            batch_df.write.mode("append").parquet(bronze)

    q = stream_ops.ingest_files_exactly_once(spark, src, orders.schema, ckpt, dedup_append)
    q.awaitTermination(300)
    assert spark.read.parquet(bronze).count() == 120

    # redelivery: a new file containing ALL 200 rows (120 old + 80 new)
    orders.coalesce(1).write.mode("append").parquet(src)
    q2 = stream_ops.ingest_files_exactly_once(spark, src, orders.schema, ckpt, dedup_append)
    q2.awaitTermination(300)
    got = spark.read.parquet(bronze)
    assert got.count() == 200
    assert got.groupBy("o_orderkey").count().filter("count > 1").count() == 0


def test_jsonl_roundtrip_and_corrupt_handling(spark, tmp_path):
    """JSON-lines sink/source: schema-first read keeps parse failures
    observable in _corrupt_record instead of dropping them silently."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from data_engineering_project_spark.sources import json_lines

    df = spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (3, "gamma")], ["id", "name"]
    )
    path = str(tmp_path / "docs_jsonl")
    json_lines.write_jsonl(df, path)

    schema = StructType(
        [StructField("id", LongType()), StructField("name", StringType())]
    )
    back = json_lines.read_jsonl(spark, path, schema)
    assert {(r.id, r.name) for r in back.collect()} == {
        (1, "alpha"),
        (2, "beta"),
        (3, "gamma"),
    }

    # corrupt line: not valid JSON for the declared schema
    bad = tmp_path / "bad.jsonl"
    bad.write_text('{"id": 1, "name": "ok"}\n{not json at all}\n')
    assert json_lines.corrupt_count(spark, str(bad), schema) == 1
    clean = json_lines.read_jsonl(spark, str(bad), schema)
    assert [(r.id, r.name) for r in clean.collect()] == [(1, "ok")]
