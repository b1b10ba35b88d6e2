"""Streaming: static-dim enrichment join and watermark late-data
accounting — the two operational proofs a streaming deployment needs."""

from __future__ import annotations

import datetime as dt
import os

from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def test_stream_static_broadcast_enrichment(spark, tmp_path):
    src = str(tmp_path / "src")
    schema = "event_id long, ts timestamp, user_id long, value double"
    t0 = dt.datetime(2024, 1, 1)
    spark.createDataFrame(
        [(1, t0, 1, 5.0), (2, t0, 2, 7.0), (3, t0, 9, 1.0)], schema
    ).coalesce(1).write.parquet(src)
    segments = spark.createDataFrame(
        [(1, "gold"), (2, "silver")], "user_id long, segment string"
    )
    out = []

    stream = spark.readStream.schema(schema).parquet(src)
    enriched = stream.join(F.broadcast(segments), "user_id", "left")

    def sink(batch_df, _):
        out.extend(batch_df.select("event_id", "segment").collect())

    q = (
        enriched.writeStream.foreachBatch(sink)
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    q.awaitTermination(120)
    got = {r["event_id"]: r["segment"] for r in out}
    assert got == {1: "gold", 2: "silver", 3: None}


def test_watermark_drops_late_rows_and_accounts_for_them(spark, tmp_path):
    src = str(tmp_path / "wm_src")
    os.makedirs(src)
    schema = "event_id long, ts timestamp, user_id long, value double"
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)

    stream = spark.readStream.schema(schema).parquet(src)
    counts = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "5 minutes"))
        .agg(F.count("*").alias("n"))
    )
    results = []

    def sink(batch_df, _):
        results.extend(batch_df.collect())

    # batch 1: on-time rows advance the watermark to 12:50
    spark.createDataFrame(
        [(1, t0, 1, 1.0), (2, t0 + dt.timedelta(hours=1), 1, 1.0)], schema
    ).coalesce(1).write.mode("append").parquet(src)
    ck = str(tmp_path / "wm_ck")
    q = (
        counts.writeStream.outputMode("update")
        .foreachBatch(sink)
        .trigger(availableNow=True)
        .option("checkpointLocation", ck)
        .start()
    )
    q.awaitTermination(120)

    # batch 2: one row 2h older than the watermark -> dropped
    spark.createDataFrame(
        [(3, t0 - dt.timedelta(hours=2), 1, 1.0),
         (4, t0 + dt.timedelta(hours=1, minutes=1), 1, 1.0)],
        schema,
    ).coalesce(1).write.mode("append").parquet(src)
    dropped = []
    q2 = (
        counts.writeStream.outputMode("update")
        .foreachBatch(sink)
        .trigger(availableNow=True)
        .option("checkpointLocation", ck)
        .start()
    )
    q2.awaitTermination(120)
    for p in q2.recentProgress:
        for op in p["stateOperators"]:
            dropped.append(op["numRowsDroppedByWatermark"])
    assert sum(dropped) >= 1, "the 2h-late row must be dropped AND counted"
    # and the late row's window never appears in emitted results
    late_window_start = t0 - dt.timedelta(hours=2)
    emitted_windows = {r["window"]["start"] for r in results}
    assert late_window_start not in emitted_windows
