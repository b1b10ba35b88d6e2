"""Streaming twin of the incremental embedding near-dup loop
(streaming/vectors.py): batch-equivalence, the cross-batch index
fold, and exactly-once under micro-batch replay."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from data_engineering_project_spark.operators import ann_index, similarity
from data_engineering_project_spark.plans import workload
from data_engineering_project_spark.sources.txlog import TransactionalTable
from data_engineering_project_spark.streaming import vectors as vec_stream


def _perturbed(spark, emb, every: int, offset: int):
    return emb.filter(F.col("vec_id") % every == 0).select(
        (F.col("vec_id") + offset).alias("vec_id"),
        F.expr(
            "transform(embedding, (x, i) -> x * CAST(1.0 + 0.003 *"
            " IF(pmod(xxhash64(concat(CAST(vec_id AS STRING), ':',"
            " CAST(i AS STRING))), 2) = 0, 1.0, -1.0) AS FLOAT))"
        ).alias("embedding"),
    )


def test_streamed_pairs_match_batch_operator(spark, sf_dir, tmp_path):
    """Two vector files land as a stream: micro-batch 1's emitted
    pairs equal the batch operator's output on the pre-batch index,
    and micro-batch 2 — exact copies of batch 1's rows — finds its
    batch-1 twins because the sink folded batch 1 into the index
    (tomorrow's batch sees tonight's rows, now as a stream)."""
    emb = workload.load(spark, sf_dir, "embeddings")
    index_path = str(tmp_path / "index")
    ann_index.build_index(emb, index_path, k_cells=8, iters=2)
    cents = spark.read.parquet(index_path + "/centroids")

    batch1 = _perturbed(spark, emb, 7, 10_000_000).localCheckpoint(eager=True)
    # expected for batch 1: the in-memory operator against the
    # pre-batch corpus under the same frozen quantizer
    want1 = sorted(
        map(
            tuple,
            similarity.embedding_near_dups_incremental(
                emb, batch1, threshold=0.99, n_probe=3, cents=cents
            ).collect(),
        )
    )
    assert want1, "fixture must plant at least one near-dup pair"

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    table = TransactionalTable(spark, str(tmp_path / "pairs"))
    batch1.coalesce(1).write.mode("append").parquet(src)
    q = vec_stream.near_dup_ingest_stream(
        spark, src, batch1.schema, ckpt, index_path, table,
        app_id="vec-ingest", threshold=0.99, n_probe=3,
    )
    q.awaitTermination(300)
    got1 = sorted(map(tuple, table.read().collect()))
    assert got1 == want1

    # batch 2: exact copies of batch 1 under fresh ids — near-dups of
    # batch-1 rows (index fold) AND of the original sources
    batch2 = batch1.select(
        (F.col("vec_id") + 10_000_000).alias("vec_id"), "embedding"
    ).localCheckpoint(eager=True)
    batch2.coalesce(1).write.mode("append").parquet(src)
    q2 = vec_stream.near_dup_ingest_stream(
        spark, src, batch1.schema, ckpt, index_path, table,
        app_id="vec-ingest", threshold=0.99, n_probe=3,
    )
    q2.awaitTermination(300)
    all_pairs = {(r["id_a"], r["id_b"]) for r in table.read().collect()}
    b1 = {int(r["vec_id"]) for r in batch1.select("vec_id").collect()}
    assert all((p, p + 10_000_000) in all_pairs for p in b1)  # twin found
    assert all((p - 10_000_000, p + 10_000_000) in all_pairs for p in b1)
    # no pair appears twice across the table's commits
    dup = (
        table.read()
        .groupBy("id_a", "id_b")
        .count()
        .filter("count > 1")
        .count()
    )
    assert dup == 0
    # and the index grew by exactly both batches (no duplicate ids)
    idx = spark.read.parquet(index_path + "/cells")
    assert idx.count() == emb.count() + batch1.count() + batch2.count()
    assert idx.groupBy("vec_id").count().filter("count > 1").count() == 0


def test_replayed_vector_batch_is_noop(spark, sf_dir, tmp_path):
    """foreachBatch is at-least-once: re-delivering an already-applied
    (app_id, batch_id) must change NEITHER the pairs table (txn-id
    skip) NOR the index (if_absent anti-join) — the two idempotence
    layers of near_dup_pairs_sink, exercised directly."""
    emb = workload.load(spark, sf_dir, "embeddings")
    index_path = str(tmp_path / "index")
    ann_index.build_index(emb, index_path, k_cells=8, iters=2)
    table = TransactionalTable(spark, str(tmp_path / "pairs"))
    sink = vec_stream.near_dup_pairs_sink(
        spark, index_path, table, app_id="vec-ingest",
        threshold=0.99, n_probe=3,
    )
    batch = _perturbed(spark, emb, 11, 10_000_000).localCheckpoint(eager=True)
    sink(batch, 0)
    n_pairs = table.read().count()
    n_index = spark.read.parquet(index_path + "/cells").count()
    assert n_pairs > 0
    assert n_index == emb.count() + batch.count()

    # the replay: same batch, same batch_id (crash after both commits)
    sink(batch, 0)
    assert table.read().count() == n_pairs
    assert spark.read.parquet(index_path + "/cells").count() == n_index

    # crash BETWEEN the two commits: pairs already committed, index
    # append lost — the replay must complete the index WITHOUT
    # double-appending pairs
    batch_b = _perturbed(spark, emb, 13, 40_000_000).localCheckpoint(
        eager=True
    )
    pairs_b = ann_index.incremental_near_dups_indexed(
        spark, index_path, batch_b, threshold=0.99, n_probe=3
    )
    table.append(pairs_b, app_id="vec-ingest", batch_id=1)  # sink died here
    mid_pairs = table.read().count()
    sink(batch_b, 1)  # redelivery
    assert table.read().count() == mid_pairs  # no pair double-commit
    idx = spark.read.parquet(index_path + "/cells")
    assert idx.count() == n_index + batch_b.count()  # append completed
    assert idx.groupBy("vec_id").count().filter("count > 1").count() == 0

    # a genuinely new batch id still flows
    batch_c = _perturbed(spark, emb, 17, 80_000_000).localCheckpoint(
        eager=True
    )
    sink(batch_c, 2)
    assert table.read().count() > mid_pairs
