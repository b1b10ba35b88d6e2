"""Streaming twin of the incremental embedding near-dup loop.

Vector batches arrive as a stream (files landing in a directory —
the nightly-drop shape, same source contract as
``events.ingest_files_exactly_once``); each micro-batch asks "is
anything in this batch a near-dup of what the index already holds?"
(:func:`ann_index.incremental_near_dups_indexed` — frozen sidecar
centroids, partition-pruned stored reads, zero refit), appends the
discovered pairs EXACTLY-ONCE to a transactional pairs table, then
folds the batch into the index so the NEXT micro-batch sees this
one's rows.

Exactly-once under replay (foreachBatch is at-least-once — a driver
crash between the sink write and the checkpoint commit redelivers
the batch) is layered per sink, in a deliberately crash-safe order:

1. pairs append: transactional (``sources/txlog.py``) keyed
   ``(app_id, batch_id)`` — a replayed batch's pairs commit is
   recognized in the table's own log and skipped (the
   :func:`events.txlog_sink` contract).
2. index append: ``add_to_index(if_absent=True)`` — ids already in
   the index are dropped before the write (the existence probe reads
   only the target cell directories), so the replayed append is a
   no-op instead of duplicate inverted-list rows.

Pairs commit FIRST, and a replay recomputes the SAME pair set no
matter which side already committed: if the crash hit before the
index append, the recomputation sees the identical pre-batch index;
if it hit after, the batch's own rows are now ALSO in the index, but
the extra rectangle columns they add are exact self-matches (dropped
by the kernel's id-inequality) plus batch-vs-batch pairs the new×new
side already emits — so the recomputed frame is row-identical, and
whichever commit already landed is skipped by its own idempotence
layer.

Batch-equivalence (the stream computes exactly what the batch
operator computes) is pinned by
tests/test_streaming_vectors.py::test_streamed_pairs_match_batch_operator.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import StructType

from data_engineering_project_spark.operators import ann_index
from data_engineering_project_spark.streaming.events import (
    ingest_files_exactly_once,
)


def near_dup_pairs_sink(
    spark: SparkSession,
    index_path: str,
    pairs_table,
    app_id: str,
    threshold: float = 0.99,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_block_rows: int | None = None,
):
    """→ a ``foreachBatch`` function: probe the persisted index for
    near-dups of the micro-batch, append pairs exactly-once
    (transactional, keyed (app_id, batch_id)), fold the batch into
    the index idempotently. See the module docstring for the replay
    analysis; composable with any stream of (id, vector) rows, not
    just the file source."""

    def batch_fn(batch_df, batch_id: int) -> None:
        batch_df = batch_df.localCheckpoint(eager=True)
        if not batch_df.count():
            return
        # LAZY pairs (r14): the txn append below STAGES (writes) the
        # frame before step 2 grows the index, so the
        # pairs-materialized-before-the-fold ordering holds without a
        # separate eager checkpoint job — and a REPLAYED batch, which
        # the append recognizes by txn id before staging, now skips
        # the pair kernel entirely instead of checkpointing rows it
        # will never commit.
        pairs = ann_index.incremental_near_dups_indexed(
            spark,
            index_path,
            batch_df,
            id_col=id_col,
            vec_col=vec_col,
            threshold=threshold,
            n_probe=n_probe,
            max_block_rows=max_block_rows,
        )
        # 1) transactional pairs commit (skipped on replay by txn id)
        pairs_table.append(pairs, app_id=app_id, batch_id=batch_id)
        # 2) idempotent index fold (no-op on replay by id anti-join)
        ann_index.add_to_index(
            spark, index_path, batch_df, id_col, vec_col, if_absent=True
        )

    return batch_fn


def near_dup_ingest_stream(
    spark: SparkSession,
    source_dir: str,
    schema: StructType,
    checkpoint_dir: str,
    index_path: str,
    pairs_table,
    app_id: str,
    threshold: float = 0.99,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_block_rows: int | None = None,
) -> StreamingQuery:
    """File-landing vector ingest: read the directory as a stream
    (``Trigger.AvailableNow`` — drain the backlog, then stop: the
    nightly semantics), run :func:`near_dup_pairs_sink` per
    micro-batch. File-level exactly-once comes from the stream
    checkpoint; row-level from the sink's two idempotence layers."""
    return ingest_files_exactly_once(
        spark,
        source_dir,
        schema,
        checkpoint_dir,
        near_dup_pairs_sink(
            spark,
            index_path,
            pairs_table,
            app_id,
            threshold=threshold,
            n_probe=n_probe,
            id_col=id_col,
            vec_col=vec_col,
            max_block_rows=max_block_rows,
        ),
    )
