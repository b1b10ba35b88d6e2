"""Transactional table: atomic commits, snapshot isolation, time
travel, idempotent batches, compaction, vacuum, checkpointed replay."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from data_engineering_project_spark.sources.txlog import (
    CHECKPOINT_EVERY,
    ConcurrentWriteError,
    TransactionalTable,
)


def _df(spark, lo, hi):
    return spark.range(lo, hi).withColumn("v", F.col("id") * 10)


@pytest.fixture()
def table(spark, tmp_path):
    return TransactionalTable(spark, str(tmp_path / "tx"))


def test_append_and_snapshot_read(spark, table):
    assert table.append(_df(spark, 0, 5)) == 0
    assert table.append(_df(spark, 5, 8)) == 1
    assert table.read().count() == 8
    assert sorted(r.id for r in table.read(version=0).collect()) == [0, 1, 2, 3, 4]


def test_time_travel_after_overwrite(spark, table):
    table.append(_df(spark, 0, 5))
    table.overwrite(_df(spark, 100, 103))
    assert sorted(r.id for r in table.read().collect()) == [100, 101, 102]
    # old snapshot still fully readable — files linger until vacuum
    assert table.read(version=0).count() == 5
    ops = [c["operation"] for c in table.history()]
    assert ops == ["overwrite", "append"]


def test_idempotent_batch_append(spark, table):
    v = table.append(_df(spark, 0, 4), app_id="stream-a", batch_id=7)
    assert v == 0
    # replaying the same (app_id, batch_id) is a no-op
    assert table.append(_df(spark, 0, 4), app_id="stream-a", batch_id=7) is None
    assert table.read().count() == 4
    # a different batch id commits normally
    assert table.append(_df(spark, 4, 6), app_id="stream-a", batch_id=8) == 1
    assert table.read().count() == 6


def test_compact_preserves_rows_and_old_snapshots(spark, table):
    for i in range(4):
        table.append(_df(spark, i * 10, i * 10 + 3).repartition(2))
    before = sorted(r.id for r in table.read().collect())
    n_files_before = len(table.snapshot_files())
    v = table.compact(target_files=1)
    assert v == 4
    assert len(table.snapshot_files()) == 1
    assert sorted(r.id for r in table.read().collect()) == before
    # pre-compaction snapshot unchanged
    assert len(table.snapshot_files(version=3)) == n_files_before


def test_vacuum_drops_only_unreferenced(spark, table):
    table.append(_df(spark, 0, 5))
    table.overwrite(_df(spark, 9, 12))
    removed = table.vacuum(retain_versions=0)
    assert removed  # v0 files gone
    assert sorted(r.id for r in table.read().collect()) == [9, 10, 11]
    with pytest.raises(Exception):
        table.read(version=0).count()


def test_checkpoint_replay_matches_full_replay(spark, table):
    for i in range(CHECKPOINT_EVERY + 3):
        table.append(_df(spark, i, i + 1))
    ckpts = [
        f for f in os.listdir(table.log_dir) if f.startswith("checkpoint-")
    ]
    assert ckpts, "expected a checkpoint to be cut"
    n = CHECKPOINT_EVERY + 3
    assert table.read().count() == n
    assert sorted(r.id for r in table.read().collect()) == list(range(n))


def test_overwrite_conflict_raises(spark, table, monkeypatch):
    table.append(_df(spark, 0, 3))
    real_latest = table.latest_version

    def stale_latest():
        # simulate a writer that read before the first commit landed
        return None if real_latest() == 0 else real_latest() - 1

    monkeypatch.setattr(table, "latest_version", stale_latest)
    with pytest.raises(ConcurrentWriteError):
        table.overwrite(_df(spark, 50, 53))
    monkeypatch.undo()
    # losing the race left no visible garbage
    assert sorted(r.id for r in table.read().collect()) == [0, 1, 2]


def test_append_retries_through_version_race(spark, table):
    table.append(_df(spark, 0, 2))
    # pre-create the next version file to force one losing CAS attempt
    nxt = table._commit_path(1)
    os.makedirs(table.log_dir, exist_ok=True)
    with open(nxt, "w") as fh:
        fh.write('{"version": 1, "operation": "append", "add": [], "remove": []}')
    v = table.append(_df(spark, 2, 4))
    assert v == 2
    assert sorted(r.id for r in table.read().collect()) == [0, 1, 2, 3]


def test_count_rows_matches_read_count(spark, table):
    """r14: count_rows() sums commit-metadata row counts over the live
    snapshot — must equal read().count() at every version, including
    after a txn-skipped replay."""
    table.append(_df(spark, 0, 5), app_id="a", batch_id=0)
    table.append(_df(spark, 5, 8), app_id="a", batch_id=1)
    assert table.count_rows() == table.read().count() == 8
    assert table.count_rows(version=0) == table.read(version=0).count() == 5
    # replayed batch commits nothing — the metadata count must agree
    assert table.append(_df(spark, 0, 5), app_id="a", batch_id=0) is None
    assert table.count_rows() == table.read().count() == 8
