"""Governance: subject erasure cascade + masked serving views."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from data_engineering_project_spark.sources.gdpr import (
    erase_subjects,
    register_masked_view,
)


def test_erasure_cascades_across_tables_with_audit(spark, tmp_path):
    ev = str(tmp_path / "events_tbl")
    orders = str(tmp_path / "orders_tbl")
    audit = str(tmp_path / "audit")
    t0 = dt.datetime(2024, 1, 1)
    spark.createDataFrame(
        [(1, t0, 7, 1.0), (2, t0, 8, 2.0), (3, t0, 7, 3.0)],
        "event_id long, ts timestamp, user_id long, value double",
    ).write.parquet(ev)
    spark.createDataFrame(
        [(10, 7), (11, 9)], "o_orderkey long, o_custkey long"
    ).write.parquet(orders)

    dropped = erase_subjects(
        spark,
        {ev: "user_id", orders: "o_custkey"},
        subject_ids=[7],
        audit_dir=audit,
    )
    assert dropped == {ev: 2, orders: 1}
    assert spark.read.parquet(ev).filter(F.col("user_id") == 7).count() == 0
    assert spark.read.parquet(ev).count() == 1
    assert spark.read.parquet(orders).count() == 1
    audit_rows = spark.read.parquet(audit).collect()
    assert {r["table"]: r["n_dropped"] for r in audit_rows} == {
        ev: 2,
        orders: 1,
    }
    # the audit trail must not contain the erased subject id
    assert "subject" not in {f.name for f in spark.read.parquet(audit).schema}


def test_erasure_is_idempotent(spark, tmp_path):
    ev = str(tmp_path / "idem_tbl")
    spark.createDataFrame(
        [(1, 7), (2, 8)], "event_id long, user_id long"
    ).write.parquet(ev)
    assert erase_subjects(spark, {ev: "user_id"}, [7]) == {ev: 1}
    assert erase_subjects(spark, {ev: "user_id"}, [7]) == {ev: 0}


def test_erasure_recovers_from_dangling_backup(spark, tmp_path):
    """Crash between the two swap renames leaves only table.__old__;
    the next erase_subjects call must restore it and proceed."""
    import os

    ev = str(tmp_path / "crash_tbl")
    spark.createDataFrame(
        [(1, 7), (2, 8), (3, 9)], "event_id long, user_id long"
    ).write.parquet(ev)
    # simulate the torn swap: data only in the backup
    os.rename(ev, ev + ".__old__")
    assert erase_subjects(spark, {ev: "user_id"}, [8]) == {ev: 1}
    assert sorted(
        r["user_id"] for r in spark.read.parquet(ev).collect()
    ) == [7, 9]
    assert not os.path.exists(ev + ".__old__")
    # stale backup alongside a live table (crash before backup delete)
    import shutil

    shutil.copytree(ev, ev + ".__old__")
    assert erase_subjects(spark, {ev: "user_id"}, [9]) == {ev: 1}
    assert [r["user_id"] for r in spark.read.parquet(ev).collect()] == [7]
    assert not os.path.exists(ev + ".__old__")


def test_masked_view_hashes_nulls_and_redacts(spark):
    df = spark.createDataFrame(
        [(1, "alice", "mail a@b.co", 31.0)],
        "id long, name string, bio string, score double",
    )
    register_masked_view(
        spark,
        df,
        "people_masked",
        hash_cols=["name"],
        null_cols=["score"],
        redact_text_cols=["bio"],
    )
    row = spark.sql("SELECT * FROM people_masked").collect()[0]
    assert row["name"] != "alice" and len(row["name"]) == 64
    assert row["score"] is None
    assert row["bio"] == "mail [EMAIL]"
    # pseudonym is stable (joinable across views)
    register_masked_view(spark, df, "people_masked2", hash_cols=["name"])
    row2 = spark.sql("SELECT name FROM people_masked2").collect()[0]
    assert row2["name"] == row["name"]
