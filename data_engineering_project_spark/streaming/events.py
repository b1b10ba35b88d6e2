"""Structured Streaming operators.

Two roles:

1. **The reference's incremental path, Spark-natively** (SURVEY.md
   §2.9 I1): a file-source stream with ``Trigger.AvailableNow`` +
   checkpoint subsumes the manifest's file-level exactly-once — Spark's
   checkpoint tracks processed files natively. Row-level anti-dup is
   still the batch anti-join (a changed file re-delivers old rows);
   :func:`ingest_files_exactly_once` composes both via foreachBatch.

2. **Beyond-reference stream analytics**: tumbling/sliding windowed
   aggregation with watermarks for late data, and gap-based session
   windows — the streaming twins of ``plans/workload.py``'s
   ``events_daily`` / ``sessionize`` batch queries.

All operators return lazy streaming DataFrames; callers pick sink +
trigger. Tests drive them with ``Trigger.AvailableNow`` over temp dirs.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import StructType


def read_file_stream(
    spark: SparkSession, path: str, schema: StructType, fmt: str = "parquet"
) -> DataFrame:
    """File-source stream: every file that lands under ``path`` is
    processed exactly once (checkpoint-tracked)."""
    return spark.readStream.format(fmt).schema(schema).load(path)


def _as_instant(df: DataFrame, ts_col: str) -> DataFrame:
    """Watermarks require event time to be TIMESTAMP (an instant);
    parquet event feeds often carry TIMESTAMP_NTZ (wall clock, no
    zone) and Spark raises EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE.

    The cast interprets the NTZ wall clock in the session time zone.
    The engine pins ``spark.sql.session.timeZone=UTC`` (session.py,
    plans/workload.py), making this deterministic; callers embedding
    these operators in a foreign session must pin a fixed-offset zone
    themselves or pre-cast their event-time column."""
    if dict(df.dtypes).get(ts_col) == "timestamp_ntz":
        return df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return df


def windowed_counts(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling (or sliding) windowed counts + value sum with a
    watermark bounding state for late data."""
    win = (
        F.window(ts_col, window, slide) if slide else F.window(ts_col, window)
    )
    return (
        _as_instant(events, ts_col)
        .withWatermark(ts_col, watermark)
        .groupBy(win.alias("win"), F.col(key_col))
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("total_value"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            key_col,
            "n_events",
            "total_value",
        )
    )


def session_aggregates(
    events: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    gap: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Gap-based session aggregation via ``session_window`` — the
    streaming-native twin of operators/sessionize.py (state bounded by
    the watermark; sessions close when the gap elapses)."""
    return (
        _as_instant(events, ts_col)
        .withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap).alias("sess"), F.col(user_col))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col(user_col),
            F.col("sess.start").alias("session_start"),
            F.col("sess.end").alias("session_end"),
            "n_events",
        )
    )


def dedup_within_watermark(
    events: DataFrame,
    key_cols: list[str] | None = None,
    ts_col: str = "ts",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming exact dedup: drop re-deliveries of the same key that
    arrive within the watermark horizon (``dropDuplicatesWithinWatermark``).

    The streaming twin of the batch anti-join dedup (SURVEY §2.9 I2):
    at-least-once upstreams (replayed files, retried producers) re-emit
    rows; keeping every key ever seen would need unbounded state, so
    state is scoped to the watermark window — exactly the guarantee a
    100 TB/day feed can afford. Keys older than the watermark are
    assumed already-settled (the batch anti-join at the sink remains
    the belt-and-suspenders layer, as in the reference's changed-file
    redelivery path)."""
    return (
        _as_instant(events, ts_col)
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(key_cols or ["event_id"])
    )


def attribution_join(
    views: DataFrame,
    purchases: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    attribution_window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream inner join: each purchase matched to the prior
    views of the same user within the attribution window.

    Both sides are watermarked and the join condition bounds event time
    on BOTH streams (view_ts in [purchase_ts - window, purchase_ts]),
    which is what lets Spark expire join state: a buffered view can be
    dropped once the purchase-side watermark passes view_ts + window.
    Without the time bound the state store would grow without limit —
    the difference between a demo and something that survives a week of
    100 TB/day event traffic.
    """
    v = (
        _as_instant(views, ts_col)
        .select(
            F.col(user_col),
            F.col(ts_col).alias("view_ts"),
            F.col("event_id").alias("view_event_id"),
        )
        .withWatermark("view_ts", watermark)
    )
    p = (
        _as_instant(purchases, ts_col)
        .select(
            F.col(user_col),
            F.col(ts_col).alias("purchase_ts"),
            F.col("event_id").alias("purchase_event_id"),
            F.col("value").alias("purchase_value"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    return p.join(
        v,
        (p[user_col] == v[user_col])
        & (F.col("view_ts") <= F.col("purchase_ts"))
        & (
            F.col("view_ts")
            >= F.col("purchase_ts") - F.expr(f"INTERVAL {attribution_window}")
        ),
        "inner",
    ).select(
        p[user_col].alias(user_col),
        "purchase_event_id",
        "purchase_ts",
        "purchase_value",
        "view_event_id",
        "view_ts",
    )


def stateful_user_totals(
    events: DataFrame,
    user_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Custom stateful operator: running per-user event count + value sum
    maintained across micro-batches via ``applyInPandasWithState``.

    The state (one row of two numbers per user) lives in the state
    store, checkpointed with the query — the pattern for stateful logic
    that watermarked windows can't express (running lifetime totals,
    custom decay, per-entity models). Emits the updated running totals
    for the users seen in each micro-batch.
    """
    import pandas as pd

    out_schema = StructType.fromDDL(
        f"{user_col} long, n_events long, total_value double"
    )
    state_schema = StructType.fromDDL("n long, total double")

    def update(key, pdf_iter, state):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdf_iter:
            n += len(pdf)
            total += float(pdf[value_col].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {user_col: [key[0]], "n_events": [n], "total_value": [total]}
        )

    return (
        events.groupBy(user_col)
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf="NoTimeout",
        )
    )


def txlog_sink(table, app_id: str) -> Callable[[DataFrame, int], None]:
    """foreachBatch sink into a transactional table (sources/txlog.py)
    with TRUE exactly-once delivery.

    The plain parquet-append sink is exactly-once only while the
    checkpoint and the sink agree; if the driver dies after the sink
    write but before the checkpoint commit, the batch is replayed and
    the rows double. Here each batch commits with its
    ``(app_id, batch_id)`` transaction id, so a replayed batch is
    recognized inside the sink's own log and skipped — the classic
    idempotent-sink half of end-to-end exactly-once.
    """

    def batch_fn(batch_df: DataFrame, batch_id: int) -> None:
        table.append(batch_df, app_id=app_id, batch_id=batch_id)

    return batch_fn


def ingest_files_exactly_once(
    spark: SparkSession,
    source_dir: str,
    schema: StructType,
    checkpoint_dir: str,
    batch_fn: Callable[[DataFrame, int], None],
) -> StreamingQuery:
    """File-level exactly-once ingestion (I1) as a streaming plan.

    ``batch_fn(batch_df, batch_id)`` receives each micro-batch — wire
    the incremental plan's anti-dup append there for row-level dedup.
    ``Trigger.AvailableNow`` processes the backlog then stops, which is
    precisely the reference's nightly semantics.
    """
    stream = read_file_stream(spark, source_dir, schema)
    return (
        stream.writeStream.foreachBatch(batch_fn)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def topk_view_maintenance(
    spark: SparkSession,
    state_dir: str,
    k: int = 10,
    key_col: str = "user_id",
    value_col: str = "value",
) -> Callable[[DataFrame, int], None]:
    """Incremental materialized-view maintenance: a foreachBatch sink
    that keeps a running per-key (count, sum) table and its top-k view
    exactly equal to a batch recompute over everything ingested so far.

    Each micro-batch is PRE-AGGREGATED to one row per key before the
    merge (so the state merge cost scales with distinct keys in the
    batch, not batch rows), then combined with the existing totals by
    a union + re-aggregate — the additive-aggregate form of MERGE.
    State lives as parquet at ``state_dir`` (totals/) with the top-k
    snapshot at topk/; a lake deployment would commit both through a
    transactional table (sources/txlog.py) instead of the
    rename-swap used here.

    Replay-safe: foreachBatch is at-least-once (a driver failure
    between the state write and the checkpoint commit replays the
    batch), so the last-applied ``batch_id`` is committed ATOMICALLY
    with the totals — written as an underscore-prefixed marker file
    inside the staged directory before the directory rename, the same
    (sink_id, batch_id) idempotence txlog_sink implements — and a
    batch whose id is <= the marker is skipped. Crash-safe swap: the
    live totals are renamed to a ``.__old__`` backup before the staged
    directory renames into place (never rmtree-then-rename, which
    loses all state if the process dies between the two); a dangling
    backup from a previous crash is recovered on the next batch.
    """
    import os
    import shutil

    from pyspark.sql import functions as F

    totals_dir = os.path.join(state_dir, "totals")
    topk_dir = os.path.join(state_dir, "topk")
    backup_dir = totals_dir + ".__old__"
    # Spark's parquet reader skips underscore-prefixed files (like
    # _SUCCESS), so the marker rides inside the data directory and the
    # directory rename commits data + watermark as one atomic unit.
    marker_name = "_last_batch_id"

    def _recover() -> None:
        if os.path.exists(backup_dir):
            if os.path.exists(totals_dir):
                # crash after swap, before backup delete: new state won
                shutil.rmtree(backup_dir)
            else:
                # crash between the two renames: restore the backup
                os.rename(backup_dir, totals_dir)

    def _last_applied() -> int:
        marker = os.path.join(totals_dir, marker_name)
        if os.path.exists(marker):
            with open(marker, encoding="ascii") as fh:
                return int(fh.read().strip())
        return -1

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        _recover()
        if batch_id <= _last_applied():
            return  # replayed batch — already folded into totals
        inc = batch_df.groupBy(key_col).agg(
            F.count("*").cast("long").alias("n_events"),
            F.sum(F.col(value_col).cast("decimal(38,6)")).alias("total_value"),
        )
        if os.path.exists(totals_dir):
            prev = spark.read.parquet(totals_dir)
            merged = (
                prev.unionByName(inc)
                .groupBy(key_col)
                .agg(
                    F.sum("n_events").cast("long").alias("n_events"),
                    F.sum("total_value")
                    .cast("decimal(38,6)")
                    .alias("total_value"),
                )
            )
        else:
            merged = inc.withColumn(
                "total_value", F.col("total_value").cast("decimal(38,6)")
            )
        staged = totals_dir + ".__new__"
        merged.write.mode("overwrite").parquet(staged)
        with open(
            os.path.join(staged, marker_name), "w", encoding="ascii"
        ) as fh:
            fh.write(str(batch_id))
        if os.path.exists(totals_dir):
            os.rename(totals_dir, backup_dir)
        os.rename(staged, totals_dir)
        if os.path.exists(backup_dir):
            shutil.rmtree(backup_dir)
        (
            spark.read.parquet(totals_dir)
            .orderBy(F.desc("total_value"), F.asc(key_col))
            .limit(k)
            .write.mode("overwrite")
            .parquet(topk_dir)
        )

    return merge


def session_counts_complete(
    events: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    gap_seconds: int = 3600,
) -> DataFrame:
    """Per-session event counts over a STREAM with gap semantics
    IDENTICAL to the batch ``operators/sessionize.with_session_ids``:
    event times floored to whole seconds (``date_trunc``, matching the
    batch path's second-boundary ``date_diff``), and
    ``session_window``'s inclusive merge (an event exactly ``gap``
    seconds after the previous one extends the session — verified
    empirically, tests/test_streaming.py) mirrors the batch rule "new
    session iff floor-second delta > gap".

    Intended for COMPLETE output mode on a bounded replay (no
    watermark: nothing is declared late, no state is evicted, the
    final emission is the full session set) — the cross-paradigm
    equality harness behind the ``streaming_sessionize`` driver
    entry. Production feeds should keep using
    :func:`session_aggregates`, whose watermark bounds state.
    """
    return (
        _as_instant(events, ts_col)
        .withColumn("_ts_sec", F.date_trunc("second", F.col(ts_col)))
        .groupBy(
            F.session_window("_ts_sec", f"{gap_seconds} seconds").alias("sess"),
            F.col(user_col),
        )
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col(user_col),
            F.col("sess.start").alias("session_start"),
            F.col("sess.end").alias("session_end"),
            "n_events",
        )
    )


def session_counts_closed(
    events: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    gap_seconds: int = 3600,
    watermark: str = "4 hours",
) -> DataFrame:
    """The PRODUCTION shape of :func:`session_counts_complete`: the
    same floored-second ``session_window`` aggregation, but with a real
    watermark bounding state, for APPEND output mode — a session row is
    emitted exactly once, when the watermark passes its end and no
    further event can extend or merge it.

    Why append and not update: Spark rejects UPDATE output mode for
    session-window aggregations (STREAMING_OUTPUT_MODE.UNSUPPORTED_
    OPERATION) because sessions MERGE — a late bridging event collapses
    two open sessions into one, so an update row could not name a
    stable key it supersedes.  Closure-on-watermark is the supported
    production semantics; the complete-mode harness remains the
    value-equality proof on bounded replays.

    Same row contract as the harness:
    ``(user, session_start, session_end, n_events)``."""
    return (
        _as_instant(events, ts_col)
        .withColumn("_ts_sec", F.date_trunc("second", F.col(ts_col)))
        # the watermark must ride the aggregation's own event-time
        # column (_ts_sec), or Spark sees an un-watermarked agg and
        # rejects append mode
        .withWatermark("_ts_sec", watermark)
        .groupBy(
            F.session_window("_ts_sec", f"{gap_seconds} seconds").alias("sess"),
            F.col(user_col),
        )
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col(user_col),
            F.col("sess.start").alias("session_start"),
            F.col("sess.end").alias("session_end"),
            "n_events",
        )
    )


def session_upsert_sink(table, user_col: str = "user_id"):
    """``foreachBatch`` sink folding emitted session rows into a
    transactional table (sources/txlog.py): each incoming session row
    REPLACES every stored session of the same user it overlaps.

    Append-mode closed sessions are immutable, so a plain exactly-once
    append (:func:`txlog_sink`) also works on one checkpoint lineage —
    overlap-replace additionally makes REBUILDS idempotent: a new
    checkpoint over the same (or backfilled) source re-emits sessions,
    and replacement converges to the same table instead of doubling.
    Replacement-by-overlap is the correct upsert key for sessions —
    a session's start is not stable across rebuilds (a backfilled
    bridging event merges two previously-stored sessions into one row
    spanning both), so a plain (user, start) key would strand the
    swallowed session.

    Scale: the batch side is one micro-batch of session rows —
    broadcast into the anti-join against the stored table, so the
    stored side never shuffles.
    """
    from pyspark.sql.functions import broadcast

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.take(1):
            return
        batch_df = batch_df.localCheckpoint(eager=True)
        try:
            stored = table.read()
        except FileNotFoundError:
            table.append(batch_df)
            return
        spans = batch_df.select(
            F.col(user_col).alias("_u"),
            F.col("session_start").alias("_s"),
            F.col("session_end").alias("_e"),
        )
        keep = stored.join(
            broadcast(spans),
            (stored[user_col] == F.col("_u"))
            & (stored["session_start"] < F.col("_e"))
            & (F.col("_s") < stored["session_end"]),
            "left_anti",
        )
        table.overwrite(keep.unionByName(batch_df))

    return merge
