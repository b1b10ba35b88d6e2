"""Bucketed (hash-clustered) tables — shuffle-free co-located joins.

Beyond the reference surface: the reference engine serves single-node
joins, but at 100 TB the dominant cost of a fact-to-fact join is the
SHUFFLE — every row of both sides crosses the network to meet its key.
Spark's answer is the bucketed table (Hive bucketing): both tables are
written pre-hash-clustered into the same number of buckets on the join
key, so the join plan consumes each bucket pair in place — `.explain`
shows a SortMergeJoin with ZERO Exchange on either side, and the scan
line carries ``Bucketed: true``.

The nightly-pipeline contract this enables: pay the clustering shuffle
ONCE at write time (the bronze→silver materialization already shuffles
anyway), then every downstream join on that key — daily KPI builds,
backfills, ad-hoc — runs shuffle-free forever. On a 1000-executor
cluster that converts the join from an all-to-all network step into a
node-local merge.

Bucketed writes go through ``saveAsTable`` (Spark's bucketing metadata
lives in the catalog, not in parquet footers); we pin an explicit
``path`` so the data lands where the caller says (external table) and
the catalog entry is just the bucketing spec.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    key: str,
    n_buckets: int,
    sort: bool = True,
) -> None:
    """Materialize ``df`` hash-clustered into ``n_buckets`` on ``key``
    (optionally sorted within buckets so the merge join skips its Sort
    too). Overwrites both the catalog entry and the path.

    The frame is pre-clustered on the WRITER'S bucket-id expression
    (``pmod(hash(key), n)`` — Spark's bucket spec uses the same
    Murmur3 ``hash()``), so each bucket's rows land in one task and
    the table materializes as ~``n_buckets`` files. Without it every
    upstream task writes its own file per bucket — n_tasks x
    n_buckets small files (measured 512 at the x10 replica's 32-task
    orders), whose per-file open cost erodes exactly the point-lookup
    win bucketing exists to buy (r13; same lesson as the ANN index's
    cell-partitioned write)."""
    from pyspark.sql import functions as F

    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    w = (
        df.repartition(
            n_buckets, F.expr(f"pmod(hash(`{key}`), {n_buckets})")
        )
        .write.mode("overwrite")
        .format("parquet")
        .option("path", path)
        .bucketBy(n_buckets, key)
    )
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)


def colocated_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    left_key: str,
    right_key: str,
) -> DataFrame:
    """Join two same-bucket-count tables on their bucket keys, forced
    to the merge strategy (the hint keeps a small side from taking the
    broadcast path, which would make the no-shuffle claim vacuous)."""
    left = spark.table(left_table)
    right = spark.table(right_table)
    return left.hint("merge").join(
        right, left[left_key] == right[right_key], "inner"
    )


def join_is_shuffle_free(joined: DataFrame) -> bool:
    """True iff the join's physical plan contains a SortMergeJoin and
    NO Exchange — the mechanical definition of a co-located join.
    (Scans of bucketed tables satisfy the join's hash-clustering
    requirement directly, so Catalyst inserts no shuffle.)"""
    plan = joined._jdf.queryExecution().executedPlan().toString()
    return "SortMergeJoin" in plan and "Exchange" not in plan


def bucket_pruned_lookup(
    spark: SparkSession,
    table: str,
    key: str,
    values: list,
):
    """Point/IN lookup on a bucketed table's bucket key with BUCKET
    PRUNING — the read-side complement to the join-side shuffle
    deletion: the literals hash to their buckets and the scan reads
    ONLY those buckets' files (`SelectedBucketsCount: v out of n` on
    the FileScan node), so a key lookup on a 100 TB table touches
    1/n_buckets of it without any sort order or directory layout —
    the same write-once clustering pays for both joins and lookups.

    Spark's auto-bucketed-scan heuristic
    (``spark.sql.sources.bucketing.autoBucketedScan.enabled``)
    disables bucketed reading for scan-only plans — it only credits
    join/aggregate distribution, not pruning — so the lookup is
    PLANNED AND EXECUTED inside a window with that heuristic off
    (planning is lazy: just building the frame under the conf and
    restoring it before the action would silently re-plan without
    pruning). The result is small by definition (a key lookup), so it
    is materialized eagerly inside the window; the session conf is
    restored either way.

    Returns ``(result_df, buckets_selected, buckets_total)`` —
    (None, None) for the counts if the scan carried no bucket-pruning
    evidence (e.g. ``table`` is not bucketed on ``key``)."""
    import re

    from pyspark.sql import functions as F

    conf_key = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    prev = spark.conf.get(conf_key)
    spark.conf.set(conf_key, "false")
    try:
        df = spark.table(table).filter(F.col(key).isin(*values))
        plan = df._jdf.queryExecution().executedPlan().toString()
        m = re.search(r"SelectedBucketsCount: (\d+) out of (\d+)", plan)
        out = df.localCheckpoint(eager=True)
    finally:
        spark.conf.set(conf_key, prev)
    if m:
        return out, int(m.group(1)), int(m.group(2))
    return out, None, None
