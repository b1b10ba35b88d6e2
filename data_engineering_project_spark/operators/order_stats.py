"""Two-phase exact global ordering — rank / ntile / running sum with
NO single-partition stage.

``ROW_NUMBER() OVER (ORDER BY ...)`` (and NTILE, and a global running
sum) is the one relational shape Spark executes by moving EVERYTHING
to one partition: an empty window partition spec plans as Exchange
SinglePartition + Sort + WindowExec, which serializes the whole frame
through one task — correct at audit scale, dead at 100 TB. The
classical fix (Goetz Graefe's range-rank; TeraSort's bookkeeping) is
two-phase:

1. **Range-partition** on the sort key — ``repartitionByRange`` samples
   the key distribution and picks balanced boundaries (the same
   machinery behind Spark's distributed ORDER BY), so partition *i*
   holds a contiguous key range and partitions are ordered end to end.
   One full-data shuffle, P-way parallel.
2. **Local order + global offsets** — each partition sorts locally;
   a P-row control-plane aggregate counts rows (and sums values) per
   partition; the driver folds those into cumulative offsets and
   inlines them as a literal array. A row's global rank is then
   ``offset[pid] + local position`` — map-only arithmetic.

The materialized frame is ``localCheckpoint``-ed between the two
phases: range boundaries come from sampling, so the partition a row
lands in is only deterministic WITHIN one materialization — the
checkpoint pins it so the offsets job and the downstream consumer see
the same layout (the final rank values are deterministic regardless,
given a total order; the checkpoint is what makes the intermediate
``_gpid`` consistent across the two jobs that read it).

Local positions come from ``monotonically_increasing_id()`` read AFTER
``sortWithinPartitions`` — Spark's documented id layout is
``partition_id << 33 | row_index_within_partition``, so one map-only
projection yields both the partition id and the 1-based local row
number with zero additional shuffles. The running-sum variant needs a
real local cumulative, so it alone adds a ``_gpid``-partitioned window
(one hash exchange over balanced partitions — still never a
single-partition stage).

Callers MUST pass a total order (the repo's explicit-tiebreak
convention): with duplicate sort keys the local tie order inside a
partition is nondeterministic, exactly as it is for the single-window
form.

Used by the twelve formerly global-window workload queries
(order_value_deciles, rfm_segments, customer_revenue_gini,
ranking_rank_correlation, zipf_fit, peak_concurrent_sessions,
part_abc_classes, revenue_lorenz_deciles, score_decile_lift,
hybrid_rank_fusion, ks_priority_value, mannwhitney_priority_value)
and guarded by tests/test_plan_audit.py, which rejects any registered
plan carrying an unpartitioned WindowExec over an unbounded frame
outside the justified BOUNDED_GLOBAL_WINDOWS allowlist.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_LOCAL_IDX_BITS = 33
_LOCAL_IDX_MASK = (1 << _LOCAL_IDX_BITS) - 1


def _cols(order_by) -> list[Column]:
    return [c if isinstance(c, Column) else F.col(c) for c in order_by]


def _default_partitions(df: DataFrame) -> int:
    return int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))


def _ranged(
    df: DataFrame,
    order_by,
    num_partitions: int | None,
    extra_aggs: list | None = None,
):
    """Phase 1 + the per-partition census.

    → (checkpointed frame + ``_gpid``/``_lrn`` columns, per-pid row
    counts as a dense list of length P, per-pid census rows). ``_lrn``
    is the 1-based local row number in sort order; ``_gpid`` the
    range-partition index (ascending = key order).

    ``extra_aggs`` rides additional aggregate columns on the SAME
    census job (r14, guide §1.2: global_cumsum's per-partition value
    totals were a second full groupBy+collect over the frame the row
    census had just walked)."""
    p = num_partitions or _default_partitions(df)
    base = (
        df.repartitionByRange(p, *_cols(order_by))
        .sortWithinPartitions(*_cols(order_by))
        .withColumn("_mid", F.monotonically_increasing_id())
        .withColumn(
            "_gpid", F.shiftright("_mid", _LOCAL_IDX_BITS).cast("int")
        )
        .withColumn(
            "_lrn",
            (F.col("_mid").bitwiseAND(F.lit(_LOCAL_IDX_MASK)) + 1).cast(
                "long"
            ),
        )
        .drop("_mid")
        .localCheckpoint(eager=True)
    )
    census = (
        base.groupBy("_gpid")
        .agg(F.count(F.lit(1)).alias("c"), *(extra_aggs or []))
        .collect()
    )
    got = {r["_gpid"]: r["c"] for r in census}
    counts = [got.get(i, 0) for i in range(p)]
    return base, counts, census


def _offsets_expr(counts: list[int], pid_col: str = "_gpid") -> Column:
    """Literal cumulative-offset lookup: offsets[pid] = rows before
    partition pid. A P-length array literal read with element_at —
    pure map-side arithmetic."""
    offs, cum = [], 0
    for c in counts:
        offs.append(cum)
        cum += c
    return F.element_at(
        F.array(*[F.lit(int(o)).cast("long") for o in offs]),
        F.col(pid_col) + 1,
    )


def global_row_number(
    df: DataFrame, order_by, out: str = "rn", num_partitions: int | None = None
) -> DataFrame:
    """``df`` + exact 1-based global row number in ``order_by`` order
    (a total order — pass a tiebreak). One range shuffle, one P-row
    census, map-only rank arithmetic; never a single-partition sort."""
    base, counts, _ = _ranged(df, order_by, num_partitions)
    return base.withColumn(
        out, (_offsets_expr(counts) + F.col("_lrn")).cast("long")
    ).drop("_gpid", "_lrn")


def _ntile_from_rn(rn: Column, n_rows: int, n_tiles: int) -> Column:
    """SQL NTILE(n) from a global row number: the first ``n_rows % n``
    tiles take ``ceil(n_rows/n)`` rows, the rest ``floor(n_rows/n)`` —
    closed-form integer arithmetic, no second pass."""
    q, r = divmod(n_rows, n_tiles)
    if q == 0:
        # fewer rows than tiles: tile i gets row i
        return rn.cast("long")
    big = r * (q + 1)  # rows covered by the (q+1)-sized tiles
    # double division then floor is exact here: operands stay far
    # below 2^52, where IEEE correctly-rounded quotients floor cleanly
    tile_small = F.floor((rn - 1) / F.lit(q + 1)) + 1
    tile_large = F.lit(r) + F.floor((rn - 1 - F.lit(big)) / F.lit(q)) + 1
    return (
        F.when(rn <= F.lit(big), tile_small).otherwise(tile_large)
    ).cast("long")


def global_ntile(
    df: DataFrame,
    order_by,
    n_tiles: int,
    out: str = "tile",
    num_partitions: int | None = None,
) -> DataFrame:
    """``df`` + exact ``NTILE(n_tiles) OVER (ORDER BY order_by)`` —
    global row number via the two-phase rank, then the SQL NTILE
    bucket-size rule as closed-form integer arithmetic (total row
    count comes free from the phase-2 census)."""
    base, counts, _ = _ranged(df, order_by, num_partitions)
    n_rows = sum(counts)
    rn = _offsets_expr(counts) + F.col("_lrn")
    return base.withColumn(out, _ntile_from_rn(rn, n_rows, n_tiles)).drop(
        "_gpid", "_lrn"
    )


def global_cumsum(
    df: DataFrame,
    order_by,
    value_col,
    out="cum",
    num_partitions: int | None = None,
) -> DataFrame:
    """``df`` + exact running ``SUM(value_col)`` in ``order_by`` order
    (ROWS UNBOUNDED PRECEDING frame; pass a total order).
    ``value_col``/``out`` may be parallel lists to carry several
    running sums through ONE range phase and ONE window (e.g. the two
    ECDF counts of a KS statistic).

    The local running sum needs a real window, so this variant runs
    one ``_gpid``-partitioned window after the range phase — a hash
    exchange over P balanced partitions, NOT a single-partition sort.
    Per-partition value totals (and non-null counts) ride the same
    census aggregate as the row counts; their cumulative offsets are
    inlined as literals.

    NULL semantics match the single-window SQL form exactly: a row
    whose global prefix holds zero non-null values yields NULL, any
    other row yields the sum of the non-null prefix — even when a
    whole range partition's local prefix is all NULL (the literal
    offset carries the prior partitions' total; the non-null prefix
    count decides NULL vs 0-start)."""
    value_cols = [value_col] if isinstance(value_col, str) else list(value_col)
    outs = [out] if isinstance(out, str) else list(out)
    if len(value_cols) != len(outs):
        raise ValueError("value_col and out must have equal length")
    # per-partition value totals + non-null counts ride the row census
    # aggregate — ONE job, not two (r14)
    base, counts, census = _ranged(
        df,
        order_by,
        num_partitions,
        extra_aggs=[
            *[F.sum(c).alias(f"s{i}") for i, c in enumerate(value_cols)],
            *[F.count(c).alias(f"n{i}") for i, c in enumerate(value_cols)],
        ],
    )
    p = len(counts)
    per_pid = {r["_gpid"]: r for r in census}
    agg_schema = base.select(
        *[F.sum(c).alias(f"s{i}") for i, c in enumerate(value_cols)]
    ).schema
    w = (
        Window.partitionBy("_gpid")
        .orderBy("_lrn")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    result = base
    for i, (vc, oc) in enumerate(zip(value_cols, outs)):
        offs, noffs, cum, ncum = [], [], 0, 0
        for pid in range(p):
            offs.append(cum)
            noffs.append(ncum)
            row = per_pid.get(pid)
            if row is not None:
                cum += row[f"s{i}"] or 0
                ncum += row[f"n{i}"] or 0
        dtype = agg_schema[f"s{i}"].dataType
        off_expr = F.element_at(
            F.array(*[F.lit(o).cast(dtype) for o in offs]),
            F.col("_gpid") + 1,
        )
        noff_expr = F.element_at(
            F.array(*[F.lit(int(n)).cast("long") for n in noffs]),
            F.col("_gpid") + 1,
        )
        nonnull_prefix = noff_expr + F.count(vc).over(w)
        running = off_expr + F.coalesce(
            F.sum(vc).over(w), F.lit(0).cast(dtype)
        )
        result = result.withColumn(
            oc,
            F.when(nonnull_prefix > 0, running).otherwise(
                F.lit(None).cast(dtype)
            ),
        )
    return result.drop("_gpid", "_lrn")


def global_ntile_multi(
    df: DataFrame,
    key_cols,
    specs,
    num_partitions: int | None = None,
) -> DataFrame:
    """Several independent exact NTILEs over DIFFERENT orders of the
    SAME frame — e.g. the R/F/M quartiles of an RFM cube — computed
    CONCURRENTLY and joined back on ``key_cols`` (a unique key).

    ``specs`` is a list of ``(order_by, n_tiles, out)`` triples.

    The chained form pays three sequential range shuffles, three
    eager checkpoints and three census collects — each a scheduler
    round trip that idles the cluster while the driver folds a P-row
    list. Here the base frame is checkpointed ONCE and each spec's
    whole two-phase rank (range shuffle + census + literal offsets)
    is submitted from its own driver thread: Spark's scheduler runs
    the independent jobs simultaneously, so wall-clock is ~max, not
    sum, of the per-spec phases. Each thread returns a slim
    ``(key..., tile)`` frame; the final equi-joins on the unique key
    are plain hash joins of narrow frames.
    """
    from concurrent.futures import ThreadPoolExecutor

    keys = list(key_cols)
    if not all(isinstance(k, str) for k in keys):
        # the final equi-joins are name-based; a Column object would
        # resolve against the checkpointed frame ambiguously
        raise TypeError("key_cols must be column names (str)")
    base = df.localCheckpoint(eager=True)

    def one(spec):
        order_by, n_tiles, out = spec
        return global_ntile(
            base, order_by, n_tiles, out=out, num_partitions=num_partitions
        ).select(*keys, out)

    with ThreadPoolExecutor(max_workers=len(specs)) as ex:
        tiles = list(ex.map(one, list(specs)))
    result = base
    for t in tiles:
        result = result.join(t, keys)
    return result
