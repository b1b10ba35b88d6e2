"""Z-order (Morton-curve) data layout — multi-dimensional clustering
for min/max file skipping.

Beyond the reference surface (its engine serves a pre-built star
schema; see SURVEY.md §2) — this is the lake-layout operator a 100 TB
deployment needs: a fact table queried by TWO independent dimensions
(e.g. part AND supplier, user AND day) can only be sorted by one of
them, so parquet min/max statistics prune files for that dimension
alone. Interleaving the bits of both keys onto a Morton curve makes
every written file cover a small RECTANGLE in (x, y) space, so a
two-sided box predicate skips files on both dimensions at once.

Everything is Catalyst expressions (shiftleft / bitwiseAND / bitwiseOR
over bigint) — whole-stage-codegen'd, no Python in the hot path — and
deterministic integer math end-to-end, so the DuckDB oracles replay it
exactly (`<<`, `&`, `|`, `//` behave identically on nonnegative
BIGINT).

This module is the CANONICAL 2-D Morton pipeline (r12): it supersedes
the float-normalized per-bit loop in ``sources/layout.py`` for the
2-column case — ``sources.layout.write_zordered`` delegates here —
while that module keeps the generic 1/3-column key, the single-column
clustered write, and small-file compaction.

Scale notes:
- normalization is min/max linear scaling onto ``bits``-bit fixed
  point: one map-side-combined aggregate over the table, broadcast
  back as a 1-row frame.  Rank normalization (skew-proof occupancy)
  would need a distributed rank — a range-partitioned prefix sum —
  and is intentionally NOT used here so the layout key stays a pure
  per-row expression replayable by the oracle; heavy key skew shows
  up as uneven bucket counts, which `zorder_locality` exposes.
- ``(x - mn) * (2^bits - 1)`` must stay inside int64: fine for any
  key domain below ~1.4e14 at bits=16 (document keys, surrogate ids);
  widen by pre-dividing or drop ``bits`` for wider domains.
- the writer is ``repartitionByRange`` on the z-key (sampled range
  boundaries — ~equal-sized output files regardless of key skew) +
  ``sortWithinPartitions`` so row groups inside a file are tight too.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (shift, mask) pairs spreading a 16-bit value so a second spread value
# shifted left by one interleaves with it: the classic Morton magic
# numbers for 16 -> 32 bit spreading.
_SPREAD_16 = (
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
)


def spread_bits16(col: Column) -> Column:
    """Spread the low 16 bits of ``col`` onto even bit positions
    (b15..b0 -> bit 30, 28, ..., 0) — one half of a 2-D Morton key."""
    x = col.bitwiseAND(F.lit(0xFFFF))
    for shift, mask in _SPREAD_16:
        x = x.bitwiseOR(F.shiftleft(x, shift)).bitwiseAND(F.lit(mask))
    return x


def spread_bits16_sql(expr: str) -> str:
    """The DuckDB-replayable twin of :func:`spread_bits16` — same
    shifts, same masks, fully parenthesized."""
    x = f"(({expr}) & 65535)"
    for shift, mask in _SPREAD_16:
        x = f"((({x} | ({x} << {shift})) & {mask}))"
    return x


def scale_expr(col_name: str, mn_name: str, mx_name: str, bits: int = 16) -> Column:
    """Min/max linear scaling onto [0, 2^bits - 1] in pure integer
    math: ``(x - mn) * (2^bits - 1) div (mx - mn)`` — Spark's ``div``
    is exact int64 division (NO float anywhere, so the DuckDB ``//``
    twin replays it bit-exactly). A constant column (mx == mn) maps to
    0 everywhere rather than dividing by zero."""
    hi = (1 << bits) - 1
    return F.expr(
        f"CASE WHEN `{mx_name}` <= `{mn_name}` THEN CAST(0 AS BIGINT) "
        f"ELSE CAST(`{col_name}` - `{mn_name}` AS BIGINT) * {hi} "
        f"div CAST(`{mx_name}` - `{mn_name}` AS BIGINT) END"
    )


def zorder_key(xs: Column, ys: Column) -> Column:
    """Interleave two 16-bit-scaled values into a 32-bit Morton key:
    x takes even bits, y odd bits."""
    return spread_bits16(xs).bitwiseOR(F.shiftleft(spread_bits16(ys), 1))


# (shift, mask) pairs spreading a 10-bit value onto every THIRD bit
# position (b9..b0 -> bit 27, 24, ..., 0) — the classic 3-D Morton
# magic numbers. 10 bits/axis keeps every intermediate below 2^28, so
# the chain is overflow-safe on SIGNED int64 in both Spark and DuckDB
# (the 21-bit/axis variant's masks shift live bits past bit 63, where
# the two engines' overflow semantics diverge).
_SPREAD3_10 = (
    (16, 0x30000FF),
    (8, 0x300F00F),
    (4, 0x30C30C3),
    (2, 0x9249249),
)


def spread_bits3(col: Column) -> Column:
    """Spread the low 10 bits of ``col`` onto every third bit position
    — one third of a 3-D Morton key."""
    x = col.bitwiseAND(F.lit(0x3FF))
    for shift, mask in _SPREAD3_10:
        x = x.bitwiseOR(F.shiftleft(x, shift)).bitwiseAND(F.lit(mask))
    return x


def spread_bits3_sql(expr: str) -> str:
    """The DuckDB-replayable twin of :func:`spread_bits3` — same
    shifts, same masks, fully parenthesized."""
    x = f"(({expr}) & 1023)"
    for shift, mask in _SPREAD3_10:
        x = f"((({x} | ({x} << {shift})) & {mask}))"
    return x


def zorder3_key(xs: Column, ys: Column, zs: Column) -> Column:
    """Interleave three 10-bit-scaled values into a 30-bit Morton key:
    x takes bits 0,3,6..., y bits 1,4,7..., z bits 2,5,8..."""
    return (
        spread_bits3(xs)
        .bitwiseOR(F.shiftleft(spread_bits3(ys), 1))
        .bitwiseOR(F.shiftleft(spread_bits3(zs), 2))
    )


def with_zorder3(
    df: DataFrame,
    xcol: str,
    ycol: str,
    zcol: str,
    bits: int = 10,
    out: str = "zkey",
) -> DataFrame:
    """df + min/max-scaled ``_xs``/``_ys``/``_zs`` fixed-point dims +
    the 3-D Morton key ``out`` — the exact-integer pipeline of
    :func:`with_zorder` extended to three dimensions (r12 verdict
    item 7). One stats aggregate, broadcast back; the key is pure
    shift/and/or codegen. ``bits`` caps at 10 per axis (1024 cells
    per dimension — file-level clustering needs no more; the generic
    float path in ``sources/layout.py`` serves wider requests)."""
    if not 1 <= bits <= 10:
        raise ValueError(
            f"bits must be in [1, 10] (got {bits}): spread_bits3 is a"
            " 10-bit spreader; use sources/layout.zorder_key for wider"
            " fixed-point domains"
        )
    reserved = {
        "_xmn", "_xmx", "_ymn", "_ymx", "_zmn", "_zmx",
        "_xs", "_ys", "_zs", out,
    }
    clash = sorted(reserved & set(df.columns))
    if clash:
        raise ValueError(
            f"input columns {clash} collide with the z-order pipeline's"
            " reserved helper names — rename them before z-ordering"
        )
    stats = df.agg(
        F.min(xcol).alias("_xmn"),
        F.max(xcol).alias("_xmx"),
        F.min(ycol).alias("_ymn"),
        F.max(ycol).alias("_ymx"),
        F.min(zcol).alias("_zmn"),
        F.max(zcol).alias("_zmx"),
    )
    j = df.crossJoin(F.broadcast(stats))
    return (
        j.withColumn("_xs", scale_expr(xcol, "_xmn", "_xmx", bits))
        .withColumn("_ys", scale_expr(ycol, "_ymn", "_ymx", bits))
        .withColumn("_zs", scale_expr(zcol, "_zmn", "_zmx", bits))
        .withColumn(
            out, zorder3_key(F.col("_xs"), F.col("_ys"), F.col("_zs"))
        )
        .drop("_xmn", "_xmx", "_ymn", "_ymx", "_zmn", "_zmx")
    )


def pruning_audit3(
    df: DataFrame,
    xcol: str,
    ycol: str,
    zcol: str,
    n_files: int = 64,
    bits: int = 10,
    box=(384, 511, 384, 511, 384, 511),
) -> DataFrame:
    """Simulated min/max file skipping for a THREE-sided box predicate,
    3-D z-layout vs linear-sort layout, one output row per layout —
    the :func:`pruning_audit` contract extended to 3 dimensions.

    With F equal-width files on the 3-D curve each file covers a
    ~F^(-1/3) span of EVERY axis (64 files -> 1/4 of each domain), so
    a three-sided box prunes on all three dimensions at once; the
    linear layout prunes on x alone and reads every (y, z) for the
    matching x range. ``rows_matching`` is identical for both layouts
    by construction — the audit's self-check that layout never changes
    the answer."""
    xlo, xhi, ylo, yhi, zlo, zhi = box
    zwidth = max(1, (1 << (3 * bits)) // n_files)
    xwidth = max(1, (1 << bits) // n_files)
    keyed = with_zorder3(df, xcol, ycol, zcol, bits).select(
        "_xs", "_ys", "_zs", "zkey"
    )

    def audit(bucket: Column, layout: str) -> DataFrame:
        per_file = (
            keyed.withColumn("_file", bucket)
            .groupBy("_file")
            .agg(
                F.count("*").alias("n_rows"),
                F.sum(
                    (
                        F.col("_xs").between(xlo, xhi)
                        & F.col("_ys").between(ylo, yhi)
                        & F.col("_zs").between(zlo, zhi)
                    ).cast("bigint")
                ).alias("n_match"),
                F.min("_xs").alias("x_min"),
                F.max("_xs").alias("x_max"),
                F.min("_ys").alias("y_min"),
                F.max("_ys").alias("y_max"),
                F.min("_zs").alias("z_min"),
                F.max("_zs").alias("z_max"),
            )
        )
        scanned = (
            (F.col("x_max") >= xlo)
            & (F.col("x_min") <= xhi)
            & (F.col("y_max") >= ylo)
            & (F.col("y_min") <= yhi)
            & (F.col("z_max") >= zlo)
            & (F.col("z_min") <= zhi)
        ).cast("bigint")
        return per_file.agg(
            F.count("*").alias("files_total"),
            F.sum(scanned).alias("files_scanned"),
            F.sum(F.col("n_rows") * scanned).alias("rows_in_scanned_files"),
            F.sum("n_match").alias("rows_matching"),
        ).select(
            F.lit(layout).alias("layout"),
            "files_total",
            "files_scanned",
            "rows_in_scanned_files",
            "rows_matching",
        )

    zed = audit(F.expr(f"zkey div {zwidth}"), "zorder3")
    lin = audit(F.expr(f"_xs div {xwidth}"), "linear_x")
    return zed.unionByName(lin).orderBy("layout")


def with_zorder(
    df: DataFrame, xcol: str, ycol: str, bits: int = 16, out: str = "zkey"
) -> DataFrame:
    """df + min/max-scaled ``_xs``/``_ys`` fixed-point dims + the
    Morton key ``out``. The scaling stats come from one aggregate,
    broadcast back as a single-row frame (no shuffle of ``df``).

    ``bits`` is capped at 16 — :func:`spread_bits16` masks its input
    to the low 16 bits, so a wider request would silently collide
    distinct keys (and break the 1 << (2*bits) bucket math in
    :func:`zorder_locality`). Wider fixed-point domains belong to the
    generic float-normalized path in ``sources/layout.py`` (ADVICE
    r12). The helper names this pipeline adds (``_xmn``/``_xmx``/
    ``_ymn``/``_ymx``/``_xs``/``_ys``/``out``) are reserved: input
    columns with those names would turn the stats crossJoin ambiguous
    or be silently replaced, so they fail loudly instead."""
    if not 1 <= bits <= 16:
        raise ValueError(
            f"bits must be in [1, 16] (got {bits}): spread_bits16 is a"
            " 16-bit spreader; use sources/layout.zorder_key for wider"
            " fixed-point domains"
        )
    reserved = {"_xmn", "_xmx", "_ymn", "_ymx", "_xs", "_ys", out}
    clash = sorted(reserved & set(df.columns))
    if clash:
        raise ValueError(
            f"input columns {clash} collide with the z-order pipeline's"
            " reserved helper names — rename them before z-ordering"
        )
    stats = df.agg(
        F.min(xcol).alias("_xmn"),
        F.max(xcol).alias("_xmx"),
        F.min(ycol).alias("_ymn"),
        F.max(ycol).alias("_ymx"),
    )
    j = df.crossJoin(F.broadcast(stats))
    xs = scale_expr(xcol, "_xmn", "_xmx", bits)
    ys = scale_expr(ycol, "_ymn", "_ymx", bits)
    return (
        j.withColumn("_xs", xs)
        .withColumn("_ys", ys)
        .withColumn(out, zorder_key(F.col("_xs"), F.col("_ys")))
        .drop("_xmn", "_xmx", "_ymn", "_ymx")
    )


def zorder_write(
    df: DataFrame,
    xcol: str,
    ycol: str,
    path: str,
    n_files: int | None,
    bits: int = 16,
) -> None:
    """Materialize ``df`` as ``n_files`` parquet files clustered along
    the (xcol, ycol) Morton curve: range-partition on the z-key
    (sampled boundaries -> balanced files even under key skew), sort
    rows inside each file so row-group stats are tight as well, drop
    the helper columns before writing. ``n_files=None`` keeps Spark's
    range-partitioning default (``spark.sql.shuffle.partitions``),
    matching ``sources/layout.write_clustered`` (ADVICE r12)."""
    keyed = with_zorder(df, xcol, ycol, bits)
    ranged = (
        keyed.repartitionByRange("zkey")
        if n_files is None
        else keyed.repartitionByRange(n_files, "zkey")
    )
    (
        ranged.sortWithinPartitions("zkey")
        .drop("_xs", "_ys", "zkey")
        .write.mode("overwrite")
        .parquet(path)
    )


def zorder_locality(
    df: DataFrame, xcol: str, ycol: str, n_buckets: int = 64, bits: int = 16
) -> DataFrame:
    """Per-zbucket rectangle audit: equal-width buckets over the z
    domain (the file boundaries an equal-width writer would produce)
    with each bucket's row count and its min/max span in BOTH scaled
    dimensions. On z-ordered data every bucket covers a small tile;
    the same audit keyed on a single-column sort would show full-range
    spans in the other dimension."""
    width = (1 << (2 * bits)) // n_buckets
    keyed = with_zorder(df, xcol, ycol, bits)
    return (
        keyed.withColumn("zbucket", F.expr(f"zkey div {width}"))
        .groupBy("zbucket")
        .agg(
            F.count("*").alias("n_rows"),
            F.min("_xs").alias("x_min"),
            F.max("_xs").alias("x_max"),
            F.min("_ys").alias("y_min"),
            F.max("_ys").alias("y_max"),
        )
        .orderBy("zbucket")
    )


def pruning_audit(
    df: DataFrame,
    xcol: str,
    ycol: str,
    n_files: int = 64,
    bits: int = 16,
    box=(24576, 32767, 24576, 32767),
) -> DataFrame:
    """Simulated min/max file skipping, z-layout vs linear-sort layout,
    one output row per layout.

    Both layouts get ``n_files`` equal-width buckets ("files"): the z
    layout buckets the Morton key, the linear layout buckets the
    scaled x alone (the best a single-column sort can do). A file must
    be READ iff its [min, max] stats on both dimensions intersect the
    box predicate — exactly the decision a parquet reader makes from
    footer statistics. Columns: layout, files_total, files_scanned,
    rows_in_scanned_files, rows_matching (identical for both layouts —
    the answer doesn't change, only the I/O does).
    """
    xlo, xhi, ylo, yhi = box
    zwidth = (1 << (2 * bits)) // n_files
    xwidth = (1 << bits) // n_files
    keyed = with_zorder(df, xcol, ycol, bits).select("_xs", "_ys", "zkey")

    def audit(bucket: Column, layout: str) -> DataFrame:
        per_file = (
            keyed.withColumn("_file", bucket)
            .groupBy("_file")
            .agg(
                F.count("*").alias("n_rows"),
                F.sum(
                    (
                        F.col("_xs").between(xlo, xhi)
                        & F.col("_ys").between(ylo, yhi)
                    ).cast("bigint")
                ).alias("n_match"),
                F.min("_xs").alias("x_min"),
                F.max("_xs").alias("x_max"),
                F.min("_ys").alias("y_min"),
                F.max("_ys").alias("y_max"),
            )
        )
        scanned = (
            (F.col("x_max") >= xlo)
            & (F.col("x_min") <= xhi)
            & (F.col("y_max") >= ylo)
            & (F.col("y_min") <= yhi)
        ).cast("bigint")
        return per_file.agg(
            F.count("*").alias("files_total"),
            F.sum(scanned).alias("files_scanned"),
            F.sum(F.col("n_rows") * scanned).alias("rows_in_scanned_files"),
            F.sum("n_match").alias("rows_matching"),
        ).select(
            F.lit(layout).alias("layout"),
            "files_total",
            "files_scanned",
            "rows_in_scanned_files",
            "rows_matching",
        )

    zed = audit(F.expr(f"zkey div {zwidth}"), "zorder")
    lin = audit(F.expr(f"_xs div {xwidth}"), "linear_x")
    return zed.unionByName(lin).orderBy("layout")
