"""Robust statistics: median / MAD outlier flagging with an exact and
a sketch-backed production path.

Beyond-reference capability (the reference's DQ layer stops at null /
duplicate counts): median-absolute-deviation outlier detection is the
robust-statistics workhorse that survives the heavy tails that wreck
z-scores. The shape is two scalar aggregates (median, then MAD around
it) collected as control-plane one-row jobs, then a map-only flagging
predicate — no shuffle of the data on the flagging pass.

Two percentile backends:

- ``exact=True`` — Spark's ``percentile`` (exact interpolated rank).
  Sorts each aggregation group's values; at 100 TB the two full sorts
  ARE the query cost. This is the path the DuckDB oracle can replay
  bit-for-bit, so the driver-checked workload entry uses it.
- ``exact=False`` — ``approx_percentile`` (KLL-style sketch,
  ``accuracy`` = 1/eps): constant-memory, map-side-mergeable, rank
  error <= n/accuracy, one pass per scalar. The production default at
  lake scale; estimates are engine-specific so this path is covered by
  pytest (flag agreement vs the exact path) rather than a value oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# consistency constant: MAD * 1.4826 estimates sigma under normality
MAD_SIGMA = 1.4826


def median_mad(
    df: DataFrame,
    value_col: str,
    exact: bool = True,
    accuracy: int = 10000,
) -> tuple[float, float]:
    """→ (median, mad) of ``value_col`` as driver scalars — two one-row
    control-plane jobs (the MAD must re-aggregate |x - median| and so
    cannot fuse with the median's own pass)."""
    if exact:
        med_expr = f"percentile({value_col}, 0.5)"
    else:
        med_expr = f"approx_percentile({value_col}, 0.5, {accuracy})"
    med = df.agg(F.expr(med_expr).alias("m")).collect()[0]["m"]
    dev = f"abs({value_col} - {med!r})"
    if exact:
        mad_expr = f"percentile({dev}, 0.5)"
    else:
        mad_expr = f"approx_percentile({dev}, 0.5, {accuracy})"
    mad = df.agg(F.expr(mad_expr).alias("m")).collect()[0]["m"]
    return float(med), float(mad)


_NEG_INF = float("-inf")


def _kth_from_counts(counts: DataFrame, k: int) -> float:
    """k-th smallest value from a (val, c) per-value count frame.

    The frame is assumed SMALL (distinct values, not rows — a sketch
    band or a distinct-collapsed small column, <= ~100k entries), so
    the cumulative rank walk runs DRIVER-SIDE over the collected
    counts: the sort is Spark's distributed range sort and the
    collect is a bounded (val, c) pair list — no single-partition
    cumulative WindowExec anywhere in the plan (round-6 ADVICE: the
    previous unpartitioned running-sum window put the whole counts
    frame on one partition, which at the small-path cutoff could mean
    ~100k continuous values)."""
    cum = 0
    for row in counts.orderBy("val").collect():
        cum += row["c"]
        if cum >= k:
            return float(row["val"])
    raise ValueError(f"rank {k} exceeds total count {cum}")


def exact_order_statistic(
    df: DataFrame,
    value_col: str,
    k: int,
    n: int,
    accuracy: int = 10000,
) -> float:
    """Exact k-th smallest (1-based) of ``value_col`` — distributed.

    The scalable replacement for ``ROW_NUMBER() OVER (ORDER BY v)``
    rank selection: a global row sort puts the whole column on one
    partition, which is exactly the shape that dies at lake scale.
    Instead:

    1. an ``approx_percentile`` sketch (rank error <= n/accuracy)
       brackets rank ``k`` into a narrow value band — one pass,
       map-side mergeable, constant memory;
    2. one counting pass folds everything below the band into a single
       sentinel row and keeps per-value counts inside the band — a
       map-side-combinable groupBy whose result is tiny (the band is
       ~4/accuracy of the data, collapsed to distinct values);
    3. the k-th value reads off the band's cumulative counts.

    If the sketch's bracket misses (tiny n, adversarial ties), falls
    back to per-value counts over the FULL column — still distinct-
    collapsed, always correct. ``n`` is the caller's row count (the
    caller needs it to choose ``k`` anyway). NaN/null values are the
    caller's job to filter; -inf is reserved as the sentinel."""
    v = F.col(value_col)
    if n <= 10 * accuracy:
        # small column: distinct-counts path directly, no sketch pass
        return _kth_from_counts(
            df.groupBy(v.alias("val")).agg(F.count(F.lit(1)).alias("c")), k
        )
    q = k / n
    m = 2.0 / accuracy
    q_lo, q_hi = max(0.0, q - m), min(1.0, q + m)
    t_lo, t_hi = df.agg(
        F.expr(
            f"approx_percentile({value_col}, array({q_lo!r}, {q_hi!r}),"
            f" {accuracy})"
        ).alias("b")
    ).collect()[0]["b"]
    return _band_select(df, value_col, k, t_lo, t_hi)


def _band_select(
    df: DataFrame, value_col: str, k: int, t_lo: float, t_hi: float
) -> float:
    """k-th smallest of ``value_col`` given a value band guaranteed (by
    the caller's sketch bracket) to contain it: one counting pass folds
    below-band mass into a -inf sentinel and keeps per-value counts in
    the band; the answer reads off the tiny band frame. Falls back to
    full distinct-counts if the bracket missed (tiny n, adversarial
    ties) — always correct, just not one-pass."""
    v = F.col(value_col)
    g = (
        df.select(
            F.when(v < t_lo, F.lit(_NEG_INF))
            .when(v > t_hi, F.lit(None))
            .otherwise(v)
            .alias("val")
        )
        .filter(F.col("val").isNotNull())
        .groupBy("val")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=True)  # tiny; feeds two tiny jobs below
    )
    stats = g.agg(
        F.sum(F.when(F.col("val") == _NEG_INF, F.col("c"))).alias("n_lt"),
        F.sum(F.when(F.col("val") != _NEG_INF, F.col("c"))).alias("n_band"),
    ).collect()[0]
    n_lt = stats["n_lt"] or 0
    n_band = stats["n_band"] or 0
    if not (n_lt < k <= n_lt + n_band):
        # sketch bracket missed: full distinct-counts fallback
        return _kth_from_counts(
            df.groupBy(v.alias("val")).agg(F.count(F.lit(1)).alias("c")), k
        )
    return _kth_from_counts(
        g.filter(F.col("val") != _NEG_INF), k - n_lt
    )


def exact_order_statistics(
    df: DataFrame,
    value_col: str,
    ks: list[int],
    n: int,
    accuracy: int = 10000,
) -> list[float]:
    """Exact k-th smallest for SEVERAL ranks in two data passes total
    (r13): :func:`exact_order_statistic` per rank pays one sketch job
    plus one band-count job (plus two tiny reads) PER RANK; auditing
    three quantiles cost ~12 jobs over the same column. Here pass 1 is
    ONE ``approx_percentile`` sketch bracketing every rank, pass 2 is
    ONE counting pass where each row contributes to every band it
    falls in (bands are ~4/accuracy of the data each, so the explode
    factor is ~len(ks) only inside the bands; below-band mass folds to
    the -inf sentinel per band) and the tiny (band, val, c) frame is
    collected once. Per-rank results are identical to the single-rank
    path: same sketch (one sketch over the same data answers each
    quantile identically), same band logic, same fallback (a missed
    bracket re-runs that rank over full distinct counts)."""
    v = F.col(value_col)
    if n <= 10 * accuracy:
        counts = (
            df.groupBy(v.alias("val"))
            .agg(F.count(F.lit(1)).alias("c"))
            .localCheckpoint(eager=True)
        )
        return [_kth_from_counts(counts, k) for k in ks]
    m = 2.0 / accuracy
    bounds: list[float] = []
    for k in ks:
        q = k / n
        bounds.extend((max(0.0, q - m), min(1.0, q + m)))
    arr = ", ".join(f"{b!r}" for b in bounds)
    bs = df.agg(
        F.expr(
            f"approx_percentile({value_col}, array({arr}), {accuracy})"
        ).alias("b")
    ).collect()[0]["b"]
    bands = [(bs[2 * i], bs[2 * i + 1]) for i in range(len(ks))]
    contribs = [
        F.struct(
            F.lit(i).alias("band"),
            F.when(v < t_lo, F.lit(_NEG_INF))
            .when(v > t_hi, F.lit(None))
            .otherwise(v)
            .alias("val"),
        )
        for i, (t_lo, t_hi) in enumerate(bands)
    ]
    rows = (
        df.select(F.explode(F.array(*contribs)).alias("s"))
        .select(F.col("s.band").alias("band"), F.col("s.val").alias("val"))
        .filter(F.col("val").isNotNull())
        .groupBy("band", "val")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    by_band: dict[int, list] = {}
    for r in rows:
        by_band.setdefault(int(r["band"]), []).append(
            (float(r["val"]), int(r["c"]))
        )
    out: list[float] = []
    for i, k in enumerate(ks):
        entries = sorted(by_band.get(i, ()))
        n_lt = sum(c for val, c in entries if val == _NEG_INF)
        n_band = sum(c for val, c in entries if val != _NEG_INF)
        if not (n_lt < k <= n_lt + n_band):
            # bracket missed (tiny n, adversarial ties): full
            # distinct-counts fallback for this rank only
            out.append(
                _kth_from_counts(
                    df.groupBy(v.alias("val")).agg(
                        F.count(F.lit(1)).alias("c")
                    ),
                    k,
                )
            )
            continue
        cum = 0
        got = None
        for val, c in entries:
            if val == _NEG_INF:
                continue
            cum += c
            if cum >= k - n_lt:
                got = val
                break
        out.append(float(got))
    return out


def exact_quantile_disc(
    df: DataFrame,
    value_col: str,
    q: float,
    accuracy: int = 10000,
) -> tuple[int, float | None]:
    """→ (n, exact value at rank ``ceil(q*n)``) in TWO data passes.

    The fused form of :func:`exact_order_statistic` for when the
    quantile is known before the row count (the usual case): pass 1 is
    one aggregation computing n AND the sketch bracket around ``q``
    together; pass 2 is the band-count selection. The rank uses IEEE
    ``ceil(q*n)`` — the same double arithmetic a SQL oracle's
    ``ceil(0.95 * COUNT(*))`` performs, and for q with a short decimal
    form that product rounds back to the exact rational rank for every
    n < 2^52. Returns (0, None) on an empty frame."""
    import math

    m = 2.0 / accuracy
    q_lo, q_hi = max(0.0, q - m), min(1.0, q + m)
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.expr(
            f"approx_percentile({value_col}, array({q_lo!r}, {q_hi!r}),"
            f" {accuracy})"
        ).alias("b"),
    ).collect()[0]
    n = row["n"]
    if n == 0:
        return 0, None
    k = math.ceil(q * n)
    t_lo, t_hi = row["b"]
    return n, _band_select(df, value_col, k, t_lo, t_hi)


def mad_outlier_flags(
    df: DataFrame,
    value_col: str,
    k: float = 3.0,
    exact: bool = True,
    accuracy: int = 10000,
) -> DataFrame:
    """``df`` plus an ``is_out`` int column: 1 where
    ``|x - median| > k * 1.4826 * MAD``. The flagging pass is map-only
    (median/MAD are inlined literals), so this composes with any
    downstream aggregate without an extra shuffle."""
    med, mad = median_mad(df, value_col, exact=exact, accuracy=accuracy)
    cut = F.lit(k) * F.lit(MAD_SIGMA) * F.lit(mad)
    return df.withColumn(
        "is_out",
        (F.abs(F.col(value_col) - F.lit(med)) > cut).cast("int"),
    )
