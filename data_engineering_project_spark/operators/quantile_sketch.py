"""Mergeable quantile sketch (t-digest) — persisted quantile summaries.

The quantile analogue of the persisted-HLL reach rollup
(operators/reach.py / workload:`reach_rollup_sketch`): a 100 TB lake
keeps a small per-partition digest column (per day, per source, …) and
answers ANY later quantile question by MERGING digests — the raw
values are never re-read. ``approx_percentile`` answers one query over
one scan; a stored digest answers all of them forever, rolls up along
any dimension, and ships across systems as two arrays.

Implementation: Dunning's merging t-digest with the size bound
``4·n·q(1−q)/δ`` per centroid — relative rank error concentrates as
O(q(1−q)/δ), tightest in the tails, the property quantile monitoring
actually needs. Everything is deterministic: values are sorted before
clustering and merges concatenate-sort-recompress, so the same input
always yields the same digest (the repo's cross-engine determinism
convention).

Spark surface: ``digest_by_partition`` is THE builder
(``mapInPandas`` per-batch partials merged through
``rollup_digests``: no group ever materializes in one pandas frame —
the 100 TB shape, where a hot group must not become one straggler
task). ``digest_by_group`` is INTERNAL/DEPRECATED (r9 VERDICT item
6): it sorts the whole group inside one task, so a hot group is a
straggler-OOM at scale; it is kept only as the bit-deterministic
equivalence baseline for pytest and must not gain new consumers.
Storage is plain DataFrame rows
``(group…, means array<double>, counts array<long>)``; estimation is
numpy on collected digests at the serving edge (a digest is ≤ δ
centroids — driver-safe by construction).
"""

from __future__ import annotations

# digest_by_group is deliberately ABSENT: internal/deprecated, pytest
# equivalence baseline only (see its docstring) — the recommended
# builder is digest_by_partition.
__all__ = [
    "tdigest_of",
    "merge_tdigests",
    "tdigest_quantile",
    "digest_by_partition",
    "rollup_digests",
]

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)


def _compress(
    means: np.ndarray, counts: np.ndarray, delta: int
) -> tuple[np.ndarray, np.ndarray]:
    """Greedy left-to-right merge of (mean, count) clusters sorted by
    mean, each output centroid bounded by ``4·n·q(1−q)/δ`` weight at
    its midpoint quantile. Deterministic for a given input order."""
    order = np.argsort(means, kind="mergesort")
    means, counts = means[order], counts[order]
    n = counts.sum()
    if n == 0:
        return np.empty(0), np.empty(0, dtype=np.int64)
    out_m: list[float] = []
    out_c: list[int] = []
    acc_m, acc_c = float(means[0]), int(counts[0])
    cum = 0  # weight strictly before the current cluster
    for m, c in zip(means[1:], counts[1:]):
        q = (cum + (acc_c + c) / 2.0) / n
        bound = max(4.0 * n * q * (1.0 - q) / delta, 1.0)
        # equal means always merge: collapsing ties is lossless, and
        # it keeps heavily-tied (or constant) columns compact where
        # the tail bound alone would keep every duplicate separate
        if acc_c + c <= bound or float(m) == acc_m:
            tot = acc_c + c
            acc_m += (float(m) - acc_m) * (c / tot)
            acc_c = tot
        else:
            out_m.append(acc_m)
            out_c.append(acc_c)
            cum += acc_c
            acc_m, acc_c = float(m), int(c)
    out_m.append(acc_m)
    out_c.append(acc_c)
    return np.asarray(out_m), np.asarray(out_c, dtype=np.int64)


def tdigest_of(values: np.ndarray, delta: int = 200) -> tuple[np.ndarray, np.ndarray]:
    """Digest of a raw value array (sorted internally; NaNs dropped)."""
    v = np.asarray(values, dtype=np.float64)
    v = v[~np.isnan(v)]
    if v.size == 0:
        return np.empty(0), np.empty(0, dtype=np.int64)
    v = np.sort(v, kind="mergesort")
    return _compress(v, np.ones(v.size, dtype=np.int64), delta)


def merge_tdigests(
    digests: list[tuple[np.ndarray, np.ndarray]], delta: int = 200
) -> tuple[np.ndarray, np.ndarray]:
    """Merge any number of digests: concatenate, sort, recompress —
    associative up to recompression, deterministic for a given list."""
    ms = np.concatenate([np.asarray(m, dtype=np.float64) for m, _ in digests])
    cs = np.concatenate([np.asarray(c, dtype=np.int64) for _, c in digests])
    return _compress(ms, cs, delta)


def tdigest_quantile(
    means: np.ndarray, counts: np.ndarray, qs
) -> np.ndarray:
    """Quantile estimates by linear interpolation between centroid
    means at their cumulative mid-ranks (Dunning's estimator)."""
    means = np.asarray(means, dtype=np.float64)
    counts = np.asarray(counts, dtype=np.float64)
    qs = np.atleast_1d(np.asarray(qs, dtype=np.float64))
    n = counts.sum()
    if n == 0:
        return np.full(qs.shape, np.nan)
    cum = np.cumsum(counts)
    mid = cum - counts / 2.0
    ranks = qs * n
    return np.interp(ranks, mid, means, left=means[0], right=means[-1])


_DIGEST_FIELDS = [
    StructField("digest_means", ArrayType(DoubleType()), False),
    StructField("digest_counts", ArrayType(LongType()), False),
    StructField("digest_n", LongType(), False),
]


def digest_by_group(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    delta: int = 200,
) -> DataFrame:
    """One t-digest row per group: ``(group…, digest_means,
    digest_counts, digest_n)``.

    .. deprecated:: round 10
       INTERNAL — the pytest equivalence baseline only. This path
       sorts each WHOLE group in one pandas task, so an unbounded hot
       group is a straggler/OOM at scale. Production consumers use
       :func:`digest_by_partition` (per-batch partials + mergeable
       rollup — no group ever materializes in one frame); the
       ``value_quantile_sketch`` registry entry routes through it.
    """
    schema = StructType(
        [df.schema[c] for c in group_cols] + _DIGEST_FIELDS
    )

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        m, c = tdigest_of(pdf[value_col].to_numpy(), delta)
        row = {g: pdf[g].iloc[0] for g in group_cols}
        row["digest_means"] = m.tolist()
        row["digest_counts"] = c.tolist()
        row["digest_n"] = int(c.sum())
        return pd.DataFrame([row])

    return df.select(*group_cols, value_col).groupBy(*group_cols).applyInPandas(
        build, schema=schema
    )


def digest_by_partition(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    delta: int = 200,
) -> DataFrame:
    """Same contract as :func:`digest_by_group` — one digest row per
    group — but NO group is ever materialized in a single pandas
    batch: each Arrow batch contributes per-group PARTIAL digests via
    ``mapInPandas`` (bounded by the batch size, not the group size),
    and :func:`rollup_digests` merges the partials to the group grain.
    T-digests are mergeable; this is the whole point of the sketch.

    This is the 100 TB shape (r8 VERDICT item 3): ``digest_by_group``
    sorts the entire group in one task, so a hot (day × source) group
    with billions of rows is one straggler/OOM; here the heaviest task
    is one Arrow batch and the rollup input is digests (O(groups × δ)
    rows), never raw values.

    Trade-off, stated plainly: the merged digest's centroid layout
    depends on how rows were batched, so the DIGEST is not
    bit-deterministic across partitionings — but count preservation,
    the ≤O(δ) size bound, and the O(q(1−q)/δ) rank-error band all
    hold regardless (pytest asserts estimate equivalence with
    ``digest_by_group`` inside the band). Persist digests from ONE
    canonical build if bit-stability matters."""
    schema = StructType(
        [df.schema[c] for c in group_cols] + _DIGEST_FIELDS
    )

    def partials(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows = []
            if group_cols:
                for keys, sub in pdf.groupby(
                    group_cols, dropna=False, sort=True
                ):
                    if not isinstance(keys, tuple):
                        keys = (keys,)
                    m, c = tdigest_of(sub[value_col].to_numpy(), delta)
                    row = dict(zip(group_cols, keys))
                    row["digest_means"] = m.tolist()
                    row["digest_counts"] = c.tolist()
                    row["digest_n"] = int(c.sum())
                    rows.append(row)
            else:
                m, c = tdigest_of(pdf[value_col].to_numpy(), delta)
                rows.append(
                    {
                        "digest_means": m.tolist(),
                        "digest_counts": c.tolist(),
                        "digest_n": int(c.sum()),
                    }
                )
            # ONE frame per input batch (not per group): a batch
            # spanning hundreds of groups must not fan out into
            # hundreds of single-row Arrow record batches
            yield pd.DataFrame(rows)

    partial_df = df.select(*group_cols, value_col).mapInPandas(
        partials, schema=schema
    )
    return rollup_digests(partial_df, group_cols, delta)


def rollup_digests(
    digest_df: DataFrame,
    group_cols: list[str],
    delta: int = 200,
) -> DataFrame:
    """Merge stored digests up to a coarser grain (day→month→global)
    WITHOUT touching raw data — the whole point of persisting them.
    ``group_cols`` may be empty for a global rollup."""
    schema = StructType(
        ([digest_df.schema[c] for c in group_cols]) + _DIGEST_FIELDS
    )

    def merge(keys: list[str]):
        def inner(pdf: pd.DataFrame) -> pd.DataFrame:
            ds = [
                (np.asarray(m), np.asarray(c))
                for m, c in zip(pdf["digest_means"], pdf["digest_counts"])
            ]
            m, c = merge_tdigests(ds, delta)
            row = {g: pdf[g].iloc[0] for g in keys}
            row["digest_means"] = m.tolist()
            row["digest_counts"] = c.tolist()
            row["digest_n"] = int(c.sum())
            return pd.DataFrame([row])

        return inner

    if group_cols:
        return digest_df.groupBy(*group_cols).applyInPandas(
            merge(group_cols), schema=schema
        )
    # global rollup: one synthetic group (the merge input is the
    # per-group digest table — tiny — not raw data, so the single
    # group is O(groups × δ), never a data-scale hotspot)
    g_schema = StructType([StructField("_g", LongType(), True)] + _DIGEST_FIELDS)
    return (
        digest_df.withColumn("_g", F.lit(0).cast("long"))
        .groupBy("_g")
        .applyInPandas(merge(["_g"]), schema=g_schema)
        .drop("_g")
    )
