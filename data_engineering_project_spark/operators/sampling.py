"""Deterministic content-hash sampling and train/val/test splits.

A training-data pipeline needs samples and splits that are (a)
reproducible across runs and engines, (b) stable under task retries and
repartitioning, and (c) assigned map-side with no shuffle and no state.
``rand()``-based sampling fails (a) and (b) — a retried task draws new
numbers. Hashing the record key gives all three: membership is a pure
function of the key, so any engine that agrees on md5 (all of them)
produces the identical sample.

Mechanics: bucket = the first two hex chars of ``md5(key)`` — 256
uniform buckets. Fixed-width lowercase hex sorts numerically, so
bucket-range membership is a plain string comparison that DuckDB (the
oracle), Spark, and every SQL engine evaluate identically; fraction
granularity is 1/256. At 100 TB this is a map-only predicate on the
scan — no shuffle, no sort, trivially parallel — and a split column
computed this way is a stable lineage fact: the same document lands in
``train`` on every engine, forever (no leakage when the pipeline
re-runs on grown data: membership never depends on the rest of the
dataset).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hash_bucket(key: Column | str) -> Column:
    """256-way uniform bucket of a key: first 2 hex chars of md5."""
    c = F.col(key) if isinstance(key, str) else key
    return F.substring(F.md5(c.cast("string")), 1, 2)


def _hex2(bucket: int) -> str:
    if not 0 <= bucket <= 256:
        raise ValueError(f"bucket {bucket} outside [0, 256]")
    return format(min(bucket, 255), "02x") if bucket < 256 else "zz"


def hash_sample(df: DataFrame, key: str, fraction: float) -> DataFrame:
    """Deterministic ``fraction`` sample by key hash (granularity 1/256).

    SQL twin: ``WHERE substring(md5(CAST(key AS VARCHAR)), 1, 2) <
    '<hex(floor(fraction*256))>'``.
    """
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction {fraction} outside [0, 1]")
    threshold = int(fraction * 256)
    if threshold >= 256:
        return df
    return df.filter(hash_bucket(key) < F.lit(_hex2(threshold)))


def split_column(key: Column | str, weights: dict[str, float]) -> Column:
    """CASE-ladder split assignment from cumulative hash-bucket ranges.

    ``weights`` maps split name → fraction (must sum to ~1; the last
    split absorbs rounding). Insertion order defines the bucket layout,
    so the same dict always yields the same assignment.
    """
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-6:
        raise ValueError(f"weights sum to {total}, expected 1.0")
    bucket = hash_bucket(key)
    names = list(weights)
    expr: Column | None = None
    cum = 0.0
    for name in names[:-1]:
        cum += weights[name]
        cond = bucket < F.lit(_hex2(int(cum * 256)))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = F.lit(names[-1])
    return last if expr is None else expr.otherwise(last)


def hash_split(
    df: DataFrame, key: str, weights: dict[str, float], col: str = "split"
) -> DataFrame:
    """Add a deterministic train/val/test column (map-only, no shuffle)."""
    return df.withColumn(col, split_column(key, weights))


def split_case_sql(key_sql: str, weights: dict[str, float]) -> str:
    """The DuckDB/ANSI twin of :func:`split_column` for oracle checks."""
    names = list(weights)
    clauses = []
    cum = 0.0
    for name in names[:-1]:
        cum += weights[name]
        clauses.append(
            f"WHEN substring(md5(CAST({key_sql} AS VARCHAR)), 1, 2) <"
            f" '{_hex2(int(cum * 256))}' THEN '{name}'"
        )
    return "CASE " + " ".join(clauses) + f" ELSE '{names[-1]}' END"


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    key_col: str,
    n_per_stratum: int,
) -> DataFrame:
    """Deterministic class-balanced subset: the first ``n_per_stratum``
    rows of each stratum in key-HASH order.

    The training-data balancing primitive (equal docs per language,
    equal examples per label): hash order makes the selection a pure
    function of the keys — stable under retries, partitioning, and
    engine (md5 on both sides), unlike ``sampleBy`` which draws from a
    seeded RNG stream and changes with partitioning. One shuffle on the
    stratum; the per-stratum sort is bounded by stratum size (for
    strata too large to sort, pre-filter with :func:`hash_sample` to
    ~2-3x the target and re-rank the survivors).
    """
    from pyspark.sql import Window

    w = Window.partitionBy(strata_col).orderBy(
        F.md5(F.col(key_col).cast("string")), F.col(key_col)
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n_per_stratum)
        .drop("__rn")
    )


def mixture_fractions(
    counts: dict[str, int], weights: dict[str, float], target_total: int
) -> dict[str, float]:
    """Per-stratum sampling fraction hitting a target domain mixture.

    ``fraction_s = min(1, target_total * weight_s / n_s)`` — a stratum
    smaller than its quota is taken whole (the standard under-supply
    rule in mixture construction: you cannot upsample what is not
    there; epoch-level repetition is a training-loop concern, not a
    data-engineering one).
    """
    if abs(sum(weights.values()) - 1.0) > 1e-6:
        raise ValueError("mixture weights must sum to 1")
    return {
        s: min(1.0, target_total * w / counts[s])
        for s, w in weights.items()
        if s in counts
    }


def mixture_sample(
    df: DataFrame,
    strata_col: str,
    key_col: str,
    weights: dict[str, float],
    target_total: int,
) -> DataFrame:
    """Deterministic sample approximating a target domain mixture
    (e.g. 40% en / 15% each de-es-fr-zh), the domain-reweighting
    primitive of pretraining-corpus construction (DoReMi-style fixed
    mixtures; public idea).

    Membership is the same md5-bucket predicate as :func:`hash_sample`
    — map-only per row once the per-stratum thresholds are known. The
    stratum count table is tiny (|domains| rows): computed in one
    aggregate and carried back as a literal CASE ladder, so the data
    path stays a single scan + filter with NO join and NO shuffle.
    Strata absent from ``weights`` are dropped (weight 0).
    """
    counts = {
        r["s"]: r["n"]
        for r in df.groupBy(F.col(strata_col).alias("s"))
        .agg(F.count("*").alias("n"))
        .collect()
    }
    fracs = mixture_fractions(counts, weights, target_total)
    bucket = hash_bucket(key_col)
    pred = F.lit(False)
    for s, frac in fracs.items():
        thr = int(frac * 256)
        keep = (
            F.lit(True) if thr >= 256 else bucket < F.lit(_hex2(thr))
        )
        pred = pred | ((F.col(strata_col) == s) & keep)
    return df.filter(pred)


def mixture_sample_sql(
    strata_sql: str,
    key_sql: str,
    weights: dict[str, float],
    target_total: int,
    table: str = "documents",
) -> str:
    """DuckDB twin of :func:`mixture_sample` — computes the same
    per-stratum thresholds from the same counts, in SQL."""
    cases = " ".join(
        f"WHEN {strata_sql} = '{s}' THEN {w!r}" for s, w in weights.items()
    )
    return f"""
WITH counts AS (
    SELECT {strata_sql} AS s, COUNT(*) AS n FROM {table} GROUP BY 1
),
fracs AS (
    SELECT s,
           LEAST(1.0, {target_total} * (CASE {cases} ELSE 0 END) / n)
               AS frac
    FROM counts
)
SELECT t.* FROM {table} t
JOIN fracs ON fracs.s = t.{strata_sql}
WHERE fracs.frac >= 1.0
   OR substring(md5(CAST(t.{key_sql} AS VARCHAR)), 1, 2)
      < printf('%02x', CAST(floor(fracs.frac * 256) AS INT))
"""


def weighted_sample(
    df: DataFrame, key_col: str, prob_col: str
) -> DataFrame:
    """Deterministic per-row weighted sampling: keep each row with
    probability ``prob_col`` (a [0,1] column, e.g. a quality score) —
    importance sampling for quality-weighted corpus construction,
    without rand() (retry-stable, engine-portable).

    Membership: md5 bucket of the key < floor(prob*256) rendered as
    2-hex — the same map-only predicate as :func:`hash_sample`, but the
    threshold is a per-row expression instead of a constant. Rows with
    prob >= 1 are always kept; granularity is 1/256 (prob < 1/256
    rounds to never-kept)."""
    thr = F.floor(F.col(prob_col) * 256).cast("int")
    keep = (F.col(prob_col) >= 1.0) | (
        hash_bucket(key_col) < F.format_string("%02x", thr)
    )
    return df.filter(keep)
