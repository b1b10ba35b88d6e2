"""operators/quantile_sketch.py — mergeable t-digest."""

from __future__ import annotations

import numpy as np
import pytest

from data_engineering_project_spark.operators import quantile_sketch as qsk

QS = [0.01, 0.05, 0.25, 0.5, 0.75, 0.95, 0.99]


def _rank(sorted_vals: np.ndarray, x: float) -> float:
    return np.searchsorted(sorted_vals, x) / len(sorted_vals)


@pytest.mark.parametrize(
    "dist",
    ["uniform", "lognormal", "normal", "bimodal"],
)
def test_rank_error_within_one_percent(dist):
    rng = np.random.default_rng(3)
    vals = {
        "uniform": rng.uniform(0, 1000, 50000),
        "lognormal": rng.lognormal(3, 1.5, 50000),
        "normal": rng.normal(0, 5, 50000),
        "bimodal": np.concatenate(
            [rng.normal(-50, 3, 25000), rng.normal(50, 3, 25000)]
        ),
    }[dist]
    m, c = qsk.tdigest_of(vals, delta=200)
    assert c.sum() == len(vals)  # count-lossless
    assert len(m) < 1500  # O(delta log n) size bound
    v = np.sort(vals)
    for q, e in zip(QS, qsk.tdigest_quantile(m, c, QS)):
        assert abs(_rank(v, float(e)) - q) < 0.01, (dist, q)


def test_merge_matches_direct_accuracy_and_is_deterministic():
    rng = np.random.default_rng(11)
    vals = rng.lognormal(2, 1, 60000)
    chunks = np.array_split(vals, 13)
    merged = qsk.merge_tdigests(
        [qsk.tdigest_of(ch, 200) for ch in chunks], 200
    )
    v = np.sort(vals)
    for q, e in zip(QS, qsk.tdigest_quantile(*merged, QS)):
        assert abs(_rank(v, float(e)) - q) < 0.015, q
    assert merged[1].sum() == len(vals)
    # deterministic: same input -> bit-identical digest
    again = qsk.merge_tdigests(
        [qsk.tdigest_of(ch, 200) for ch in chunks], 200
    )
    assert np.array_equal(merged[0], again[0])
    assert np.array_equal(merged[1], again[1])


def test_edge_cases():
    # empty, single value, NaNs, constant column
    m, c = qsk.tdigest_of(np.array([]))
    assert len(m) == 0
    assert np.isnan(qsk.tdigest_quantile(m, c, [0.5])[0])
    m, c = qsk.tdigest_of(np.array([42.0]))
    assert qsk.tdigest_quantile(m, c, [0.0, 0.5, 1.0]) == pytest.approx(
        [42.0] * 3
    )
    m, c = qsk.tdigest_of(np.array([1.0, np.nan, 3.0]))
    assert c.sum() == 2
    m, c = qsk.tdigest_of(np.full(10000, 7.0), delta=100)
    assert len(m) < 150 and qsk.tdigest_quantile(m, c, [0.5])[0] == 7.0


def test_digest_by_partition_equivalent_within_band(spark, sf_dir):
    """r8 VERDICT item 3: the partition-partials path (mapInPandas +
    mergeable rollup — no group ever in one pandas batch) must agree
    with digest_by_group inside the rank-error band, preserve counts,
    and stay size-bounded, per day AND after global rollup."""
    from pyspark.sql import functions as F

    from data_engineering_project_spark.sources.parquet import read_testdata

    ev = (
        read_testdata(spark, sf_dir, "events")
        .select(F.date_trunc("day", F.col("ts")).alias("day"), "value")
        .repartition(16)  # force groups to straddle many batches
    )
    by_group = {
        r["day"]: r for r in qsk.digest_by_group(ev, "value", ["day"], 150).collect()
    }
    by_part = {
        r["day"]: r
        for r in qsk.digest_by_partition(ev, "value", ["day"], 150).collect()
    }
    assert set(by_part) == set(by_group)
    for day, rp in by_part.items():
        rg = by_group[day]
        assert rp["digest_n"] == rg["digest_n"]  # count-lossless
        assert len(rp["digest_means"]) <= 1500
        eg = qsk.tdigest_quantile(rg["digest_means"], rg["digest_counts"], QS)
        ep = qsk.tdigest_quantile(rp["digest_means"], rp["digest_counts"], QS)
        spread = eg[-1] - eg[0] or 1.0
        assert np.all(np.abs(eg - ep) <= 0.05 * spread + 1e-9), day

    # global rollup from partition partials: same invariant contract
    # the driver checks in value_quantile_sketch
    top = qsk.rollup_digests(
        qsk.digest_by_partition(ev, "value", ["day"], 200), [], 200
    ).collect()[0]
    n = ev.count()
    assert top["digest_n"] == n and sum(top["digest_counts"]) == n
    est = qsk.tdigest_quantile(top["digest_means"], top["digest_counts"], QS)
    bounds = ev.agg(
        F.expr(
            "percentile(value, array({}))".format(
                ",".join(
                    f"{max(q - 0.02, 0)},{min(q + 0.02, 1)}" for q in QS
                )
            )
        ).alias("p")
    ).collect()[0]["p"]
    for i, e in enumerate(est):
        assert bounds[2 * i] <= float(e) <= bounds[2 * i + 1], QS[i]


def test_spark_group_digest_and_rollup(spark, sf_dir):
    """The Spark surface: per-day digests, digest-only rollup, and the
    rolled-up estimate vs the exact percentile of the same frame."""
    from pyspark.sql import functions as F

    from data_engineering_project_spark.sources.parquet import read_testdata

    ev = read_testdata(spark, sf_dir, "events").select(
        F.date_trunc("day", F.col("ts")).alias("day"), "value"
    )
    daily = qsk.digest_by_group(ev, "value", ["day"], delta=150)
    rows = daily.collect()
    assert len(rows) == ev.select("day").distinct().count()
    assert all(len(r["digest_means"]) == len(r["digest_counts"]) for r in rows)

    top = qsk.rollup_digests(daily, [], delta=150).collect()
    assert len(top) == 1
    n = ev.count()
    assert top[0]["digest_n"] == n
    est = qsk.tdigest_quantile(
        top[0]["digest_means"], top[0]["digest_counts"], [0.5]
    )[0]
    lo, hi = ev.agg(
        F.expr("percentile(value, array(0.47, 0.53))").alias("p")
    ).collect()[0]["p"]
    assert lo <= est <= hi
