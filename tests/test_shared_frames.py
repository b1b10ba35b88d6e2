"""The per-session shared-frame memo (plans/workload._shared_frame)."""

from __future__ import annotations

from data_engineering_project_spark.plans import workload


def test_shared_frame_builds_once_per_key(spark, sf_dir):
    calls = {"n": 0}

    def build():
        calls["n"] += 1
        return workload.load(spark, sf_dir, "region")

    a = workload._shared_frame(spark, sf_dir, "test_region", build)
    b = workload._shared_frame(spark, sf_dir, "test_region", build)
    assert a is b
    assert calls["n"] == 1
    # a different sf_dir (or tag) is a different key
    c = workload._shared_frame(spark, sf_dir + "/", "test_region", build)
    assert calls["n"] == 2
    assert c is not a
    # the memoized frame is materialized (checkpointed) and readable
    assert a.count() == 5


def test_shared_frame_outputs_match_unshared_build(spark, sf_dir):
    """The memo is pure caching: a query through the shared frame must
    equal the same pipeline built from scratch."""
    from pyspark.sql import functions as F

    shared = workload._copurchase_pair_counts(spark, sf_dir)
    items = (
        workload.load(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a, b = items.alias("a"), items.alias("b")
    fresh = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("part_a"),
            F.col("b.l_partkey").alias("part_b"),
        )
        .agg(F.count("*").alias("n_both"))
    )
    got = sorted(map(tuple, shared.collect()))
    want = sorted(map(tuple, fresh.collect()))
    assert got == want and len(got) > 0
