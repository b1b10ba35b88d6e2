"""Deterministic hash sampling/splits: stability, disjointness,
proportions, and parameter validation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_engineering_project_spark.operators import sampling


@pytest.fixture(scope="module")
def ids(spark):
    return spark.range(0, 2000).withColumnRenamed("id", "key")


def test_sample_is_deterministic_and_repartition_stable(spark, ids):
    a = sorted(r.key for r in sampling.hash_sample(ids, "key", 0.25).collect())
    b = sorted(
        r.key
        for r in sampling.hash_sample(ids.repartition(7), "key", 0.25).collect()
    )
    assert a == b
    assert len(a) > 0


def test_sample_fraction_roughly_holds(spark, ids):
    n = sampling.hash_sample(ids, "key", 0.25).count()
    assert 0.20 <= n / 2000 <= 0.30  # 256-bucket granularity + hash noise


def test_sample_is_nested(spark, ids):
    """A smaller sample is a subset of a larger one (threshold ranges
    nest) — lets a pipeline scale a sample up without resampling."""
    small = {r.key for r in sampling.hash_sample(ids, "key", 0.1).collect()}
    big = {r.key for r in sampling.hash_sample(ids, "key", 0.5).collect()}
    assert small <= big


def test_split_partitions_everything_exactly_once(spark, ids):
    out = sampling.hash_split(ids, "key", {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r.split: r.n for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == 2000
    assert set(counts) == {"train", "val", "test"}
    assert counts["train"] > counts["val"]
    # same key never changes split across invocations
    again = sampling.hash_split(ids, "key", {"train": 0.8, "val": 0.1, "test": 0.1})
    joined = out.alias("a").join(again.alias("b"), "key")
    assert joined.filter(F.col("a.split") != F.col("b.split")).count() == 0


def test_full_fraction_keeps_all(spark, ids):
    assert sampling.hash_sample(ids, "key", 1.0).count() == 2000


def test_bad_params_raise(spark, ids):
    with pytest.raises(ValueError):
        sampling.hash_sample(ids, "key", 1.5)
    with pytest.raises(ValueError):
        sampling.hash_split(ids, "key", {"a": 0.5, "b": 0.4})


def test_split_case_sql_mirrors_spark(spark, ids, oracle):
    weights = {"train": 0.8, "val": 0.1, "test": 0.1}
    spark_counts = {
        r.split: r.n
        for r in sampling.hash_split(ids, "key", weights)
        .groupBy("split")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    case = sampling.split_case_sql("key", weights)
    duck = dict(
        oracle.execute(
            f"SELECT {case} AS split, COUNT(*) FROM range(2000) t(key) GROUP BY split"
        ).fetchall()
    )
    assert spark_counts == duck


def test_stratified_sample_balanced_and_partitioning_invariant(spark, sf_dir):
    """Every stratum yields exactly min(n, stratum size) rows, and the
    selected set is identical under different partitionings."""
    from pyspark.sql import functions as F

    from data_engineering_project_spark.operators import sampling
    from data_engineering_project_spark.sources.parquet import read_testdata

    docs = read_testdata(spark, sf_dir, "documents").select("doc_id", "lang")
    out = sampling.stratified_sample(docs, "lang", "doc_id", 20)
    per = {r.lang: r.n for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    sizes = {r.lang: r.n for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert per == {lang: min(20, n) for lang, n in sizes.items()}

    a = {tuple(r) for r in out.collect()}
    b = {
        tuple(r)
        for r in sampling.stratified_sample(
            docs.repartition(17), "lang", "doc_id", 20
        ).collect()
    }
    assert a == b
