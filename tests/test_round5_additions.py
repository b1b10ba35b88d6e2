"""Round-5 batch: invariant tests for the sketch-audit and weighted
sampling additions.

Cross-engine value equality is covered by test_oracle_parity; these
tests pin the MATHEMATICAL invariants each query's semantics promise.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from data_engineering_project_spark.plans import workload


def test_quantile_sketch_audit_flags_hold_and_values_are_order_stats(
    spark, sf_dir
):
    rows = workload.QUERIES["quantile_sketch_audit"](spark, sf_dir).collect()
    assert [r["q"] for r in rows] == [0.5, 0.95, 0.99]
    li = workload.load(spark, sf_dir, "lineitem")
    n = li.count()
    for r in rows:
        assert r["n_rows"] == n
        assert r["rank_err_within_bound"] is True
        # the exact value really is the ceil(q*n)-th order statistic:
        # count(v < x) < k <= count(v <= x)
        import math

        k = math.ceil(r["q"] * n)
        lt = li.filter(F.col("l_extendedprice") < r["exact_value"]).count()
        le = li.filter(F.col("l_extendedprice") <= r["exact_value"]).count()
        assert lt < k <= le
    # quantile values are monotone in q
    vals = [r["exact_value"] for r in rows]
    assert vals == sorted(vals)


def test_weighted_sample_ares_is_a_valid_wor_sample(spark, sf_dir):
    out = workload.QUERIES["weighted_sample_ares"](spark, sf_dir)
    rows = out.collect()
    docs = workload.load(spark, sf_dir, "documents")
    n_eligible = docs.filter(F.col("n_chars") > 0).count()
    assert len(rows) == min(50, n_eligible)
    # without replacement: all distinct
    assert len({r["doc_id"] for r in rows}) == len(rows)
    # keys are ln(u)/w with u in (0,1] and w > 0 -> all <= 0, and the
    # output is ranked best-first
    keys = [r["es_key"] for r in rows]
    assert all(k <= 0 for k in keys)
    assert keys == sorted(keys, reverse=True)
    # the cut is real: every kept key beats every dropped key (modulo
    # the 10dp rounding tie broken by doc_id)
    kept_min = min(keys)
    dropped_max = (
        docs.filter(F.col("n_chars") > 0)
        .join(
            out.select("doc_id").withColumn("_k", F.lit(1)),
            "doc_id",
            "left_anti",
        )
        .select(
            F.round(
                F.log(
                    (
                        F.conv(
                            F.substring(
                                F.md5(F.col("doc_id").cast("string")), 1, 15
                            ),
                            16,
                            10,
                        ).cast("long")
                        + F.lit(1.0)
                    )
                    / F.lit(float(1 << 60))
                )
                / F.col("n_chars"),
                10,
            ).alias("k")
        )
        .agg(F.max("k"))
        .collect()[0][0]
    )
    if dropped_max is not None:
        assert dropped_max <= kept_min


def test_weighted_sample_ares_favors_heavier_docs(spark, sf_dir):
    """Length-weighted sampling must skew the sample toward longer
    docs: the sample's mean n_chars should exceed the corpus mean."""
    out = workload.QUERIES["weighted_sample_ares"](spark, sf_dir)
    docs = workload.load(spark, sf_dir, "documents").filter(
        F.col("n_chars") > 0
    )
    sample_mean = (
        docs.join(out.select("doc_id"), "doc_id")
        .agg(F.avg("n_chars"))
        .collect()[0][0]
    )
    corpus_mean = docs.agg(F.avg("n_chars")).collect()[0][0]
    assert sample_mean > corpus_mean
