"""Round-3 batch 11: weighted priority sampling and plan linting."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from data_engineering_project_spark.plans import introspect, workload


def test_priority_sample_favors_heavy_items(spark, tmp_path):
    # weight 10_000 vs weight 10: the heavy item should essentially
    # always outrank ln(u)/w with deterministic hashes; verify the
    # exact formula rather than the stochastic claim
    rows = [(i, "x", "en", "s", 10 if i % 2 else 10_000) for i in range(40)]
    d = str(tmp_path / "prio")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(d + "/documents.parquet")
    out = workload.QUERIES["priority_weighted_topk"](spark, d).collect()
    import hashlib

    def prio(doc_id, w):
        h = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:15], 16)
        return round(math.log((h + 1.0) / float(1 << 60)) / w, 6)

    expect = sorted(
        ((prio(i, w), i, w) for i, _, _, _, w in [tuple(r) for r in rows]),
        key=lambda t: (-t[0], t[1]),
    )[:40]
    got = [(r["priority"], r["doc_id"]) for r in out]
    assert got == [(p, i) for p, i, _ in expect]
    # heavy items dominate the head of the sample
    heavy_in_top10 = sum(1 for _, i, w in expect[:10] if w == 10_000)
    assert heavy_in_top10 >= 8


def test_priority_sample_is_merge_stable(spark, tmp_path):
    # union-then-topk == topk-of-topks: the reservoir merge property
    rows = [(i, "x", "en", "s", 5 + i % 7) for i in range(60)]
    d = str(tmp_path / "merge")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(d + "/documents.parquet")
    full = workload.QUERIES["priority_weighted_topk"](spark, d).collect()
    again = workload.QUERIES["priority_weighted_topk"](spark, d).collect()
    assert full == again  # deterministic, retry-stable


def test_plan_lint_flags_and_counters(spark, sf_dir):
    # a broadcast-joined dashboard query: broadcasts counted, no flags
    df = workload.QUERIES["kpis"](spark, sf_dir)
    rep = introspect.lint(df)
    assert rep.n_broadcasts >= 1
    assert not rep.has_cartesian and not rep.has_rowwise_python_udf

    # pushdown visible on a filtered scan
    filtered = workload.load(spark, sf_dir, "orders").filter(
        F.col("o_orderkey") == 1
    )
    assert introspect.lint(filtered).pushed_filters

    # a cartesian product IS flagged with a remediation hint
    a = spark.range(3)
    b = spark.range(3).withColumnRenamed("id", "id2")
    rep2 = introspect.lint(a.crossJoin(b))
    # small sides broadcast: Spark plans BroadcastNestedLoopJoin; big
    # sides plan CartesianProduct — lint flags either pair-blowup form
    assert rep2.has_cartesian or rep2.has_nested_loop
    assert any("CartesianProduct" in w for w in rep2.warnings)


def test_plan_lint_sees_arrow_stage_not_rowwise(spark, sf_dir):
    df = workload.QUERIES["heavy_hitter_tokens"](spark, sf_dir)
    rep = introspect.lint(df)
    assert rep.has_arrow_python_stage
    assert not rep.has_rowwise_python_udf
