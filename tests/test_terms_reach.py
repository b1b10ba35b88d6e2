"""Planted-data semantics tests for term-level corpus statistics
(operators/terms.py), sliding-window reach (operators/reach.py), and
table profiling (plans/quality.profile_columns)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from data_engineering_project_spark.operators import reach, terms
from data_engineering_project_spark.plans import quality


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_term_frequencies_counts_occurrences(spark):
    df = _docs(spark, [(1, "a b a", "s1"), (2, "b", "s1")])
    got = {
        (r.doc_id, r.term): r.tf
        for r in terms.term_frequencies(df, "text", "doc_id").collect()
    }
    assert got == {(1, "a"): 2, (1, "b"): 1, (2, "b"): 1}


def test_document_frequencies_dedup_within_doc(spark):
    df = _docs(spark, [(1, "a a b", "s1"), (2, "a c", "s1")])
    got = {r.term: r.df for r in terms.document_frequencies(df, "text", "doc_id").collect()}
    assert got == {"a": 2, "b": 1, "c": 1}


def test_tfidf_ranks_distinctive_terms_first(spark):
    # "rare" appears only in doc 1; "common" appears everywhere → idf 0.
    df = _docs(
        spark,
        [
            (1, "common rare rare", "s1"),
            (2, "common x", "s1"),
            (3, "common y", "s1"),
        ],
    )
    top = terms.tfidf_topk(df, "text", "doc_id", k=1)
    doc1 = {r.doc_id: r.term for r in top.collect()}[1]
    assert doc1 == "rare"
    # ln(3/3) = 0 → "common" scores 0 in every doc
    scores = {
        (r.doc_id, r.term): r.tfidf
        for r in terms.tfidf_topk(df, "text", "doc_id", k=3).collect()
    }
    assert scores[(2, "common")] == 0.0


def test_stopword_candidates_threshold_is_strict(spark):
    # "every" in 4/4 docs, "half" in 2/4 — at min_doc_ratio=0.5 only the
    # strictly-greater term qualifies.
    df = _docs(
        spark,
        [
            (1, "every half", "s1"),
            (2, "every half", "s1"),
            (3, "every x", "s1"),
            (4, "every y", "s1"),
        ],
    )
    got = {r.term for r in terms.stopword_candidates(df, "text", "doc_id", 0.5).collect()}
    assert got == {"every"}


def test_word_bigram_counts(spark):
    df = _docs(spark, [(1, "a b c", "s1"), (2, "a b", "s1"), (3, "solo", "s1")])
    got = {r.bigram: r.n for r in terms.word_bigram_counts(df, "text").collect()}
    assert got == {"a b": 2, "b c": 1}


def test_vocab_jaccard_known_overlap(spark):
    # s1 vocab {a,b,c}, s2 vocab {b,c,d} → |∩|=2, |∪|=4 → 0.5
    df = _docs(spark, [(1, "a b c", "s1"), (2, "b c d", "s2")])
    rows = terms.vocab_jaccard(df, "text", "source").collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.grp_a, r.grp_b, r.n_common, r.jaccard) == ("s1", "s2", 2, 0.5)


def test_rolling_reach_window_semantics(spark):
    # user 1 active day 1; user 2 active day 1 and day 9.
    # 3-day window: day1 reach {1,2}; day9 reach {2} (day1 aged out).
    d = datetime.datetime
    ev = spark.createDataFrame(
        [
            (d(2024, 1, 1, 10), 1),
            (d(2024, 1, 1, 11), 2),
            (d(2024, 1, 9, 10), 2),
        ],
        "ts timestamp, user_id long",
    )
    got = {r.day.isoformat(): r.reach for r in
           reach.rolling_reach(ev, "ts", "user_id", window_days=3).collect()}
    # Only days that appear in the data are reported.
    assert got == {"2024-01-01": 2, "2024-01-09": 1}


def test_rolling_reach_counts_trailing_days(spark):
    # user 1 on day 1, user 2 on day 2: day 2's trailing-7d reach = 2.
    d = datetime.datetime
    ev = spark.createDataFrame(
        [(d(2024, 1, 1, 1), 1), (d(2024, 1, 2, 1), 2)],
        "ts timestamp, user_id long",
    )
    got = {r.day.isoformat(): r.reach for r in
           reach.rolling_reach(ev, "ts", "user_id", window_days=7).collect()}
    assert got == {"2024-01-01": 1, "2024-01-02": 2}


def test_profile_columns(spark):
    df = spark.createDataFrame(
        [(1, "x"), (2, None), (2, "y")], "k long, v string"
    )
    got = {
        r.column_name: (r.null_count, r.distinct_count)
        for r in quality.profile_columns(df, ["k", "v"]).collect()
    }
    assert got == {"k": (0, 2), "v": (1, 2)}
