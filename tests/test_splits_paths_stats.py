"""Round-3 batch 2: k-fold assignment, class weights, session paths,
vocabulary growth, chi-square independence."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from data_engineering_project_spark.plans import workload


def test_kfold_assignment_is_deterministic_and_total(spark, sf_dir):
    a = workload.QUERIES["kfold_balance"](spark, sf_dir).collect()
    b = workload.QUERIES["kfold_balance"](spark, sf_dir).collect()
    assert a == b
    assert {r["fold"] for r in a} <= {0, 1, 2, 3, 4}
    n_docs = workload.load(spark, sf_dir, "documents").count()
    assert sum(r["n_docs"] for r in a) == n_docs


def test_label_weights_rebalance_to_total(spark, sf_dir):
    rows = workload.QUERIES["label_weights"](spark, sf_dir).collect()
    total = sum(r["n_vecs"] for r in rows)
    # sum over classes of n_l * (N / (K n_l)) == N exactly; rounding to
    # 4dp perturbs each term by < n_l * 5e-5
    recon = sum(r["n_vecs"] * r["weight"] for r in rows)
    assert recon == pytest.approx(total, rel=1e-3)
    assert all(r["weight"] > 0 for r in rows)


def _write_events(spark, tmp_path, rows, name):
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    d = str(tmp_path / name)
    df.coalesce(1).write.parquet(d + "/events.parquet")
    return d


def test_session_paths_split_on_gap_and_sort_within_session(spark, tmp_path):
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        # user 1, one session: view>click>purchase
        (1, t0, 1, "view", 0.0, "{}"),
        (2, t0 + dt.timedelta(minutes=5), 1, "click", 0.0, "{}"),
        (3, t0 + dt.timedelta(minutes=10), 1, "purchase", 0.0, "{}"),
        # user 1, >1h gap starts a NEW session: view
        (4, t0 + dt.timedelta(hours=3), 1, "view", 0.0, "{}"),
        # user 2 repeats the common path
        (5, t0, 2, "view", 0.0, "{}"),
        (6, t0 + dt.timedelta(minutes=1), 2, "click", 0.0, "{}"),
        (7, t0 + dt.timedelta(minutes=2), 2, "purchase", 0.0, "{}"),
    ]
    d = _write_events(spark, tmp_path, rows, "paths")
    out = {
        r["path"]: r["n_sessions"]
        for r in workload.QUERIES["session_paths_top"](spark, d).collect()
    }
    assert out == {"view>click>purchase": 2, "view": 1}


def test_vocab_growth_is_monotone_and_ends_at_full_vocab(spark, sf_dir):
    rows = workload.QUERIES["vocab_growth_curve"](spark, sf_dir).collect()
    assert [r["decile"] for r in rows] == list(range(1, 11))
    for prev, cur in zip(rows, rows[1:]):
        assert cur["vocab_size"] >= prev["vocab_size"]
        assert cur["n_docs"] >= prev["n_docs"]
    docs = workload.load(spark, sf_dir, "documents")
    full_vocab = (
        docs.select(F.explode(F.split("text", " ")).alias("t"))
        .select("t")
        .distinct()
        .count()
    )
    assert rows[-1]["vocab_size"] == full_vocab
    assert rows[-1]["n_docs"] == docs.count()


def _write_docs(spark, tmp_path, rows, name):
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    d = str(tmp_path / name)
    df.coalesce(1).write.parquet(d + "/documents.parquet")
    return d


def test_chi2_zero_when_independent_positive_when_skewed(spark, tmp_path):
    # perfectly independent 2x2: every (lang, source) cell has 5 docs
    indep = [
        (i, "w", lang, src, 1)
        for i, (lang, src) in enumerate(
            [(l, s) for l in ("en", "fr") for s in ("a", "b")] * 5
        )
    ]
    d1 = _write_docs(spark, tmp_path, indep, "indep")
    r1 = workload.QUERIES["lang_source_chi2"](spark, d1).collect()[0]
    assert r1["chi2"] == pytest.approx(0.0, abs=1e-9)
    assert r1["dof"] == 1 and r1["n_total"] == 20

    # fully dependent: en only in a, fr only in b
    dep = [(i, "w", "en", "a", 1) for i in range(10)] + [
        (i + 10, "w", "fr", "b", 1) for i in range(10)
    ]
    d2 = _write_docs(spark, tmp_path, dep, "dep")
    r2 = workload.QUERIES["lang_source_chi2"](spark, d2).collect()[0]
    # 2x2 full dependence: chi2 == N
    assert r2["chi2"] == pytest.approx(20.0, abs=1e-6)


def test_mutual_information_zero_for_independent_grid(spark, tmp_path):
    # same independent 2x2 grid as the chi2 test: MI must be ~0
    indep = [
        (i, "w", lang, src, 1)
        for i, (lang, src) in enumerate(
            [(l, s) for l in ("en", "fr") for s in ("a", "b")] * 5
        )
    ]
    d = _write_docs(spark, tmp_path, indep, "mi_indep")
    r = workload.QUERIES["lang_source_mutual_information"](spark, d).collect()[0]
    assert abs(r["mutual_information_bits"]) < 1e-9

    # fully dependent 2x2: MI = 1 bit exactly
    dep = [(i, "w", "en", "a", 1) for i in range(10)] + [
        (i + 10, "w", "fr", "b", 1) for i in range(10)
    ]
    d2 = _write_docs(spark, tmp_path, dep, "mi_dep")
    r2 = workload.QUERIES["lang_source_mutual_information"](spark, d2).collect()[0]
    assert abs(r2["mutual_information_bits"] - 1.0) < 1e-9
