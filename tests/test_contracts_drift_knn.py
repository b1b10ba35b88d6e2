"""Round-3 batch 7: data contracts, PSI drift, changepoint scan,
KNN label agreement."""

from __future__ import annotations

import datetime as dt
import math

import pytest
from pyspark.sql import functions as F

from data_engineering_project_spark.operators import contracts as C
from data_engineering_project_spark.plans import workload


def test_contract_rules_count_planted_violations(spark):
    df = spark.createDataFrame(
        [
            (1, "F", 10.0, "1-URGENT"),
            (1, "O", -5.0, "9-BOGUS"),   # dup key, range, regex
            (None, "X", 20.0, "2-HIGH"),  # null key, enum
        ],
        "k long, status string, price double, prio string",
    )
    out = {
        r["rule"]: r["n_violations"]
        for r in C.evaluate(
            df,
            [
                C.not_null("k"),
                C.in_set("status", ["F", "O", "P"]),
                C.in_range("price", 0, 100),
                C.matches("prio", "^[1-5]-"),
                C.unique_key("k"),
            ],
        ).collect()
    }
    assert out == {
        "k_not_null": 1,
        "status_in_set": 1,
        "price_in_range": 1,
        "prio_matches": 1,
        "k_unique": 1,
    }


def test_contract_empty_list_and_explicit_kind_routing(spark):
    df = spark.createDataFrame(
        [(1, "a"), (1, "b")], "k long, name_unique string"
    )
    # empty contract: empty result frame, not IndexError
    empty = C.evaluate(df, [])
    assert empty.collect() == []
    assert [f.name for f in empty.schema.fields] == [
        "rule", "n_violations", "n_rows",
    ]
    # a hand-built ROW rule whose name ends in _unique must route to
    # the row-predicate path (kind field, not name sniffing)
    row_rule = C.Expectation(
        "looks_unique", F.col("name_unique").isNull()
    )
    out = {r["rule"]: r["n_violations"] for r in C.evaluate(df, [row_rule]).collect()}
    assert out == {"looks_unique": 0}


def test_orders_contract_is_clean_on_testdata(spark, sf_dir):
    rows = workload.QUERIES["orders_contract_violations"](spark, sf_dir).collect()
    assert len(rows) == 5
    assert all(r["n_violations"] == 0 for r in rows)
    assert all(r["n_rows"] > 0 for r in rows)


def _write_events(spark, tmp_path, rows, name):
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    d = str(tmp_path / name)
    df.coalesce(1).write.parquet(d + "/events.parquet")
    return d


def test_psi_near_zero_for_identical_halves_and_large_for_shifted(spark, tmp_path):
    rows = []
    eid = 0
    # identical halves: same values on day 1 and day 20
    for day in (1, 20):
        for i in range(100):
            eid += 1
            rows.append(
                (eid, dt.datetime(2024, 1, day), 1, "view", float(i % 400), "{}")
            )
    d1 = _write_events(spark, tmp_path, rows, "stable")
    r1 = workload.QUERIES["value_psi_drift"](spark, d1).collect()[0]
    assert abs(r1["psi"]) < 0.01

    rows2 = []
    eid = 0
    for i in range(100):  # first half: low values
        eid += 1
        rows2.append((eid, dt.datetime(2024, 1, 2), 1, "view", 10.0, "{}"))
    for i in range(100):  # second half: high values
        eid += 1
        rows2.append((eid, dt.datetime(2024, 1, 25), 1, "view", 450.0, "{}"))
    d2 = _write_events(spark, tmp_path, rows2, "shifted")
    r2 = workload.QUERIES["value_psi_drift"](spark, d2).collect()[0]
    assert r2["psi"] > 1.0


def test_changepoint_scan_returns_extreme_splits(spark, sf_dir):
    rows = workload.QUERIES["revenue_changepoint"](spark, sf_dir).collect()
    assert len(rows) == 5
    shifts = [r["mean_shift"] for r in rows]
    assert shifts == sorted(shifts, reverse=True)
    assert all(s >= 0 for s in shifts)


def test_knn_agreement_is_high_on_separable_labels(spark, tmp_path):
    # two tight orthogonal clusters: all 10-NN stay within the cluster
    rows = []
    for i in range(12):
        rows.append((i, [1.0 + 0.001 * i, 0.0, 0.0, 0.0], 0))
    for i in range(12):
        rows.append((100 + i, [0.0, 1.0 + 0.001 * i, 0.0, 0.0], 1))
    d = str(tmp_path / "sep")
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.parquet(d + "/embeddings.parquet")
    out = {
        r["label"]: r["avg_agreement"]
        for r in workload.QUERIES["knn_label_agreement"](spark, d).collect()
    }
    assert out == {0: 1.0, 1: 1.0}
