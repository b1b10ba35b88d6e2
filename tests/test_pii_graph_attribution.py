"""Round-3 batch: PII redaction, triangle counting, attribution and
anomaly queries — planted-fixture invariants."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from data_engineering_project_spark.operators import pii
from data_engineering_project_spark.operators.graph import triangle_counts
from data_engineering_project_spark.plans import workload


# ---------------------------------------------------------------- PII


def test_pii_redacts_planted_examples(spark):
    df = spark.createDataFrame(
        [
            (1, "mail me at jo.doe+x@sub.example.org today"),
            (2, "server at 192.168.0.1 answered"),
            (3, "call +1 555-0199 now"),
            (4, "clean text with no identifiers"),
            (5, "both a@b.co and 10.0.0.255 here"),
        ],
        "id long, text string",
    )
    out = {r["id"]: r for r in pii.scan_and_redact(df, "text").collect()}
    assert out[1]["redacted"] == "mail me at [EMAIL] today"
    assert out[1]["has_email"] == 1 and out[1]["has_ipv4"] == 0
    assert out[2]["redacted"] == "server at [IP] answered"
    assert out[3]["redacted"] == "call [PHONE] now"
    assert out[3]["has_phone"] == 1
    assert out[4]["redacted"] == out[4]["text"]
    assert out[4]["has_email"] == out[4]["has_phone"] == out[4]["has_ipv4"] == 0
    assert out[5]["redacted"] == "both [EMAIL] and [IP] here"


def test_pii_email_redacted_before_ip_protects_dotted_quads(spark):
    # a dotted quad INSIDE an email domain must vanish with the email,
    # not get half-rewritten by the IP pass
    df = spark.createDataFrame([(1, "x 1.2.3.4@9.8.7.6.net y")], "id long, text string")
    row = pii.scan_and_redact(df, "text").collect()[0]
    assert row["redacted"] == "x [EMAIL] y"


def test_pii_scan_query_counts_follow_the_planting_rule(spark, sf_dir):
    rows = workload.QUERIES["pii_redaction_scan"](spark, sf_dir).collect()
    assert rows, "every source bucket should appear"
    n_docs = sum(r["n_docs"] for r in rows)
    # email planted on EVERY doc; phone on doc_id%3==0; ip on %2==0
    # (per-source splits of the modulo depend on how the generator
    # assigns doc_id -> source, so assert corpus-wide)
    assert sum(r["n_email"] for r in rows) == n_docs
    assert 0 < sum(r["n_phone"] for r in rows) < n_docs
    assert 0 < sum(r["n_ipv4"] for r in rows) < n_docs
    for r in rows:
        assert r["n_distinct"] <= r["n_docs"]


# ---------------------------------------------------------- triangles


def _canon_edges(spark, pairs):
    canon = list({(min(a, b), max(a, b)) for a, b in pairs})
    return spark.createDataFrame(canon, "src long, dst long")


def test_single_triangle_credits_each_corner_once(spark):
    out = triangle_counts(_canon_edges(spark, [(1, 2), (2, 3), (1, 3)]))
    rows = {r["node"]: r["n_triangles"] for r in out.collect()}
    assert rows == {1: 1, 2: 1, 3: 1}


def test_k4_has_three_triangles_per_node(spark):
    pairs = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    out = triangle_counts(_canon_edges(spark, pairs))
    rows = {r["node"]: r["n_triangles"] for r in out.collect()}
    # K4: C(3,2)=3 triangles through each of the 4 nodes, 4 total
    assert rows == {1: 3, 2: 3, 3: 3, 4: 3}
    assert sum(rows.values()) == 3 * 4


def test_path_graph_has_no_triangles(spark):
    out = triangle_counts(_canon_edges(spark, [(1, 2), (2, 3), (3, 4)]))
    assert out.count() == 0


# -------------------------------------------------------- attribution


def test_purchase_attribution_first_and_last_touch(spark, tmp_path, sf_dir):
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        # user 1: view -> click -> purchase  => (view, click)
        (1, t0, 1, "view", 0.0, "{}"),
        (2, t0 + dt.timedelta(hours=1), 1, "click", 0.0, "{}"),
        (3, t0 + dt.timedelta(hours=2), 1, "purchase", 9.0, "{}"),
        # user 2: signup -> purchase -> click => (signup, signup):
        # the click AFTER the first purchase must not count
        (4, t0, 2, "signup", 0.0, "{}"),
        (5, t0 + dt.timedelta(hours=1), 2, "purchase", 5.0, "{}"),
        (6, t0 + dt.timedelta(hours=2), 2, "click", 0.0, "{}"),
        # user 3: purchase with NO prior events => excluded
        (7, t0, 3, "purchase", 1.0, "{}"),
        # user 4: never purchases => excluded
        (8, t0, 4, "view", 0.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    d = str(tmp_path / "attr")
    df.coalesce(1).write.parquet(d + "/events.parquet")
    out = {
        (r["first_touch"], r["last_touch"]): r["n_users"]
        for r in workload.QUERIES["purchase_attribution"](spark, d).collect()
    }
    assert out == {("view", "click"): 1, ("signup", "signup"): 1}


# ------------------------------------------------------------ anomaly


def test_hourly_anomaly_flags_only_the_spiked_hour(spark, tmp_path):
    rows = []
    eid = 0
    # 10 days x hour 03: baseline of 5 events, day 9 spikes to 50
    for day in range(1, 11):
        n = 50 if day == 9 else 5
        for i in range(n):
            eid += 1
            rows.append(
                (eid, dt.datetime(2024, 1, day, 3, 0, i % 60), 1, "view", 0.0, "{}")
            )
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    d = str(tmp_path / "anom")
    df.coalesce(1).write.parquet(d + "/events.parquet")
    out = workload.QUERIES["events_hourly_anomalies"](spark, d).collect()
    assert [r["hour_ts"] for r in out] == [dt.datetime(2024, 1, 9, 3)]
    assert out[0]["n_events"] == 50 and out[0]["zscore"] > 2.0
