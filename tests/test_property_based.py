"""Property-based checks (hypothesis) for the custom operators the
reference has no oracle for — compared against naive Python references
on arbitrary inputs."""

from __future__ import annotations

from datetime import datetime, timedelta

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from data_engineering_project_spark.operators.asof import asof_join
from data_engineering_project_spark.operators.sessionize import session_counts

T0 = datetime(2024, 1, 1)

events_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),  # key
        st.integers(min_value=0, max_value=10_000),  # seconds offset
        st.integers(min_value=0, max_value=100),  # value
    ),
    min_size=0,
    max_size=40,
)


@settings(max_examples=10, deadline=None)
@given(left=events_strategy, right=events_strategy)
def test_asof_join_matches_naive(spark, left, right):
    # unique (key, ts) per side: equal-ts duplicates are tie-ambiguous
    # on any engine, so the property holds on the deterministic domain
    left = list({(k, t): (k, t, v) for k, t, v in left}.values())
    right = list({(k, t): (k, t, v) for k, t, v in right}.values())
    ldf = spark.createDataFrame(
        [(k, T0 + timedelta(seconds=t), v) for k, t, v in left] or [(0, T0, 0)],
        "k int, ts timestamp, lv int",
    )
    rdf = spark.createDataFrame(
        [(k, T0 + timedelta(seconds=t), v) for k, t, v in right],
        "k int, ts timestamp, rv int",
    ) if right else spark.createDataFrame([], "k int, ts timestamp, rv int")

    got = {
        (r.k, r.ts): r.rv_asof
        for r in asof_join(ldf, rdf, on="k", left_ts="ts", right_ts="ts",
                           value_cols=["rv"]).collect()
    }
    for k, t, _ in (left or [(0, 0, 0)]):
        lts = T0 + timedelta(seconds=t)
        candidates = [(T0 + timedelta(seconds=rt), rv) for rk, rt, rv in right
                      if rk == k and rt <= t]
        expected = max(candidates)[1] if candidates else None
        assert got[(k, lts)] == expected, (k, t, candidates)


@settings(max_examples=10, deadline=None)
@given(events=events_strategy)
def test_sessionize_matches_naive(spark, events):
    events = list({(k, t): (k, t, v) for k, t, v in events}.values())
    if not events:
        return
    df = spark.createDataFrame(
        [(i, k, T0 + timedelta(seconds=t)) for i, (k, t, _) in enumerate(events)],
        "event_id long, user_id int, ts timestamp",
    )
    gap = 600
    got = {r.user_id: (r.n_sessions, r.n_events)
           for r in session_counts(df, "user_id", "ts", "event_id", gap).collect()}
    by_user: dict[int, list[int]] = {}
    for k, t, _ in events:
        by_user.setdefault(k, []).append(t)
    for k, ts_list in by_user.items():
        ts_list.sort()
        sessions = 1 + sum(1 for a, b in zip(ts_list, ts_list[1:]) if b - a > gap)
        assert got[k] == (sessions, len(ts_list)), (k, ts_list)


@settings(max_examples=10, deadline=None)
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 5), st.floats(0, 1000, allow_nan=False)),
        min_size=1,
        max_size=50,
    )
)
def test_salted_agg_equals_plain_agg(spark, rows):
    from data_engineering_project_spark.operators.skew import salted_agg

    df = spark.createDataFrame(
        [(k, float(v), i) for i, (k, v) in enumerate(rows)], "k int, v double, rid long"
    )
    plain = {r.k: (r.n, round(r.s, 6), r.mn) for r in df.groupBy("k").agg(
        F.count("v").alias("n"), F.sum("v").alias("s"), F.min("v").alias("mn")
    ).collect()}
    salted = {r.k: (r.n, round(r.s, 6), r.mn) for r in salted_agg(
        df, ["k"], {"n": ("count", "v"), "s": ("sum", "v"), "mn": ("min", "v")},
        salt_from=["rid"], salt_buckets=4
    ).collect()}
    assert salted == plain


scd2_batch = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),              # key
        st.sampled_from(["a", "b", "c", None]),             # attr value
    ),
    min_size=0,
    max_size=8,
).map(lambda rows: list({k: (k, v) for k, v in rows}.values()))  # unique keys


@settings(max_examples=8, deadline=None)
@given(b1=scd2_batch, b2=scd2_batch, b3=scd2_batch)
def test_scd2_invariants_on_arbitrary_batches(spark, b1, b2, b3):
    """SCD2 invariants under arbitrary update sequences: at most one
    current row per key, validity intervals per key are non-overlapping
    and contiguous from first sight, the current row always reflects
    the latest batch that mentioned the key, and re-applying the final
    batch is a no-op."""
    from data_engineering_project_spark.plans.incremental import scd2_apply

    def df(rows):
        return (
            spark.createDataFrame(rows, "k int, attr string")
            if rows
            else spark.createDataFrame([], "k int, attr string")
        )

    ts = ["2024-01-01 00:00:00", "2024-02-01 00:00:00", "2024-03-01 00:00:00"]
    dim = None
    latest: dict[int, str | None] = {}
    for rows, t in zip((b1, b2, b3), ts):
        if not rows:
            continue
        dim = scd2_apply(dim, df(rows), "k", ["attr"], t)
        for k, v in rows:
            latest[k] = v
    if dim is None:
        return
    dim = dim.localCheckpoint(eager=True)
    collected = dim.collect()

    # at most one current row per key; current attr == latest seen
    current = [r for r in collected if r.is_current]
    assert len({r.k for r in current}) == len(current)
    assert {r.k: r.attr for r in current} == latest

    # per-key intervals: closed rows end where the next begins; no overlap
    from collections import defaultdict

    by_key = defaultdict(list)
    for r in collected:
        by_key[r.k].append((r.valid_from, r.valid_to))
    for k, ivs in by_key.items():
        ivs.sort()
        for (f1, t1), (f2, _) in zip(ivs, ivs[1:]):
            assert t1 == f2, (k, ivs)
        assert ivs[-1][1] is None  # newest interval open

    # idempotence: re-applying the last non-empty batch later is a no-op
    last = next((rows for rows in (b3, b2, b1) if rows), None)
    if last:
        dim2 = scd2_apply(dim, df(last), "k", ["attr"], "2024-04-01 00:00:00")
        a = sorted(map(repr, map(tuple, collected)))
        b = sorted(map(repr, map(tuple, dim2.collect())))
        assert a == b
