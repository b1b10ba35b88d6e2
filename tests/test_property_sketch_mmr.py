"""Property-based checks for the round-3 operators: Misra-Gries heavy
hitters against brute force, MMR against a naive greedy reference, and
PII redaction idempotence — arbitrary inputs, exact references."""

from __future__ import annotations

from collections import Counter

import numpy as np
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from data_engineering_project_spark.operators import frequency, pii
from data_engineering_project_spark.operators.similarity import mmr_select

token_stream = st.lists(
    st.sampled_from([f"t{i}" for i in range(12)]),
    min_size=1,
    max_size=300,
)


@settings(max_examples=10, deadline=None)
@given(tokens=token_stream, k=st.integers(min_value=2, max_value=6))
def test_heavy_hitters_equals_brute_force(spark, tokens, k):
    toks = spark.createDataFrame(
        [(t,) for t in tokens], "tok string"
    ).repartition(3)
    got = {
        (r["tok"], r["cnt"])
        for r in frequency.heavy_hitters(toks, "tok", k=k).collect()
    }
    n = len(tokens)
    want = {
        (t, c) for t, c in Counter(tokens).items() if c * k > n
    }
    assert got == want


vec_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),   # direction index
        st.integers(min_value=50, max_value=99),  # relevance percent
    ),
    min_size=1,
    max_size=8,
)


@settings(max_examples=10, deadline=None)
@given(cands=vec_strategy, k=st.integers(min_value=1, max_value=5))
def test_mmr_matches_naive_greedy(spark, cands, k):
    lam = 0.7
    rows = []
    for i, (d, relp) in enumerate(cands):
        vec = [0.0] * 4
        vec[d] = 1.0
        rows.append((1, i, vec, relp / 100.0))
    df = spark.createDataFrame(
        rows,
        "query_id long, neighbor_id long, embedding array<double>, relevance double",
    )
    got = [
        r["neighbor_id"]
        for r in mmr_select(df, k=k, lam=lam).orderBy("rank").collect()
    ]

    # naive reference with the same rounding + id tiebreak
    ids = [r[1] for r in rows]
    mat = np.array([r[2] for r in rows], dtype=np.float64)
    normed = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    rel = np.array([r[3] for r in rows])
    sims = np.round(normed @ normed.T, 6)
    selected, max_sim = [], np.zeros(len(ids))
    avail = set(range(len(ids)))
    for _ in range(min(k, len(ids))):
        best, best_key = None, None
        for i in sorted(avail):
            score = round(lam * rel[i] - (1 - lam) * max_sim[i], 6)
            key = (-score, ids[i])
            if best_key is None or key < best_key:
                best, best_key = i, key
        selected.append(ids[best])
        avail.remove(best)
        max_sim = np.maximum(max_sim, sims[best])
    assert got == selected


pii_text = st.text(
    alphabet="abc @.0-9+",
    min_size=0,
    max_size=60,
)


@settings(max_examples=25, deadline=None)
@given(texts=st.lists(pii_text, min_size=1, max_size=8))
def test_pii_redaction_is_idempotent(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id long, text string"
    )
    once = pii.scan_and_redact(df, "text", out_col="r1").select("id", "r1")
    twice = once.withColumn("r2", pii.redact(F.col("r1")))
    assert twice.filter(F.col("r1") != F.col("r2")).count() == 0
