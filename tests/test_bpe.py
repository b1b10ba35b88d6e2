"""operators/bpe.py — trained BPE: counting, merging, encoding."""

from __future__ import annotations

import pytest

from data_engineering_project_spark.operators import bpe


def test_train_matches_hand_computed_example():
    """The classic Sennrich example shape: 'low/lower/newest/widest'.
    First merges must follow pair frequency with the deterministic
    (count DESC, pair ASC) tiebreak."""
    counts = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    merges = bpe.train_bpe_from_counts(counts, n_merges=4)
    # 'es' appears in newest(6) + widest(3) = 9 — the unique max.
    assert merges[0][:2] == ("e", "s") and merges[0][2] == 9
    # then ('es','t') at 9 — merging creates the next dominant pair
    assert merges[1][:2] == ("es", "t") and merges[1][2] == 9
    # 'lo' in low(5)+lower(2) = 7 beats everything remaining
    assert merges[2][:2] == ("l", "o") and merges[2][2] == 7
    assert merges[3][:2] == ("lo", "w") and merges[3][2] == 7


def test_merge_counts_and_determinism():
    counts = [("abab", 3), ("abba", 2)]
    m1 = bpe.train_bpe_from_counts(counts, 3)
    m2 = bpe.train_bpe_from_counts(list(counts), 3)
    assert m1 == m2  # deterministic
    # 'ab' count: abab has 2 occurrences x3, abba has 1 x2 = 8
    assert m1[0] == ("a", "b", 8)


def test_encode_word_round_trip_and_greedy_rank():
    counts = [("aaab", 10), ("aab", 5)]
    merges = bpe.train_bpe_from_counts(counts, 3, min_count=1)
    ranks = {(a, b): i for i, (a, b, _) in enumerate(merges)}
    for w in ("aaab", "aab", "baaa", "xyz", "", "a"):
        enc = bpe.encode_word(w, ranks)
        assert "".join(enc) == w  # lossless, structurally
    # a word containing trained pairs compresses
    assert len(bpe.encode_word("aaab", ranks)) < 4


def test_monotone_in_merge_set():
    """Encoding with a PREFIX of the merge list never yields fewer
    subwords than the full list (greedy rank encode is monotone)."""
    counts = [("banana", 4), ("bandana", 3), ("ananas", 2)]
    merges = bpe.train_bpe_from_counts(counts, 6, min_count=1)
    full = {(a, b): i for i, (a, b, _) in enumerate(merges)}
    half = {(a, b): i for i, (a, b, _) in enumerate(merges[:3])}
    for w in ("banana", "bandana", "ananas", "banal"):
        assert len(bpe.encode_word(w, full)) <= len(bpe.encode_word(w, half))


def test_min_count_early_stop():
    merges = bpe.train_bpe_from_counts([("ab", 1)], 10, min_count=2)
    assert merges == []  # the only pair is below min_count
    merges = bpe.train_bpe_from_counts([("ab", 2)], 10, min_count=2)
    assert merges == [("a", "b", 2)]  # merged word has no pairs left


def test_word_count_dictionary_rank_and_cap(spark):
    df = spark.createDataFrame(
        [("b b b a a c",), ("a b",)], "text string"
    )
    rows = bpe.word_count_dictionary(df, "text", top_k=2).collect()
    assert [(r["word"], r["n"]) for r in rows] == [("b", 4), ("a", 3)]


def test_apply_bpe_spark_stats(spark):
    df = spark.createDataFrame(
        [(1, "aaab aab aaab"), (2, ""), (3, "zz")],
        "doc_id long, text string",
    )
    merges = bpe.train_bpe_from_counts([("aaab", 10), ("aab", 5)], 3, 1)
    out = {
        r["doc_id"]: r
        for r in bpe.apply_bpe(df, "text", merges, keep_cols=["doc_id"]).collect()
    }
    assert out[1]["n_words"] == 3 and out[1]["lossless"]
    assert out[1]["n_subwords"] < 12  # compressed below char count
    assert out[2]["n_words"] == 0 and out[2]["n_subwords"] == 0
    assert out[3]["n_words"] == 1 and out[3]["n_subwords"] == 2  # no merges hit


def test_dictionary_training_equals_full_corpus_training():
    """Training on (word, count) must equal training on the raw
    replicated word stream — the dictionary is sufficient statistics
    for BPE."""
    stream = ["cat"] * 5 + ["cart"] * 3 + ["car"] * 2
    from collections import Counter

    dict_merges = bpe.train_bpe_from_counts(
        sorted(Counter(stream).items()), 5, min_count=1
    )
    stream_merges = bpe.train_bpe_from_counts(
        [(w, 1) for w in stream], 5, min_count=1
    )
    assert dict_merges == stream_merges


def test_sentence_unit_dictionary_meta_symbol_and_rank(spark):
    df = spark.createDataFrame(
        [("a b", 1), ("a b", 1), ("c d", 1), ("", 1), (None, 1)],
        "text string, x int",
    )
    rows = bpe.sentence_unit_dictionary(df, "text", top_k=5).collect()
    assert [(r["unit"], r["n"]) for r in rows] == [("a▁b", 2), ("c▁d", 1)]
    # truncation bounds the symbol count
    long = spark.createDataFrame([("x y " * 50,)], "text string")
    unit = bpe.sentence_unit_dictionary(long, "text", top_k=1, max_chars=10)
    assert len(unit.collect()[0]["unit"]) == 10


def test_sentencepiece_training_learns_cross_word_merges(spark):
    """No pre-tokenization: repeated word bigrams become phrase tokens
    (a merge whose result spans the ▁ boundary)."""
    df = spark.createDataFrame(
        [("the cat sat",), ("the cat ran",), ("the cat hid",)], "text string"
    )
    merges = bpe.train_bpe_sentencepiece(
        df, "text", top_k=10, n_merges=30, min_count=2
    )
    joined = {a + b for a, b, _ in merges}
    assert any("▁" in t and t.strip("▁") not in ("",) and len(t) > 4 for t in joined)
    # 'the▁cat' (or a superstring path to it) must be learnable
    assert any("the▁cat".startswith(t) or t.startswith("the▁cat") or "e▁c" in t for t in joined)


def _recount_train(counts, n_merges, min_count=2):
    """Reference trainer: full pair recount after every merge (the
    pre-round-10 implementation). Kept ONLY as the equivalence oracle
    for the incremental-maintenance trainer."""
    vocab = {}
    for w, c in counts:
        syms = tuple(w)
        vocab[syms] = vocab.get(syms, 0) + int(c)
    merges = []
    for _ in range(n_merges):
        pair_counts = {}
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pair_counts[p] = pair_counts.get(p, 0) + c
        if not pair_counts:
            break
        (a, b), bc = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if bc < min_count:
            break
        merges.append((a, b, bc))
        new_vocab = {}
        for syms, c in vocab.items():
            m = bpe._merge_seq(syms, a, b)
            new_vocab[m] = new_vocab.get(m, 0) + c
        vocab = new_vocab
    return merges


def test_incremental_trainer_equals_recount_reference():
    """The round-10 incremental pair-count trainer must be
    bit-identical to the full-recount reference, merge by merge,
    including counts, tiebreaks, overlapping pairs ('aaa'), and
    early-stop — run far past exhaustion to cover the empty tail."""
    import random

    rng = random.Random(20260816)
    alpha = "abcdefg"
    corpus = [
        (
            "".join(rng.choice(alpha) for _ in range(rng.randint(1, 12))),
            rng.randint(1, 9),
        )
        for _ in range(300)
    ] + [("aaa", 7), ("aaaa", 3), ("abab", 5), ("", 2)]
    for min_count in (1, 2, 5):
        ref = _recount_train(list(corpus), 400, min_count)
        inc = bpe.train_bpe_from_counts(list(corpus), 400, min_count)
        assert inc == ref


def test_merge_table_round_trip(spark, tmp_path):
    """Tokenizer artifact: save_merges -> load_merges is identity, and
    encode with the reloaded vocabulary is bit-equal to the in-memory
    list (the property that makes the parquet table a shippable
    tokenizer)."""
    counts = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    merges = bpe.train_bpe_from_counts(counts, 6, min_count=1)
    path = str(tmp_path / "vocab")
    bpe.save_merges(spark, merges, path)
    reloaded = bpe.load_merges(spark, path)
    assert reloaded == merges
    ranks_a = {(a, b): i for i, (a, b, _) in enumerate(merges)}
    ranks_b = {(a, b): i for i, (a, b, _) in enumerate(reloaded)}
    for w in ("lowest", "newest", "wide", "zzz"):
        assert bpe.encode_word(w, ranks_a) == bpe.encode_word(w, ranks_b)


def test_trainer_sustains_production_merge_counts():
    """The r9 caveat ('a production 32k-merge vocabulary would want
    incremental pair-count maintenance') made concrete: the
    incremental trainer runs a 10k-merge budget over a 5000-word
    random dictionary in one call, returns merges in training order
    with monotonically usable ranks, and every merge's recorded count
    respects the min_count floor. (The recount trainer at this budget
    is O(n_merges x total symbols) — minutes; incremental is
    seconds.)"""
    import random

    rng = random.Random(32_000)
    counts = [
        (
            "".join(rng.choice("abcdefghijklmnop") for _ in range(rng.randint(6, 14))),
            rng.randint(1, 50),
        )
        for _ in range(5000)
    ]
    merges = bpe.train_bpe_from_counts(counts, 10_000, min_count=1)
    # ~50k total symbols in the dictionary and every merge removes at
    # least one occurrence, so the 10k budget is always exhausted here
    # — assert the full budget ran, not a disjunction that a
    # short-stopped trainer could satisfy
    assert len(merges) == 10_000
    assert all(c >= 1 for _, _, c in merges)
    assert len(merges) == len({(a, b) for a, b, _ in merges})  # no pair repeats
    # ranks must encode losslessly at this vocabulary size too
    ranks = {(a, b): i for i, (a, b, _) in enumerate(merges)}
    for w, _ in counts[:100]:
        assert "".join(bpe.encode_word(w, ranks)) == w


@pytest.mark.parametrize("n_merges", [0, 5])
def test_fertility_audit_invariants_hold(spark, sf_dir, n_merges):
    """The driver query's invariants, exercised on real testdata with
    a small merge budget (fast): losslessness and monotonicity."""
    from data_engineering_project_spark.sources.parquet import read_testdata

    docs = read_testdata(spark, sf_dir, "documents").limit(120)
    merges = bpe.train_bpe(docs, "text", top_k=300, n_merges=n_merges)
    assert len(merges) == n_merges
    enc = bpe.apply_bpe(docs, "text", merges)
    row = enc.agg(
        {"lossless": "min", "n_words": "sum", "n_subwords": "sum"}
    ).collect()[0]
    assert row["min(lossless)"] is True
    if n_merges:
        assert row["sum(n_subwords)"] <= enc.count() * 1000  # sane


def test_apply_bpe_multi_matches_per_set_apply_bpe(spark):
    """r13: the fused multi-set encode pass returns bit-identical
    per-set stats to one apply_bpe pass per merge set, plus the char
    count Spark's length() would report."""
    from pyspark.sql import functions as F

    rows = [
        (1, "low lower lowest"),
        (2, "new newer newest"),
        (3, ""),
        (4, "low low low"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    merges = bpe.train_bpe(df, "text", top_k=100, n_merges=12, min_count=1)
    multi = {
        r["doc_id"]: r
        for r in bpe.apply_bpe_multi(
            df, "text", [merges, merges[:3]], keep_cols=["doc_id"]
        ).collect()
    }
    for si, ms in enumerate([merges, merges[:3]]):
        single = {
            r["doc_id"]: r
            for r in bpe.apply_bpe(df, "text", ms, keep_cols=["doc_id"]).collect()
        }
        assert set(single) == set(multi)
        for k, s in single.items():
            m = multi[k]
            assert m["n_words"] == s["n_words"]
            assert m[f"n_subwords_{si}"] == s["n_subwords"]
            assert m[f"lossless_{si}"] == s["lossless"]
    chars = {
        r["doc_id"]: r["c"]
        for r in df.select("doc_id", F.length("text").alias("c")).collect()
    }
    for k, m in multi.items():
        assert m["n_chars"] == chars[k]
