"""Unit tests for round-3 batch-2 operators: BM25 ranking, chunking
(Catalyst + UDTF), repetition rules, prefix-filter similarity join,
mixture sampling."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from data_engineering_project_spark.operators import (
    chunking,
    dedup,
    quality_rules,
    ranking,
    sampling,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "spark join scan spark spark filter table"),
        (2, "join scan window agg"),
        (3, "cat dog bird fish"),
        (4, "spam spam spam spam spam spam spam spam spam ham"),
        (5, "a b c d e f g h i j k l m n o p q r s t"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestBM25:
    def test_ranks_term_dense_doc_first(self, docs):
        out = ranking.bm25_topk(docs, "text", "doc_id", ["spark"], k=3)
        rows = out.orderBy("rnk").collect()
        assert rows[0]["doc_id"] == 1  # 3x 'spark'
        assert all(r["bm25"] > 0 for r in rows)

    def test_non_matching_docs_absent(self, docs):
        out = ranking.bm25_scores(docs, "text", "doc_id", ["spark"])
        ids = {r["doc_id"] for r in out.collect()}
        assert 3 not in ids and 4 not in ids

    def test_matches_hand_computation(self, spark):
        # Two docs, one term — check the exact Okapi formula.
        df = spark.createDataFrame(
            [(1, "x x y"), (2, "y z")], "doc_id long, text string"
        )
        out = {
            r["doc_id"]: r["bm25"]
            for r in ranking.bm25_scores(df, "text", "doc_id", ["x"]).collect()
        }
        n, dfx, tf, dl, avgdl = 2, 1, 2, 3, 2.5
        idf = math.log(1 + (n - dfx + 0.5) / (dfx + 0.5))
        expect = idf * (tf * 2.2) / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
        assert out[1] == pytest.approx(round(expect, 6), abs=1e-6)
        assert 2 not in out


class TestChunking:
    def test_covers_all_tokens_with_overlap(self, docs):
        out = chunking.chunk_documents(
            docs, "text", "doc_id", size=8, overlap=2
        ).collect()
        by_doc = {}
        for r in out:
            by_doc.setdefault(r["doc_id"], []).append(r)
        # doc 5 has 20 tokens, stride 6: starts 0,6,12,18
        starts = sorted(r["start_token"] for r in by_doc[5])
        assert starts == [0, 6, 12, 18]
        last = max(by_doc[5], key=lambda r: r["start_token"])
        assert last["n_tokens"] == 2  # tokens 18..19
        # every token index covered
        covered = set()
        for r in by_doc[5]:
            covered.update(range(r["start_token"], r["start_token"] + r["n_tokens"]))
        assert covered == set(range(20))

    def test_short_doc_single_chunk(self, docs):
        out = chunking.chunk_documents(
            docs.filter("doc_id = 3"), "text", "doc_id", size=64, overlap=16
        ).collect()
        assert len(out) == 1
        assert out[0]["chunk"] == "cat dog bird fish"

    def test_udtf_matches_catalyst(self, docs):
        a = chunking.chunk_documents(docs, "text", "doc_id", size=8, overlap=3)
        b = chunking.chunk_documents_udtf(docs, "text", "doc_id", size=8, overlap=3)
        assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))

    def test_rejects_bad_overlap(self, docs):
        with pytest.raises(ValueError):
            chunking.chunk_documents(docs, "text", "doc_id", size=8, overlap=8)


class TestRepetitionRules:
    def test_spammy_doc_flagged(self, docs):
        out = {
            r["doc_id"]: r
            for r in quality_rules.doc_repetition_stats(
                docs, "text", "doc_id"
            ).collect()
        }
        spam = out[4]
        assert spam["rep_unigram"] == 1  # 'spam' is 9/10 tokens
        assert spam["rep_bigram"] == 1  # 'spam spam' dominates
        assert spam["low_diversity"] == 1  # 2 distinct / 10
        assert spam["keep"] == 0
        clean = out[5]
        assert clean["keep"] == 1
        assert clean["distinct_ratio"] == 1.0

    def test_ratios_exact(self, docs):
        out = {
            r["doc_id"]: r
            for r in quality_rules.doc_repetition_stats(
                docs, "text", "doc_id"
            ).collect()
        }
        assert out[4]["top_term_ratio"] == 0.9
        assert out[4]["top_bigram_ratio"] == round(8 / 9, 4)


class TestPrefixFilterJoin:
    def test_exact_recall_vs_bruteforce(self, spark):
        # 8 docs, some near-dups; brute-force all-pairs Jaccard is the
        # ground truth the prefix-filtered join must reproduce EXACTLY.
        base = "the quick brown fox jumps over the lazy dog again and again"
        rows = [
            (1, base),
            (2, base + " tail"),
            (3, base.replace("quick", "slow")),
            (4, "completely different text with no common shingles here"),
            (5, base),
            (6, "another unrelated document about spark query planning"),
            (7, base.replace("dog", "cat").replace("fox", "ox")),
            (8, "the quick brown fox"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            (r["id_a"], r["id_b"]): r["jaccard"]
            for r in dedup.prefix_filter_pairs(
                df, "text", "doc_id", 1, 2
            ).collect()
        }

        def shingles(t):
            toks = t.split(" ")
            return {
                " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
            }

        expect = {}
        sh = {i: shingles(t) for i, t in rows}
        for a in sh:
            for b in sh:
                if a < b and sh[a] and sh[b]:
                    inter = len(sh[a] & sh[b])
                    union = len(sh[a] | sh[b])
                    if inter * 2 >= union:
                        expect[(a, b)] = round(inter / union, 4)
        assert got == expect
        assert (1, 5) in got and got[(1, 5)] == 1.0

    def test_no_cartesian_in_plan(self, spark):
        df = spark.createDataFrame(
            [(i, f"w{i} w{i+1} w{i+2} w{i+3}") for i in range(10)],
            "doc_id long, text string",
        )
        plan = dedup.prefix_filter_pairs(df, "text", "doc_id")._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


class TestMixtureSample:
    def test_fractions(self):
        fr = sampling.mixture_fractions(
            {"en": 100, "de": 10}, {"en": 0.5, "de": 0.5}, 40
        )
        assert fr["en"] == pytest.approx(0.2)
        assert fr["de"] == 1.0  # under-supplied stratum taken whole

    def test_weights_must_sum(self):
        with pytest.raises(ValueError):
            sampling.mixture_fractions({"a": 1}, {"a": 0.5}, 10)

    def test_deterministic_and_mixture_shaped(self, spark):
        df = spark.range(1000).select(
            F.col("id").alias("k"),
            F.when(F.col("id") % 4 == 0, "en").otherwise("de").alias("lang"),
        )
        w = {"en": 0.8, "de": 0.2}
        a = sampling.mixture_sample(df, "lang", "k", w, 100)
        b = sampling.mixture_sample(df, "lang", "k", w, 100)
        ra = sorted(r["k"] for r in a.collect())
        assert ra == sorted(r["k"] for r in b.collect())
        by_lang = {
            r["lang"]: r["n"]
            for r in a.groupBy("lang").agg(F.count("*").alias("n")).collect()
        }
        # en quota 80 of 250 available, de quota 20 of 750: both sampled
        assert 60 <= by_lang["en"] <= 100
        assert 10 <= by_lang["de"] <= 32


class TestQuantizationAndDecay:
    def test_quantization_error_bounded(self, spark):
        # int8 symmetric quantization: reconstruction error <= 0.5/scale
        df = spark.createDataFrame(
            [(1, [1.0, -0.5, 0.25, 0.125], 0)],
            "vec_id long, embedding array<float>, label int",
        )
        from data_engineering_project_spark.plans.workload import QUERIES
        # exercise via the registered query path on real testdata below;
        # here check the math directly
        from pyspark.sql import functions as F
        vd = F.transform("embedding", lambda x: x.cast("double"))
        scale = F.lit(127.0) / F.array_max(F.transform(vd, F.abs))
        err = F.array_max(
            F.transform(vd, lambda x: F.abs(x - F.round(x * scale) / scale))
        )
        e = df.select(err.alias("e")).collect()[0]["e"]
        assert e <= 0.5 / 127.0 + 1e-12

    def test_ivf_recall_invariant_holds(self, spark, sf_dir):
        from data_engineering_project_spark.plans.workload import QUERIES
        row = QUERIES["ivf_recall_check"](spark, sf_dir).collect()[0]
        assert row["recall_ge_60pct"] is True
        assert row["n_queries"] == 10


class TestLmScoreAndWeightedSample:
    def test_lm_score_favors_repetitive(self, spark):
        from data_engineering_project_spark.operators import terms
        # Both docs share the head token 'a'; doc 1 always continues
        # with 'b' (the dominant transition) while doc 2 scatters over
        # four rare continuations -> doc 1 scores higher. (Disjoint
        # vocabularies would NOT discriminate: every transition is
        # P=1 under MLE.)
        df = spark.createDataFrame(
            [(1, "a b a b a b a b"), (2, "a q a w a e a r")],
            "doc_id long, text string",
        )
        out = {r["doc_id"]: r for r in terms.bigram_lm_scores(df, "text", "doc_id").collect()}
        assert out[1]["avg_logp"] > out[2]["avg_logp"]
        assert out[1]["n_bigrams"] == 7 and out[2]["n_bigrams"] == 7
        # hand check: C(a as head)=8; doc1 P(b|a)=4/8, P(a|b)=1
        import math
        expect1 = round(4 * math.log(0.5) / 7, 4)
        assert out[1]["avg_logp"] == expect1

    def test_weighted_sample_extremes(self, spark):
        from data_engineering_project_spark.operators import sampling
        df = spark.range(500).select(
            F.col("id").alias("k"), F.lit(1.0).alias("p")
        )
        assert sampling.weighted_sample(df, "k", "p").count() == 500
        df0 = spark.range(500).select(
            F.col("id").alias("k"), F.lit(0.0).alias("p")
        )
        assert sampling.weighted_sample(df0, "k", "p").count() == 0

    def test_weighted_sample_rate_tracks_prob(self, spark):
        from data_engineering_project_spark.operators import sampling
        df = spark.range(2000).select(
            F.col("id").alias("k"), F.lit(0.25).alias("p")
        )
        n = sampling.weighted_sample(df, "k", "p").count()
        assert 380 <= n <= 620  # ~500 expected, md5-uniform
