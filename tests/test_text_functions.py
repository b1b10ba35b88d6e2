"""Unit tests for the text-analysis expression library."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_engineering_project_spark.functions import text as t


def _one(spark, text, expr):
    return spark.createDataFrame([(text,)], "text string").select(
        expr.alias("x")
    ).collect()[0].x


def test_subword_tokens(spark):
    got = _one(spark, "Hello, world! x2", t.subword_tokens("text"))
    assert got == ["Hello", ",", "world", "!", "x2"]


def test_token_counts_and_ttr(spark):
    assert _one(spark, "a b a c", t.token_count("text")) == 4
    assert _one(spark, "a b a c", t.distinct_token_count("text")) == 3
    assert _one(spark, "a b a c", t.type_token_ratio("text")) == 0.75


def test_quality_score_bands(spark):
    # too short → loses the length band; repetitive → low richness
    short = _one(spark, "one two three", t.quality_score("text"))
    good = _one(
        spark, " ".join(f"word{i:02d}" for i in range(50)), t.quality_score("text")
    )
    assert good > short
    assert 0.0 <= short <= 1.0 and 0.0 <= good <= 1.0


def test_lang_guess(spark):
    df = spark.createDataFrame(
        [
            ("the cat and the dog of a house",),
            ("el gato y la casa de que si",),
            ("xyz qqq zzz",),
        ],
        "text string",
    )
    got = [
        r.g
        for r in df.select(
            t.lang_guess_from_tokens(t.tokens("text")).alias("g")
        ).collect()
    ]
    assert got == ["en", "es", "und"]


def test_doc_fingerprint_is_md5(spark):
    import hashlib

    got = _one(spark, "hello world", t.doc_fingerprint("text"))
    assert got == hashlib.md5(b"hello world").hexdigest()


def test_char_entropy_of_uniform_alphabet_is_log2_k(spark, tmp_path):
    from data_engineering_project_spark.plans import workload
    import pytest as _pt

    d = str(tmp_path / "ent")
    # 'abcd' repeated: 4 equiprobable chars -> exactly 2 bits
    spark.createDataFrame(
        [(1, "abcd" * 50, "en", "s", 200)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.parquet(d + "/documents.parquet")
    r = workload.QUERIES["char_entropy_by_lang"](spark, d).collect()[0]
    assert r["alphabet_size"] == 4
    assert r["entropy_bits"] == _pt.approx(2.0, abs=1e-9)


def test_mojibake_audit_flags_planted_junk(spark, tmp_path):
    from data_engineering_project_spark.plans import workload

    d = str(tmp_path / "moji")
    rows = [
        (1, "clean text here", "en", "a", 15),
        (2, "lossy transco�de", "en", "a", 15),   # U+FFFD
        (3, "null byte \x00 leaked", "en", "b", 17),   # C0 control
        (4, "tabs\tand\nnewlines are fine", "en", "b", 25),
    ]
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.parquet(d + "/documents.parquet")
    got = {
        r["source"]: r
        for r in workload.QUERIES["mojibake_audit"](spark, d).collect()
    }
    assert got["a"]["n_replacement"] == 1 and got["a"]["n_control"] == 0
    assert got["b"]["n_replacement"] == 0 and got["b"]["n_control"] == 1
    assert got["a"]["bad_share"] == 0.5 and got["b"]["bad_share"] == 0.5


def test_subword_token_stats_fertility(spark, tmp_path):
    from data_engineering_project_spark.plans import workload

    d = str(tmp_path / "fert")
    # "don't stop, world!" -> ws=3; word runs {don,t,stop,world}=4 +
    # loose punct {',',',','!'}=3 -> sub=7
    spark.createDataFrame(
        [(1, "don't stop, world!", "en", "s", 18)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.parquet(d + "/documents.parquet")
    r = workload.QUERIES["subword_token_stats"](spark, d).collect()[0]
    assert r["whitespace_tokens"] == 3
    assert r["subword_tokens"] == 7
    assert r["fertility"] == round(7 / 3, 4)
