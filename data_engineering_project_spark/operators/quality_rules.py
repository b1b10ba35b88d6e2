"""Gopher/C4-style repetition and diversity rules for corpus filtering.

Beyond-reference capability (BASELINE.json north star): pretraining
pipelines drop documents dominated by repeated n-grams (Rae et al. 2021,
"Scaling Language Models" §A1.1 repetition filters; public heuristic).
This module computes the per-document repetition signals and the
corresponding keep/drop flags.

Scale design: all three signals are doc-keyed aggregations — explode →
(doc, gram) count with map-side combine → per-doc max — so the shuffle
key is the document id (uniform, no Zipf skew: the skewed *term* axis
is collapsed inside each doc before any shuffle leaves the row group).
Threshold compares use exact integer cross-multiplication so a ratio at
the boundary never flips between engines' float rounding.
"""

from __future__ import annotations

from fractions import Fraction

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_engineering_project_spark.functions.text import tokens
from data_engineering_project_spark.operators.terms import word_bigram_counts


def _max_gram_count(
    df: DataFrame, id_col: str, gram_col_expr, out: str
) -> DataFrame:
    """(id, out) — the count of the most frequent gram per document."""
    return (
        df.select(F.col(id_col), F.explode(gram_col_expr).alias("__g"))
        .groupBy(id_col, "__g")
        .agg(F.count("*").alias("__n"))
        .groupBy(id_col)
        .agg(F.max("__n").alias(out))
    )


def doc_repetition_stats(
    df: DataFrame,
    text_col: str,
    id_col: str,
    max_top_term_ratio: float = 0.2,
    max_top_bigram_ratio: float = 0.18,
    min_distinct_ratio: float = 0.3,
) -> DataFrame:
    """Per-document repetition profile + keep/drop flags.

    Columns: n_tokens, distinct_ratio, top_term_ratio,
    top_bigram_ratio, rep_unigram / rep_bigram / low_diversity (ints
    0/1 — exact integer threshold compares), keep (1 iff no flag).
    """
    toks = tokens(text_col)
    bigrams = F.zip_with(
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    base = df.select(
        F.col(id_col),
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("__n_distinct"),
    )
    top_term = _max_gram_count(df, id_col, toks, "__max_tf")
    top_bg = _max_gram_count(
        df.filter(F.size(toks) >= 2), id_col, bigrams, "__max_bg"
    )

    tt = Fraction(str(max_top_term_ratio))
    tb = Fraction(str(max_top_bigram_ratio))
    dr = Fraction(str(min_distinct_ratio))

    joined = (
        base.join(top_term, id_col)
        .join(top_bg, id_col, "left")
        .withColumn("__max_bg", F.coalesce("__max_bg", F.lit(0)))
    )
    rep_uni = (
        F.col("__max_tf") * tt.denominator > F.col("n_tokens") * tt.numerator
    ).cast("int")
    rep_bg = (
        F.col("__max_bg") * tb.denominator
        > F.greatest(F.col("n_tokens") - 1, F.lit(1)) * tb.numerator
    ).cast("int")
    low_div = (
        F.col("__n_distinct") * dr.denominator
        < F.col("n_tokens") * dr.numerator
    ).cast("int")
    return joined.select(
        id_col,
        "n_tokens",
        F.round(F.col("__n_distinct") / F.col("n_tokens"), 4).alias(
            "distinct_ratio"
        ),
        F.round(F.col("__max_tf") / F.col("n_tokens"), 4).alias(
            "top_term_ratio"
        ),
        F.round(
            F.col("__max_bg") / F.greatest(F.col("n_tokens") - 1, F.lit(1)), 4
        ).alias("top_bigram_ratio"),
        rep_uni.alias("rep_unigram"),
        rep_bg.alias("rep_bigram"),
        low_div.alias("low_diversity"),
        (
            (rep_uni == 0) & (rep_bg == 0) & (low_div == 0)
        ).cast("int").alias("keep"),
    )
