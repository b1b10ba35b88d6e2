"""Term-level corpus statistics — TF-IDF, stopword mining, n-gram
profiles, cross-source vocabulary overlap.

Beyond-reference capability (BASELINE.json north star): the term-level
view a training-data pipeline needs next to document-level dedup and
quality scoring — keyword extraction (TF-IDF), corpus-adaptive stopword
lists (document-frequency mining), bigram language profiles, and
vocabulary drift between sources.

Scale design: every operator here is explode → equi-shuffle on the term
→ hash aggregate. Terms are Zipf-distributed, so the term key space is
skew-prone at the head — but the head terms are exactly the ones with
massive partial-aggregation collapse (map-side combine folds millions of
occurrences of "the" into one row per task before the shuffle), so the
shuffled volume per term is bounded by task count, not occurrence count.
No operator collects to the driver; top-k cuts happen distributed under
a total order (score desc, term asc) so results are deterministic."""

from __future__ import annotations

from fractions import Fraction

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from data_engineering_project_spark.functions.text import tokens


def exploded_terms(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, term) — one row per token occurrence."""
    return df.select(id_col, F.explode(tokens(text_col)).alias("term"))


def term_frequencies(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, term, tf) — per-document term counts. One shuffle on
    (id, term); partial aggregation collapses repeats map-side."""
    return (
        exploded_terms(df, text_col, id_col)
        .groupBy(id_col, "term")
        .agg(F.count("*").alias("tf"))
    )


def document_frequencies(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(term, df) — number of documents containing each term.
    array_distinct BEFORE the explode: per-document dedup happens
    inside the row (no (id, term) distinct-shuffle), so the shuffle
    carries one row per (document, distinct term)."""
    return (
        df.select(F.explode(F.array_distinct(tokens(text_col))).alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("df"))
    )


def tfidf_topk(
    df: DataFrame, text_col: str, id_col: str, k: int = 3
) -> DataFrame:
    """Top-k terms per document by TF-IDF (keyword extraction).

    tfidf = tf * ln(N / df), rounded to 6 dp BEFORE ranking so the
    (score desc, term asc) total order is identical cross-engine. The
    document-frequency table is term-keyed and Zipf-truncated in
    practice — Spark broadcasts it when small; at corpus scale the join
    is an equi-shuffle on the term, never a cartesian."""
    n_docs = df.count()  # one cheap scalar job, reused in the closure
    tf = term_frequencies(df, text_col, id_col)
    dfreq = document_frequencies(df, text_col, id_col)
    scored = tf.join(dfreq, "term").select(
        id_col,
        "term",
        F.round(
            F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")), 6
        ).alias("tfidf"),
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(id_col, "term", "tfidf")
    )


def stopword_candidates(
    df: DataFrame, text_col: str, id_col: str, min_doc_ratio: float = 0.4
) -> DataFrame:
    """Terms present in more than ``min_doc_ratio`` of all documents —
    a corpus-adaptive stopword list (the fixed tiny lists in
    functions/text.py are for language ID; real pipelines mine the
    corpus). Exact integer threshold compare (df * denom > N * num)
    avoids float-boundary flips between engines — the ratio is read as
    its DECIMAL-string fraction (0.4 → 2/5), not its binary float
    expansion."""
    n_docs = df.count()
    frac = Fraction(str(min_doc_ratio))
    num, denom = frac.numerator, frac.denominator
    return (
        document_frequencies(df, text_col, id_col)
        .filter(F.col("df") * denom > n_docs * num)
        .select(
            "term",
            "df",
            F.round(F.col("df") / F.lit(float(n_docs)), 4).alias("doc_ratio"),
        )
    )


def word_bigram_counts(df: DataFrame, text_col: str) -> Column | DataFrame:
    """(bigram, n) — corpus-wide adjacent-word-pair counts. The pair
    construction is a zip of the token array with its own tail — pure
    per-row Catalyst (no self-join on position), then one term-keyed
    aggregate."""
    toks = tokens(text_col)
    bigrams = F.zip_with(
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    return (
        df.filter(F.size(toks) >= 2)
        .select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count("*").alias("n"))
    )


def vocab_jaccard(df: DataFrame, text_col: str, group_col: str) -> DataFrame:
    """Pairwise Jaccard similarity of the vocabularies of each group
    (e.g. source) — vocabulary drift between crawl snapshots or feeds.

    |A ∩ B| comes from a term-keyed self-join of the (group, term)
    distinct sets — an equi-join, linear in shared vocabulary, never
    |A| × |B|. Group count is assumed small (sources, not documents);
    vocab sizes broadcast."""
    vocab = (
        df.select(
            F.col(group_col).alias("grp"),
            F.explode(F.array_distinct(tokens(text_col))).alias("term"),
        )
        .distinct()
    )
    sizes = vocab.groupBy("grp").agg(F.count("*").alias("n_terms"))
    a, b = vocab.alias("a"), vocab.alias("b")
    inter = (
        a.join(b, (F.col("a.term") == F.col("b.term"))
               & (F.col("a.grp") < F.col("b.grp")))
        .groupBy(F.col("a.grp").alias("grp_a"), F.col("b.grp").alias("grp_b"))
        .agg(F.count("*").alias("n_common"))
    )
    sa = sizes.select(F.col("grp").alias("grp_a"), F.col("n_terms").alias("n_a"))
    sb = sizes.select(F.col("grp").alias("grp_b"), F.col("n_terms").alias("n_b"))
    return (
        inter.join(F.broadcast(sa), "grp_a")
        .join(F.broadcast(sb), "grp_b")
        .select(
            "grp_a",
            "grp_b",
            "n_common",
            F.round(
                F.col("n_common")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
                6,
            ).alias("jaccard"),
        )
    )


def bigram_lm_scores(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """CCNet-style language-model quality proxy: mean log-probability of
    each document under a corpus-trained MLE bigram model (public idea:
    Wenzek et al. 2020 filter corpora by LM perplexity; the bigram MLE
    is the engine-friendly stand-in for KenLM).

    P(w2|w1) = C(w1 w2) / C(w1-as-predecessor); scored on the training
    corpus itself every document bigram exists in the model, so no
    smoothing term is needed. Repetitive/templated documents score HIGH
    (their bigrams dominate the model), rare/garbled text scores low.

    Scale shape: the model IS two aggregate tables (bigram counts,
    predecessor counts) — term-keyed shuffles with map-side combine;
    scoring is two equi-joins (Zipf-head bigrams collapse map-side
    before the join) and one doc-keyed average. Nothing is collected;
    the 'model' never leaves the cluster.
    """
    toks = tokens(text_col)
    n = F.size(toks)
    heads = F.slice(toks, 1, F.greatest(n - 1, F.lit(0)))
    tails = F.slice(toks, 2, F.greatest(n - 1, F.lit(0)))
    pairs = F.arrays_zip(
        heads.alias("w1"),
        F.zip_with(heads, tails, lambda a, b: F.concat_ws(" ", a, b)).alias(
            "bigram"
        ),
    )
    bg = (
        df.filter(n >= 2)
        .select(F.col(id_col), F.explode(pairs).alias("p"))
        .select(id_col, F.col("p.w1").alias("w1"), F.col("p.bigram").alias("bigram"))
    )
    bmodel = bg.groupBy("bigram").agg(F.count("*").alias("cb"))
    umodel = bg.groupBy("w1").agg(F.count("*").alias("cu"))
    scored = (
        bg.join(bmodel, "bigram")
        .join(umodel, "w1")
        .select(
            F.col(id_col),
            F.log(F.col("cb").cast("double") / F.col("cu")).alias("lp"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_bigrams"),
        F.round(F.avg("lp"), 4).alias("avg_logp"),
    )
