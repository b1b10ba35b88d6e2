"""BM25 full-text relevance ranking over the `documents` corpus.

Beyond-reference capability (BASELINE.json north star): retrieval-style
scoring a training-data pipeline uses for corpus curation — "rank every
document against this probe query" (e.g. decontamination probes,
topicality filters, seed-document expansion).

Scale design: the score is a pure term-keyed aggregation pipeline —
explode to (doc, term) counts, join the tiny per-query-term df table
(broadcast: |query| rows), then one groupBy(doc) to sum per-term
contributions. No cross join, no driver-side scoring; the corpus stats
(N, avgdl) are two scalar aggregates computed once per call. At 100 TB
the explode→combine shuffle carries (doc, query-term) hits only —
non-matching terms are filtered before the shuffle by the broadcast
semi-join on the query vocabulary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from data_engineering_project_spark.functions.text import tokens
from data_engineering_project_spark.operators.terms import term_frequencies


def bm25_scores(
    df: DataFrame,
    text_col: str,
    id_col: str,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """(id, bm25) — Okapi BM25 score of each matching document against
    ``query_terms`` (documents with no query term are absent).

    idf(t) = ln(1 + (N - df + 0.5) / (df + 0.5))   (Lucene's form —
    never negative, so stopword-like probe terms cannot subtract).
    Scores are rounded to 6 dp so downstream rank ties break
    identically across engines.
    """
    n_docs = df.count()
    doclen = df.select(
        F.col(id_col), F.size(tokens(text_col)).alias("dl")
    )
    avgdl = doclen.agg(F.avg("dl")).collect()[0][0]  # one scalar job

    tf = (
        term_frequencies(df, text_col, id_col)
        .filter(F.col("term").isin(query_terms))
    )
    dfreq = (
        df.select(F.explode(F.array_distinct(tokens(text_col))).alias("term"))
        .filter(F.col("term").isin(query_terms))
        .groupBy("term")
        .agg(F.count("*").alias("df"))
    )
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .join(doclen, id_col)
        .select(
            id_col,
            (
                F.log(
                    F.lit(1.0)
                    + (F.lit(float(n_docs)) - F.col("df") + 0.5)
                    / (F.col("df") + 0.5)
                )
                * (F.col("tf") * (k1 + 1))
                / (
                    F.col("tf")
                    + k1
                    * (1 - b + b * F.col("dl") / F.lit(float(avgdl)))
                )
            ).alias("part_score"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.round(F.sum("part_score"), 6).alias("bm25")
    )


def bm25_topk(
    df: DataFrame,
    text_col: str,
    id_col: str,
    query_terms: list[str],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-k documents by BM25 with a deterministic (score desc, id asc)
    total order — the distributed top-k cut is a TakeOrderedAndProject,
    never a global sort materialization."""
    scores = bm25_scores(df, text_col, id_col, query_terms, k1=k1, b=b)
    # orderBy + limit compiles to TakeOrderedAndProject — a distributed
    # per-partition top-k merged at the driver, NOT a global sort. The
    # rank window then runs over at most k rows.
    top = scores.orderBy(F.desc("bm25"), F.asc(id_col)).limit(k)
    w = Window.orderBy(F.desc("bm25"), F.asc(id_col))
    return top.withColumn("rnk", F.row_number().over(w)).select(
        id_col, "bm25", "rnk"
    )
