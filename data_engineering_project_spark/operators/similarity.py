"""Similarity search over an embedding column (``array<float>``).

Beyond-reference capability (BASELINE.json north star):

- :func:`cosine_topk` — exact brute-force top-k, the correctness
  baseline. The query set is broadcast (it's small by definition); the
  corpus streams through a single map stage, so the plan is
  scan → broadcast-nested-loop → per-query top-k. No shuffle of the
  corpus itself; the only exchange is the final per-query k-row reduce.
- :func:`lsh_bucket_topk` — the scale path: random-hyperplane LSH
  (sign of dot with R random vectors) buckets the corpus; queries only
  compare against same-bucket rows. Recall < 1, cost ~ corpus/2^R per
  query. At 100 TB this is the difference between a full scan per query
  batch and a pruned scan; for exact results, re-rank survivors.

Both paths compute cosine in double precision via ``F.zip_with`` +
``F.aggregate`` — JVM array expressions, no Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Output: (query_id, neighbor_id, cosine) — k rows per query,
    ranked by similarity desc with neighbor_id as the deterministic
    tiebreak; self-matches excluded.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    )
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine_similarity(F.col("q_vec"), F.col("c_vec")), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine")
    )


def hyperplane_signature(vec: Column, planes: list[list[float]]) -> Column:
    """Bit signature: sign of ⟨vec, plane⟩ per hyperplane, packed to long."""
    sig = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        dot = F.aggregate(
            F.zip_with(vec, F.array(*[F.lit(v) for v in plane]), lambda x, y: x.cast("double") * y),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        sig = sig + F.when(dot > 0, F.lit(1 << i).cast("long")).otherwise(0)
    return sig


def lsh_bucket_topk(
    corpus: DataFrame,
    queries: DataFrame,
    planes: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Approximate top-k: compare only within matching hyperplane buckets.

    ``planes`` must be generated driver-side with a fixed seed (numpy
    RandomState) so the plan stays deterministic.
    """
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        hyperplane_signature(F.col(vec_col), planes).alias("bucket"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        hyperplane_signature(F.col(vec_col), planes).alias("bucket"),
    )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine_similarity(F.col("q_vec"), F.col("c_vec")), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine")
    )


def centroids(
    df: DataFrame, label_col: str = "label", vec_col: str = "embedding"
) -> DataFrame:
    """Mean vector per label — posexplode → avg per (label, dim) →
    re-assemble ordered array. Shuffles (label × dim) rows, i.e. tiny."""
    dims = (
        df.select(F.col(label_col), F.posexplode(vec_col).alias("dim", "v"))
        .groupBy(label_col, "dim")
        .agg(F.avg(F.col("v").cast("double")).alias("mean_v"))
    )
    return (
        dims.groupBy(label_col)
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "mean_v"))),
                lambda s: F.round(s["mean_v"], 6),
            ).alias("centroid")
        )
    )
