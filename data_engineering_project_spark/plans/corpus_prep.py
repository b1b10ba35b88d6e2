"""End-to-end corpus preparation pipeline — the composition a training
team actually runs, wired from this engine's operators:

    raw documents
      → PII redaction                  (operators/pii.py)
      → exact dedup                    (operators/dedup.exact_dedup)
      → near-dup removal (MinHash-LSH candidates → cluster keep-list)
      → quality + repetition filter    (functions/text.quality_score,
                                        operators/quality_rules)
      → deterministic train/val split  (operators/sampling.hash_split)
      → sequence packing of the train split (operators/packing)

Every stage is lazy-on-lazy DataFrame composition: Catalyst sees ONE
plan per output, so scan-side projections/filters fuse across stage
boundaries (e.g. the quality filter prunes before the packer's
shuffle). Per-stage row counts are collected from ONE pass each —
the funnel report a pipeline owner reviews after every run.

Scale: the only stateful stages are the dedup shuffles (hash/band
keys, never text) and the packer's hash-sharded applyInPandas; all
filters are row-local. Stage order puts the cheapest row-droppers
(exact dedup) before the near-dup join so the LSH input is already
thinned.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_engineering_project_spark.functions.text import quality_score
from data_engineering_project_spark.operators import dedup, packing, pii
from data_engineering_project_spark.operators.joins import anti_join
from data_engineering_project_spark.operators.sampling import hash_split


@dataclass(frozen=True)
class CorpusPrepResult:
    train_packed: DataFrame
    val: DataFrame
    funnel: dict[str, int]


def prepare_corpus(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_quality: float = 0.5,
    val_fraction: float = 0.1,
    pack_budget: int = 256,
    num_hashes: int = 16,
    bands: int = 4,
) -> CorpusPrepResult:
    """Run the full prep funnel; returns packed train, val, and the
    per-stage surviving-row counts."""
    funnel: dict[str, int] = {"raw": docs.count()}

    # 1. PII scrub (row-local, no row drops)
    clean = docs.withColumn(text_col, pii.redact(F.col(text_col)))

    # 2. exact dedup (md5 groups, keep min id)
    exact = dedup.exact_dedup(clean, text_col, id_col)
    funnel["after_exact_dedup"] = exact.count()

    # 3. near-dup: LSH candidates -> connected clusters -> keep the
    #    min-id representative of every cluster
    pairs = dedup.lsh_candidates_portable(
        exact, text_col, id_col, num_hashes=num_hashes, bands=bands
    )
    clusters = dedup.dup_clusters(pairs)  # columns: doc_id, cluster_id
    drop = clusters.filter(
        F.col("doc_id") != F.col("cluster_id")
    ).select(F.col("doc_id").alias(id_col))
    neardeduped = anti_join(exact, drop, [id_col], broadcast_right=True)
    funnel["after_near_dedup"] = neardeduped.count()

    # 4. quality gate (C4/Gopher-style composite score)
    quality = neardeduped.filter(
        quality_score(text_col) >= F.lit(min_quality)
    )
    funnel["after_quality"] = quality.count()

    # 5. deterministic split (md5 buckets — retry- and cluster-stable)
    splits = {"val": val_fraction, "train": 1.0 - val_fraction}
    tagged = hash_split(quality, id_col, splits)
    train = tagged.filter(F.col("split") == "train")
    val = tagged.filter(F.col("split") == "val")
    funnel["train"] = train.count()
    funnel["val"] = val.count()

    # 6. pack the train split into fixed token budgets
    with_len = train.withColumn(
        "n_tokens", F.size(F.split(F.col(text_col), " "))
    )
    packed = packing.pack_sequences(
        with_len,
        id_col=id_col,
        token_count_col="n_tokens",
        max_tokens=pack_budget,
    )
    funnel["train_packs"] = (
        packed.select("shard", "pack_id").distinct().count()
    )
    return CorpusPrepResult(train_packed=packed, val=val, funnel=funnel)
