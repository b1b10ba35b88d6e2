"""End-to-end corpus-prep pipeline: the full funnel on a corpus with
planted exact dups, near dups, PII, and junk quality."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_engineering_project_spark.plans.corpus_prep import prepare_corpus


def _base_text(i: int) -> str:
    # disjoint vocabularies: doc i shares no shingles with doc j != i
    return " ".join(f"word{i}x{j}" for j in range(20))


def _docs(spark):
    rows = []
    # 20 genuinely distinct good docs (no shared shingles)
    for i in range(20):
        rows.append((i, _base_text(i), "en", "s", 1))
    # exact duplicates of doc 0
    rows.append((100, _base_text(0), "en", "s", 1))
    rows.append((101, _base_text(0), "en", "s", 1))
    # near duplicate of doc 1: last word changed => ~90% shingle overlap
    near = _base_text(1).rsplit(" ", 1)[0] + " changedword"
    rows.append((102, near, "en", "s", 1))
    # junk: too short AND fully repetitive -> fails length + TTR rules
    rows.append((103, "junk junk junk junk", "en", "s", 1))
    # PII: doc with an email that must be redacted, otherwise good
    rows.append((104, _base_text(21) + " mail me a@b.co today ok", "en", "s", 1))
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )


def test_full_funnel_drops_the_planted_problems(spark):
    res = prepare_corpus(
        _docs(spark),
        min_quality=0.5,
        val_fraction=0.2,
        pack_budget=64,
    )
    f = res.funnel
    assert f["raw"] == 25
    # two exact copies of doc 0 die (keeper = min id 0)
    assert f["after_exact_dedup"] == 23
    # the near-dup of doc 1 dies; everything else survives
    assert f["after_near_dedup"] == 22
    # junk doc dies at the quality gate
    assert f["after_quality"] == 21
    assert f["train"] + f["val"] == f["after_quality"]
    assert f["train_packs"] >= 1

    # PII was scrubbed before anything downstream saw the text
    val_texts = [r["text"] for r in res.val.collect()]
    train_ids = {
        i for r in res.train_packed.collect() for i in r["doc_ids"]
    }
    assert all("a@b.co" not in t for t in val_texts)
    # packed train + val exactly partition the surviving docs
    val_ids = {r["doc_id"] for r in res.val.collect()}
    assert len(train_ids) + len(val_ids) == f["after_quality"]
    assert not (train_ids & val_ids)


def test_funnel_is_deterministic_across_runs(spark):
    a = prepare_corpus(_docs(spark), pack_budget=64).funnel
    b = prepare_corpus(_docs(spark), pack_budget=64).funnel
    assert a == b
