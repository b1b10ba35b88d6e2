"""Trained BPE tokenizer: distributed counting, bounded training,
distributed encoding.

Beyond-reference capability (SURVEY §LLM-pipeline): the corpus text
analysis so far measures tokens with a FIXED regex
(`functions.text.subword_tokens`); real training pipelines TRAIN the
tokenizer on the corpus (Sennrich et al. 2016, the public BPE
algorithm — also the shape SentencePiece/HF tokenizers production-
alize). The split of work here mirrors those systems exactly, and is
the 100 TB design:

- **Counting is the corpus-scale stage** — one distributed scan +
  groupBy + top-k (TakeOrderedAndProject, no full sort) producing the
  word-frequency dictionary. This is the only stage that touches every
  byte.
- **Training runs on the CAPPED dictionary** (``top_k`` rows — a
  bounded, documented collect, same class as the collected t-digest /
  k-means centroid frames). BPE's merge loop is inherently sequential
  (each merge depends on the counts AFTER the previous merge), so
  distributing it buys nothing once the dictionary is bounded; what
  matters is that the dictionary CAME from a distributed count and its
  size is an explicit knob.
- **Encoding is corpus-scale again** — broadcast merge ranks, one
  Arrow-batched ``mapInPandas`` pass with a per-batch word cache
  (Zipf makes the cache hit rate high), structural round-trip
  losslessness (merges never alter characters, only grouping).

Everything is deterministic: ties in the merge argmax break on
(count DESC, pair ASC); word-dictionary rank breaks on
(count DESC, word ASC) — the repo's cross-engine convention.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_engineering_project_spark.functions import text as text_fns

Merge = tuple[str, str, int]  # (left, right, pair_count_at_merge_time)


def word_count_dictionary(
    df: DataFrame, text_col: str, top_k: int = 20_000
) -> DataFrame:
    """(word, n) for the ``top_k`` most frequent whitespace tokens —
    the distributed stage of BPE training. Deterministic rank:
    (n DESC, word ASC). The orderBy+limit plans as
    TakeOrderedAndProject: no global sort materializes."""
    ex = df.select(
        F.explode(text_fns.tokens(F.col(text_col))).alias("word")
    ).filter(F.col("word") != "")
    return (
        ex.groupBy("word")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), F.col("word").asc())
        .limit(top_k)
    )


def _merge_seq(syms: tuple, a: str, b: str) -> tuple:
    """Merge every non-overlapping (a, b) occurrence, left to right."""
    out: list[str] = []
    i = 0
    while i < len(syms):
        if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def train_bpe_from_counts(
    counts: list[tuple[str, int]], n_merges: int, min_count: int = 2
) -> list[Merge]:
    """Classic BPE on a word-frequency dictionary (exact, single-node —
    the dictionary is bounded by construction; see module docstring).

    Returns up to ``n_merges`` merges in training order; stops early
    when no remaining pair reaches ``min_count``."""
    vocab: dict[tuple, int] = {}
    for w, c in counts:
        syms = tuple(w)
        vocab[syms] = vocab.get(syms, 0) + int(c)
    merges: list[Merge] = []
    for _ in range(n_merges):
        pair_counts: dict[tuple[str, str], int] = {}
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pair_counts[p] = pair_counts.get(p, 0) + c
        if not pair_counts:
            break
        (a, b), bc = min(
            pair_counts.items(), key=lambda kv: (-kv[1], kv[0])
        )
        if bc < min_count:
            break
        merges.append((a, b, bc))
        new_vocab: dict[tuple, int] = {}
        for syms, c in vocab.items():
            m = _merge_seq(syms, a, b)
            new_vocab[m] = new_vocab.get(m, 0) + c
        vocab = new_vocab
    return merges


def train_bpe(
    df: DataFrame,
    text_col: str,
    top_k: int = 20_000,
    n_merges: int = 100,
    min_count: int = 2,
) -> list[Merge]:
    """Distributed count → bounded collect (``top_k`` rows) → exact
    train. The convenience composition used by the workload query."""
    counts = [
        (r["word"], r["n"])
        for r in word_count_dictionary(df, text_col, top_k).collect()
    ]
    return train_bpe_from_counts(counts, n_merges, min_count)


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> tuple:
    """Greedy BPE encode: repeatedly apply the LOWEST-rank adjacent
    merge present (the standard inference rule — training order is the
    priority). Structural invariant: ``''.join(result) == word``."""
    syms: tuple = tuple(word)
    while len(syms) > 1:
        best_rank = None
        best_pair = None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_pair = r, (syms[i], syms[i + 1])
        if best_pair is None:
            break
        syms = _merge_seq(syms, best_pair[0], best_pair[1])
    return syms


def apply_bpe(
    df: DataFrame,
    text_col: str,
    merges: list[Merge],
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """Per-row encoding stats over the full corpus: ``(keep_cols…,
    n_words, n_subwords, lossless)`` via one Arrow-batched
    ``mapInPandas`` pass. Merge ranks ride the closure (broadcast by
    Spark's task serialization — the table is ``n_merges`` entries);
    a per-batch word cache exploits Zipf so each distinct word in a
    batch is encoded once."""
    import pandas as pd

    keep = list(keep_cols or [])
    ranks = {(a, b): i for i, (a, b, _) in enumerate(merges)}
    out_fields = ", ".join(
        [f"{df.schema[c].name} {df.schema[c].dataType.simpleString()}" for c in keep]
        + ["n_words long", "n_subwords long", "lossless boolean"]
    )

    def kernel(batches):
        cache: dict[str, tuple] = {}
        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows = []
            for idx in range(len(pdf)):
                text = pdf[text_col].iloc[idx]
                n_words = 0
                n_sub = 0
                lossless = True
                for w in (text or "").split(" "):
                    if not w:
                        continue
                    subs = cache.get(w)
                    if subs is None:
                        subs = encode_word(w, ranks)
                        cache[w] = subs
                    n_words += 1
                    n_sub += len(subs)
                    if "".join(subs) != w:
                        lossless = False
                row = {c: pdf[c].iloc[idx] for c in keep}
                row["n_words"] = n_words
                row["n_subwords"] = n_sub
                row["lossless"] = lossless
                rows.append(row)
            yield pd.DataFrame(rows)

    return df.select(*keep, text_col).mapInPandas(kernel, out_fields)
