"""Frequent-item (heavy hitter) detection via a Misra–Gries sketch.

Beyond-reference capability (BASELINE.json north star): finding the
dominant tokens/domains/keys of a 100 TB corpus without a full
(term → count) shuffle. The classic two-phase plan:

1. **Sketch pass** — each partition runs a bounded Misra–Gries summary
   (Misra & Gries 1982; the `k`-counter deterministic sketch) over its
   token stream: O(k) memory, one pass, no shuffle. Any item with
   global count > N/k is guaranteed (pigeonhole over partitions) to
   survive in at least one partition's summary, so the union of
   per-partition candidates is a SUPERSET of the true heavy hitters —
   at most ``k × partitions`` rows, i.e. tiny.
2. **Verify pass** — exact counts for the candidate set only (a
   broadcast semi-join against the token stream), then the exact
   threshold ``count * k > N`` keeps precisely the true heavy hitters.

The emitted result is therefore EXACT (sketch recall + exact-count
precision), while the skewed term axis never becomes a shuffle key for
the full vocabulary — only for the bounded candidate set.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def misra_gries_candidates(tokens: DataFrame, col: str, k: int) -> DataFrame:
    """Per-partition Misra–Gries summaries → distinct candidate items.

    ``tokens`` is a one-column frame of items (pre-exploded). Arrow
    batches stream through a per-partition dict of at most ``k``
    counters; the decrement step is the textbook "subtract 1 from all
    and drop zeros" whenever a new item arrives with the table full.
    """

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict[str, int] = {}
        for batch in batches:
            for item, cnt in batch[col].value_counts().items():
                c = int(cnt)
                if item in counters:
                    counters[item] += c
                elif len(counters) < k:
                    counters[item] = c
                else:
                    # bulk decrement: min surviving mass absorbs c
                    dec = min(c, min(counters.values()))
                    counters = {
                        i: n - dec for i, n in counters.items() if n > dec
                    }
                    if c > dec and len(counters) < k:
                        counters[item] = c - dec
        yield pd.DataFrame({col: list(counters.keys())})

    return tokens.mapInPandas(summarize, schema=f"{col} string").distinct()


def heavy_hitters(tokens: DataFrame, col: str, k: int) -> DataFrame:
    """Exact items with count > N/k → (item, cnt), via sketch-then-
    verify. Threshold compares use integer cross-multiplication
    (cnt * k > N) so the boundary never floats."""
    spark = tokens.sparkSession
    candidates = misra_gries_candidates(tokens, col, k)
    total = tokens.agg(F.count("*").cast("long").alias("n_total")).withColumn(
        "j", F.lit(1)
    )
    exact = (
        tokens.join(F.broadcast(candidates), col)
        .groupBy(col)
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    return (
        exact.withColumn("j", F.lit(1))
        .join(F.broadcast(total), "j")
        .filter(F.col("cnt") * k > F.col("n_total"))
        .select(col, "cnt")
    )
