"""Parquet footer statistics: the zone-map view of a table.

Row-group/file min-max statistics are what makes predicate pushdown
actually SKIP I/O — but whether they help depends entirely on layout
(see sources/layout.py: a shuffled write gives every file the full
value range). This module reads the footers (driver-side pyarrow —
metadata only, no data pages) and quantifies how much a given
predicate could prune, so layout decisions are measured, not guessed.
"""

from __future__ import annotations

import os
from dataclasses import dataclass


@dataclass(frozen=True)
class FileStats:
    path: str
    n_rows: int
    col_min: object
    col_max: object


def file_stats(path: str, column: str) -> list[FileStats]:
    """Per-file (min, max, rows) for ``column`` from parquet footers."""
    import pyarrow.parquet as pq

    out: list[FileStats] = []
    files = (
        [
            os.path.join(dp, f)
            for dp, _, fs in os.walk(path)
            for f in fs
            if f.endswith(".parquet")
        ]
        if os.path.isdir(path)
        else [path]
    )
    for f in sorted(files):
        meta = pq.ParquetFile(f).metadata
        idx = None
        for i in range(meta.num_columns):
            if meta.row_group(0).column(i).path_in_schema == column:
                idx = i
                break
        if idx is None:
            raise KeyError(f"{column} not found in {f}")
        mins, maxs, rows = [], [], 0
        for g in range(meta.num_row_groups):
            col = meta.row_group(g).column(idx)
            rows += meta.row_group(g).num_rows
            st = col.statistics
            if st is not None and st.has_min_max:
                mins.append(st.min)
                maxs.append(st.max)
        out.append(
            FileStats(
                path=f,
                n_rows=rows,
                col_min=min(mins) if mins else None,
                col_max=max(maxs) if maxs else None,
            )
        )
    return out


def pruning_fraction(path: str, column: str, lo, hi) -> dict:
    """How much of the table a range predicate [lo, hi] can SKIP using
    file-level stats alone → {n_files, skippable_files, skippable_rows,
    row_fraction_skipped}. The layout-quality metric: compare a
    clustered write against a shuffled one on the same data."""
    stats = file_stats(path, column)
    skippable = [
        s
        for s in stats
        if s.col_min is not None and (s.col_max < lo or s.col_min > hi)
    ]
    total_rows = sum(s.n_rows for s in stats)
    skip_rows = sum(s.n_rows for s in skippable)
    return {
        "n_files": len(stats),
        "skippable_files": len(skippable),
        "skippable_rows": skip_rows,
        "row_fraction_skipped": round(skip_rows / max(total_rows, 1), 4),
    }
