"""Document chunking for retrieval / context-window packing.

Beyond-reference capability (BASELINE.json north star): RAG and
pretraining pipelines slice long documents into fixed-size token
windows with overlap before embedding or packing. Two implementations
of the same contract:

- :func:`chunk_documents` — pure Catalyst (sequence → transform →
  posexplode), the hot path: per-row array work inside whole-stage
  codegen, embarrassingly parallel, zero Python.
- :func:`chunk_documents_udtf` — a Spark 4 Python UDTF (lateral join)
  with identical output, proving the SURVEY.md §2.10 UDTF surface on a
  real operator. Row-at-a-time Python: the demonstration path, not the
  100 TB path.

Chunk contract: windows of ``size`` whitespace tokens starting every
``stride = size - overlap`` tokens; the last window may be short; a
document shorter than one window yields a single chunk. Output one row
per (doc, chunk): (doc_id, chunk_idx, start_token, n_tokens, chunk).

Scale design: chunking multiplies row count by ~len/stride but never
shuffles — it is a projection. Downstream consumers (embedding UDFs,
packers) decide their own partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_engineering_project_spark.functions.text import tokens


def chunk_documents(
    df: DataFrame,
    text_col: str,
    id_col: str,
    size: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """Fixed-size overlapping token windows, pure Catalyst."""
    if not 0 <= overlap < size:
        raise ValueError("need 0 <= overlap < size")
    stride = size - overlap
    toks = tokens(text_col)
    starts = F.sequence(
        F.lit(0),
        F.greatest(F.size(toks) - 1, F.lit(0)),
        F.lit(stride),
    )
    exploded = df.select(
        F.col(id_col),
        toks.alias("__toks"),
        F.posexplode(starts).alias("chunk_idx", "start_token"),
    )
    piece = F.slice(F.col("__toks"), F.col("start_token") + 1, size)
    return exploded.select(
        id_col,
        "chunk_idx",
        "start_token",
        F.size(piece).alias("n_tokens"),
        F.array_join(piece, " ").alias("chunk"),
    )


def chunk_documents_udtf(
    df: DataFrame,
    text_col: str,
    id_col: str,
    size: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """Same contract via a Spark 4 Python UDTF lateral join — the
    §2.10 table-function surface. Output is bit-identical to
    :func:`chunk_documents`."""
    if not 0 <= overlap < size:
        raise ValueError("need 0 <= overlap < size")
    stride = size - overlap
    from pyspark.sql.functions import udtf

    @udtf(
        returnType=(
            "chunk_idx int, start_token int, n_tokens int, chunk string"
        )
    )
    class ChunkUdtf:
        def eval(self, text: str):  # noqa: D102
            toks = (text or "").split(" ")
            for idx, start in enumerate(range(0, max(len(toks), 1), stride)):
                piece = toks[start : start + size]
                yield idx, start, len(piece), " ".join(piece)

    out = df.select(F.col(id_col), F.col(text_col)).lateralJoin(
        ChunkUdtf(F.col(text_col).outer())
    )
    return out.select(id_col, "chunk_idx", "start_token", "n_tokens", "chunk")
