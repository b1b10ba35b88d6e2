"""Multimodal column plumbing — image/audio/video as opaque binary.

Beyond-reference capability (BASELINE.json north star). The pattern a
100 TB multimodal pipeline needs from Spark:

- media as ``binary`` columns + a typed metadata struct (mime, width,
  height, duration) so relational ops never touch the payload;
- decode / feature-extract as Arrow-batched ``mapInPandas`` so bytes
  stream through Python in columnar batches (never row-at-a-time), and
  the decode stage is embarrassingly parallel per input partition — no
  shuffle is introduced by any operator here;
- partition sizing by *bytes not rows*: callers should repartition so a
  batch of payloads fits executor memory (see ``target_partitions``).

The actual codecs (PIL/librosa/ffmpeg) are NOT in this container, so
the decode kernel is stubbed deterministically: real Spark plumbing
(schema, batching, UDF signatures), fake pixels. Swap ``_decode_stub``
for a real decoder in production.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("mime", StringType(), True),
        StructField("payload", BinaryType(), True),
        StructField("n_bytes", IntegerType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("mime", StringType(), True),
        StructField("n_bytes", IntegerType(), True),
        StructField("feature", ArrayType(FloatType()), True),
    ]
)


def attach_media_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Typed metadata without decoding: size + content hash are
    computable JVM-side; mime stays whatever ingestion declared."""
    return df.withColumn("n_bytes", F.length(payload_col)).withColumn(
        "content_sha", F.sha2(F.col(payload_col), 256)
    )


def _decode_stub(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic fake 'embedding' from payload bytes.

    Stand-in for a real decode→model feature extractor (PIL/torchvision
    etc. are not installed here). Deterministic so tests are stable.
    """
    digest = hashlib.sha256(payload or b"").digest()
    return [b / 255.0 for b in digest[:dim]]


def decode_and_featurize(df: DataFrame, dim: int = 8) -> DataFrame:
    """Arrow-batched decode + feature extraction via ``mapInPandas``.

    Batch shape: the kernel receives pandas DataFrames of whole rows
    (payload bytes included) and yields the feature schema — the real
    pattern for GPU-adjacent preprocessing at scale. Raises nothing on
    null payloads (null in → null feature out).
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime": pdf["mime"],
                    "n_bytes": pdf["payload"].map(
                        lambda p: 0 if p is None else len(p)
                    ).astype("int32"),
                    "feature": pdf["payload"].map(
                        lambda p: None if p is None else _decode_stub(bytes(p), dim)
                    ),
                }
            )
            yield out

    return df.mapInPandas(kernel, FEATURE_SCHEMA)


def sample_frames(
    df: DataFrame, every_n_bytes: int = 1024, max_frames: int = 4
) -> DataFrame:
    """'Frame sampling' plumbing: explode each payload into up to
    ``max_frames`` byte-offset frames (a real video pipeline would
    decode keyframes; offsets stand in). Pure JVM expressions — the
    explode happens before any Python stage so Catalyst manages the
    fan-out."""
    n_frames = F.least(
        F.lit(max_frames),
        F.greatest(F.lit(1), (F.length("payload") / every_n_bytes).cast("int")),
    )
    return df.select(
        "media_id",
        F.posexplode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx", "_"),
    ).select(
        "media_id",
        "frame_idx",
        (F.col("frame_idx") * every_n_bytes).alias("byte_offset"),
    )


def target_partitions(total_bytes: int, bytes_per_partition: int = 128 << 20) -> int:
    """Partition count so each task holds ~128 MB of payload — size by
    bytes, not rows, when payloads dominate row width."""
    return max(1, total_bytes // bytes_per_partition)
