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

Decoding: four raster formats are decoded FOR REAL in pure
stdlib+numpy — PPM "P6", 24-bit uncompressed BMP, baseline sequential
JPEG (Huffman, 4:2:0/4:2:2/4:4:4, restart markers; full codec in
``multimodal/jpeg.py``), and 8-bit PNG (DEFLATE via stdlib zlib, all
five scanline filters, gray/RGB/palette/alpha color types, Adam7
interlace; codec in ``multimodal/png.py``) — so the
decode→feature→resize path runs on actual pixels with zero native
dependencies. Payloads in any other
format (1/2/4/16-bit PNG; audio/video need librosa/ffmpeg,
absent here) fall back to the deterministic hash stub
``_hash_features`` — real Spark plumbing, declared fake features; the
audio/video fallback is PERMANENT for this repo. Swap it for a real
codec in production; the kernel signature and batch shape don't
change.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
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


def _hash_features(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic fake 'embedding' from payload bytes — the
    DECLARED fallback for formats whose codecs aren't in this
    container (JPEG/PNG/audio/video). Deterministic so tests are
    stable; swap for a real codec in production."""
    digest = hashlib.sha256(payload or b"").digest()
    return [b / 255.0 for b in digest[:dim]]


def _decode_ppm(payload: bytes):
    """Binary PPM ("P6", maxval <= 255) → HxWx3 uint8 array.

    Header = magic, whitespace/#-comment separated width/height/
    maxval, ONE whitespace byte, then raw RGB rows. Returns None on
    any malformed header/truncated payload (decode never throws —
    a corrupt object in a 100 TB corpus must not kill the task)."""
    try:
        if not payload.startswith(b"P6"):
            return None
        pos, fields = 2, []
        while len(fields) < 3:
            while pos < len(payload) and payload[pos : pos + 1].isspace():
                pos += 1
            if payload[pos : pos + 1] == b"#":  # comment to end of line
                while pos < len(payload) and payload[pos : pos + 1] != b"\n":
                    pos += 1
                continue
            start = pos
            while pos < len(payload) and not payload[pos : pos + 1].isspace():
                pos += 1
            fields.append(int(payload[start:pos]))
        pos += 1  # the single whitespace after maxval
        w, h, maxval = fields
        if w <= 0 or h <= 0 or not (0 < maxval <= 255):
            return None
        raw = payload[pos : pos + w * h * 3]
        if len(raw) != w * h * 3:
            return None
        return np.frombuffer(raw, dtype=np.uint8).reshape(h, w, 3)
    except (ValueError, IndexError):
        return None


def _decode_bmp(payload: bytes):
    """Uncompressed 24-bit BMP (BITMAPINFOHEADER, the plain variant)
    → HxWx3 uint8 RGB array. Rows are stored bottom-up, BGR, padded
    to 4-byte boundaries. Returns None for any other BMP flavor or a
    truncated payload."""
    try:
        if not payload.startswith(b"BM") or len(payload) < 54:
            return None
        pix_off = int.from_bytes(payload[10:14], "little")
        w = int.from_bytes(payload[18:22], "little", signed=True)
        h = int.from_bytes(payload[22:26], "little", signed=True)
        bpp = int.from_bytes(payload[28:30], "little")
        compression = int.from_bytes(payload[30:34], "little")
        if w <= 0 or h == 0 or bpp != 24 or compression != 0:
            return None
        flip = h > 0  # positive height = bottom-up storage
        h = abs(h)
        stride = (w * 3 + 3) & ~3
        raw = payload[pix_off : pix_off + stride * h]
        if len(raw) != stride * h:
            return None
        rows = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride)
        bgr = rows[:, : w * 3].reshape(h, w, 3)
        rgb = bgr[:, :, ::-1]
        return rgb[::-1] if flip else rgb
    except (ValueError, IndexError):
        return None


def decode_image(payload: bytes):
    """Dispatch on magic bytes → HxWx3 uint8 RGB, or None when the
    format isn't a supported raster (PPM P6, 24-bit BMP, baseline
    JPEG — multimodal/jpeg.py — or 8-bit PNG — multimodal/png.py)."""
    if payload is None:
        return None
    payload = bytes(payload)
    if payload.startswith(b"P6"):
        return _decode_ppm(payload)
    if payload.startswith(b"BM"):
        return _decode_bmp(payload)
    if payload.startswith(b"\xff\xd8"):
        from data_engineering_project_spark.multimodal.jpeg import decode_jpeg

        return decode_jpeg(payload)
    if payload.startswith(b"\x89PNG\r\n\x1a\n"):
        from data_engineering_project_spark.multimodal.png import decode_png

        return decode_png(payload)
    return None


def resize_rgb(pixels, out_h: int, out_w: int):
    """Nearest-neighbor resize of an HxWx3 uint8 array — the bounded
    preprocessing step between decode and featurize (a model input
    wants a fixed shape). Pure numpy indexing; deterministic."""
    h, w = pixels.shape[:2]
    ri = (np.arange(out_h) * h) // out_h
    ci = (np.arange(out_w) * w) // out_w
    return pixels[ri][:, ci]


def pixel_features(pixels) -> list[float]:
    """8-float image descriptor from REAL pixels: mean R/G/B, luma
    standard deviation, and a 4-bin luma histogram (all in [0, 1]).
    The fixed-dim contract a downstream similarity join or quality
    filter expects from any featurizer."""
    px = pixels.astype(np.float64)
    means = px.reshape(-1, 3).mean(axis=0) / 255.0
    luma = px @ np.array([0.299, 0.587, 0.114])
    hist = np.histogram(luma, bins=4, range=(0.0, 256.0))[0]
    hist = hist / luma.size
    return [
        float(means[0]),
        float(means[1]),
        float(means[2]),
        float(luma.std() / 255.0),
        *(float(x) for x in hist),
    ]


def decode_and_featurize(df: DataFrame, dim: int = 8) -> DataFrame:
    """Arrow-batched decode + feature extraction via ``mapInPandas``.

    Batch shape: the kernel receives pandas DataFrames of whole rows
    (payload bytes included) and yields the feature schema — the real
    pattern for GPU-adjacent preprocessing at scale. Raises nothing on
    null payloads (null in → null feature out).

    PPM/BMP/JPEG/PNG payloads decode to real pixels (resize to 16x16,
    then the 8-float ``pixel_features`` descriptor); other formats
    fall back to the declared ``_hash_features`` stub — same schema
    either way, so swapping in another real codec changes no plumbing.
    """

    def featurize(p) -> list[float] | None:
        if p is None:
            return None
        px = decode_image(p)
        if px is None:
            return _hash_features(bytes(p), dim)
        feats = pixel_features(resize_rgb(px, 16, 16))
        # honor the dim contract on BOTH paths: the pixel descriptor
        # is 8 floats, the hash fallback is dim floats — zero-pad or
        # truncate so one column never mixes feature lengths
        if len(feats) < dim:
            feats = feats + [0.0] * (dim - len(feats))
        return feats[:dim]

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime": pdf["mime"],
                    "n_bytes": pdf["payload"].map(
                        lambda p: 0 if p is None else len(p)
                    ).astype("int32"),
                    "feature": pdf["payload"].map(featurize),
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
