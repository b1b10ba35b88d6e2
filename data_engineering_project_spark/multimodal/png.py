"""Pure-stdlib+numpy PNG decoder — the fourth REAL raster codec.

Shrinks the declared hash-fallback surface (binary_ops module
docstring): PNG payloads now decode to actual pixels like PPM/BMP/
JPEG, with zero native dependencies — DEFLATE is ``zlib`` from the
Python standard library, and the scanline unfiltering is numpy.

Scope (returns None outside it, like every decoder here — a corrupt
or exotic object in a 100 TB corpus must not kill the task):

- 8-bit samples; color types 0 (gray), 2 (RGB), 3 (palette),
  4 (gray+alpha), 6 (RGBA); all five scanline filters
  (None/Sub/Up/Average/Paeth);
- NOT decoded: 1/2/4/16-bit depths, Adam7 interlace (progressive
  delivery matters for browsers, not for a batch decode stage);
- alpha is dropped (the featurize contract downstream is HxWx3 RGB;
  compositing policy belongs to the caller, not the codec);
- chunk CRCs are verified — a silent bit-flip in a lake object
  surfaces as "undecodable", not as wrong pixels.

Spark-side plumbing is unchanged by design: ``decode_image``
dispatches on the PNG signature, and the mapInPandas kernel, batch
shape, and FEATURE_SCHEMA are identical (the whole point of the
opaque-binary column pattern).
"""

from __future__ import annotations

import struct
import zlib
from binascii import crc32

import numpy as np

_SIGNATURE = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _parse_chunks(payload: bytes):
    """→ list of (type, data) with CRCs verified, or None."""
    pos = len(_SIGNATURE)
    chunks = []
    n = len(payload)
    while pos + 8 <= n:
        length, ctype = struct.unpack(">I4s", payload[pos : pos + 8])
        data_end = pos + 8 + length
        if data_end + 4 > n:
            return None
        data = payload[pos + 8 : data_end]
        (crc,) = struct.unpack(">I", payload[data_end : data_end + 4])
        if crc32(ctype + data) & 0xFFFFFFFF != crc:
            return None
        chunks.append((ctype, data))
        pos = data_end + 4
        if ctype == b"IEND":
            return chunks
    return None


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _unfilter(raw: bytes, h: int, w: int, ch: int):
    """Reverse the per-scanline filters → (h, w*ch) uint8 matrix.

    None/Up rows are whole-row numpy ops; Sub/Average/Paeth recur
    along x, so those rows walk a Python loop over the stride — fine
    for the bounded images a feature batch holds (and trivially
    replaced by a C scanline pass in production; the contract is the
    decode, not this loop)."""
    stride = w * ch
    if len(raw) != h * (1 + stride):
        return None
    out = np.zeros((h, stride), dtype=np.int64)
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(h, 1 + stride)
    for y in range(h):
        ftype = int(rows[y, 0])
        cur = rows[y, 1:].astype(np.int64)
        prev = out[y - 1] if y else np.zeros(stride, dtype=np.int64)
        if ftype == 0:  # None
            out[y] = cur
        elif ftype == 2:  # Up
            out[y] = (cur + prev) & 0xFF
        elif ftype == 1:  # Sub
            line = cur
            for x in range(ch, stride):
                line[x] = (line[x] + line[x - ch]) & 0xFF
            out[y] = line
        elif ftype == 3:  # Average
            line = cur
            for x in range(stride):
                left = line[x - ch] if x >= ch else 0
                line[x] = (line[x] + ((left + prev[x]) >> 1)) & 0xFF
            out[y] = line
        elif ftype == 4:  # Paeth
            line = cur
            for x in range(stride):
                left = line[x - ch] if x >= ch else 0
                ul = prev[x - ch] if x >= ch else 0
                line[x] = (line[x] + _paeth(int(left), int(prev[x]), int(ul))) & 0xFF
            out[y] = line
        else:
            return None
    return out.astype(np.uint8)


def decode_png(payload: bytes):
    """PNG → HxWx3 uint8 RGB array, or None outside the documented
    scope (module docstring). Never throws."""
    try:
        if not payload.startswith(_SIGNATURE):
            return None
        chunks = _parse_chunks(payload)
        if not chunks or chunks[0][0] != b"IHDR":
            return None
        ihdr = chunks[0][1]
        if len(ihdr) != 13:
            return None
        w, h, depth, color, comp, filt, interlace = struct.unpack(
            ">IIBBBBB", ihdr
        )
        if (
            w <= 0
            or h <= 0
            or depth != 8
            or color not in _CHANNELS
            or comp != 0
            or filt != 0
            or interlace != 0
        ):
            return None
        idat = b"".join(d for t, d in chunks if t == b"IDAT")
        if not idat:
            return None
        raw = zlib.decompress(idat)
        ch = _CHANNELS[color]
        mat = _unfilter(raw, h, w, ch)
        if mat is None:
            return None
        px = mat.reshape(h, w, ch)
        if color == 2:  # RGB
            return px
        if color == 6:  # RGBA → drop alpha
            return np.ascontiguousarray(px[:, :, :3])
        if color == 0:  # gray → replicate
            return np.repeat(px, 3, axis=2)
        if color == 4:  # gray+alpha → replicate luma, drop alpha
            return np.repeat(px[:, :, :1], 3, axis=2)
        # color == 3: palette lookup
        plte = next((d for t, d in chunks if t == b"PLTE"), None)
        if plte is None or len(plte) % 3:
            return None
        pal = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
        idx = px[:, :, 0]
        if int(idx.max()) >= len(pal):
            return None
        return pal[idx]
    except (ValueError, IndexError, zlib.error, struct.error):
        return None


def encode_png(pixels, filter_type: int = 0) -> bytes:
    """Minimal PNG writer (8-bit RGB, one filter type for every row) —
    the test harness's known-answer source and a usable sink for small
    rasters. ``filter_type`` exercises a specific scanline filter so
    each unfilter branch is pinned against ground truth."""
    px = np.asarray(pixels, dtype=np.uint8)
    h, w, ch = px.shape
    assert ch == 3 and 0 <= filter_type <= 4
    stride = w * 3
    flat = px.reshape(h, stride).astype(np.int64)
    lines = []
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(h):
        cur = flat[y]
        if filter_type == 0:
            enc = cur
        elif filter_type == 1:
            left = np.concatenate([np.zeros(3, dtype=np.int64), cur[:-3]])
            enc = (cur - left) & 0xFF
        elif filter_type == 2:
            enc = (cur - prev) & 0xFF
        elif filter_type == 3:
            left = np.concatenate([np.zeros(3, dtype=np.int64), cur[:-3]])
            enc = (cur - ((left + prev) >> 1)) & 0xFF
        else:
            left = np.concatenate([np.zeros(3, dtype=np.int64), cur[:-3]])
            ul = np.concatenate([np.zeros(3, dtype=np.int64), prev[:-3]])
            pred = np.array(
                [
                    _paeth(int(left[x]), int(prev[x]), int(ul[x]))
                    for x in range(stride)
                ],
                dtype=np.int64,
            )
            enc = (cur - pred) & 0xFF
        lines.append(bytes([filter_type]) + bytes(enc.astype(np.uint8)))
        prev = cur
    raw = b"".join(lines)

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        _SIGNATURE
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
