"""Pure-stdlib+numpy PNG decoder — the fourth REAL raster codec.

Shrinks the declared hash-fallback surface (binary_ops module
docstring): PNG payloads now decode to actual pixels like PPM/BMP/
JPEG, with zero native dependencies — DEFLATE is ``zlib`` from the
Python standard library, and the scanline unfiltering is numpy.

Scope (returns None outside it, like every decoder here — a corrupt
or exotic object in a 100 TB corpus must not kill the task):

- every legal depth/color combination in the PNG spec: color types
  0 (gray; depths 1/2/4/8/16), 2 (RGB; 8/16), 3 (palette; 1/2/4/8),
  4 (gray+alpha; 8/16), 6 (RGBA; 8/16); all five scanline filters
  (None/Sub/Up/Average/Paeth); Adam7 interlace (each of the seven
  passes is an independently-filtered sub-image — unfilter per pass,
  scatter into the output raster). Sub-byte rows are bit-packed
  MSB-first with per-row padding; filtering is byte-level with
  bpp=1 per the spec. 16-bit samples downconvert to 8-bit by taking
  the high byte; sub-byte gray scales by 255/(2^d-1) (exact integers
  for d in 1/2/4);
- hostile objects are bounded BEFORE inflation: the IHDR-implied raw
  size is capped (a crafted huge-dimensions header + small DEFLATE
  bomb must not OOM the executor), the inflate runs through
  ``decompressobj(max_length=...)`` so it can never produce more
  bytes than the header promises, and MemoryError is caught like any
  other decode failure — the contract is None, never a dead task;
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
# legal bit depths per color type (PNG spec §11.2.2)
_DEPTHS = {
    0: (1, 2, 4, 8, 16),
    2: (8, 16),
    3: (1, 2, 4, 8),
    4: (8, 16),
    6: (8, 16),
}

# hard ceiling on the post-inflate scanline bytes one object may claim
# (from its IHDR, BEFORE any zlib work) — ~128 MiB covers a 6500x6500
# RGBA raster; a training-corpus feature batch never needs more, and a
# crafted header can't allocate past it
_MAX_RAW_BYTES = 128 * 1024 * 1024

# Adam7 pass geometry: (x_start, y_start, x_step, y_step) per the PNG
# spec's pixel-extraction grid; each pass is filtered independently
_ADAM7 = (
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
)


def _adam7_dims(w: int, h: int):
    """→ per-pass (pw, ph, x0, xs, y0, ys); empty passes keep pw/ph=0."""
    dims = []
    for x0, y0, xs, ys in _ADAM7:
        pw = (w - x0 + xs - 1) // xs if w > x0 else 0
        ph = (h - y0 + ys - 1) // ys if h > y0 else 0
        dims.append((pw, ph, x0, xs, y0, ys))
    return dims


def _stride(w: int, ch: int, depth: int) -> int:
    """Row byte count WITHOUT the filter byte: sub-byte samples are
    bit-packed MSB-first with the row padded to a whole byte."""
    return (w * ch * depth + 7) // 8


def _expected_raw(w: int, h: int, ch: int, depth: int, interlace: int) -> int:
    """Scanline-stream byte count the IHDR promises (filter byte per
    row included) — the pre-inflation bound everything else trusts."""
    if interlace == 0:
        return h * (1 + _stride(w, ch, depth))
    return sum(
        ph * (1 + _stride(pw, ch, depth))
        for pw, ph, *_ in _adam7_dims(w, h)
        if pw and ph
    )


def _inflate_exact(idat: bytes, expected: int):
    """zlib-inflate to EXACTLY ``expected`` bytes or None — the
    decompressor is never allowed to produce more than expected+1, so
    a DEFLATE bomb costs at most the promised raster, not its
    expansion."""
    d = zlib.decompressobj()
    raw = d.decompress(idat, expected + 1)
    if len(raw) != expected:
        return None
    # any trailing decompressed data means the stream lied about size
    if d.decompress(d.unconsumed_tail, 1) or d.flush(1):
        return None
    return raw


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


def _unfilter(raw: bytes, h: int, stride: int, ch: int):
    """Reverse the per-scanline filters → (h, stride) uint8 byte
    matrix. ``stride`` is ROW BYTES (not pixels) and ``ch`` is the
    filter unit in bytes (``bpp``: 1 for sub-byte depths, bytes-per-
    pixel otherwise) — per the spec, filtering is byte-level and the
    "left neighbor" sits bpp bytes back regardless of bit packing.

    None/Up rows are whole-row numpy ops; Sub/Average/Paeth recur
    along x, so those rows walk a Python loop over the stride — fine
    for the bounded images a feature batch holds (and trivially
    replaced by a C scanline pass in production; the contract is the
    decode, not this loop)."""
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


def _unpack_samples(mat, w: int, ch: int, depth: int):
    """(h, stride) unfiltered bytes → (h, w*ch) uint8 samples.

    depth 8 is the identity; depth 16 keeps the HIGH byte of each
    big-endian sample (the standard 16→8 downconversion); depths
    1/2/4 (always ch==1: gray or palette index) unpack MSB-first
    bit groups and drop the row-padding columns. Sub-byte GRAY values
    are raw 0..2^d-1 here — the caller scales; palette indexes are
    used as-is."""
    h = mat.shape[0]
    if depth == 8:
        return mat[:, : w * ch]
    if depth == 16:
        return np.ascontiguousarray(mat[:, : w * ch * 2 : 2])
    # 1/2/4-bit, single channel: unpack to bits then regroup
    bits = np.unpackbits(mat, axis=1)
    per = bits.shape[1] // depth
    groups = bits[:, : per * depth].reshape(h, per, depth)
    weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint8)
    vals = (groups * weights).sum(axis=2).astype(np.uint8)
    return vals[:, :w]


def _deinterlace(raw: bytes, w: int, h: int, ch: int, depth: int):
    """Adam7: the scanline stream is seven concatenated sub-images,
    each filtered as if it were a standalone PNG of its own pass
    dimensions (each pass bit-packs its own rows with its own
    padding) — unfilter each with the SAME five-filter engine, unpack
    its samples, then scatter onto the (x_start::x_step,
    y_start::y_step) grid. Empty passes (a pass grid that misses a
    tiny image) occupy zero bytes. → (h, w*ch) uint8 sample matrix,
    or None."""
    out = np.zeros((h, w, ch), dtype=np.uint8)
    bpp = max(1, ch * depth // 8)
    pos = 0
    for pw, ph, x0, xs, y0, ys in _adam7_dims(w, h):
        if not pw or not ph:
            continue
        stride = _stride(pw, ch, depth)
        size = ph * (1 + stride)
        sub = _unfilter(raw[pos : pos + size], ph, stride, bpp)
        if sub is None:
            return None
        pos += size
        samples = _unpack_samples(sub, pw, ch, depth)
        out[y0::ys, x0::xs] = samples.reshape(ph, pw, ch)
    if pos != len(raw):
        return None
    return out.reshape(h, w * ch)


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
            or color not in _CHANNELS
            or depth not in _DEPTHS[color]
            or comp != 0
            or filt != 0
            or interlace not in (0, 1)
        ):
            return None
        ch = _CHANNELS[color]
        expected = _expected_raw(w, h, ch, depth, interlace)
        # bound BEFORE inflating: a crafted IHDR (huge dims) plus a
        # small DEFLATE bomb must fail here, not in an executor OOM
        if expected > _MAX_RAW_BYTES:
            return None
        idat = b"".join(d for t, d in chunks if t == b"IDAT")
        if not idat:
            return None
        raw = _inflate_exact(idat, expected)
        if raw is None:
            return None
        if interlace == 0:
            bpp = max(1, ch * depth // 8)
            byte_mat = _unfilter(raw, h, _stride(w, ch, depth), bpp)
            if byte_mat is None:
                return None
            mat = _unpack_samples(byte_mat, w, ch, depth)
        else:
            mat = _deinterlace(raw, w, h, ch, depth)
            if mat is None:
                return None
        px = mat.reshape(h, w, ch)
        if color != 3 and depth < 8:
            # gray sub-byte: scale 0..2^d-1 onto 0..255 (exact: 255,
            # 85, 17 for d=1/2/4); palette indexes stay raw
            px = px * np.uint8(255 // ((1 << depth) - 1))
        if color == 2:  # RGB
            return np.ascontiguousarray(px)
        if color == 6:  # RGBA → drop alpha
            return np.ascontiguousarray(px[:, :, :3])
        if color == 0:  # gray → replicate
            return np.repeat(px, 3, axis=2)
        if color == 4:  # gray+alpha → replicate luma, drop alpha
            return np.repeat(px[:, :, :1], 3, axis=2)
        # color == 3: palette lookup (PLTE is always 8-bit RGB
        # regardless of the index depth)
        plte = next((d for t, d in chunks if t == b"PLTE"), None)
        if plte is None or len(plte) % 3:
            return None
        pal = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
        idx = px[:, :, 0]
        if int(idx.max()) >= len(pal):
            return None
        return pal[idx]
    except (
        ValueError,
        IndexError,
        zlib.error,
        struct.error,
        MemoryError,
        OverflowError,
    ):
        return None


def encode_png(pixels, filter_type: int = 0) -> bytes:
    """Minimal PNG writer (8-bit RGB, one filter type for every row) —
    the test harness's known-answer source and a usable sink for small
    rasters. ``filter_type`` exercises a specific scanline filter so
    each unfilter branch is pinned against ground truth."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim != 3 or px.shape[2] != 3:
        raise ValueError(f"encode_png wants HxWx3 RGB, got {px.shape}")
    if not 0 <= filter_type <= 4:
        raise ValueError(f"filter_type must be 0..4, got {filter_type}")
    h, w, ch = px.shape
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


def encode_png_interlaced(pixels, filter_type: int = 0) -> bytes:
    """Adam7-interlaced PNG writer (8-bit RGB) — the known-answer
    source pinning :func:`_deinterlace`: extract each pass's pixel
    grid, filter it as a standalone sub-image via the SAME row-filter
    logic :func:`encode_png` uses, concatenate, and mark interlace=1
    in IHDR. decode(encode_interlaced(px)) == px is the test."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim != 3 or px.shape[2] != 3:
        raise ValueError(f"encode_png_interlaced wants HxWx3 RGB, got {px.shape}")
    h, w, _ = px.shape
    sections = []
    for pw, ph, x0, xs, y0, ys in _adam7_dims(w, h):
        if not pw or not ph:
            continue
        sub = np.ascontiguousarray(px[y0::ys, x0::xs])
        # reuse encode_png's filtering by encoding the pass standalone
        # and slicing its raw scanline stream back out
        sub_png = encode_png(sub, filter_type)
        chunks = _parse_chunks(sub_png)
        idat = b"".join(d for t, d in chunks if t == b"IDAT")
        sections.append(zlib.decompress(idat))
    raw = b"".join(sections)

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 1)
    return (
        _SIGNATURE
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _chunk_bytes(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", crc32(ctype + data) & 0xFFFFFFFF)
    )


def encode_png_gray(samples, depth: int) -> bytes:
    """Grayscale PNG writer for ALL legal gray depths (1/2/4/8/16) —
    the known-answer source for the sub-byte and 16-bit decode paths.
    ``samples`` is (h, w) of RAW sample values (0..2^depth-1 for
    depth<=8; 0..65535 for depth 16). Rows are filter-0, bit-packed
    MSB-first with per-row padding exactly as the spec requires."""
    s = np.asarray(samples)
    if s.ndim != 2:
        raise ValueError(f"encode_png_gray wants HxW samples, got {s.shape}")
    if depth not in _DEPTHS[0]:
        raise ValueError(f"illegal gray depth {depth}")
    hi = (1 << depth) - 1
    if s.min() < 0 or s.max() > hi:
        raise ValueError(f"samples out of range for depth {depth}")
    h, w = s.shape
    lines = []
    for y in range(h):
        if depth == 16:
            row = s[y].astype(">u2").tobytes()
        elif depth == 8:
            row = s[y].astype(np.uint8).tobytes()
        else:
            bits = (
                (s[y, :, None].astype(np.uint8) >> np.arange(depth - 1, -1, -1))
                & 1
            ).reshape(-1)
            row = np.packbits(bits).tobytes()  # packbits pads the row
        lines.append(b"\x00" + row)
    ihdr = struct.pack(">IIBBBBB", w, h, depth, 0, 0, 0, 0)
    return (
        _SIGNATURE
        + _chunk_bytes(b"IHDR", ihdr)
        + _chunk_bytes(b"IDAT", zlib.compress(b"".join(lines)))
        + _chunk_bytes(b"IEND", b"")
    )


def encode_png_palette(pixels, depth: int) -> bytes:
    """Palette PNG writer (filter 0) for index depths 1/2/4/8 — the
    known-answer source for the sub-byte palette path. Builds PLTE
    from the raster's unique colors (first-seen order); raises if the
    image has more colors than 2**depth indexes can address."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim != 3 or px.shape[2] != 3:
        raise ValueError(f"encode_png_palette wants HxWx3, got {px.shape}")
    if depth not in _DEPTHS[3]:
        raise ValueError(f"illegal palette depth {depth}")
    h, w, _ = px.shape
    flat = px.reshape(-1, 3)
    colors: list[tuple[int, int, int]] = []
    index: dict[tuple[int, int, int], int] = {}
    idx = np.empty(len(flat), dtype=np.uint8)
    for i, c in enumerate(map(tuple, flat.tolist())):
        if c not in index:
            index[c] = len(colors)
            colors.append(c)
        idx[i] = index[c]
    if len(colors) > (1 << depth):
        raise ValueError(f"{len(colors)} colors exceed depth-{depth} palette")
    idx2 = idx.reshape(h, w)
    lines = []
    for y in range(h):
        if depth == 8:
            row = idx2[y].tobytes()
        else:
            bits = (
                (idx2[y, :, None] >> np.arange(depth - 1, -1, -1)) & 1
            ).reshape(-1)
            row = np.packbits(bits).tobytes()
        lines.append(b"\x00" + row)
    plte = bytes(b for c in colors for b in c)
    ihdr = struct.pack(">IIBBBBB", w, h, depth, 3, 0, 0, 0)
    return (
        _SIGNATURE
        + _chunk_bytes(b"IHDR", ihdr)
        + _chunk_bytes(b"PLTE", plte)
        + _chunk_bytes(b"IDAT", zlib.compress(b"".join(lines)))
        + _chunk_bytes(b"IEND", b"")
    )


def encode_png_rgb16(pixels16) -> bytes:
    """16-bit RGB PNG writer (filter 0) — known-answer source for the
    16-bit triplet path. ``pixels16`` is (h, w, 3) uint16."""
    px = np.asarray(pixels16, dtype=np.uint16)
    if px.ndim != 3 or px.shape[2] != 3:
        raise ValueError(f"encode_png_rgb16 wants HxWx3, got {px.shape}")
    h, w, _ = px.shape
    raw = b"".join(b"\x00" + px[y].astype(">u2").tobytes() for y in range(h))
    ihdr = struct.pack(">IIBBBBB", w, h, 16, 2, 0, 0, 0)
    return (
        _SIGNATURE
        + _chunk_bytes(b"IHDR", ihdr)
        + _chunk_bytes(b"IDAT", zlib.compress(raw))
        + _chunk_bytes(b"IEND", b"")
    )
