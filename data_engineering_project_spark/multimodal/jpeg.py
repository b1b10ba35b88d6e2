"""Baseline JPEG codec in pure numpy — no native dependencies.

Closes the declared JPEG gap in the multimodal kernel
(``binary_ops.decode_image`` fell back to hash features for JPEG/PNG;
reference parity: the reference ships no media decode at all, this is
beyond-reference capability). Scope — the baseline sequential DCT
process of ITU-T T.81:

- decode: SOF0 (baseline, 8-bit), Huffman entropy coding, grayscale or
  YCbCr with any of the common sampling factors (4:4:4, 4:2:2, 4:4:0,
  4:2:0), restart markers (DRI/RSTn), 8- and 16-bit DQT tables,
  0xFF00 byte stuffing. Anything else (progressive SOF2, arithmetic
  coding, 12-bit precision, CMYK) returns ``None`` — a corrupt or
  exotic object in a 100 TB corpus must never kill the task, so the
  decoder NEVER raises.
- encode: JFIF baseline with the Annex-K quantization tables scaled by
  the IJG quality formula and the Annex-K Huffman tables, 4:2:0 or
  4:4:4, optional restart interval. The tables ride the stream in
  DQT/DHT segments (as every baseline JPEG's do), so the output is a
  standard file decodable by any JPEG implementation — the pair is
  NOT a private format.

The 8x8 DCT is the orthonormal type-II basis applied as two matrix
multiplies (``T @ B @ T.T``); tests cross-check it against a direct
O(n^4) evaluation of the DCT-III sum so the encoder and decoder cannot
share a transform bug. Per-block entropy coding is Python-level
bit work — fine for the Arrow-batched featurize kernel's thumbnails;
the design point is correctness + zero dependencies, not codec speed.
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------- tables

ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10,
        17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34,
        27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36,
        29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46,
        53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)
_UNZIGZAG = np.argsort(ZIGZAG)

# ITU-T T.81 Annex K.1 example quantization tables
QTBL_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
)
QTBL_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
)

# Annex K.3 typical Huffman tables: (BITS[1..16], HUFFVAL)
HUFF_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
HUFF_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
HUFF_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
HUFF_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8x8 DCT-II basis: row k = c(k)/2 * cos((2j+1)k pi/16)."""
    k = np.arange(8).reshape(8, 1)
    j = np.arange(8).reshape(1, 8)
    t = np.cos((2 * j + 1) * k * np.pi / 16) / 2.0
    t[0, :] = 1.0 / np.sqrt(8.0)
    return t


_T = _dct_matrix()


def _fdct(block: np.ndarray) -> np.ndarray:
    return _T @ block @ _T.T


def _idct(coef: np.ndarray) -> np.ndarray:
    return _T.T @ coef @ _T


def _canonical_codes(bits: list[int], values: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length), canonical JPEG assignment."""
    out: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _decode_table(bits: list[int], values: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol, for the bit-serial decoder."""
    return {
        (length, code): sym
        for sym, (code, length) in _canonical_codes(bits, values).items()
    }


# ---------------------------------------------------------------- encoder


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, code: int, length: int) -> None:
        self._acc = (self._acc << length) | (code & ((1 << length) - 1))
        self._n += length
        while self._n >= 8:
            byte = (self._acc >> (self._n - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)
            self._n -= 8
        self._acc &= (1 << self._n) - 1

    def pad_to_byte(self) -> None:
        if self._n:
            self.write((1 << (8 - self._n)) - 1, 8 - self._n)  # 1-fill


def _quality_scale(base: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, int(quality)))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int64)


def _magnitude(v: int) -> tuple[int, int]:
    """JPEG magnitude coding: value -> (category, appended bits)."""
    if v == 0:
        return 0, 0
    a = abs(v)
    t = a.bit_length()
    bits = v if v > 0 else v + (1 << t) - 1
    return t, bits


def _rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    r = rgb[..., 0].astype(np.float64)
    g = rgb[..., 1].astype(np.float64)
    b = rgb[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    return np.stack([y, cb, cr], axis=-1)


def _encode_blocks(
    writer: _BitWriter,
    plane: np.ndarray,
    qtbl: np.ndarray,
    dc_codes: dict[int, tuple[int, int]],
    ac_codes: dict[int, tuple[int, int]],
    pred: int,
) -> int:
    """Encode one 8x8 block (plane is exactly 8x8); returns new DC pred."""
    coef = _fdct(plane - 128.0)
    q = np.round(coef.flatten() / qtbl.reshape(8, 8).flatten()).astype(np.int64)
    zz = q[ZIGZAG]
    # DC
    diff = int(zz[0]) - pred
    t, bits = _magnitude(diff)
    code, length = dc_codes[t]
    writer.write(code, length)
    if t:
        writer.write(bits, t)
    # AC
    run = 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            zcode, zlen = ac_codes[0xF0]
            writer.write(zcode, zlen)
            run -= 16
        t, bits = _magnitude(v)
        code, length = ac_codes[(run << 4) | t]
        writer.write(code, length)
        writer.write(bits, t)
        run = 0
    if run:
        code, length = ac_codes[0x00]
        writer.write(code, length)
    return int(zz[0])


def encode_jpeg(
    rgb: np.ndarray,
    quality: int = 75,
    subsample: bool = True,
    restart_interval: int = 0,
) -> bytes:
    """Encode an HxWx3 (or HxW grayscale) uint8 array as baseline JFIF.

    ``subsample=True`` → 4:2:0 (2x2-mean chroma), else 4:4:4.
    ``restart_interval`` > 0 writes DRI and RSTn markers every that
    many MCUs (exercises the decoder's restart path)."""
    rgb = np.asarray(rgb)
    gray = rgb.ndim == 2
    if gray:
        rgb = np.repeat(rgb[:, :, None], 3, axis=2)
    h, w = rgb.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    ycc = _rgb_to_ycbcr(rgb.astype(np.uint8))

    qt_l = _quality_scale(QTBL_LUMA, quality)
    qt_c = _quality_scale(QTBL_CHROMA, quality)
    dc_l = _canonical_codes(*HUFF_DC_LUMA)
    ac_l = _canonical_codes(*HUFF_AC_LUMA)
    dc_c = _canonical_codes(*HUFF_DC_CHROMA)
    ac_c = _canonical_codes(*HUFF_AC_CHROMA)

    if gray:
        comps = [(1, 1, 0)]  # (hsamp, vsamp, qtbl id)
    elif subsample:
        comps = [(2, 2, 0), (1, 1, 1), (1, 1, 1)]
    else:
        comps = [(1, 1, 0), (1, 1, 1), (1, 1, 1)]
    hmax = max(c[0] for c in comps)
    vmax = max(c[1] for c in comps)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = -(-w // mcu_w)
    mcus_y = -(-h // mcu_h)

    # per-component planes, edge-padded to whole MCUs then resampled
    pad = np.pad(ycc, ((0, mcus_y * mcu_h - h), (0, mcus_x * mcu_w - w), (0, 0)), mode="edge")
    planes = []
    for ci, (hs, vs, _) in enumerate(comps):
        p = pad[..., ci]
        if hs != hmax or vs != vmax:
            fy, fx = vmax // vs, hmax // hs
            ph, pw = p.shape
            p = p.reshape(ph // fy, fy, pw // fx, fx).mean(axis=(1, 3))
        planes.append(p)

    writer = _BitWriter()
    preds = [0] * len(comps)
    mcu_count = 0
    rst = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                writer.pad_to_byte()
                writer.out.append(0xFF)
                writer.out.append(0xD0 + rst)
                rst = (rst + 1) % 8
                preds = [0] * len(comps)
            for ci, (hs, vs, tq) in enumerate(comps):
                qt = qt_l if tq == 0 else qt_c
                dc = dc_l if ci == 0 else dc_c
                ac = ac_l if ci == 0 else ac_c
                for by in range(vs):
                    for bx in range(hs):
                        y0 = (my * vs + by) * 8
                        x0 = (mx * hs + bx) * 8
                        block = planes[ci][y0 : y0 + 8, x0 : x0 + 8]
                        preds[ci] = _encode_blocks(writer, block, qt, dc, ac, preds[ci])
            mcu_count += 1
    writer.pad_to_byte()

    # ---- segments
    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(2, "big") + payload

    def dqt(tid: int, tbl: np.ndarray) -> bytes:
        return seg(0xDB, bytes([tid]) + bytes(int(x) for x in tbl[ZIGZAG]))

    def dht(cls: int, tid: int, table: tuple[list[int], list[int]]) -> bytes:
        bits, vals = table
        return seg(0xC4, bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals))

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += dqt(0, qt_l)
    if not gray:
        out += dqt(1, qt_c)
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([len(comps)])
    for ci, (hs, vs, tq) in enumerate(comps):
        sof += bytes([ci + 1, (hs << 4) | vs, tq])
    out += seg(0xC0, sof)
    out += dht(0, 0, HUFF_DC_LUMA)
    out += dht(1, 0, HUFF_AC_LUMA)
    if not gray:
        out += dht(0, 1, HUFF_DC_CHROMA)
        out += dht(1, 1, HUFF_AC_CHROMA)
    if restart_interval:
        out += seg(0xDD, restart_interval.to_bytes(2, "big"))
    sos = bytes([len(comps)])
    for ci in range(len(comps)):
        td_ta = 0 if ci == 0 else 0x11
        sos += bytes([ci + 1, td_ta])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    out += writer.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------- decoder


class _BitReader:
    """Entropy-segment bit reader: un-stuffs 0xFF00, surfaces RSTn."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self._acc = 0
        self._n = 0
        self.marker: int | None = None

    def _fill(self) -> bool:
        if self.marker is not None:
            return False
        if self.pos >= len(self.data):
            return False
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1] if self.pos + 1 < len(self.data) else None
            if nxt == 0x00:
                self.pos += 2
            elif nxt is not None and 0xD0 <= nxt <= 0xD7:
                self.marker = nxt
                return False
            else:
                self.marker = nxt
                return False
        else:
            self.pos += 1
        self._acc = (self._acc << 8) | b
        self._n += 8
        return True

    def read_bit(self) -> int | None:
        if self._n == 0 and not self._fill():
            return None
        self._n -= 1
        bit = (self._acc >> self._n) & 1
        # discard the consumed bit: without this mask the accumulator
        # grows by 8 bits per byte forever and every shift becomes
        # O(stream), turning decode quadratic in payload size
        self._acc &= (1 << self._n) - 1
        return bit

    def read_bits(self, n: int) -> int | None:
        v = 0
        for _ in range(n):
            bit = self.read_bit()
            if bit is None:
                return None
            v = (v << 1) | bit
        return v

    def sync_restart(self) -> bool:
        """Consume an expected RSTn marker and realign."""
        self._acc = 0
        self._n = 0
        if self.marker is None:
            # marker not yet reached (padding bits) — scan forward
            while self.pos < len(self.data):
                if (
                    self.data[self.pos] == 0xFF
                    and self.pos + 1 < len(self.data)
                    and 0xD0 <= self.data[self.pos + 1] <= 0xD7
                ):
                    self.marker = self.data[self.pos + 1]
                    break
                self.pos += 1
        if self.marker is None or not 0xD0 <= self.marker <= 0xD7:
            return False
        self.pos += 2
        self.marker = None
        return True


def _huff_decode(reader: _BitReader, table: dict[tuple[int, int], int]) -> int | None:
    code = 0
    for length in range(1, 17):
        bit = reader.read_bit()
        if bit is None:
            return None
        code = (code << 1) | bit
        sym = table.get((length, code))
        if sym is not None:
            return sym
    return None


def _extend(v: int, t: int) -> int:
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def decode_jpeg(payload: bytes):
    """Baseline-JPEG bytes → HxWx3 uint8 RGB array, or None.

    Never raises: unsupported process, malformed stream, or truncation
    all return None (the multimodal kernel's corrupt-object contract)."""
    try:
        return _decode_jpeg_inner(bytes(payload))
    except Exception:  # noqa: BLE001 — decoder must never kill a task
        return None


def _decode_jpeg_inner(d: bytes):
    if not d.startswith(b"\xff\xd8"):
        return None
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    comps: list[dict] = []
    h = w = 0
    restart_interval = 0
    while pos + 4 <= len(d):
        if d[pos] != 0xFF:
            return None
        # T.81 B.1.1.2: markers may be preceded by any number of 0xFF fill
        # bytes — skip them so the marker code is the first non-0xFF byte.
        while pos + 4 <= len(d) and d[pos + 1] == 0xFF:
            pos += 1
        if pos + 4 > len(d):
            return None
        marker = d[pos + 1]
        if marker == 0xD9:  # EOI before SOS
            return None
        seg_len = int.from_bytes(d[pos + 2 : pos + 4], "big")
        body = d[pos + 4 : pos + 2 + seg_len]
        if marker == 0xDB:  # DQT (possibly several tables)
            i = 0
            while i < len(body):
                prec, tid = body[i] >> 4, body[i] & 0xF
                i += 1
                n = 64 * (2 if prec else 1)
                raw = body[i : i + n]
                if len(raw) != n:
                    return None
                if prec:
                    vals = np.frombuffer(raw, dtype=">u2").astype(np.int64)
                else:
                    vals = np.frombuffer(raw, dtype=np.uint8).astype(np.int64)
                tbl = np.empty(64, dtype=np.int64)
                tbl[ZIGZAG] = vals  # stored in zigzag order
                qtables[tid] = tbl
                i += n
        elif marker == 0xC4:  # DHT (possibly several tables)
            i = 0
            while i + 17 <= len(body):
                cls, tid = body[i] >> 4, body[i] & 0xF
                bits = list(body[i + 1 : i + 17])
                n = sum(bits)
                vals = list(body[i + 17 : i + 17 + n])
                if len(vals) != n:
                    return None
                htables[(cls, tid)] = _decode_table(bits, vals)
                i += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # baseline / ext sequential
            if body[0] != 8:
                return None  # 12-bit not supported
            h = int.from_bytes(body[1:3], "big")
            w = int.from_bytes(body[3:5], "big")
            nc = body[5]
            if nc not in (1, 3):
                return None
            comps = []
            for ci in range(nc):
                cid, samp, tq = body[6 + 3 * ci : 9 + 3 * ci]
                comps.append(
                    {"id": cid, "h": samp >> 4, "v": samp & 0xF, "tq": tq}
                )
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            return None  # progressive / arithmetic / hierarchical
        elif marker == 0xDD:  # DRI
            restart_interval = int.from_bytes(body[0:2], "big")
        elif marker == 0xDA:  # SOS — entropy data follows
            ns = body[0]
            if ns != len(comps) or not comps or h == 0 or w == 0:
                return None
            for ci in range(ns):
                cs, tdta = body[1 + 2 * ci], body[2 + 2 * ci]
                for c in comps:
                    if c["id"] == cs:
                        c["td"], c["ta"] = tdta >> 4, tdta & 0xF
            return _decode_scan(
                d, pos + 2 + seg_len, h, w, comps, qtables, htables, restart_interval
            )
        pos += 2 + seg_len
    return None


def _decode_scan(d, pos, h, w, comps, qtables, htables, restart_interval):
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if hmax < 1 or vmax < 1 or hmax > 4 or vmax > 4:
        return None
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    planes = []
    for c in comps:
        if not (1 <= c["h"] <= hmax and 1 <= c["v"] <= vmax):
            return None
        planes.append(
            np.zeros((mcus_y * c["v"] * 8, mcus_x * c["h"] * 8), dtype=np.float64)
        )
        if c["tq"] not in qtables or ("td" not in c) or ("ta" not in c):
            return None
        if (0, c["td"]) not in htables or (1, c["ta"]) not in htables:
            return None

    reader = _BitReader(d, pos)
    preds = [0] * len(comps)
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                if not reader.sync_restart():
                    return None
                preds = [0] * len(comps)
            for ci, c in enumerate(comps):
                dc_tbl = htables[(0, c["td"])]
                ac_tbl = htables[(1, c["ta"])]
                qt = qtables[c["tq"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zz = np.zeros(64, dtype=np.int64)
                        t = _huff_decode(reader, dc_tbl)
                        if t is None or t > 11:
                            return None
                        if t:
                            bits = reader.read_bits(t)
                            if bits is None:
                                return None
                            preds[ci] += _extend(bits, t)
                        zz[0] = preds[ci]
                        k = 1
                        while k < 64:
                            sym = _huff_decode(reader, ac_tbl)
                            if sym is None:
                                return None
                            if sym == 0x00:  # EOB
                                break
                            run, size = sym >> 4, sym & 0xF
                            if size == 0:
                                if run != 15:
                                    return None
                                k += 16  # ZRL
                                continue
                            k += run
                            if k >= 64:
                                return None
                            bits = reader.read_bits(size)
                            if bits is None:
                                return None
                            zz[k] = _extend(bits, size)
                            k += 1
                        # de-zigzag FIRST, then dequantize: qt is stored in
                        # natural order (see DQT parse) while zz is in zigzag
                        # order — multiplying before reordering scales each AC
                        # coefficient by the quant step of a different frequency.
                        coef = (zz[_UNZIGZAG] * qt).reshape(8, 8)
                        block = _idct(coef) + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = block
            mcu_count += 1

    # upsample to full resolution and convert
    full = []
    for ci, c in enumerate(comps):
        p = planes[ci]
        fy, fx = vmax // c["v"], hmax // c["h"]
        if fy > 1 or fx > 1:
            p = np.repeat(np.repeat(p, fy, axis=0), fx, axis=1)
        full.append(p[:h, :w])
    if len(comps) == 1:
        y = np.clip(full[0], 0, 255)
        return np.repeat(y[:, :, None], 3, axis=2).astype(np.uint8)
    y, cb, cr = full
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
