"""PNG codec (multimodal/png.py): known-answer decodes built by hand
(independent of the module's own encoder), filter-by-filter
roundtrips, the non-RGB color types, and malformed-payload behavior.
Pure Python/numpy — no Spark session needed except the dispatch test."""

from __future__ import annotations

import struct
import zlib
from binascii import crc32

import numpy as np

from data_engineering_project_spark.multimodal import binary_ops
import pytest

from data_engineering_project_spark.multimodal.png import (
    decode_png,
    encode_png,
    encode_png_gray,
    encode_png_interlaced,
    encode_png_rgb16,
)

SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", crc32(ctype + data) & 0xFFFFFFFF)
    )


def _manual_png(w, h, color_type, raw_scanlines, extra_chunks=()):
    """Assemble a PNG entirely in the test — filter bytes and pixel
    bytes are written out literally, so the decoder is checked against
    ground truth, not against encode_png."""
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    body = _chunk(b"IHDR", ihdr)
    for ctype, data in extra_chunks:
        body += _chunk(ctype, data)
    body += _chunk(b"IDAT", zlib.compress(raw_scanlines))
    return SIG + body + _chunk(b"IEND", b"")


def test_filter0_rgb_known_answer():
    # 2x2 RGB, filter 0 rows: pixel bytes appear literally
    row0 = bytes([0]) + bytes([10, 20, 30, 40, 50, 60])
    row1 = bytes([0]) + bytes([70, 80, 90, 100, 110, 120])
    png = _manual_png(2, 2, 2, row0 + row1)
    px = decode_png(png)
    want = np.array(
        [[[10, 20, 30], [40, 50, 60]], [[70, 80, 90], [100, 110, 120]]],
        dtype=np.uint8,
    )
    assert np.array_equal(px, want)


def test_sub_and_up_filters_known_answer():
    # row0: Sub — first pixel literal, second stored as delta vs left
    # row1: Up — stored as delta vs the row above
    row0 = bytes([1]) + bytes([10, 20, 30, 5, 5, 5])  # -> 10,20,30,15,25,35
    row1 = bytes([2]) + bytes([1, 1, 1, 2, 2, 2])  # -> 11,21,31,17,27,37
    png = _manual_png(2, 2, 2, row0 + row1)
    want = np.array(
        [[[10, 20, 30], [15, 25, 35]], [[11, 21, 31], [17, 27, 37]]],
        dtype=np.uint8,
    )
    assert np.array_equal(decode_png(png), want)


def test_all_filters_roundtrip_exact():
    rng = np.random.default_rng(11)
    px = rng.integers(0, 256, size=(9, 7, 3), dtype=np.uint8)
    for ftype in range(5):
        back = decode_png(encode_png(px, filter_type=ftype))
        assert back is not None and np.array_equal(back, px), f"filter {ftype}"


def test_grayscale_alpha_palette_color_types():
    # gray (color 0): one channel, replicated to RGB
    g = _manual_png(2, 1, 0, bytes([0]) + bytes([7, 200]))
    assert np.array_equal(
        decode_png(g), np.array([[[7, 7, 7], [200, 200, 200]]], dtype=np.uint8)
    )
    # gray+alpha (color 4): luma replicated, alpha dropped
    ga = _manual_png(1, 1, 4, bytes([0]) + bytes([9, 128]))
    assert np.array_equal(decode_png(ga), np.array([[[9, 9, 9]]], dtype=np.uint8))
    # RGBA (color 6): alpha dropped
    rgba = _manual_png(1, 1, 6, bytes([0]) + bytes([1, 2, 3, 77]))
    assert np.array_equal(decode_png(rgba), np.array([[[1, 2, 3]]], dtype=np.uint8))
    # palette (color 3): PLTE lookup
    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])
    pal = _manual_png(
        3, 1, 3, bytes([0]) + bytes([2, 0, 1]), extra_chunks=[(b"PLTE", plte)]
    )
    want = np.array([[[0, 0, 255], [255, 0, 0], [0, 255, 0]]], dtype=np.uint8)
    assert np.array_equal(decode_png(pal), want)


def test_out_of_scope_and_corrupt_return_none():
    px = np.zeros((2, 2, 3), dtype=np.uint8)
    good = encode_png(px)
    # corrupt a CRC byte (silent bit-flip must surface as undecodable)
    bad = bytearray(good)
    bad[-5] ^= 0xFF
    assert decode_png(bytes(bad)) is None
    # truncated
    assert decode_png(good[:-8]) is None
    # 16-bit RGB is IN scope since round 12: a 1x1 zero raster decodes
    ihdr16 = struct.pack(">IIBBBBB", 1, 1, 16, 2, 0, 0, 0)
    png16 = (
        SIG
        + _chunk(b"IHDR", ihdr16)
        + _chunk(b"IDAT", zlib.compress(bytes(7)))
        + _chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_png(png16), np.zeros((1, 1, 3), dtype=np.uint8))
    # ILLEGAL depth/color combos (spec §11.2.2) still return None:
    # 16-bit palette and 4-bit RGB do not exist
    for depth, color, rowbytes in [(16, 3, 3), (4, 2, 3)]:
        ihdr_bad = struct.pack(">IIBBBBB", 1, 1, depth, color, 0, 0, 0)
        png_bad = (
            SIG
            + _chunk(b"IHDR", ihdr_bad)
            + _chunk(b"IDAT", zlib.compress(bytes(rowbytes)))
            + _chunk(b"IEND", b"")
        )
        assert decode_png(png_bad) is None, (depth, color)
    # interlaced is IN scope since round 12: a 1x1 Adam7 image is just
    # pass 1 (one filtered scanline) and must decode
    ihdr_i = struct.pack(">IIBBBBB", 1, 1, 8, 2, 0, 0, 1)
    png_i = (
        SIG
        + _chunk(b"IHDR", ihdr_i)
        + _chunk(b"IDAT", zlib.compress(bytes(4)))
        + _chunk(b"IEND", b"")
    )
    assert np.array_equal(
        decode_png(png_i), np.zeros((1, 1, 3), dtype=np.uint8)
    )
    # palette index past the palette end
    pal_bad = _manual_png(
        1, 1, 3, bytes([0, 9]), extra_chunks=[(b"PLTE", bytes([1, 2, 3]))]
    )
    assert decode_png(pal_bad) is None
    # not a PNG at all
    assert decode_png(b"definitely not a png") is None


def test_adam7_known_answer_hand_built():
    # 2x2 RGB interlaced, assembled literally: pass 1 carries pixel
    # (0,0), pass 6 carries (0,1), pass 7 carries row 1 — each pass a
    # standalone filter-0 scanline. Checks the decoder against the
    # spec's pixel-extraction grid, not against our own encoder.
    p00, p01 = bytes([10, 20, 30]), bytes([40, 50, 60])
    p10, p11 = bytes([70, 80, 90]), bytes([100, 110, 120])
    raw = (
        bytes([0]) + p00  # pass 1
        + bytes([0]) + p01  # pass 6
        + bytes([0]) + p10 + p11  # pass 7
    )
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 1)
    png = (
        SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )
    want = np.array(
        [[[10, 20, 30], [40, 50, 60]], [[70, 80, 90], [100, 110, 120]]],
        dtype=np.uint8,
    )
    assert np.array_equal(decode_png(png), want)


def test_adam7_roundtrip_shapes_and_filters():
    # shapes straddling the 8x8 pass grid: exact blocks, sub-block,
    # non-multiples, single row/column
    rng = np.random.default_rng(12)
    for h, w in [(1, 1), (2, 3), (7, 7), (8, 8), (9, 13), (1, 9), (9, 1)]:
        px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        for ftype in range(5):
            back = decode_png(encode_png_interlaced(px, filter_type=ftype))
            assert back is not None and np.array_equal(back, px), (h, w, ftype)


def test_adam7_truncated_stream_returns_none():
    px = np.arange(16 * 9 * 3, dtype=np.uint8).reshape(16, 9, 3)
    good = encode_png_interlaced(px)
    chunks = []
    pos = len(SIG)
    while pos < len(good):
        (length,) = struct.unpack(">I", good[pos : pos + 4])
        ctype = good[pos + 4 : pos + 8]
        chunks.append((ctype, good[pos + 8 : pos + 8 + length]))
        pos += 12 + length
    idat = next(d for t, d in chunks if t == b"IDAT")
    raw = zlib.decompress(idat)
    rebuilt = (
        SIG
        + _chunk(b"IHDR", next(d for t, d in chunks if t == b"IHDR"))
        + _chunk(b"IDAT", zlib.compress(raw[:-10]))
        + _chunk(b"IEND", b"")
    )
    assert decode_png(rebuilt) is None


def test_decompress_bomb_rejected_before_inflation():
    # crafted IHDR claims a 100k x 100k raster (30 GB raw) with a tiny
    # DEFLATE bomb as IDAT: must return None without allocating
    ihdr = struct.pack(">IIBBBBB", 100_000, 100_000, 8, 2, 0, 0, 0)
    bomb = zlib.compress(b"\x00" * (8 * 1024 * 1024), 9)
    png = (
        SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", bomb)
        + _chunk(b"IEND", b"")
    )
    assert decode_png(png) is None


def test_stream_longer_than_header_promises_returns_none():
    # valid 4x4 dims but the DEFLATE stream inflates to extra bytes —
    # the bounded decompressor must refuse, not silently truncate
    raw = b"".join(bytes([0]) + bytes(12) for _ in range(4)) + b"EXTRA"
    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 0)
    png = (
        SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )
    assert decode_png(png) is None


def test_encode_png_validates_input():
    with pytest.raises(ValueError):
        encode_png(np.zeros((2, 2, 4), dtype=np.uint8))
    with pytest.raises(ValueError):
        encode_png(np.zeros((2, 2), dtype=np.uint8))
    with pytest.raises(ValueError):
        encode_png(np.zeros((2, 2, 3), dtype=np.uint8), filter_type=5)
    with pytest.raises(ValueError):
        encode_png_interlaced(np.zeros((2, 2, 4), dtype=np.uint8))


def test_gray_1bit_checkerboard_with_row_padding():
    # w=10 at depth 1 -> 2-byte rows with 6 padding bits; decoder must
    # drop the padding columns and scale 0/1 to 0/255
    s = np.indices((3, 10)).sum(axis=0) % 2
    px = decode_png(encode_png_gray(s, depth=1))
    want = np.repeat((s * 255).astype(np.uint8)[:, :, None], 3, axis=2)
    assert np.array_equal(px, want)


def test_gray_2bit_and_4bit_hand_built_known_answer():
    # depth 2, w=3: samples 3,0,2 pack MSB-first as 0b11_00_10_00=0xC8
    png2 = _manual_png_depth(3, 1, 2, 0, bytes([0, 0xC8]))
    want2 = np.repeat(
        np.array([[3 * 85, 0, 2 * 85]], dtype=np.uint8)[:, :, None], 3, axis=2
    )
    assert np.array_equal(decode_png(png2), want2)
    # depth 4, w=3: samples 15,1,9 pack as 0xF1, 0x90 (low nibble pad)
    png4 = _manual_png_depth(3, 1, 4, 0, bytes([0, 0xF1, 0x90]))
    want4 = np.repeat(
        np.array([[255, 17, 9 * 17]], dtype=np.uint8)[:, :, None], 3, axis=2
    )
    assert np.array_equal(decode_png(png4), want4)


def test_sub_filter_on_subbyte_rows_uses_bpp_1():
    # depth 4, w=4 -> 2 data bytes per row; filter 1 (Sub) with bpp=1:
    # second byte accumulates the first BYTE (not "pixel")
    # row bytes after unfilter: 0x12, 0x12+0x22=0x34 -> samples 1,2,3,4
    png = _manual_png_depth(4, 1, 4, 0, bytes([1, 0x12, 0x22]))
    want = np.repeat(
        (np.array([[1, 2, 3, 4]], dtype=np.uint8) * 17)[:, :, None], 3, axis=2
    )
    assert np.array_equal(decode_png(png), want)


def test_gray_16bit_takes_high_byte():
    s = np.array([[0x1234, 0x00FF], [0xFF00, 0xABCD]], dtype=np.uint16)
    px = decode_png(encode_png_gray(s, depth=16))
    want = np.repeat(
        np.array([[0x12, 0x00], [0xFF, 0xAB]], dtype=np.uint8)[:, :, None],
        3,
        axis=2,
    )
    assert np.array_equal(px, want)


def test_rgb16_known_answer_and_sub_filter_bpp6():
    px16 = (
        np.arange(2 * 3 * 3, dtype=np.uint16).reshape(2, 3, 3) * 257 * 4
    ) % 65536
    got = decode_png(encode_png_rgb16(px16))
    assert np.array_equal(got, (px16 >> 8).astype(np.uint8))
    # hand-built Sub-filtered 16-bit RGB row, w=2: bpp must be 6 bytes
    # pixel0 = (0x0100, 0x0200, 0x0300) literal; pixel1 stored as
    # delta, accumulating byte-wise 6 bytes back
    row = bytes([1]) + bytes([1, 0, 2, 0, 3, 0]) + bytes([1, 0, 1, 0, 1, 0])
    ihdr = struct.pack(">IIBBBBB", 2, 1, 16, 2, 0, 0, 0)
    png = (
        SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(row))
        + _chunk(b"IEND", b"")
    )
    want = np.array([[[1, 2, 3], [2, 3, 4]]], dtype=np.uint8)
    assert np.array_equal(decode_png(png), want)


def test_palette_2bit_indexes_are_raw_not_scaled():
    # depth-2 palette: indexes 3,0,2,1 pack as 0b11_00_10_01 = 0xC9;
    # indexes must hit PLTE directly (no 85x scaling)
    plte = bytes(
        [255, 0, 0, 0, 255, 0, 0, 0, 255, 9, 9, 9]
    )  # pal[0..3] = R,G,B,gray9
    png = _manual_png_depth(
        4, 1, 2, 3, bytes([0, 0xC9]), extra_chunks=[(b"PLTE", plte)]
    )
    want = np.array(
        [[[9, 9, 9], [255, 0, 0], [0, 0, 255], [0, 255, 0]]], dtype=np.uint8
    )
    assert np.array_equal(decode_png(png), want)
    # index past palette end at depth 2
    bad = _manual_png_depth(
        1, 1, 2, 3, bytes([0, 0xC0]), extra_chunks=[(b"PLTE", bytes([1, 2, 3]))]
    )
    assert decode_png(bad) is None


def test_adam7_interlaced_subbyte_and_16bit_roundtrip():
    # Adam7 at depth 1 exercises PER-PASS bit packing (each pass pads
    # its own rows); hand-scattering the spec grid rebuilds the raster
    rng = np.random.default_rng(21)
    s = rng.integers(0, 2, size=(9, 13), dtype=np.uint8)
    sections = []
    for x0, y0, xs, ys in [
        (0, 0, 8, 8),
        (4, 0, 8, 8),
        (0, 4, 4, 8),
        (2, 0, 4, 4),
        (0, 2, 2, 4),
        (1, 0, 2, 2),
        (0, 1, 1, 2),
    ]:
        sub = s[y0::ys, x0::xs]
        if 0 in sub.shape:
            continue
        for row in sub:
            sections.append(b"\x00" + np.packbits(row).tobytes())
    ihdr = struct.pack(">IIBBBBB", 13, 9, 1, 0, 0, 0, 1)
    png = (
        SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(b"".join(sections)))
        + _chunk(b"IEND", b"")
    )
    want = np.repeat((s * 255)[:, :, None], 3, axis=2)
    assert np.array_equal(decode_png(png), want)
    # Adam7 16-bit gray: same scatter, 2-byte samples
    s16 = rng.integers(0, 65536, size=(5, 6), dtype=np.uint16)
    sections = []
    for x0, y0, xs, ys in [
        (0, 0, 8, 8),
        (4, 0, 8, 8),
        (0, 4, 4, 8),
        (2, 0, 4, 4),
        (0, 2, 2, 4),
        (1, 0, 2, 2),
        (0, 1, 1, 2),
    ]:
        sub = s16[y0::ys, x0::xs]
        if 0 in sub.shape:
            continue
        for row in sub:
            sections.append(b"\x00" + row.astype(">u2").tobytes())
    ihdr = struct.pack(">IIBBBBB", 6, 5, 16, 0, 0, 0, 1)
    png = (
        SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(b"".join(sections)))
        + _chunk(b"IEND", b"")
    )
    want = np.repeat((s16 >> 8).astype(np.uint8)[:, :, None], 3, axis=2)
    assert np.array_equal(decode_png(png), want)


def test_palette_encoder_roundtrip_all_depths():
    from data_engineering_project_spark.multimodal.png import encode_png_palette

    rng = np.random.default_rng(31)
    for depth in (1, 2, 4, 8):
        ncolors = 1 << depth
        pal = rng.integers(0, 256, size=(ncolors, 3), dtype=np.uint8)
        idx = rng.integers(0, ncolors, size=(5, 9))
        px = pal[idx]
        back = decode_png(encode_png_palette(px, depth=depth))
        assert np.array_equal(back, px), depth
    with pytest.raises(ValueError):
        # 5 distinct colors cannot fit a depth-2 palette
        five = np.arange(5 * 3, dtype=np.uint8).reshape(1, 5, 3)
        encode_png_palette(five, depth=2)


def test_depth_encoder_validation():
    with pytest.raises(ValueError):
        encode_png_gray(np.zeros((2, 2, 1)), depth=8)
    with pytest.raises(ValueError):
        encode_png_gray(np.zeros((2, 2)), depth=3)
    with pytest.raises(ValueError):
        encode_png_gray(np.full((2, 2), 4), depth=2)
    with pytest.raises(ValueError):
        encode_png_rgb16(np.zeros((2, 2), dtype=np.uint16))


def _manual_png_depth(w, h, depth, color_type, raw_scanlines, extra_chunks=()):
    ihdr = struct.pack(">IIBBBBB", w, h, depth, color_type, 0, 0, 0)
    body = _chunk(b"IHDR", ihdr)
    for ctype, data in extra_chunks:
        body += _chunk(ctype, data)
    body += _chunk(b"IDAT", zlib.compress(raw_scanlines))
    return SIG + body + _chunk(b"IEND", b"")


def test_decode_image_dispatch_and_features():
    px = np.array(
        [[[255, 0, 0], [0, 255, 0]], [[0, 0, 255], [255, 255, 255]]],
        dtype=np.uint8,
    )
    payload = encode_png(px, filter_type=4)
    got = binary_ops.decode_image(payload)
    assert got is not None and np.array_equal(got, px)
    feats = binary_ops.pixel_features(binary_ops.resize_rgb(got, 16, 16))
    # channel means over the 4 pixels: R=(255+0+0+255)/4, etc.
    assert feats[0] == (510 / 4) / 255.0
    assert feats[1] == (510 / 4) / 255.0
    assert feats[2] == (510 / 4) / 255.0
