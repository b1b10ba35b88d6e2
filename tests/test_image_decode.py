"""Real raster decoding in the multimodal kernel (round-6 ADVICE
stretch): PPM "P6" and 24-bit uncompressed BMP parse to actual pixels
in pure numpy; decode → resize → featurize runs on real values
through the same Arrow-batched mapInPandas plumbing, and every
malformed/foreign payload degrades to the declared hash fallback
instead of raising (a corrupt object must never kill a 100 TB scan).
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from data_engineering_project_spark.multimodal.binary_ops import (
    _hash_features,
    decode_and_featurize,
    decode_image,
    pixel_features,
    resize_rgb,
)


def make_ppm(pixels: np.ndarray, comment: bool = False) -> bytes:
    h, w = pixels.shape[:2]
    header = b"P6\n"
    if comment:
        header += b"# synthetic test image\n"
    header += f"{w} {h}\n255\n".encode()
    return header + pixels.astype(np.uint8).tobytes()


def make_bmp(pixels: np.ndarray) -> bytes:
    """Minimal BITMAPINFOHEADER 24-bit BMP: bottom-up BGR rows padded
    to 4 bytes — built independently of the decoder under test."""
    h, w = pixels.shape[:2]
    stride = (w * 3 + 3) & ~3
    rows = b""
    for r in range(h - 1, -1, -1):  # bottom-up
        row = pixels[r, :, ::-1].astype(np.uint8).tobytes()  # RGB->BGR
        rows += row + b"\x00" * (stride - len(row))
    pix_off = 14 + 40
    header = b"BM" + struct.pack(
        "<IHHI", pix_off + len(rows), 0, 0, pix_off
    )
    dib = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(rows), 2835, 2835, 0, 0
    )
    return header + dib + rows


@pytest.fixture
def img():
    rng = np.random.RandomState(11)
    return rng.randint(0, 256, size=(7, 5, 3), dtype=np.uint8)


def test_ppm_roundtrip(img):
    out = decode_image(make_ppm(img))
    assert out is not None and out.shape == (7, 5, 3)
    assert np.array_equal(out, img)


def test_ppm_with_comment(img):
    assert np.array_equal(decode_image(make_ppm(img, comment=True)), img)


def test_bmp_roundtrip(img):
    out = decode_image(make_bmp(img))
    assert out is not None and out.shape == (7, 5, 3)
    assert np.array_equal(out, img)


@pytest.mark.parametrize(
    "payload",
    [
        b"",
        b"P6",
        b"P6\n5 7\n255\n" + b"\x01" * 10,  # truncated raster
        b"P6\n-3 7\n255\n",  # bad dims
        b"P6 garbage here",
        b"BM",
        b"BM" + b"\x00" * 60,  # zero dims / wrong bpp
        b"BMshort",
        b"\x89PNG\r\n\x1a\n....",  # unsupported codec
        "P6 but actually text".encode(),
    ],
)
def test_malformed_payloads_return_none(payload):
    assert decode_image(payload) is None


def test_resize_nearest_exact():
    px = np.arange(4 * 4 * 3, dtype=np.uint8).reshape(4, 4, 3)
    small = resize_rgb(px, 2, 2)
    assert small.shape == (2, 2, 3)
    # nearest-neighbor picks rows/cols floor(i*4/2) = {0, 2}
    assert np.array_equal(small, px[[0, 2]][:, [0, 2]])


def test_pixel_features_known_values():
    solid = np.full((4, 4, 3), 255, dtype=np.uint8)
    f = pixel_features(solid)
    assert f[:4] == pytest.approx([1.0, 1.0, 1.0, 0.0])
    # all luma mass lands in the top histogram bin
    assert f[4:] == pytest.approx([0.0, 0.0, 0.0, 1.0])


def test_kernel_routes_real_and_fallback(spark, img):
    ppm, bmp = make_ppm(img), make_bmp(img)
    junk = b"\x89PNG not really"
    media = spark.createDataFrame(
        [
            ("p", "image/x-portable-pixmap", bytearray(ppm)),
            ("b", "image/bmp", bytearray(bmp)),
            ("j", "image/png", bytearray(junk)),
        ],
        "media_id string, mime string, payload binary",
    )
    feats = {
        r["media_id"]: list(r["feature"])
        for r in decode_and_featurize(media).collect()
    }
    want = pixel_features(resize_rgb(img, 16, 16))
    # PPM and BMP decode to the SAME pixels -> identical real features
    assert feats["p"] == pytest.approx(want, abs=1e-6)
    assert feats["b"] == pytest.approx(feats["p"], abs=1e-6)
    # unsupported codec -> the declared deterministic hash fallback
    assert feats["j"] == pytest.approx(_hash_features(junk), abs=1e-6)
    assert feats["j"] != pytest.approx(feats["p"], abs=1e-3)


def test_dim_contract_uniform_across_paths(spark, img):
    """dim > 8 (ADVICE r06): decoded payloads zero-pad the 8-float
    pixel descriptor to dim; the hash fallback is dim-long natively —
    one column never mixes feature lengths."""
    ppm = make_ppm(img)
    junk = b"\x89PNG not really"
    media = spark.createDataFrame(
        [
            ("p", "image/x-portable-pixmap", bytearray(ppm)),
            ("j", "image/png", bytearray(junk)),
        ],
        "media_id string, mime string, payload binary",
    )
    feats = {
        r["media_id"]: list(r["feature"])
        for r in decode_and_featurize(media, dim=12).collect()
    }
    assert len(feats["p"]) == 12 and len(feats["j"]) == 12
    assert feats["p"][:8] == pytest.approx(
        pixel_features(resize_rgb(img, 16, 16)), abs=1e-6
    )
    assert feats["p"][8:] == [0.0] * 4
    # truncation side of the contract
    feats4 = {
        r["media_id"]: list(r["feature"])
        for r in decode_and_featurize(media, dim=4).collect()
    }
    assert len(feats4["p"]) == 4 and len(feats4["j"]) == 4


# ---------------------------------------------------------------- JPEG


@pytest.fixture
def smooth_img():
    """Gradient image — representative of JPEG's design domain, so
    roundtrip error bounds are meaningful."""
    yy, xx = np.mgrid[0:48, 0:64]
    return np.stack(
        [(xx * 255 / 64), (yy * 255 / 48), ((xx + yy) * 255 / 112)], axis=-1
    ).astype(np.uint8)


def test_jpeg_roundtrip_444_near_lossless(smooth_img):
    from data_engineering_project_spark.multimodal import jpeg

    enc = jpeg.encode_jpeg(smooth_img, quality=95, subsample=False)
    dec = jpeg.decode_jpeg(enc)
    assert dec is not None and dec.shape == smooth_img.shape
    err = np.abs(dec.astype(int) - smooth_img.astype(int))
    assert err.mean() < 2.0 and err.max() <= 12


def test_jpeg_roundtrip_420_and_quality_ladder(smooth_img):
    from data_engineering_project_spark.multimodal import jpeg

    errs = {}
    for q in (50, 75, 90):
        dec = jpeg.decode_jpeg(jpeg.encode_jpeg(smooth_img, quality=q))
        assert dec is not None
        errs[q] = np.abs(dec.astype(int) - smooth_img.astype(int)).mean()
    # not strictly monotone pointwise (4:2:0 chroma quantization can
    # cancel differently per step) but the endpoints must order and
    # every level stays inside a sane band
    assert errs[90] < errs[50]
    assert max(errs.values()) < 8.0


def test_jpeg_grayscale_and_odd_dimensions(smooth_img):
    from data_engineering_project_spark.multimodal import jpeg

    g = smooth_img[:, :, 1]
    dec = jpeg.decode_jpeg(jpeg.encode_jpeg(g, quality=90))
    assert dec.shape == (48, 64, 3)
    assert np.abs(dec[:, :, 0].astype(int) - g.astype(int)).mean() < 2.0
    # three channels identical for grayscale
    assert (dec[:, :, 0] == dec[:, :, 1]).all()

    odd = smooth_img[:17, :13]  # forces MCU edge padding + crop
    dec = jpeg.decode_jpeg(jpeg.encode_jpeg(odd, quality=90))
    assert dec.shape == (17, 13, 3)
    assert np.abs(dec.astype(int) - odd.astype(int)).mean() < 6.0


def test_jpeg_restart_markers(smooth_img):
    from data_engineering_project_spark.multimodal import jpeg

    enc = jpeg.encode_jpeg(smooth_img, quality=85, restart_interval=2)
    assert b"\xff\xdd" in enc  # DRI present
    assert any(bytes([0xFF, 0xD0 + i]) in enc for i in range(8))
    dec = jpeg.decode_jpeg(enc)
    assert dec is not None
    assert np.abs(dec.astype(int) - smooth_img.astype(int)).mean() < 7.0


def test_jpeg_decoder_never_raises(smooth_img):
    from data_engineering_project_spark.multimodal import jpeg

    enc = jpeg.encode_jpeg(smooth_img, quality=85)
    assert jpeg.decode_jpeg(enc[: len(enc) // 2]) is None  # truncated
    assert jpeg.decode_jpeg(b"\xff\xd8\x00garbage") is None
    assert jpeg.decode_jpeg(b"not a jpeg") is None
    # progressive (SOF2) declared unsupported -> None, not an error
    prog = enc.replace(b"\xff\xc0", b"\xff\xc2", 1)
    assert jpeg.decode_jpeg(prog) is None


def test_jpeg_idct_matches_direct_sum():
    """The matrix IDCT must equal the direct O(n^4) DCT-III sum — an
    independent formulation, so encoder and decoder cannot share a
    transform bug."""
    from data_engineering_project_spark.multimodal import jpeg

    rng = np.random.default_rng(11)
    coef = rng.normal(scale=50, size=(8, 8))

    def c(k):
        return 1 / np.sqrt(2) if k == 0 else 1.0

    direct = np.zeros((8, 8))
    for x in range(8):
        for y in range(8):
            s = 0.0
            for u in range(8):
                for v in range(8):
                    s += (
                        c(u) * c(v) * coef[u, v]
                        * np.cos((2 * x + 1) * u * np.pi / 16)
                        * np.cos((2 * y + 1) * v * np.pi / 16)
                    )
            direct[x, y] = s / 4.0
    assert np.allclose(jpeg._idct(coef), direct, atol=1e-9)
    # and FDCT inverts it
    assert np.allclose(jpeg._fdct(direct), coef, atol=1e-9)


def test_jpeg_magnitude_coding_edges():
    from data_engineering_project_spark.multimodal.jpeg import (
        _extend,
        _magnitude,
    )

    for v in (-255, -128, -2, -1, 0, 1, 2, 127, 255, 1023):
        t, bits = _magnitude(v)
        assert (v == 0 and t == 0) or _extend(bits, t) == v


def test_jpeg_roundtrip_high_frequency(smooth_img):
    """ADVICE r08: smooth images have near-zero AC energy, which is
    exactly how a dequantization-order bug can pass a smooth-only
    suite. A checkerboard maximizes AC energy at the highest
    frequency; with spec-correct dequant the q90 4:4:4 roundtrip
    stays tight, while zigzag/natural-order confusion blows the mean
    error past 25."""
    from data_engineering_project_spark.multimodal import jpeg

    yy, xx = np.mgrid[0:32, 0:32]
    checker = np.where((xx + yy) % 2 == 0, 208, 48).astype(np.uint8)
    img = np.repeat(checker[:, :, None], 3, axis=2)
    dec = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=90, subsample=False))
    assert dec is not None
    err = np.abs(dec.astype(int) - img.astype(int))
    assert err.mean() < 8.0

    # stripes: energy concentrated in one mid-frequency row of the
    # spectrum, where natural and zigzag quant steps differ most
    stripes = np.where(xx % 2 == 0, 200, 55).astype(np.uint8)
    img2 = np.repeat(stripes[:, :, None], 3, axis=2)
    dec2 = jpeg.decode_jpeg(jpeg.encode_jpeg(img2, quality=90, subsample=False))
    err2 = np.abs(dec2.astype(int) - img2.astype(int))
    assert err2.mean() < 8.0


def _bits_to_stuffed_bytes(bitstring: str) -> bytes:
    """Pack a '0'/'1' string MSB-first, pad with 1s, 0xFF-stuff."""
    bitstring += "1" * (-len(bitstring) % 8)
    out = bytearray()
    for i in range(0, len(bitstring), 8):
        b = int(bitstring[i : i + 8], 2)
        out.append(b)
        if b == 0xFF:
            out.append(0x00)
    return bytes(out)


def test_jpeg_known_answer_decode_vector():
    """Byte-level known-answer test, fully independent of the encoder:
    a hand-assembled single-MCU grayscale baseline stream whose quant
    table has a DISTINCT value at every natural position (1..64), so
    any zigzag/natural ordering mistake in dequantization changes the
    pixels. Expected output computed with a direct O(n^4) DCT-III sum
    written inline here."""
    from data_engineering_project_spark.multimodal import jpeg

    qt_nat = np.arange(1, 65, dtype=np.int64)  # natural order 1..64
    qt_zig = qt_nat[jpeg.ZIGZAG]  # stream stores zigzag order

    def seg(marker, body):
        return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body

    sof = bytes([8]) + (8).to_bytes(2, "big") + (8).to_bytes(2, "big") + bytes(
        [1, 1, 0x11, 0]
    )
    # DC table: one symbol (category 6) with code "00"
    dht_dc = bytes([0x00]) + bytes(
        [0, 1] + [0] * 14
    ) + bytes([6])
    # AC table: 0x03 -> "00", 0x02 -> "01", EOB 0x00 -> "10"
    dht_ac = bytes([0x10]) + bytes(
        [0, 3] + [0] * 14
    ) + bytes([0x03, 0x02, 0x00])
    sos = bytes([1, 1, 0x00, 0, 63, 0])
    # Block in zigzag order: zz[0]=40 (DC), zz[1]=+5, zz[2]=-3, rest 0.
    # DC: code "00" + 6 magnitude bits of 40 = 101000
    # AC k=1: (run0,size3)="00" + 101 (=+5)
    # AC k=2: (run0,size2)="01" + 00  (=-3)
    # EOB "10"
    entropy = _bits_to_stuffed_bytes("00" + "101000" + "00" + "101" + "01" + "00" + "10")
    stream = (
        b"\xff\xd8"
        + seg(0xDB, bytes([0x00]) + bytes(int(v) for v in qt_zig))
        + seg(0xC0, sof)
        + seg(0xC4, dht_dc)
        + seg(0xC4, dht_ac)
        + seg(0xDA, sos)
        + entropy
        + b"\xff\xd9"
    )
    dec = jpeg.decode_jpeg(stream)
    assert dec is not None and dec.shape == (8, 8, 3)

    # expected: natural-order coefficients dequantized by qt_nat
    coef = np.zeros(64)
    coef[jpeg.ZIGZAG[0]] = 40 * qt_nat[jpeg.ZIGZAG[0]]
    coef[jpeg.ZIGZAG[1]] = 5 * qt_nat[jpeg.ZIGZAG[1]]
    coef[jpeg.ZIGZAG[2]] = -3 * qt_nat[jpeg.ZIGZAG[2]]
    coef = coef.reshape(8, 8)

    def c(k):
        return 1 / np.sqrt(2) if k == 0 else 1.0

    expect = np.zeros((8, 8))
    for x in range(8):
        for y in range(8):
            s = 0.0
            for u in range(8):
                for v in range(8):
                    s += (
                        c(u) * c(v) * coef[u, v]
                        * np.cos((2 * x + 1) * u * np.pi / 16)
                        * np.cos((2 * y + 1) * v * np.pi / 16)
                    )
            expect[x, y] = s / 4.0 + 128.0
    expect = np.clip(expect, 0, 255)
    assert np.abs(dec[:, :, 0].astype(float) - expect).max() <= 1.0


def test_jpeg_fill_bytes_before_markers(smooth_img):
    """T.81 B.1.1.2 allows any number of 0xFF fill bytes before a
    marker code; the decoder must skip them (ADVICE r08)."""
    from data_engineering_project_spark.multimodal import jpeg

    enc = jpeg.encode_jpeg(smooth_img, quality=90)
    base = jpeg.decode_jpeg(enc)
    # pad the DQT and SOF markers with fill bytes
    padded = enc.replace(b"\xff\xdb", b"\xff\xff\xff\xdb", 1).replace(
        b"\xff\xc0", b"\xff\xff\xc0", 1
    )
    dec = jpeg.decode_jpeg(padded)
    assert dec is not None
    assert np.array_equal(dec, base)


def test_jpeg_through_spark_featurize_kernel(spark, smooth_img):
    """decode_and_featurize now runs REAL pixels for JPEG payloads:
    the feature must equal pixel_features of the decoded thumbnail,
    not the hash fallback."""
    from data_engineering_project_spark.multimodal import jpeg

    enc = jpeg.encode_jpeg(smooth_img, quality=90)
    media = spark.createDataFrame(
        [("j1", "image/jpeg", bytearray(enc))],
        "media_id string, mime string, payload binary",
    )
    feats = {
        r["media_id"]: list(r["feature"])
        for r in decode_and_featurize(media, dim=8).collect()
    }
    expected = pixel_features(resize_rgb(jpeg.decode_jpeg(enc), 16, 16))
    assert feats["j1"] == pytest.approx(expected, abs=1e-6)
