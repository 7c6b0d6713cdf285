"""Baseline JPEG codec (operators/jpeg.py): closed-form DC math,
round-trip error bounds, restart markers, hand-assembled independent
fixture, and the multimodal wiring."""

import numpy as np
import pytest

from distcpplus_spark.operators.jpeg import (
    decode_jpeg,
    encode_jpeg,
    scaled_quant_tables,
)


def _grad(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [(yy * 4) % 256, (xx * 3) % 256, ((xx + yy) * 2) % 256], axis=2
    ).astype(np.uint8)


def test_solid_color_exact_at_q99():
    """Quality 99 scales the Annex-K luma DC quant step to 1, so a
    solid-color image (DC-only blocks, zero chroma diff) round-trips
    EXACTLY — closed form, not encoder/decoder cancellation."""
    qy, qc = scaled_quant_tables(99)
    assert qy[0, 0] == 1  # premise of the exactness argument
    for c in (0, 7, 63, 128, 200, 255):
        for sub in ("444", "420"):
            px = np.full((16, 24, 3), c, dtype=np.uint8)
            dec = decode_jpeg(encode_jpeg(px, quality=99, subsampling=sub))
            assert dec.shape == (16, 24, 3)
            assert int(np.abs(dec.astype(int) - c).max()) == 0, (c, sub)


def test_dc_only_quadrants_exact():
    """Any image whose 8x8 blocks are each constant is DC-only; at
    q99 every block reconstructs its exact value (the oracle-query
    premise for q155)."""
    vals = [13, 200, 97, 255]
    px = np.zeros((16, 16, 3), dtype=np.uint8)
    px[:8, :8] = vals[0]
    px[:8, 8:] = vals[1]
    px[8:, :8] = vals[2]
    px[8:, 8:] = vals[3]
    dec = decode_jpeg(encode_jpeg(px, quality=99, subsampling="420"))
    assert np.array_equal(dec, px)


def test_gradient_roundtrip_bounds():
    px = _grad(40, 56)
    dec = decode_jpeg(encode_jpeg(px, quality=95, subsampling="444"))
    d = np.abs(dec.astype(int) - px.astype(int))
    assert d.max() <= 4 and d.mean() < 1.0


def test_nonaligned_dims_and_420():
    """Dims not multiples of the MCU grid: pad-encode, crop-decode."""
    px = _grad(33, 41)
    dec = decode_jpeg(encode_jpeg(px, quality=85, subsampling="420"))
    assert dec.shape == (33, 41, 3)
    # luma fidelity: Y is not subsampled, smooth content stays close
    luma = lambda p: (  # noqa: E731
        0.299 * p[:, :, 0] + 0.587 * p[:, :, 1] + 0.114 * p[:, :, 2]
    )
    assert np.abs(luma(dec) - luma(px.astype(float))).mean() < 3.0


def test_restart_interval_decodes_identically():
    px = _grad(32, 48)
    a = decode_jpeg(encode_jpeg(px, quality=90, subsampling="420",
                                restart_interval=2))
    b = decode_jpeg(encode_jpeg(px, quality=90, subsampling="420"))
    assert np.array_equal(a, b)


def test_grayscale_single_component():
    yy, xx = np.mgrid[0:24, 0:40]
    g = ((yy * 11 + xx * 13) % 256).astype(np.uint8)
    dec = decode_jpeg(encode_jpeg(g, quality=95))
    assert dec.shape == (24, 40)
    assert np.abs(dec.astype(int) - g.astype(int)).mean() < 2.0


def test_hand_assembled_fixture_decodes_exactly():
    """A minimal grayscale JPEG assembled byte-by-byte in this test
    (independent of the encoder): 8x8 solid v=130, all-ones quant
    table, Annex-K DC/AC luma Huffman tables. DC diff = 8*(130-128)
    = 16 -> category 5 (code 110) + 5 value bits 10000, then EOB
    (1010); padded with 1s -> entropy bytes D0 AF. Every pixel must
    decode to exactly 130."""
    import struct

    dc_bits = bytes([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0])
    dc_vals = bytes(range(12))
    ac_bits = bytes([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D])
    from distcpplus_spark.operators.jpeg import AC_LUMA_VALS

    ac_vals = bytes(AC_LUMA_VALS)
    jpg = bytearray(b"\xff\xd8")
    jpg += b"\xff\xdb" + struct.pack(">HB", 67, 0x00) + b"\x01" * 64
    jpg += b"\xff\xc0" + struct.pack(">HBHHBBBB", 11, 8, 8, 8, 1, 1, 0x11, 0)
    jpg += (
        b"\xff\xc4"
        + struct.pack(">H", 2 + (1 + 16 + 12) + (1 + 16 + len(ac_vals)))
        + b"\x00" + dc_bits + dc_vals
        + b"\x10" + ac_bits + ac_vals
    )
    jpg += b"\xff\xda" + struct.pack(">HBBBBBB", 8, 1, 1, 0x00, 0, 63, 0)
    jpg += b"\xd0\xaf"  # hand-computed entropy bits
    jpg += b"\xff\xd9"
    dec = decode_jpeg(bytes(jpg))
    assert dec.shape == (8, 8)
    assert np.all(dec == 130)


def test_arithmetic_rejected_then_stubbed():
    """SOF9 (arithmetic) raises ValueError; _decode_image falls back
    to the deterministic stub rather than erroring the row. (SOF2
    progressive now decodes for real — see the progressive tests.)"""
    import struct

    from distcpplus_spark.operators import multimodal as mm

    jpg = bytearray(b"\xff\xd8")
    jpg += b"\xff\xc9" + struct.pack(">HBHHBBBB", 11, 8, 8, 8, 1, 1, 0x11, 0)
    jpg += b"\xff\xd9"
    with pytest.raises(ValueError, match="SOF"):
        decode_jpeg(bytes(jpg))
    feats = mm._decode_image(bytes(jpg))
    assert feats == mm._decode_image_stub(bytes(jpg))


def test_decode_image_routes_jpeg_for_real():
    """The multimodal feature extractor now computes exact features
    from real JPEG bytes: solid gray -> mean_luma c/255, phash 0."""
    from distcpplus_spark.operators import multimodal as mm

    c = 180
    px = np.full((12, 20, 3), c, dtype=np.uint8)
    f = mm._decode_image(encode_jpeg(px, quality=99, subsampling="420"))
    assert (f["width"], f["height"], f["channels"]) == (20, 12, 3)
    assert abs(f["mean_luma"] - round(c / 255.0, 6)) < 1e-9
    assert f["phash"] == 0


def test_resize_jpeg_real_path():
    """_resize_image decodes real JPEG, resamples, re-encodes as
    JPEG — verified by decoding the output again."""
    from distcpplus_spark.operators import multimodal as mm

    px = np.full((16, 16, 3), 90, dtype=np.uint8)
    out = mm._resize_image(encode_jpeg(px, quality=99), 8, 8)
    assert bytes(out[:2]) == b"\xff\xd8"
    dec = decode_jpeg(bytes(out))
    assert dec.shape == (8, 8, 3)
    assert np.abs(dec.astype(int) - 90).max() <= 2  # q92 re-encode


# ----------------------------------------------------- progressive


def test_progressive_hand_assembled_fixture():
    """A one-block grayscale progressive stream written BYTE BY HAND
    from the T.81 Annex-G rules and Annex-K code tables (independent
    of the encoder): three scans — DC first with point transform
    Al=1 (diff cat 2 '011'+'10' = 0x77 padded), AC first band 1-63
    (symbol 0x02 '01' + bits '00' for -3, EOB '1010' = 0x4A), and a
    DC refinement bit 0 (0x7F padded). Unit quant => coefficients
    reconstruct exactly: DC=4, coef(0,1)=-3."""
    import struct

    from distcpplus_spark.operators.jpeg import (
        _DCT_M,
        DC_LUMA_BITS,
        DC_LUMA_VALS,
        AC_LUMA_BITS,
        AC_LUMA_VALS,
    )

    dc_bits = bytes(DC_LUMA_BITS)
    dc_vals = bytes(DC_LUMA_VALS)
    ac_bits = bytes(AC_LUMA_BITS)
    ac_vals = bytes(AC_LUMA_VALS)
    jpg = bytearray(b"\xff\xd8")
    jpg += b"\xff\xdb" + struct.pack(">HB", 67, 0x00) + b"\x01" * 64
    # SOF2: 8x8, one component, h=v=1
    jpg += b"\xff\xc2" + struct.pack(">HBHHBBBB", 11, 8, 8, 8, 1, 1, 0x11, 0)
    jpg += (
        b"\xff\xc4"
        + struct.pack(">H", 2 + (1 + 16 + 12) + (1 + 16 + len(ac_vals)))
        + b"\x00" + dc_bits + dc_vals
        + b"\x10" + ac_bits + ac_vals
    )
    # scan 1: DC first, Ah=0 Al=1, diff=+2 -> cat2 '011' + '10'
    jpg += b"\xff\xda" + struct.pack(">HBBBBBB", 8, 1, 1, 0x00, 0, 0, 0x01)
    jpg += b"\x77"
    # scan 2: AC first, band 1..63, Ah=0 Al=0: -3 at zz1 then EOB
    jpg += b"\xff\xda" + struct.pack(">HBBBBBB", 8, 1, 1, 0x00, 1, 63, 0x00)
    jpg += b"\x4a"
    # scan 3: DC refinement, Ah=1 Al=0: one raw 0 bit
    jpg += b"\xff\xda" + struct.pack(">HBBBBBB", 8, 1, 1, 0x00, 0, 0, 0x10)
    jpg += b"\x7f"
    jpg += b"\xff\xd9"

    dec = decode_jpeg(bytes(jpg))
    coef = np.zeros((8, 8))
    coef[0, 0] = 4.0   # (2<<1) with refinement bit 0
    coef[0, 1] = -3.0  # zigzag index 1
    expect = np.clip(
        np.round(_DCT_M.T @ coef @ _DCT_M + 128.0), 0, 255
    ).astype(np.uint8)
    assert dec.shape == (8, 8)
    assert np.array_equal(dec, expect)


def test_progressive_matches_baseline_pixels_exactly():
    """The progressive scan layer must reconstruct EXACTLY the
    coefficients the baseline stream carries (same quantization
    pipeline), so decoded pixels are bit-identical — across shapes,
    subsampling, grayscale, and qualities."""
    from distcpplus_spark.operators.jpeg import encode_jpeg_progressive

    rng = np.random.default_rng(42)
    cases = [
        (16, 16, "444", False), (24, 17, "444", False),
        (32, 32, "420", False), (8, 8, "444", True),
        (1, 1, "444", False), (40, 33, "420", False),
        (19, 21, "420", False),
    ]
    for h, w, sub, gray in cases:
        px = (
            rng.integers(0, 256, (h, w), dtype=np.uint8)
            if gray
            else rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        )
        for q in (50, 90, 99):
            base = decode_jpeg(encode_jpeg(px, quality=q, subsampling=sub))
            prog = decode_jpeg(
                encode_jpeg_progressive(px, quality=q, subsampling=sub)
            )
            assert np.array_equal(base, prog), (h, w, sub, gray, q)


def test_progressive_smooth_image_exercises_eob_and_zrl():
    """A smooth gradient yields sparse AC bands — lots of EOB0 blocks
    and ZRL runs in both first and refinement AC scans."""
    from distcpplus_spark.operators.jpeg import encode_jpeg_progressive

    y, x = np.mgrid[0:48, 0:40]
    px = np.stack(
        [(x * 3 + y) % 256, (x + y * 2) % 256, (x * 2 + y * 2) % 256],
        axis=2,
    ).astype(np.uint8)
    for q in (75, 99):
        base = decode_jpeg(encode_jpeg(px, quality=q))
        prog = decode_jpeg(encode_jpeg_progressive(px, quality=q))
        assert np.array_equal(base, prog), q


def test_progressive_custom_scan_script():
    """Spectral bands split differently (and refined in two steps)
    still converge to the same coefficients."""
    from distcpplus_spark.operators.jpeg import encode_jpeg_progressive

    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, (24, 24, 3), dtype=np.uint8)
    scans = [
        ((0, 1, 2), 0, 0, 0, 2),
        ((0,), 1, 2, 0, 1),
        ((0,), 3, 63, 0, 1),
        ((1,), 1, 63, 0, 0),
        ((2,), 1, 63, 0, 0),
        ((0, 1, 2), 0, 0, 2, 1),
        ((0, 1, 2), 0, 0, 1, 0),
        ((0,), 1, 63, 1, 0),
    ]
    base = decode_jpeg(encode_jpeg(px, quality=85))
    prog = decode_jpeg(
        encode_jpeg_progressive(px, quality=85, scans=scans)
    )
    assert np.array_equal(base, prog)


def test_progressive_multimodal_features_real():
    """_decode_image now computes real features from progressive
    bytes (no stub): solid gray at quality 99 decodes exactly."""
    from distcpplus_spark.operators import multimodal as mm
    from distcpplus_spark.operators.jpeg import encode_jpeg_progressive

    c = 180
    px = np.full((12, 20, 3), c, dtype=np.uint8)
    f = mm._decode_image(encode_jpeg_progressive(px, quality=99))
    assert (f["width"], f["height"], f["channels"]) == (20, 12, 3)
    assert abs(f["mean_luma"] - round(c / 255.0, 6)) < 1e-9
    assert f["phash"] == 0


# ------------------------------------------------------ 12-bit


def test_12bit_flat_blocks_exact_at_q99():
    """Unit DC quant + constant 8x8 blocks reconstruct the full
    12-bit range exactly; decode yields uint16."""
    from distcpplus_spark.operators.jpeg import encode_jpeg12_gray

    px = np.zeros((16, 24), dtype=np.uint16)
    px[:8, :8] = 1234
    px[:8, 8:16] = 4095
    px[:8, 16:] = 2048
    px[8:, :8] = 77
    px[8:, 8:] = 3000
    dec = decode_jpeg(encode_jpeg12_gray(px, quality=99))
    assert dec.dtype == np.uint16
    assert np.array_equal(dec, px)


def test_12bit_gradient_error_bounds():
    from distcpplus_spark.operators.jpeg import encode_jpeg12_gray

    yy, xx = np.mgrid[0:40, 0:56]
    g = ((yy * 60 + xx * 40) % 4096).astype(np.uint16)
    dec = decode_jpeg(encode_jpeg12_gray(g, quality=95))
    err = np.abs(dec.astype(int) - g.astype(int))
    assert err.max() <= 24 and err.mean() < 1.0  # 12-bit scale


def test_12bit_multimodal_luma_normalized():
    from distcpplus_spark.operators import multimodal as mm
    from distcpplus_spark.operators.jpeg import encode_jpeg12_gray

    px = np.full((8, 8), 4095, dtype=np.uint16)  # full-scale white
    f = mm._decode_image(encode_jpeg12_gray(px, quality=99))
    assert (f["width"], f["height"], f["channels"]) == (8, 8, 1)
    assert abs(f["mean_luma"] - 1.0) < 1e-6
