"""Baseline TIFF codec (operators/tiff.py): round trips, the
published PackBits spec vector, a hand-assembled big-endian
multi-strip palette fixture independent of the encoder, and the
multimodal wiring."""

import struct

import numpy as np
import pytest

from distcpplus_spark.operators.tiff import (
    _packbits_decode,
    _packbits_encode,
    decode_tiff,
    encode_tiff,
)


def test_rgb_and_gray_roundtrips():
    rng = np.random.default_rng(7)
    for h, w in [(16, 16), (13, 29), (1, 1), (40, 3)]:
        px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        assert np.array_equal(decode_tiff(encode_tiff(px)), px)
        assert np.array_equal(
            decode_tiff(encode_tiff(px, packbits=True)), px
        )
        g = rng.integers(0, 256, (h, w), dtype=np.uint8)
        assert np.array_equal(decode_tiff(encode_tiff(g)), g)
        assert np.array_equal(decode_tiff(encode_tiff(g, packbits=True)), g)


def test_packbits_published_spec_vector():
    """The worked example from the public TIFF 6.0 spec (PackBits
    section): 24 decoded bytes from 15 encoded."""
    enc = bytes(
        [0xFE, 0xAA, 0x02, 0x80, 0x00, 0x2A, 0xFD, 0xAA,
         0x03, 0x80, 0x00, 0x2A, 0x22, 0xF7, 0xAA]
    )
    expect = bytes(
        [0xAA] * 3 + [0x80, 0x00, 0x2A] + [0xAA] * 4
        + [0x80, 0x00, 0x2A, 0x22] + [0xAA] * 10
    )
    assert _packbits_decode(enc, 24) == expect
    assert _packbits_decode(_packbits_encode(expect), 24) == expect


def test_hand_assembled_bigendian_palette_multistrip():
    """A 4x4 palette TIFF written byte-by-byte in MM (big-endian)
    order with TWO strips of 2 rows — independent of the encoder,
    exercising byte order, strip assembly, and the 16-bit ColorMap."""
    pal_rgb = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (17, 34, 51)]
    idx = [[0, 1, 2, 3], [3, 2, 1, 0], [1, 3, 0, 2], [2, 0, 3, 1]]
    strip1 = bytes(idx[0] + idx[1])
    strip2 = bytes(idx[2] + idx[3])
    # layout: header(8) strip1(8) strip2(8) IFD colormap
    s1_off, s2_off = 8, 16
    ifd_off = 24
    n_entries = 10
    cmap_off = ifd_off + 2 + 12 * n_entries + 4
    out = bytearray(struct.pack(">2sHI", b"MM", 42, ifd_off))
    out += strip1 + strip2

    def entry(tag, typ, cnt, val):
        e = struct.pack(">HHI", tag, typ, cnt)
        if typ == 3 and cnt == 1:
            return e + struct.pack(">HH", val, 0)
        return e + struct.pack(">I", val)

    # offsets/counts arrays (2 longs each) stored after the colormap
    offs_off = cmap_off + 2 * 3 * 4  # colormap: 3*4 shorts
    cnts_off = offs_off + 8
    out += struct.pack(">H", n_entries)
    out += entry(256, 3, 1, 4)            # width
    out += entry(257, 3, 1, 4)            # height
    out += entry(258, 3, 1, 8)            # bits per sample
    out += entry(259, 3, 1, 1)            # uncompressed
    out += entry(262, 3, 1, 3)            # palette photometric
    out += entry(273, 4, 2, offs_off)     # strip offsets (pointer)
    out += entry(277, 3, 1, 1)            # samples per pixel
    out += entry(278, 3, 1, 2)            # rows per strip
    out += entry(279, 4, 2, cnts_off)     # strip byte counts (pointer)
    out += entry(320, 3, 12, cmap_off)    # colormap (pointer)
    out += struct.pack(">I", 0)
    for c in range(3):                    # R plane, G plane, B plane
        for p in pal_rgb:
            out += struct.pack(">H", p[c] << 8)
    out += struct.pack(">II", s1_off, s2_off)
    out += struct.pack(">II", len(strip1), len(strip2))
    px = decode_tiff(bytes(out))
    assert px.shape == (4, 4, 3)
    for y in range(4):
        for x in range(4):
            assert tuple(px[y, x]) == pal_rgb[idx[y][x]], (y, x)


def test_white_is_zero_inverts():
    g = np.array([[0, 255], [128, 1]], dtype=np.uint8)
    blob = bytearray(encode_tiff(g))
    # flip photometric tag 262 from 1 to 0 (little-endian layout:
    # find the tag entry and patch its value)
    i = blob.find(struct.pack("<HHI", 262, 3, 1))
    assert i > 0
    blob[i + 8 : i + 10] = struct.pack("<H", 0)
    out = decode_tiff(bytes(blob))
    assert np.array_equal(out, 255 - g)


def test_rejects_non_tiff_and_lzw():
    with pytest.raises(ValueError, match="not a TIFF"):
        decode_tiff(b"\x00" * 32)
    blob = bytearray(encode_tiff(np.zeros((2, 2, 3), dtype=np.uint8)))
    i = blob.find(struct.pack("<HHI", 259, 3, 1))
    blob[i + 8 : i + 10] = struct.pack("<H", 5)  # LZW
    with pytest.raises(ValueError, match="compression"):
        decode_tiff(bytes(blob))


def test_multimodal_features_and_resize_from_tiff():
    from distcpplus_spark.operators import multimodal as mm

    c = 90
    px = np.full((6, 10, 3), c, dtype=np.uint8)
    f = mm._decode_image(encode_tiff(px, packbits=True))
    assert (f["width"], f["height"], f["channels"]) == (10, 6, 3)
    assert abs(f["mean_luma"] - round(c / 255.0, 6)) < 1e-9
    out = mm._resize_image(encode_tiff(px), 5, 3)
    assert bytes(out[:2]) == b"II"
    dec = decode_tiff(bytes(out))
    assert dec.shape == (3, 5, 3)
    assert np.all(dec == c)
