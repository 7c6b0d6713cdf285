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


def test_rejects_non_tiff_and_jpeg_compression():
    with pytest.raises(ValueError, match="not a TIFF"):
        decode_tiff(b"\x00" * 32)
    blob = bytearray(encode_tiff(np.zeros((2, 2, 3), dtype=np.uint8)))
    i = blob.find(struct.pack("<HHI", 259, 3, 1))
    blob[i + 8 : i + 10] = struct.pack("<H", 7)  # JPEG-in-TIFF
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


# ------------------------------------------------------- LZW / Deflate


def _tiff_lzw_encode(data):
    """Independent in-test TIFF-LZW compressor (TIFF 6.0 §13):
    MSB-first packing and the EARLY width change — the encoder widens
    when next_code reaches 1<<width (one code before a GIF encoder
    would, whose rule is next_code > 1<<width)."""
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code, width):
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8

    table = {bytes((i,)): i for i in range(256)}
    width = 9
    next_code = 258
    emit(256, width)  # CLEAR
    buf = b""
    for byte in bytes(data):
        cand = buf + bytes((byte,))
        if cand in table:
            buf = cand
            continue
        emit(table[buf], width)
        if next_code >= 4094:
            # table full: CLEAR, reset dictionary and width — the
            # decoder must resynchronize mid-stream
            emit(256, width)
            table = {bytes((i,)): i for i in range(256)}
            width = 9
            next_code = 258
        else:
            table[cand] = next_code
            next_code += 1
            if next_code >= (1 << width) and width < 12:  # early change
                width += 1
        buf = bytes((byte,))
    if buf:
        emit(table[buf], width)
    emit(257, width)  # EOI
    if nbits:
        emit(0, 8 - nbits)
    return bytes(out)


def _fresh_pair_stream(n):
    """Byte stream where every consecutive pair is novel (triangular
    steps), so LZW emits one root code per input byte — making the
    code-index → bit-width alignment exactly predictable."""
    return bytes(((i * (i + 1)) // 2) % 256 for i in range(n))


def test_tiff_lzw_roundtrip_against_independent_encoder():
    from distcpplus_spark.operators.tiff import _lzw_decode_tiff

    rng = np.random.default_rng(11)
    for n in [1, 7, 300, 2000]:
        data = bytes(rng.integers(0, 256, n, dtype=np.uint8))
        assert _lzw_decode_tiff(_tiff_lzw_encode(data), n) == data
    # low-entropy data exercises long dictionary strings
    data = bytes([5, 5, 5, 6] * 500)
    assert _lzw_decode_tiff(_tiff_lzw_encode(data), len(data)) == data


def test_tiff_lzw_early_change_boundary_is_code_254():
    """Pin the early-change constant: with one add per emitted code,
    the decoder's table length hits 511 after processing code 253, so
    codes 0..253 after CLEAR are 9-bit and code 254 is the first
    10-bit one (tifffile/libtiff behavior). GIF widens one code later
    (table length 512 → first 10-bit code is 255); a GIF-timed
    decoder would misparse this stream."""
    from distcpplus_spark.operators.tiff import _lzw_decode_tiff

    data = _fresh_pair_stream(300)
    blob = _tiff_lzw_encode(data)
    # independent bit-serial parse with the explicit 9/10 schedule:
    # clear + codes 0..252 at 9 bits, code 253 onward at 10 bits
    acc = 0
    nbits = 0
    pos = 0

    def read(width):
        nonlocal acc, nbits, pos
        while nbits < width:
            acc = (acc << 8) | blob[pos]
            pos += 1
            nbits += 8
        v = (acc >> (nbits - width)) & ((1 << width) - 1)
        nbits -= width
        return v

    assert read(9) == 256  # CLEAR
    for m in range(254):
        assert read(9) == data[m], m
    for m in range(254, 299):
        assert read(10) == data[m], m
    # and the product decoder agrees end-to-end
    assert _lzw_decode_tiff(blob, len(data)) == data


def test_tiff_lzw_multistrip_rgb_with_predictor():
    """LZW strips + predictor 2 (horizontal differencing) assembled
    by hand: differencing applied per row per channel before
    compression, decoder must undo both."""
    rng = np.random.default_rng(3)
    h, w = 7, 11
    px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    diff = px.astype(np.int16)
    diff[:, 1:, :] = diff[:, 1:, :] - diff[:, :-1, :]
    diff = (diff % 256).astype(np.uint8)
    rows_per_strip = 3
    strips = [
        _tiff_lzw_encode(diff[y : y + rows_per_strip].tobytes())
        for y in range(0, h, rows_per_strip)
    ]
    # assemble: header(8) strips IFD then offset/count arrays
    offs = []
    pos = 8
    for s in strips:
        offs.append(pos)
        pos += len(s)
    ifd_off = pos
    n_entries = 10
    arr_off = ifd_off + 2 + 12 * n_entries + 4
    bps_off = arr_off + 2 * 4 * len(strips)

    def entry(tag, typ, cnt, val):
        e = struct.pack("<HHI", tag, typ, cnt)
        if typ == 3 and cnt == 1:
            return e + struct.pack("<HH", val, 0)
        return e + struct.pack("<I", val)

    out = bytearray(struct.pack("<2sHI", b"II", 42, ifd_off))
    for s in strips:
        out += s
    out += struct.pack("<H", n_entries)
    out += entry(256, 3, 1, w)
    out += entry(257, 3, 1, h)
    out += entry(258, 3, 3, bps_off)
    out += entry(259, 3, 1, 5)               # LZW
    out += entry(262, 3, 1, 2)               # RGB
    out += entry(273, 4, len(strips), arr_off)
    out += entry(277, 3, 1, 3)
    out += entry(278, 3, 1, rows_per_strip)
    out += entry(279, 4, len(strips), arr_off + 4 * len(strips))
    out += entry(317, 3, 1, 2)               # horizontal differencing
    out += struct.pack("<I", 0)
    out += struct.pack("<%dI" % len(strips), *offs)
    out += struct.pack("<%dI" % len(strips), *[len(s) for s in strips])
    out += struct.pack("<HHH", 8, 8, 8)
    got = decode_tiff(bytes(out))
    assert np.array_equal(got, px)


def test_tiff_deflate_strip():
    """Compression 8 (zlib deflate) decodes via the stdlib."""
    import zlib

    rng = np.random.default_rng(5)
    # grayscale: BitsPerSample is inline, so no IFD-external pointers
    # go stale when the strip shrinks below
    px = rng.integers(0, 256, (5, 9), dtype=np.uint8)
    blob = bytearray(encode_tiff(px))
    raw = px.tobytes()
    comp = zlib.compress(raw)
    # encode_tiff wrote the strip at offset 8 with length len(raw);
    # rebuild the file with the compressed strip instead
    i = blob.find(struct.pack("<HHI", 259, 3, 1))
    blob[i + 8 : i + 10] = struct.pack("<H", 8)
    j = blob.find(struct.pack("<HHI", 279, 4, 1))
    blob[j + 8 : j + 12] = struct.pack("<I", len(comp))
    rebuilt = bytes(blob[:8]) + comp + bytes(blob[8 + len(raw) :])
    # strip data moved: IFD offset shrinks by the size delta
    delta = len(raw) - len(comp)
    (ifd_off,) = struct.unpack_from("<I", rebuilt, 4)
    rebuilt = (
        rebuilt[:4]
        + struct.pack("<I", ifd_off - delta)
        + rebuilt[8:]
    )
    assert np.array_equal(decode_tiff(rebuilt), px)


def test_tiff_lzw_table_full_clear_reset():
    """>4k distinct dictionary entries force a mid-stream CLEAR; the
    decoder must resynchronize (width back to 9, dictionary reset)."""
    from distcpplus_spark.operators.tiff import _lzw_decode_tiff

    rng = np.random.default_rng(23)
    data = bytes(rng.integers(0, 256, 12000, dtype=np.uint8))
    assert _lzw_decode_tiff(_tiff_lzw_encode(data), len(data)) == data
