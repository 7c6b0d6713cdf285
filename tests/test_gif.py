"""GIF decoder (operators/gif.py) against an independent in-test LZW
encoder: real compression, the uncompressed-GIF trick, interlacing,
animated first-frame, and the multimodal wiring."""

import struct

import numpy as np
import pytest

from distcpplus_spark.operators.gif import decode_gif


def _lzw_encode(min_code_size, indices):
    """Reference GIF-LZW compressor (dictionary growth, CLEAR at
    start, EOI at end, little-endian bit packing) — written from the
    spec independently of the decoder."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code, width):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table = {bytes((i,)): i for i in range(clear)}
    width = min_code_size + 1
    next_code = eoi + 1
    emit(clear, width)
    buf = b""
    for px in indices:
        cand = buf + bytes((px,))
        if cand in table:
            buf = cand
            continue
        emit(table[buf], width)
        if next_code < 4096:
            table[cand] = next_code
            next_code += 1
            # standard GIF timing (giflib): widen only once next_code
            # exceeds 1<<width — one code LATER than TIFF-LZW
            if next_code > (1 << width) and width < 12:
                width += 1
        buf = bytes((px,))
    if buf:
        emit(table[buf], width)
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _make_gif(grid, palette, interlace=False, min_code_size=None,
              animated_second_frame=None):
    h = len(grid)
    w = len(grid[0])
    bits = max(2, (len(palette) - 1).bit_length())
    pal_n = 1 << bits
    if min_code_size is None:
        min_code_size = bits
    head = b"GIF89a" + struct.pack(
        "<HHBBB", w, h, 0x80 | (bits - 1), 0, 0
    )
    pal = b"".join(bytes(c) for c in palette)
    pal += b"\x00" * (3 * (pal_n - len(palette)))

    def image_block(g, inter):
        rows = list(g)
        if inter:  # store rows in 4-pass order
            order = (
                list(range(0, h, 8))
                + list(range(4, h, 8))
                + list(range(2, h, 4))
                + list(range(1, h, 2))
            )
            rows = [g[r] for r in order]
        flat = [px for row in rows for px in row]
        data = _lzw_encode(min_code_size, flat)
        blob = struct.pack(
            "<BHHHHB", 0x2C, 0, 0, w, h, 0x40 if inter else 0
        ) + bytes((min_code_size,))
        for i in range(0, len(data), 255):
            chunk = data[i : i + 255]
            blob += bytes((len(chunk),)) + chunk
        return blob + b"\x00"

    gif = head + pal
    # a graphic-control extension the decoder must skip
    gif += b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    gif += image_block(grid, interlace)
    if animated_second_frame is not None:
        gif += image_block(animated_second_frame, False)
    return gif + b"\x3b"


PALETTE = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (40, 80, 120)]


def _check(grid, px):
    for y, row in enumerate(grid):
        for x, idx in enumerate(row):
            assert tuple(px[y, x]) == PALETTE[idx], (y, x)


def test_real_lzw_roundtrip():
    """Repetitive data drives genuine dictionary growth in the
    reference encoder; the decoder must invert it exactly."""
    grid = [[(x // 3 + y // 2) % 4 for x in range(31)] for y in range(17)]
    px = decode_gif(_make_gif(grid, PALETTE))
    assert px.shape == (17, 31, 3)
    _check(grid, px)


def test_code_width_growth_past_one_boundary():
    """>256 dictionary entries forces at least two width bumps."""
    rng = np.random.default_rng(5)
    grid = rng.integers(0, 4, (40, 40)).tolist()
    px = decode_gif(_make_gif(grid, PALETTE))
    _check(grid, px)


def test_interlaced_rows_reordered():
    grid = [[y % 4] * 8 for y in range(16)]  # row-striped
    px = decode_gif(_make_gif(grid, PALETTE, interlace=True))
    _check(grid, px)


def test_animated_gif_first_frame_only():
    first = [[0, 1], [2, 3]]
    second = [[3, 3], [3, 3]]
    px = decode_gif(
        _make_gif(first, PALETTE, animated_second_frame=second)
    )
    _check(first, px)


def test_rejects_non_gif():
    with pytest.raises(ValueError, match="not a GIF"):
        decode_gif(b"NOTAGIF" + b"\x00" * 32)


def test_multimodal_features_from_gif():
    from distcpplus_spark.operators import multimodal as mm

    grid = [[0] * 10 for _ in range(6)]  # solid red
    f = mm._decode_image(_make_gif(grid, PALETTE))
    assert (f["width"], f["height"], f["channels"]) == (10, 6, 3)
    assert abs(f["mean_luma"] - round(0.299 * 255 / 255, 6)) < 1e-6


def test_encode_decode_roundtrip_exact():
    from distcpplus_spark.operators.gif import encode_gif

    rng = np.random.default_rng(3)
    for h, w, nc in [(16, 16, 8), (13, 29, 200), (1, 1, 1), (24, 24, 256)]:
        colors = rng.integers(0, 256, (nc, 3), dtype=np.uint8)
        px = colors[rng.integers(0, nc, (h, w))]
        assert np.array_equal(decode_gif(encode_gif(px)), px), (h, w, nc)


def test_encode_rejects_too_many_colors():
    from distcpplus_spark.operators.gif import encode_gif

    rng = np.random.default_rng(4)
    px = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)  # ~1024 colors
    with pytest.raises(ValueError, match="256"):
        encode_gif(px)


def test_resize_gif_real_path():
    """_resize_image decodes GIF, nearest-neighbor resamples, and
    re-encodes as GIF losslessly (palette preserved)."""
    from distcpplus_spark.operators import multimodal as mm
    from distcpplus_spark.operators.gif import encode_gif

    px = np.zeros((8, 8, 3), dtype=np.uint8)
    px[:4] = (200, 10, 30)
    px[4:] = (5, 180, 90)
    out = mm._resize_image(encode_gif(px), 4, 4)
    assert bytes(out[:6]) == b"GIF89a"
    dec = decode_gif(bytes(out))
    assert dec.shape == (4, 4, 3)
    assert np.array_equal(dec[:2], np.broadcast_to((200, 10, 30), (2, 4, 3)))
    assert np.array_equal(dec[2:], np.broadcast_to((5, 180, 90), (2, 4, 3)))


def test_gif_lzw_width_boundary_is_code_255():
    """Pin the standard GIF width-change timing (giflib/browsers):
    with one add per emitted code, the decoder's table length hits
    512 after processing code 254, so codes 0..254 after CLEAR are
    9-bit and code 255 is the first 10-bit one — one code LATER than
    TIFF-LZW's early change (see test_tiff.py)."""
    from distcpplus_spark.operators.gif import (
        _lzw_decode,
        _lzw_encode as _product_encode,
    )

    # every consecutive pair novel -> one root code per input byte
    data = [((i * (i + 1)) // 2) % 256 for i in range(300)]
    blob = _product_encode(8, data)
    # independent LSB-first bit-serial parse with the explicit
    # 9/10 schedule
    acc = 0
    nbits = 0
    pos = 0

    def read(width):
        nonlocal acc, nbits, pos
        while nbits < width:
            acc |= blob[pos] << nbits
            pos += 1
            nbits += 8
        v = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        return v

    assert read(9) == 256  # CLEAR
    for m in range(255):
        assert read(9) == data[m], m
    for m in range(255, 299):
        assert read(10) == data[m], m
    # in-test reference encoder and product decoder agree end-to-end
    ref = _lzw_encode(8, data)
    assert ref == blob
    assert list(_lzw_decode(8, blob, len(data))) == data


def test_animated_frames_composite_with_transparency():
    """Three frames: full base, then a transparent-patch overlay
    that only paints its opaque pixels, then a disposal-2 frame
    whose rectangle is cleared to background afterward."""
    from distcpplus_spark.operators.gif import decode_gif_frames

    pal = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (9, 9, 9)]

    def gce(delay, transparent=None, disposal=0):
        packed = (disposal << 2) | (1 if transparent is not None else 0)
        return bytes(
            [0x21, 0xF9, 4, packed, delay & 0xFF, delay >> 8,
             transparent or 0, 0]
        )

    def image_block(left, top, grid):
        h = len(grid)
        w = len(grid[0])
        flat = [px for row in grid for px in row]
        data = _lzw_encode(2, flat)
        blob = struct.pack("<BHHHHB", 0x2C, left, top, w, h, 0) + b"\x02"
        for i in range(0, len(data), 255):
            chunk = data[i : i + 255]
            blob += bytes((len(chunk),)) + chunk
        return blob + b"\x00"

    head = b"GIF89a" + struct.pack("<HHBBB", 4, 4, 0x81, 3, 0)
    pal_bytes = b"".join(bytes(c) for c in pal)
    base = [[0] * 4 for _ in range(4)]           # all red
    overlay = [[1, 2], [2, 1]]                   # 2x2 at (1,1), idx2
    # transparent index 2: only the '1' (green) pixels paint
    gif = (
        head + pal_bytes
        + gce(10) + image_block(0, 0, base)
        + gce(20, transparent=2) + image_block(1, 1, overlay)
        + gce(30, disposal=2) + image_block(0, 0, [[1]])
        + gce(0) + image_block(0, 0, [[2]])
        + b"\x3b"
    )
    frames = decode_gif_frames(gif)
    assert [d for d, _ in frames] == [10, 20, 30, 0]
    f0, f1, f2, f3 = [f for _, f in frames]
    assert (f0 == (255, 0, 0)).all()
    # overlay painted only where idx != transparent(2)
    assert tuple(f1[1, 1]) == (0, 255, 0)   # idx 1 painted
    assert tuple(f1[2, 2]) == (0, 255, 0)
    assert tuple(f1[1, 2]) == (255, 0, 0)   # transparent: base shows
    assert tuple(f1[2, 1]) == (255, 0, 0)
    # frame 3: (0,0) painted green; then disposal-2 clears to bg
    assert tuple(f2[0, 0]) == (0, 255, 0)
    # frame 4 canvas: (0,0) was cleared to background (idx 3) before
    # the new 1x1 blue paint lands on top of it
    assert tuple(f3[0, 0]) == (0, 0, 255)
    assert tuple(f3[1, 1]) == (0, 255, 0)  # persists from overlay


def test_disposal2_restores_global_palette_background():
    """GIF89a's background color index refers to the GLOBAL color
    table; a disposal-2 frame carrying a LOCAL palette must still
    restore its rectangle from the global table, not the local one."""
    from distcpplus_spark.operators.gif import decode_gif_frames

    gpal = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (9, 9, 9)]
    lpal = [(200, 10, 10), (10, 200, 10), (10, 10, 200), (7, 7, 7)]

    def gce(delay, disposal=0):
        return bytes([0x21, 0xF9, 4, disposal << 2, delay, 0, 0, 0])

    def image_block(left, top, grid, local_pal=None):
        h, w = len(grid), len(grid[0])
        flat = [px for row in grid for px in row]
        data = _lzw_encode(2, flat)
        flags = 0x81 if local_pal else 0  # local table, 4 entries
        blob = struct.pack("<BHHHHB", 0x2C, left, top, w, h, flags)
        if local_pal:
            blob += b"".join(bytes(c) for c in local_pal)
        blob += b"\x02"
        for i in range(0, len(data), 255):
            chunk = data[i : i + 255]
            blob += bytes((len(chunk),)) + chunk
        return blob + b"\x00"

    head = b"GIF89a" + struct.pack("<HHBBB", 2, 2, 0x81, 3, 0)
    gif = (
        head + b"".join(bytes(c) for c in gpal)
        + gce(10) + image_block(0, 0, [[0, 0], [0, 0]])
        + gce(20, disposal=2) + image_block(0, 0, [[1]], local_pal=lpal)
        + gce(0) + image_block(1, 1, [[2]])
        + b"\x3b"
    )
    frames = decode_gif_frames(gif)
    _, f1, f2 = [f for _, f in frames]
    # frame 2 paints LOCAL idx 1
    assert tuple(f1[0, 0]) == (10, 200, 10)
    # after disposal 2, (0,0) is GLOBAL pal[bg_idx=3], not local[3]
    assert tuple(f2[0, 0]) == (9, 9, 9)
    assert tuple(f2[1, 1]) == (0, 0, 255)
