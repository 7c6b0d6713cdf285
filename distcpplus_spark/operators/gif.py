"""GIF decode in pure Python — LZW + palette, no native libs.

Implements the public GIF87a/GIF89a specification: header + logical
screen descriptor, global/local color tables, extension skipping,
image descriptors, the GIF variant of LZW (variable 3-12-bit codes,
CLEAR/EOI, dictionary growth), and 4-pass interlacing. Web-scraped
training corpora are full of GIFs, so the multimodal image path
decodes them for real like BMP/PNG/baseline-JPEG; decode_gif
yields the FIRST frame (the standard thumbnail/feature semantics)
and decode_gif_frames composites the full animation (GCE delays,
transparency, disposal).

Called per-row inside Arrow-batched mapInPandas
(operators/multimodal.py) — same distributed shape as every other
codec here.
"""

from __future__ import annotations

import struct


def _lzw_decode(min_code_size: int, data: bytes, n_pixels: int) -> bytearray:
    """GIF-variant LZW: little-endian bit packing, CLEAR resets the
    dictionary, code width grows after the dictionary fills a width,
    capped at 12 bits until the next CLEAR."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()

    # bit reader state over the concatenated sub-block data
    acc = 0
    nbits = 0
    pos = 0

    def init_dict():
        return {i: bytes((i,)) for i in range(clear)}

    table = init_dict()
    width = min_code_size + 1
    next_code = eoi + 1
    prev: bytes | None = None

    n = len(data)
    while len(out) < n_pixels:
        while nbits < width:
            if pos >= n:
                return out  # truncated stream: return what we have
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = init_dict()
            width = min_code_size + 1
            next_code = eoi + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            entry = table[code]
        elif code in table:
            entry = table[code]
        elif code == next_code:
            entry = prev + prev[:1]  # the KwKwK special case
        else:
            raise ValueError(f"bad LZW code {code}")
        out += entry
        if prev is not None and next_code < 4096:
            table[next_code] = prev + entry[:1]
            next_code += 1
        # width bump (GIF timing, NOT TIFF's early change): the next
        # code the encoder may emit is at most next_code - 1 — its
        # newest entry, received here as the KwKwK case — so 9 bits
        # suffice until next_code itself needs a 10th bit. Bump when
        # next_code reaches 1<<width (512/1024/2048), checked after
        # EVERY code including the add-free first one. TIFF-LZW bumps
        # one code earlier (operators/tiff.py); giflib and browser
        # decoders use this timing.
        if next_code >= (1 << width) and width < 12:
            width += 1
        prev = entry
    return out


def decode_gif(content: bytes):
    """Decode the first image of a GIF → HxWx3 uint8 RGB. Raises
    ValueError on non-GIF bytes or malformed streams."""
    import numpy as np

    if content[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    sw, sh, flags, _bg, _ar = struct.unpack_from("<HHBBB", content, 6)
    pos = 13
    global_palette = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        global_palette = np.frombuffer(
            content, np.uint8, n * 3, pos
        ).reshape(n, 3)
        pos += n * 3
    while pos < len(content):
        b = content[pos]
        pos += 1
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension: label + sub-blocks, skip
            pos += 1
            while content[pos] != 0:
                pos += 1 + content[pos]
            pos += 1
            continue
        if b != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{b:02X}")
        left, top, w, h, iflags = struct.unpack_from("<HHHHB", content, pos)
        pos += 9
        palette = global_palette
        if iflags & 0x80:
            n = 2 << (iflags & 0x07)
            palette = np.frombuffer(
                content, np.uint8, n * 3, pos
            ).reshape(n, 3)
            pos += n * 3
        if palette is None:
            raise ValueError("GIF image without color table")
        min_code = content[pos]
        pos += 1
        chunks = []
        while content[pos] != 0:
            ln = content[pos]
            chunks.append(content[pos + 1 : pos + 1 + ln])
            pos += 1 + ln
        pos += 1
        idx = _lzw_decode(min_code, b"".join(chunks), w * h)
        if len(idx) < w * h:
            raise ValueError("GIF pixel data truncated")
        grid = np.frombuffer(bytes(idx[: w * h]), np.uint8).reshape(h, w)
        if iflags & 0x40:  # interlaced: 4-pass row order
            out = np.empty_like(grid)
            rows = (
                list(range(0, h, 8))
                + list(range(4, h, 8))
                + list(range(2, h, 4))
                + list(range(1, h, 2))
            )
            for src, dst in enumerate(rows):
                out[dst] = grid[src]
            grid = out
        return palette[np.minimum(grid, len(palette) - 1)]
    raise ValueError("GIF contained no image block")


def _lzw_encode(min_code_size: int, indices) -> bytes:
    """GIF-variant LZW compressor (the inverse of _lzw_decode):
    dictionary growth with width bumps after the entry that fills the
    current width, CLEAR at start, EOI at end, little-endian bit
    packing."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
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
            # standard GIF timing: codes stay at the current width
            # while every emittable value (≤ next_code - 1) fits;
            # widen only once next_code exceeds 1<<width
            if next_code > (1 << width) and width < 12:
                width += 1
        buf = bytes((px,))
    if buf:
        emit(table[buf], width)
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def encode_gif(px) -> bytes:
    """Encode an HxWx3 uint8 array as a single-frame GIF89a. The
    palette is built from the image's distinct colors — at most 256
    (raise otherwise; quantization is the caller's job, e.g. a
    nearest-neighbor resize of a decoded GIF preserves its palette)."""
    import numpy as np

    px = np.asarray(px, dtype=np.uint8)
    if px.ndim == 2:
        px = np.repeat(px[:, :, None], 3, axis=2)
    h, w = px.shape[:2]
    flat = px.reshape(-1, 3)
    colors, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(colors) > 256:
        raise ValueError(f"GIF encode needs <=256 colors, got {len(colors)}")
    bits = max(2, (len(colors) - 1).bit_length() or 1)
    pal_n = 1 << bits
    head = b"GIF89a" + struct.pack("<HHBBB", w, h, 0x80 | (bits - 1), 0, 0)
    pal = colors.astype(np.uint8).tobytes()
    pal += b"\x00" * (3 * pal_n - len(pal))
    min_code = bits
    data = _lzw_encode(min_code, inverse.astype(np.uint8).tolist())
    blob = struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0) + bytes((min_code,))
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        blob += bytes((len(chunk),)) + chunk
    return head + pal + blob + b"\x00\x3b"


def decode_gif_frames(content: bytes, max_frames: int = 64):
    """Decode an animated GIF into composited frames:
    [(delay_centiseconds, HxWx3 uint8 RGB), ...].

    Implements the GIF89a animation model: per-frame graphic control
    extensions carry delay, transparency index, and disposal; frames
    draw into their (left, top, w, h) sub-rectangle over the living
    canvas, transparent pixels leave the canvas untouched, disposal
    2 clears the sub-rectangle to the background color afterward
    (disposal 3 'restore previous' is rare and treated as 'leave' —
    documented approximation). The still-image decode_gif above
    remains the cheap first-frame path."""
    import numpy as np

    if content[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    sw, sh, flags, bg_idx, _ar = struct.unpack_from("<HHBBB", content, 6)
    pos = 13
    global_palette = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        global_palette = np.frombuffer(
            content, np.uint8, n * 3, pos
        ).reshape(n, 3)
        pos += n * 3
    canvas = np.zeros((sh, sw, 3), dtype=np.uint8)
    if global_palette is not None and bg_idx < len(global_palette):
        canvas[:, :] = global_palette[bg_idx]
    frames = []
    delay_cs = 0
    transparent = None
    disposal = 0
    while pos < len(content) and len(frames) < max_frames:
        b = content[pos]
        pos += 1
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension
            label = content[pos]
            pos += 1
            if label == 0xF9:  # graphic control
                blen = content[pos]
                packed = content[pos + 1]
                delay_cs = struct.unpack_from("<H", content, pos + 2)[0]
                transparent = (
                    content[pos + 4] if packed & 1 else None
                )
                disposal = (packed >> 2) & 0x07
                pos += 1 + blen
            while content[pos] != 0:
                pos += 1 + content[pos]
            pos += 1
            continue
        if b != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{b:02X}")
        left, top, w, h, iflags = struct.unpack_from("<HHHHB", content, pos)
        pos += 9
        palette = global_palette
        if iflags & 0x80:
            n = 2 << (iflags & 0x07)
            palette = np.frombuffer(
                content, np.uint8, n * 3, pos
            ).reshape(n, 3)
            pos += n * 3
        if palette is None:
            raise ValueError("GIF image without color table")
        min_code = content[pos]
        pos += 1
        chunks = []
        while content[pos] != 0:
            ln = content[pos]
            chunks.append(content[pos + 1 : pos + 1 + ln])
            pos += 1 + ln
        pos += 1
        idx = _lzw_decode(min_code, b"".join(chunks), w * h)
        if len(idx) < w * h:
            raise ValueError("GIF pixel data truncated")
        grid = np.frombuffer(bytes(idx[: w * h]), np.uint8).reshape(h, w)
        if iflags & 0x40:  # interlaced
            out = np.empty_like(grid)
            rows = (
                list(range(0, h, 8))
                + list(range(4, h, 8))
                + list(range(2, h, 4))
                + list(range(1, h, 2))
            )
            for src, dst in enumerate(rows):
                out[dst] = grid[src]
            grid = out
        region = canvas[top : top + h, left : left + w]
        colors = palette[np.minimum(grid, len(palette) - 1)]
        if transparent is not None:
            mask = grid != transparent
            region[mask] = colors[mask]
        else:
            region[:, :] = colors
        frames.append((delay_cs, canvas.copy()))
        if disposal == 2:  # restore to background
            # GIF89a defines the background color index against the
            # GLOBAL color table; a frame-LOCAL palette must not be
            # consulted (black when there is no global table)
            bg = (
                global_palette[bg_idx]
                if global_palette is not None
                and bg_idx < len(global_palette)
                else np.zeros(3, dtype=np.uint8)
            )
            canvas[top : top + h, left : left + w] = bg
        transparent = None
        disposal = 0
        delay_cs = 0
    if not frames:
        raise ValueError("GIF contained no image block")
    return frames
