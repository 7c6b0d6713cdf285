"""Baseline TIFF codec in pure Python — IFD walk + strips, no libs.

Implements the public TIFF 6.0 baseline spec: II/MM byte orders, IFD
entry parsing (inline values vs offsets), strip assembly,
uncompressed (1), LZW (5), Deflate (8/32946 via stdlib zlib) and
PackBits (32773) strips, the horizontal-differencing predictor
(tag 317 = 2), photometric interpretations 0/1 (grayscale,
optionally inverted), 2 (RGB), and 3 (palette via the 16-bit
ColorMap). Scanned-document corpora ship TIFFs; this keeps the
multimodal image path real for them like BMP/PNG/JPEG/GIF.
JPEG-compressed TIFFs raise ValueError and fall back.

TIFF LZW differs from GIF LZW in two ways (TIFF 6.0 §13): bits pack
MSB-first, and the code width bumps one code EARLY — the decoder
widens the moment its table length hits 511/1023/2047 (the spec's
famous off-by-one that became the de facto standard).

The encoder writes uncompressed 8-bit RGB (header + one IFD + one
strip) — enough for lossless resize re-encode and for oracle
fixtures assembled in executors.
"""

from __future__ import annotations

import struct


def _packbits_decode(data: bytes, expected: int) -> bytes:
    out = bytearray()
    i = 0
    n = len(data)
    while i < n and len(out) < expected:
        b = data[i]
        i += 1
        if b < 128:  # literal run of b+1 bytes
            out += data[i : i + b + 1]
            i += b + 1
        elif b > 128:  # repeat next byte 257-b times
            out += bytes((data[i],)) * (257 - b)
            i += 1
        # b == 128: noop
    return bytes(out[:expected])


def _packbits_encode(data: bytes) -> bytes:
    """Simple PackBits: emit maximal repeat runs (>=3) else literals."""
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 3:
            out.append(257 - run)
            out.append(data[i])
            i += run
            continue
        lit_start = i
        i += run
        while i < n and i - lit_start < 128:
            run = 1
            while i + run < n and run < 3 and data[i + run] == data[i]:
                run += 1
            if run >= 3:
                break
            i += 1
        out.append(i - lit_start - 1)
        out += data[lit_start:i]
    return bytes(out)


def _lzw_decode_tiff(data: bytes, expected: int) -> bytes:
    """TIFF-variant LZW (TIFF 6.0 §13): MSB-first bit packing, codes
    start at 9 bits, CLEAR=256 EOI=257, first dictionary code 258,
    and the early-change width bump — widen when the table length
    reaches (1<<width)-1 (511/1023/2047), one code earlier than GIF.
    Matches what libtiff writes (the tifffile/libtiff de facto
    behavior)."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    acc = 0
    nbits = 0
    pos = 0
    n = len(data)
    table: dict[int, bytes] = {}
    width = 9
    next_code = 258
    prev: bytes | None = None
    while len(out) < expected:
        while nbits < width:
            if pos >= n:
                return bytes(out[:expected])  # truncated: best effort
            acc = (acc << 8) | data[pos]
            pos += 1
            nbits += 8
        code = (acc >> (nbits - width)) & ((1 << width) - 1)
        nbits -= width
        if code == CLEAR:
            table = {}
            width = 9
            next_code = 258
            prev = None
            continue
        if code == EOI:
            break
        if code < 256:
            entry = bytes((code,))
        elif code in table:
            entry = table[code]
        elif prev is not None and code == next_code:
            entry = prev + prev[:1]  # KwKwK
        else:
            raise ValueError(f"bad TIFF-LZW code {code}")
        out += entry
        if prev is not None and next_code < 4096:
            table[next_code] = prev + entry[:1]
            next_code += 1
            # early change: widen as soon as the NEXT free slot index
            # hits (1<<width)-1 — one code before GIF would
            if next_code >= (1 << width) - 1 and width < 12:
                width += 1
        prev = entry
    return bytes(out[:expected])


def _undo_predictor(raw: bytes, height: int, width: int, spp: int) -> bytes:
    """Invert TIFF predictor 2 (horizontal differencing): each sample
    is stored as the delta vs the same channel one pixel left; undo
    with a per-row per-channel cumulative sum mod 256."""
    import numpy as np

    px = np.frombuffer(raw, np.uint8, height * width * spp).reshape(
        height, width, spp
    )
    return np.cumsum(px, axis=1, dtype=np.uint8).tobytes()


_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8}


def decode_tiff(content: bytes):
    """Decode the first IFD of a baseline TIFF → HxWx3 (RGB/palette)
    or HxW (grayscale) uint8. Raises ValueError for non-TIFF bytes or
    compressions beyond none/PackBits."""
    import numpy as np

    if content[:4] == b"II*\x00":
        end = "<"
    elif content[:4] == b"MM\x00*":
        end = ">"
    else:
        raise ValueError("not a TIFF")
    (ifd_off,) = struct.unpack_from(end + "I", content, 4)
    (n_entries,) = struct.unpack_from(end + "H", content, ifd_off)
    tags: dict[int, list[int]] = {}
    for i in range(n_entries):
        tag, typ, cnt = struct.unpack_from(
            end + "HHI", content, ifd_off + 2 + 12 * i
        )
        if typ not in _TYPE_SIZES:
            continue
        size = _TYPE_SIZES[typ] * cnt
        vpos = ifd_off + 2 + 12 * i + 8
        if size > 4:
            (vpos,) = struct.unpack_from(end + "I", content, vpos)
        fmt = {1: "B", 3: "H", 4: "I"}.get(typ)
        if fmt is None:
            continue  # rationals etc. — not needed
        tags[tag] = list(
            struct.unpack_from(end + fmt * cnt, content, vpos)
        )
    try:
        width = tags[256][0]
        height = tags[257][0]
        offsets = tags[273]
        counts = tags[279]
    except KeyError as e:
        raise ValueError(f"TIFF missing required tag {e}") from e
    bits = tags.get(258, [8])
    if any(b != 8 for b in bits):
        raise ValueError(f"unsupported TIFF bits per sample {bits}")
    compression = tags.get(259, [1])[0]
    photometric = tags.get(262, [1])[0]
    spp = tags.get(277, [len(bits)])[0]
    rows_per_strip = tags.get(278, [height])[0]
    predictor = tags.get(317, [1])[0]

    raw = bytearray()
    for si, (off, cnt) in enumerate(zip(offsets, counts)):
        strip = content[off : off + cnt]
        n_rows = min(rows_per_strip, height - si * rows_per_strip)
        expected = n_rows * width * spp
        if compression == 1:
            raw += strip[:expected]
        elif compression == 5:
            raw += _lzw_decode_tiff(strip, expected)
        elif compression in (8, 32946):  # Deflate (new + old tag)
            import zlib

            raw += zlib.decompress(strip)[:expected]
        elif compression == 32773:
            raw += _packbits_decode(strip, expected)
        else:
            raise ValueError(f"unsupported TIFF compression {compression}")
    if len(raw) < height * width * spp:
        raise ValueError("TIFF strip data truncated")
    if predictor == 2:
        raw = _undo_predictor(bytes(raw), height, width, spp)
    elif predictor not in (1,):
        raise ValueError(f"unsupported TIFF predictor {predictor}")
    px = np.frombuffer(bytes(raw), np.uint8, height * width * spp).reshape(
        height, width, spp
    )
    if photometric == 2:  # RGB
        if spp < 3:
            raise ValueError("RGB TIFF with <3 samples")
        return np.ascontiguousarray(px[:, :, :3])
    if photometric == 3:  # palette: 16-bit R..G..B colormap
        cmap = tags.get(320)
        if not cmap:
            raise ValueError("palette TIFF missing ColorMap")
        ncol = len(cmap) // 3
        pal = (
            np.array(cmap, dtype=np.uint32).reshape(3, ncol).T >> 8
        ).astype(np.uint8)
        return pal[px.reshape(height, width)]
    gray = px.reshape(height, width, spp)[:, :, 0]
    if photometric == 0:  # white-is-zero
        gray = 255 - gray
    return np.ascontiguousarray(gray)


def encode_tiff(px, packbits: bool = False) -> bytes:
    """Encode HxWx3 RGB (or HxW grayscale) uint8 as little-endian
    baseline TIFF: one IFD, one strip, uncompressed or PackBits."""
    import numpy as np

    px = np.asarray(px, dtype=np.uint8)
    gray = px.ndim == 2
    h, w = px.shape[:2]
    spp = 1 if gray else 3
    body = px.tobytes()
    if packbits:
        body = _packbits_encode(body)
    # layout: header(8) + strip data + IFD
    strip_off = 8
    ifd_off = strip_off + len(body)
    entries = [
        (256, 3, 1, w),
        (257, 3, 1, h),
        (259, 3, 1, 32773 if packbits else 1),
        (262, 3, 1, 1 if gray else 2),
        (273, 4, 1, strip_off),
        (277, 3, 1, spp),
        (278, 3, 1, h),
        (279, 4, 1, len(body)),
    ]
    # BitsPerSample: inline for gray (1 short), offset for RGB (3 shorts)
    if gray:
        entries.append((258, 3, 1, 8))
        extra = b""
    else:
        bps_off = ifd_off + 2 + 12 * 9 + 4
        entries.append((258, 3, 3, bps_off))
        extra = struct.pack("<HHH", 8, 8, 8)
    entries.sort()
    out = bytearray(struct.pack("<2sHI", b"II", 42, ifd_off))
    out += body
    out += struct.pack("<H", len(entries))
    for tag, typ, cnt, val in entries:
        out += struct.pack("<HHI", tag, typ, cnt)
        if typ == 3 and cnt == 1:
            out += struct.pack("<HH", val, 0)
        else:
            out += struct.pack("<I", val)
    out += struct.pack("<I", 0)  # next IFD
    out += extra
    return bytes(out)
