"""WebP-lossless (VP8L) decoder in pure Python/numpy — no native
libs.

Everything here derives from the public WebP lossless bitstream
specification (RFC 9649 §3, the VP8L format): RIFF/WEBP container,
LSB-first bit reading, canonical prefix codes (simple 1-2 symbol and
normal code-length-coded forms with the 16/17/18 RLE codes), meta
prefix images, LZ77 backward references with the 2D distance map,
the color cache, and all four inverse transforms (predictor, color,
subtract-green, color-indexing incl. sub-byte pixel bundling).

Lossy WebP (VP8) needs a full DCT video intra decoder and raises
ValueError so the multimodal path can fall back; animated WebP
yields its ValueError likewise (ANMF). Web-scraped corpora are full
of WebP — this keeps the image pipeline real for the lossless half.

Called per-row inside Arrow-batched mapInPandas
(operators/multimodal.py), the same distributed shape as every
codec here.
"""

from __future__ import annotations

import struct


class _Bits:
    """LSB-first bit reader (VP8L bit order)."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position

    def read(self, n: int) -> int:
        v = 0
        for i in range(n):
            byte = self.data[self.pos >> 3]
            v |= ((byte >> (self.pos & 7)) & 1) << i
            self.pos += 1
        return v


# code length code order (spec §3.5.2.2)
_CLC_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12,
              13, 14, 15]


class _Prefix:
    """Canonical prefix decoder: {(length, code): symbol} built from
    per-symbol code lengths (codes assigned in symbol order within
    each length, MSB-first values read bit-by-bit)."""

    def __init__(self, lengths):
        self.map = {}
        self.single = None
        nonzero = [(ln, sym) for sym, ln in enumerate(lengths) if ln > 0]
        if len(nonzero) == 1:
            self.single = nonzero[0][1]
            return
        code = 0
        prev_len = 0
        for ln, sym in sorted(nonzero):
            code <<= ln - prev_len
            prev_len = ln
            self.map[(ln, code)] = sym
            code += 1

    def decode(self, br: _Bits) -> int:
        if self.single is not None:
            return self.single
        length = 0
        code = 0
        while length < 16:
            code = (code << 1) | br.read(1)
            length += 1
            sym = self.map.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("bad VP8L prefix code")


def _read_prefix_code(br: _Bits, alphabet_size: int) -> _Prefix:
    if br.read(1):  # simple code
        num_symbols = br.read(1) + 1
        if br.read(1):  # first symbol is 8 bits
            s0 = br.read(8)
        else:
            s0 = br.read(1)
        lengths = [0] * alphabet_size
        if num_symbols == 2:
            s1 = br.read(8)
            lengths[s0] = 1
            lengths[s1] = 1
        else:
            lengths[s0] = 1
        return _Prefix(lengths)
    # normal: code-length code
    num_codes = br.read(4) + 4
    clc_lengths = [0] * 19
    for i in range(num_codes):
        clc_lengths[_CLC_ORDER[i]] = br.read(3)
    clc = _Prefix(clc_lengths)
    # optional bound on coded symbols
    if br.read(1):
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet_size
    lengths = [0] * alphabet_size
    prev_len = 8
    sym = 0
    while sym < alphabet_size:
        if max_symbol <= 0:
            break
        max_symbol -= 1
        c = clc.decode(br)
        if c < 16:
            lengths[sym] = c
            sym += 1
            if c:
                prev_len = c
        elif c == 16:
            rep = 3 + br.read(2)
            for _ in range(rep):
                if sym < alphabet_size:
                    lengths[sym] = prev_len
                    sym += 1
        elif c == 17:
            sym += 3 + br.read(3)
        else:  # 18
            sym += 11 + br.read(7)
    return _Prefix(lengths)


def _lz77_value(br: _Bits, code: int) -> int:
    """Length/distance prefix coding (spec §3.6.2.2)."""
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.read(extra) + 1


# 2D distance map: codes 1..120 → (dx, dy) neighborhood (spec §3.6.2.3)
_DIST_MAP = [
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5), (8, 4), (6, 7),
    (-6, 7), (7, 6), (-7, 6), (8, 5), (7, 7), (-7, 7), (8, 6), (8, 7),
]


def _plane_distance(code: int, width: int) -> int:
    if code > 120:
        return code - 120
    dx, dy = _DIST_MAP[code - 1]
    d = dy * width + dx
    return max(1, d)


def _div_round_up(a: int, b: int) -> int:
    return -(-a // b)


def _decode_entropy_image(
    br: _Bits, width: int, height: int, allow_meta: bool,
    allow_cache: bool,
):
    """Decode one spatially-coded image (the main image, or a
    transform's sub-image) → list of ARGB ints, row-major."""
    cache_bits = 0
    cache = None
    if allow_cache and br.read(1):
        cache_bits = br.read(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError("bad color cache size")
        cache = [0] * (1 << cache_bits)
    meta = None
    meta_bits = 0
    n_groups = 1
    if allow_meta and br.read(1):
        meta_bits = br.read(3) + 2
        mw = _div_round_up(width, 1 << meta_bits)
        mh = _div_round_up(height, 1 << meta_bits)
        meta = _decode_entropy_image(br, mw, mh, False, False)
        n_groups = max(((px >> 8) & 0xFFFF) for px in meta) + 1
    groups = []
    green_alpha = 256 + 24 + (1 << cache_bits if cache_bits else 0)
    for _ in range(n_groups):
        g = _read_prefix_code(br, green_alpha)
        r = _read_prefix_code(br, 256)
        b = _read_prefix_code(br, 256)
        a = _read_prefix_code(br, 256)
        d = _read_prefix_code(br, 40)
        groups.append((g, r, b, a, d))

    n = width * height
    out = [0] * n
    pos = 0
    while pos < n:
        if meta is not None:
            x = pos % width
            y = pos // width
            mi = meta[
                (y >> meta_bits)
                * _div_round_up(width, 1 << meta_bits)
                + (x >> meta_bits)
            ]
            gcode, rcode, bcode, acode, dcode = groups[
                (mi >> 8) & 0xFFFF
            ]
        else:
            gcode, rcode, bcode, acode, dcode = groups[0]
        s = gcode.decode(br)
        if s < 256:  # literal
            g = s
            r = rcode.decode(br)
            b = bcode.decode(br)
            a = acode.decode(br)
            px = (a << 24) | (r << 16) | (g << 8) | b
            out[pos] = px
            pos += 1
            if cache is not None:
                cache[(0x1E35A7BD * px & 0xFFFFFFFF) >> (32 - cache_bits)] = px
        elif s < 256 + 24:  # LZ77 backward reference
            length = _lz77_value(br, s - 256)
            dist_code = _lz77_value(br, dcode.decode(br))
            dist = _plane_distance(dist_code, width)
            if dist > pos:
                raise ValueError("LZ77 distance before image start")
            for _ in range(length):
                if pos >= n:
                    break
                px = out[pos - dist]
                out[pos] = px
                pos += 1
                if cache is not None:
                    cache[
                        (0x1E35A7BD * px & 0xFFFFFFFF) >> (32 - cache_bits)
                    ] = px
        else:  # color cache reference
            if cache is None:
                raise ValueError("cache index without color cache")
            out[pos] = cache[s - 256 - 24]
            pos += 1
    return out


def _inverse_transforms(argb, width, height, transforms,
                        true_width=None):
    import numpy as np

    px = np.array(argb, dtype=np.uint32).reshape(height, width)
    a = (px >> 24) & 0xFF
    r = (px >> 16) & 0xFF
    g = (px >> 8) & 0xFF
    b = px & 0xFF
    chans = np.stack([a, r, g, b], axis=2).astype(np.int64)

    for ttype, tdata in reversed(transforms):
        if ttype == 2:  # subtract green
            chans[:, :, 1] = (chans[:, :, 1] + chans[:, :, 2]) & 0xFF
            chans[:, :, 3] = (chans[:, :, 3] + chans[:, :, 2]) & 0xFF
        elif ttype == 0:  # predictor
            bits, sub = tdata
            chans = _inverse_predictor(chans, bits, sub, width, height)
        elif ttype == 1:  # color transform
            bits, sub = tdata
            chans = _inverse_color_transform(
                chans, bits, sub, width, height
            )
        elif ttype == 3:  # color indexing
            palette, pack_bits = tdata
            chans = _inverse_palette(
                chans, palette, pack_bits, true_width or width, height
            )
    return chans.astype(np.uint8)


def _inverse_predictor(chans, bits, sub, width, height):
    import numpy as np

    sub_w = _div_round_up(width, 1 << bits)
    out = chans.copy()

    def clamp_add(cur, pred):
        return (cur + pred) & 0xFF

    for y in range(height):
        for x in range(width):
            if x == 0 and y == 0:
                pred = np.array([255, 0, 0, 0])
            elif y == 0:
                pred = out[y, x - 1]
            elif x == 0:
                pred = out[y - 1, x]
            else:
                mode = (sub[(y >> bits) * sub_w + (x >> bits)] >> 8) & 0xFF
                L = out[y, x - 1].astype(np.int64)
                T = out[y - 1, x].astype(np.int64)
                TL = out[y - 1, x - 1].astype(np.int64)
                # rightmost column: TR wraps to the CURRENT row's
                # first pixel (libwebp's contiguous-buffer rule:
                # top[x+1] with x = w-1 lands on row y, column 0 —
                # already decoded)
                TR = (
                    out[y - 1, x + 1].astype(np.int64)
                    if x + 1 < width
                    else out[y, 0].astype(np.int64)
                )
                if mode == 0:
                    pred = np.array([255, 0, 0, 0])
                elif mode == 1:
                    pred = L
                elif mode == 2:
                    pred = T
                elif mode == 3:
                    pred = TR
                elif mode == 4:
                    pred = TL
                elif mode == 5:
                    pred = ((L + TR) // 2 + T) // 2
                elif mode == 6:
                    pred = (L + TL) // 2
                elif mode == 7:
                    pred = (L + T) // 2
                elif mode == 8:
                    pred = (TL + T) // 2
                elif mode == 9:
                    pred = (T + TR) // 2
                elif mode == 10:
                    pred = ((L + TL) // 2 + (T + TR) // 2) // 2
                elif mode == 11:  # select
                    p = L + T - TL
                    pl = int(np.abs(p - L).sum())
                    pt = int(np.abs(p - T).sum())
                    pred = L if pl < pt else T
                elif mode == 12:  # clamp add subtract full
                    pred = np.clip(L + T - TL, 0, 255)
                elif mode == 13:  # clamp add subtract half
                    avg = (L + T) // 2
                    pred = np.clip(avg + (avg - TL) // 2, 0, 255)
                else:
                    raise ValueError(f"bad predictor mode {mode}")
            out[y, x] = clamp_add(chans[y, x], pred.astype(np.int64))
    return out


def _inverse_color_transform(chans, bits, sub, width, height):
    import numpy as np

    sub_w = _div_round_up(width, 1 << bits)
    out = chans.copy()

    def s8(v):
        return v - 256 if v >= 128 else v

    for y in range(height):
        for x in range(width):
            cx = sub[(y >> bits) * sub_w + (x >> bits)]
            g2r = s8((cx >> 16) & 0xFF)
            g2b = s8((cx >> 8) & 0xFF)
            r2b = s8(cx & 0xFF)
            g = int(out[y, x, 2])
            r = (int(out[y, x, 1]) + ((g2r * _i8(g)) >> 5)) & 0xFF
            out[y, x, 1] = r
            b = (int(out[y, x, 3]) + ((g2b * _i8(g)) >> 5) + (
                (r2b * _i8(r)) >> 5
            )) & 0xFF
            out[y, x, 3] = b
    return out


def _i8(v: int) -> int:
    v = int(v) & 0xFF
    return v - 256 if v >= 128 else v


def _inverse_palette(chans, palette, pack_bits, width, height):
    import numpy as np

    if pack_bits:  # sub-byte bundling: indices packed in green
        bits_pp = pack_bits
        per = 8 // bits_pp
        mask = (1 << bits_pp) - 1
        idx = np.zeros((height, width), dtype=np.int64)
        for y in range(height):
            for x in range(width):
                packed = chans[y, x // per, 2]
                idx[y, x] = (packed >> (bits_pp * (x % per))) & mask
    else:
        idx = chans[:, :, 2]
    pal = np.array(palette, dtype=np.uint32)
    n_pal = len(pal)
    idx = np.clip(idx, 0, n_pal - 1).astype(np.int64)
    vals = pal[idx]
    out = np.zeros((height, width, 4), dtype=np.int64)
    out[:, :, 0] = (vals >> 24) & 0xFF
    out[:, :, 1] = (vals >> 16) & 0xFF
    out[:, :, 2] = (vals >> 8) & 0xFF
    out[:, :, 3] = vals & 0xFF
    return out


def decode_webp(content: bytes):
    """Decode a lossless WebP → HxWx3 uint8 RGB (alpha composited
    over nothing — returned as straight RGB; fully-opaque corpora
    images are unaffected). Raises ValueError on lossy VP8/animated
    streams so callers can fall back."""
    import numpy as np

    if content[:4] != b"RIFF" or content[8:12] != b"WEBP":
        raise ValueError("not a WebP")
    pos = 12
    vp8l = None
    while pos + 8 <= len(content):
        tag = content[pos : pos + 4]
        (ln,) = struct.unpack_from("<I", content, pos + 4)
        body = content[pos + 8 : pos + 8 + ln]
        pos += 8 + ln + (ln & 1)
        if tag == b"VP8L":
            vp8l = body
            break
        if tag in (b"VP8 ", b"ANIM", b"ANMF"):
            raise ValueError(f"unsupported WebP chunk {tag!r}")
    if vp8l is None:
        raise ValueError("no VP8L chunk")
    if vp8l[0] != 0x2F:
        raise ValueError("bad VP8L signature")
    br = _Bits(vp8l)
    br.pos = 8
    width = br.read(14) + 1
    height = br.read(14) + 1
    br.read(1)  # alpha hint
    if br.read(3) != 0:
        raise ValueError("unsupported VP8L version")

    transforms = []
    xsize = width
    while br.read(1):
        ttype = br.read(2)
        if any(t[0] == 3 for t in transforms):
            raise ValueError(
                "transforms after color-indexing are out of scope"
            )
        if ttype in (0, 1):  # predictor / color: sub-image
            bits = br.read(3) + 2
            sw = _div_round_up(xsize, 1 << bits)
            sh = _div_round_up(height, 1 << bits)
            sub = _decode_entropy_image(br, sw, sh, False, True)
            transforms.append((ttype, (bits, sub)))
        elif ttype == 2:
            transforms.append((2, None))
        elif ttype == 3:
            if transforms:
                raise ValueError(
                    "color-indexing combined with other transforms is "
                    "out of scope"
                )
            n_colors = br.read(8) + 1
            pal_deltas = _decode_entropy_image(br, n_colors, 1, False, True)
            # palette entries are stored as deltas to the previous
            palette = []
            prev = 0
            for d in pal_deltas:
                # component-wise addition mod 256
                a = ((prev >> 24) + (d >> 24)) & 0xFF
                r = (((prev >> 16) & 0xFF) + ((d >> 16) & 0xFF)) & 0xFF
                g = (((prev >> 8) & 0xFF) + ((d >> 8) & 0xFF)) & 0xFF
                b = ((prev & 0xFF) + (d & 0xFF)) & 0xFF
                prev = (a << 24) | (r << 16) | (g << 8) | b
                palette.append(prev)
            if n_colors <= 2:
                bits_pp = 1
            elif n_colors <= 4:
                bits_pp = 2
            elif n_colors <= 16:
                bits_pp = 4
            else:
                bits_pp = 0
            if bits_pp:
                xsize = _div_round_up(width, 8 // bits_pp)
            transforms.append((3, (palette, bits_pp)))
        else:
            raise ValueError("bad transform type")

    argb = _decode_entropy_image(br, xsize, height, True, True)
    chans = _inverse_transforms(
        argb, xsize, height, transforms, true_width=width
    )
    # palette unpacking may have widened back to the true width
    if chans.shape[1] != width:
        chans = chans[:, :width]
    rgb = np.stack(
        [chans[:, :, 1], chans[:, :, 2], chans[:, :, 3]], axis=2
    )
    return rgb.astype(np.uint8)


# ----------------------------------------------------------- encode

class _WBits:
    """LSB-first bit writer (VP8L order); prefix-code values emit
    MSB-first, matching the bit-serial reader."""

    def __init__(self):
        self.bits: list[int] = []

    def b(self, v: int, n: int = 1) -> None:
        for i in range(n):
            self.bits.append((v >> i) & 1)

    def code(self, value: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.bits.append((value >> i) & 1)

    def to_bytes(self) -> bytes:
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            byte = 0
            for j, bit in enumerate(self.bits[i : i + 8]):
                byte |= bit << j
            out.append(byte)
        return bytes(out)


def _huffman_lengths(freqs: dict, limit: int = 15) -> dict:
    """Huffman code lengths capped at ``limit`` bits. VP8L hard-caps
    symbol code lengths at 15 (and the code-length code at 7 — its
    lengths are written in 3-bit fields); an unconstrained Huffman
    tree over a skewed histogram can reach depth 20+, producing a
    stream no conforming decoder accepts, and lengths 16-18 would
    additionally collide with the 16/17/18 repeat ops in the
    length-array encoding. Plain Huffman when it fits, else the
    optimal package-merge construction."""
    import heapq

    if len(freqs) == 1:
        return {next(iter(freqs)): 1}
    heap = [(c, i, (s,)) for i, (s, c) in enumerate(sorted(freqs.items()))]
    heapq.heapify(heap)
    lengths = {s: 0 for s in freqs}
    nid = len(heap)
    while len(heap) > 1:
        c1, _, s1 = heapq.heappop(heap)
        c2, _, s2 = heapq.heappop(heap)
        for s in s1 + s2:
            lengths[s] += 1
        heapq.heappush(heap, (c1 + c2, nid, s1 + s2))
        nid += 1
    if max(lengths.values()) <= limit:
        return lengths
    return _package_merge_lengths(freqs, limit)


def _package_merge_lengths(freqs: dict, limit: int) -> dict:
    """Optimal length-limited code lengths (package-merge): run
    ``limit - 1`` rounds of pair-packaging merged against the
    original symbol list; each symbol's length = how many of the
    first 2n-2 final items contain it. Kraft-tight by construction,
    max depth <= limit."""
    from collections import Counter

    n = len(freqs)
    if n > (1 << limit):
        raise ValueError(
            f"{n} symbols cannot fit in a {limit}-bit prefix code"
        )
    originals = [
        (f, Counter({s: 1}))
        for s, f in sorted(freqs.items(), key=lambda kv: (kv[1], kv[0]))
    ]
    items = list(originals)
    for _ in range(limit - 1):
        packaged = []
        for i in range(0, len(items) - 1, 2):
            w = items[i][0] + items[i + 1][0]
            cnt = items[i][1] + items[i + 1][1]
            packaged.append((w, cnt))
        items = sorted(originals + packaged, key=lambda x: x[0])
    lengths: Counter = Counter()
    for _, cnt in items[: 2 * n - 2]:
        lengths += cnt
    return dict(lengths)


def _canonical(lengths: dict) -> dict:
    code = 0
    prev = 0
    out = {}
    for ln, sym in sorted((ln, s) for s, ln in lengths.items() if ln):
        code <<= ln - prev
        prev = ln
        out[sym] = (code, ln)
        code += 1
    return out


def _write_tree(w: _WBits, freqs: dict, alphabet: int) -> dict:
    """Emit a prefix-code definition (simple for 1-2 symbols <=255,
    normal Huffman otherwise) and return {symbol: (code, len)}."""
    syms = sorted(freqs)
    if len(syms) == 1 and syms[0] <= 255:
        s = syms[0]
        w.b(1)
        w.b(0)
        if s < 2:
            w.b(0)
            w.b(s, 1)
        else:
            w.b(1)
            w.b(s, 8)
        return {s: (0, 0)}
    if len(syms) == 2 and syms[0] <= 255 and syms[1] <= 255:
        w.b(1)
        w.b(1)
        w.b(1)
        w.b(syms[0], 8)
        w.b(syms[1], 8)
        return {syms[0]: (0, 1), syms[1]: (1, 1)}
    lengths = _huffman_lengths(freqs)
    # encode the length array via the code-length code with 17/18
    # zero-run symbols
    seq = []
    sym = 0
    while sym < alphabet:
        ln = lengths.get(sym, 0)
        if ln:
            seq.append((ln, 0, 0))
            sym += 1
            continue
        run = 0
        while sym + run < alphabet and lengths.get(sym + run, 0) == 0:
            run += 1
        sym += run
        while run > 0:
            if run < 3:
                seq.extend([(0, 0, 0)] * run)
                run = 0
            elif run <= 10:
                seq.append((17, run - 3, 3))
                run = 0
            else:
                chunk = min(run, 138)
                seq.append((18, chunk - 11, 7))
                run -= chunk
    clc_freq: dict[int, int] = {}
    for c, _, _ in seq:
        clc_freq[c] = clc_freq.get(c, 0) + 1
    clc_len = _huffman_lengths(clc_freq, limit=7)
    clc_codes = _canonical(clc_len)
    w.b(0)  # normal
    used_pos = max(i for i, c in enumerate(_CLC_ORDER) if c in clc_len) + 1
    num_codes = max(4, used_pos)
    w.b(num_codes - 4, 4)
    for i in range(num_codes):
        w.b(clc_len.get(_CLC_ORDER[i], 0), 3)
    w.b(0)  # no max_symbol bound
    for c, extra, extra_n in seq:
        code, ln = clc_codes[c]
        w.code(code, ln)
        if extra_n:
            w.b(extra, extra_n)
    return _canonical(lengths)


def _lz77_code_of(v: int):
    """Inverse of _lz77_value: (prefix_symbol, extra_value,
    extra_bits)."""
    x = v - 1
    if x < 4:
        return x, 0, 0
    e = x.bit_length() - 2
    half = (x >> e) & 1
    offset = (2 + half) << e
    return 2 * e + 2 + half, x - offset, e


_CACHE_BITS = 6


def encode_webp_lossless(px) -> bytes:
    """Encode an HxWx3 uint8 RGB array as lossless WebP (VP8L):
    subtract-green transform, a 2^6-entry color cache, LZ77
    distance-1 run coding for repeated pixels, and per-symbol
    Huffman codes — a conforming stream that exercises the same
    literal/copy/cache machinery real-world files use."""
    import numpy as np

    px = np.asarray(px, dtype=np.uint8)
    if px.ndim == 2:
        px = np.repeat(px[:, :, None], 3, axis=2)
    h, wd = px.shape[:2]
    if h == 0 or wd == 0:
        raise ValueError("empty image")
    r = px[:, :, 0].astype(np.int64)
    g = px[:, :, 1].astype(np.int64)
    b = px[:, :, 2].astype(np.int64)
    rs = ((r - g) % 256).ravel()
    bs = ((b - g) % 256).ravel()
    gv = g.ravel()
    n = h * wd

    # tokenize: distance-1 runs -> LZ77 copies; repeated colors ->
    # cache hits; else literals. The cache is updated for EVERY
    # emitted pixel, exactly as the decoder replays it.
    cache = [None] * (1 << _CACHE_BITS)
    tokens = []
    i = 0
    while i < n:
        argb = (255 << 24) | (int(rs[i]) << 16) | (int(gv[i]) << 8) | int(
            bs[i]
        )
        if i > 0:
            prev = (255 << 24) | (int(rs[i - 1]) << 16) | (
                int(gv[i - 1]) << 8
            ) | int(bs[i - 1])
            if argb == prev:
                run = 0
                while i + run < n and (
                    (255 << 24)
                    | (int(rs[i + run]) << 16)
                    | (int(gv[i + run]) << 8)
                    | int(bs[i + run])
                ) == prev and run < 4095:
                    run += 1
                tokens.append(("copy", run))
                slot = ((0x1E35A7BD * prev) & 0xFFFFFFFF) >> (
                    32 - _CACHE_BITS
                )
                cache[slot] = prev
                i += run
                continue
        slot = ((0x1E35A7BD * argb) & 0xFFFFFFFF) >> (32 - _CACHE_BITS)
        if cache[slot] == argb:
            tokens.append(("cache", slot))
        else:
            tokens.append(("lit", int(gv[i]), int(rs[i]), int(bs[i])))
            cache[slot] = argb
        i += 1

    # symbol frequencies
    gfreq, rfreq, bfreq, dfreq = {}, {}, {}, {}
    for t in tokens:
        if t[0] == "lit":
            gfreq[t[1]] = gfreq.get(t[1], 0) + 1
            rfreq[t[2]] = rfreq.get(t[2], 0) + 1
            bfreq[t[3]] = bfreq.get(t[3], 0) + 1
        elif t[0] == "copy":
            sym, _, _ = _lz77_code_of(t[1])
            gfreq[256 + sym] = gfreq.get(256 + sym, 0) + 1
            dfreq[1] = dfreq.get(1, 0) + 1  # distance code 2 -> (1,0)
        else:
            gfreq[256 + 24 + t[1]] = gfreq.get(256 + 24 + t[1], 0) + 1
    if not rfreq:
        rfreq = {0: 1}
    if not bfreq:
        bfreq = {0: 1}
    if not dfreq:
        dfreq = {0: 1}

    w = _WBits()
    w.b(wd - 1, 14)
    w.b(h - 1, 14)
    w.b(0)      # alpha hint
    w.b(0, 3)   # version
    w.b(1)      # transform present
    w.b(2, 2)   # subtract-green
    w.b(0)      # no more transforms
    w.b(1)      # color cache present
    w.b(_CACHE_BITS, 4)
    w.b(0)      # no meta prefix image

    gc = _write_tree(w, gfreq, 256 + 24 + (1 << _CACHE_BITS))
    rc = _write_tree(w, rfreq, 256)
    bc = _write_tree(w, bfreq, 256)
    ac = _write_tree(w, {255: max(1, len(tokens))}, 256)
    dc = _write_tree(w, dfreq, 40)
    for t in tokens:
        if t[0] == "lit":
            code, ln = gc[t[1]]
            w.code(code, ln)
            code, ln = rc[t[2]]
            w.code(code, ln)
            code, ln = bc[t[3]]
            w.code(code, ln)
            code, ln = ac[255]
            w.code(code, ln)
        elif t[0] == "copy":
            sym, extra, extra_n = _lz77_code_of(t[1])
            code, ln = gc[256 + sym]
            w.code(code, ln)
            if extra_n:
                w.b(extra, extra_n)
            code, ln = dc[1]
            w.code(code, ln)
        else:
            code, ln = gc[256 + 24 + t[1]]
            w.code(code, ln)

    payload = bytes([0x2F]) + w.to_bytes()
    padded = payload + (b"\x00" if len(payload) % 2 else b"")
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(padded))
        + b"WEBP"
        + b"VP8L"
        + struct.pack("<I", len(payload))
        + padded
    )
