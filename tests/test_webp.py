"""VP8L / WebP-lossless decoder (operators/webp.py) against an
independent in-test encoder: conforming normal prefix codes built by
a real Huffman construction, simple codes, LZ77 references, the
color cache, and every transform — plus container negatives."""

import heapq
import struct

import numpy as np
import pytest

from distcpplus_spark.operators.webp import _CLC_ORDER, decode_webp


class WBits:
    """LSB-first bit writer (the VP8L order)."""

    def __init__(self):
        self.bits = []

    def b(self, v, n=1):
        for i in range(n):
            self.bits.append((v >> i) & 1)

    def code(self, value, length):
        """Prefix-code bits are emitted MSB-first."""
        for i in range(length - 1, -1, -1):
            self.bits.append((value >> i) & 1)

    def bytes(self):
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            byte = 0
            for j, bit in enumerate(self.bits[i : i + 8]):
                byte |= bit << j
            out.append(byte)
        return bytes(out)


def huffman_lengths(freqs):
    """Complete prefix-code lengths via standard Huffman over
    {symbol: count}; single-symbol alphabets get length handled by
    the caller (simple code)."""
    heap = [(c, i, (s,)) for i, (s, c) in enumerate(sorted(freqs.items()))]
    heapq.heapify(heap)
    lengths = {s: 0 for s in freqs}
    if len(heap) == 1:
        return {next(iter(freqs)): 1}
    nid = len(heap)
    while len(heap) > 1:
        c1, _, s1 = heapq.heappop(heap)
        c2, _, s2 = heapq.heappop(heap)
        for s in s1 + s2:
            lengths[s] += 1
        heapq.heappush(heap, (c1 + c2, nid, s1 + s2))
        nid += 1
    return lengths


def canonical_codes(lengths):
    code = 0
    prev = 0
    out = {}
    for ln, sym in sorted((ln, s) for s, ln in lengths.items() if ln):
        code <<= ln - prev
        prev = ln
        out[sym] = (code, ln)
        code += 1
    return out


def write_prefix(w, lengths, alphabet_size):
    """Emit a NORMAL prefix-code definition for {symbol: length}."""
    # encode the per-symbol length array as clc symbols
    seq = []  # (clc_symbol, extra_bits_value, extra_bits_n)
    sym = 0
    items = dict(lengths)
    while sym < alphabet_size:
        ln = items.get(sym, 0)
        if ln:
            seq.append((ln, 0, 0))
            sym += 1
            continue
        run = 0
        while sym + run < alphabet_size and items.get(sym + run, 0) == 0:
            run += 1
        sym += run
        while run > 0:
            if run < 3:
                for _ in range(run):
                    seq.append((0, 0, 0))
                run = 0
            elif run <= 10:
                seq.append((17, run - 3, 3))
                run = 0
            else:
                chunk = min(run, 138)
                seq.append((18, chunk - 11, 7))
                run -= chunk
    clc_freq = {}
    for c, _, _ in seq:
        clc_freq[c] = clc_freq.get(c, 0) + 1
    clc_len = huffman_lengths(clc_freq)
    clc_codes = canonical_codes(clc_len)
    w.b(0)  # normal code
    # num_code_lengths: cover every used clc symbol's position
    used_pos = max(
        i for i, c in enumerate(_CLC_ORDER) if c in clc_len
    ) + 1
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


def vp8l_container(body_bits: WBits, width, height):
    head = WBits()
    head.b(width - 1, 14)
    head.b(height - 1, 14)
    head.b(0)      # alpha hint
    head.b(0, 3)   # version
    payload = bytes([0x2F]) + WBits.bytes(
        type("m", (), {"bits": head.bits + body_bits.bits})()
    )
    if len(payload) % 2:
        padded = payload + b"\x00"
    else:
        padded = payload
    riff = (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(padded))
        + b"WEBP"
        + b"VP8L"
        + struct.pack("<I", len(payload))
        + padded
    )
    return riff


def encode_literals(pixels, width, height):
    """Literal-only VP8L body for a list of (r, g, b) rows using
    complete Huffman codes per channel."""
    flat = [px for row in pixels for px in row]
    w = WBits()
    w.b(0)  # no more transforms
    w.b(0)  # no color cache
    w.b(0)  # no meta prefix image
    gf, rf, bf = {}, {}, {}
    for r, g, b in flat:
        gf[g] = gf.get(g, 0) + 1
        rf[r] = rf.get(r, 0) + 1
        bf[b] = bf.get(b, 0) + 1
    af = {255: len(flat)}

    def emit_tree(freqs, alphabet):
        if len(freqs) == 1:
            s = next(iter(freqs))
            w.b(1)      # simple
            w.b(0)      # one symbol
            if s < 2:
                w.b(0)
                w.b(s, 1)
            else:
                w.b(1)
                w.b(s, 8)
            return {s: (0, 0)}
        ln = huffman_lengths(freqs)
        write_prefix(w, ln, alphabet)
        return canonical_codes(ln)

    gc = emit_tree(gf, 256 + 24)
    rc = emit_tree(rf, 256)
    bc = emit_tree(bf, 256)
    ac = emit_tree(af, 256)
    dc = emit_tree({0: 1}, 40)  # unused but must be present
    _ = dc
    for r, g, b in flat:
        code, ln = gc[g]
        w.code(code, ln)
        code, ln = rc[r]
        w.code(code, ln)
        code, ln = bc[b]
        w.code(code, ln)
        code, ln = ac[255]
        w.code(code, ln)
    return vp8l_container(w, width, height)


def test_literal_image_roundtrip():
    rng = np.random.default_rng(3)
    for h, wd in [(1, 1), (4, 7), (16, 16), (9, 23)]:
        px = rng.integers(0, 256, (h, wd, 3), dtype=np.uint8)
        pixels = [
            [tuple(int(v) for v in px[y, x]) for x in range(wd)]
            for y in range(h)
        ]
        blob = encode_literals(pixels, wd, h)
        dec = decode_webp(blob)
        assert dec.shape == (h, wd, 3)
        assert np.array_equal(dec, px), (h, wd)


def test_two_tone_simple_codes():
    """2-symbol alphabets ride the SIMPLE prefix-code path."""
    h, wd = 6, 10
    pixels = [
        [(200, 30, 90) if (x + y) % 2 else (10, 250, 140)
         for x in range(wd)]
        for y in range(h)
    ]
    blob = encode_literals(pixels, wd, h)
    dec = decode_webp(blob)
    for y in range(h):
        for x in range(wd):
            assert tuple(dec[y, x]) == pixels[y][x]


def _green_tree_with(symbols, w, alphabet=256 + 24):
    """Emit a normal green tree whose used symbols are `symbols`
    (dict symbol->freq) over the green+length(+cache) alphabet."""
    ln = huffman_lengths(symbols)
    write_prefix(w, ln, alphabet)
    return canonical_codes(ln)


def test_lz77_backward_reference():
    """4x1 image: one literal then a length-3 copy at distance 1
    (2D distance code 2 = (1,0)) — every pixel equal."""
    w = WBits()
    w.b(0)  # no transform
    w.b(0)  # no cache
    w.b(0)  # no meta
    gc = _green_tree_with({77: 1, 256 + 2: 1}, w)  # literal + len-code 2

    def one_symbol(s, alphabet):
        w.b(1)
        w.b(0)
        if s < 2:
            w.b(0)
            w.b(s, 1)
        else:
            w.b(1)
            w.b(s, 8)
        return {s: (0, 0)}

    rc = one_symbol(20, 256)
    bc = one_symbol(30, 256)
    ac = one_symbol(255, 256)
    dcodes = one_symbol(1, 40)  # distance prefix symbol 1 -> value 2
    _ = rc, bc, ac, dcodes
    # literal pixel (g=77, r=20, b=30, a=255): only green emits bits
    code, ln = gc[77]
    w.code(code, ln)
    # LZ77: green symbol 256+2 -> length code 2 -> length 3 (no extra)
    code, ln = gc[256 + 2]
    w.code(code, ln)
    # distance tree yields symbol 1 with zero bits -> value 2 ->
    # 2D map entry (1, 0) -> distance 1
    blob = vp8l_container(w, 4, 1)
    dec = decode_webp(blob)
    assert dec.shape == (1, 4, 3)
    for x in range(4):
        assert tuple(dec[0, x]) == (20, 77, 30)


def test_color_cache_reference():
    """Pixel, then a cache hit for the same ARGB: cache index =
    (0x1e35a7bd * argb) >> (32 - bits)."""
    bits = 4
    argb = (255 << 24) | (20 << 16) | (77 << 8) | 30
    idx = ((0x1E35A7BD * argb) & 0xFFFFFFFF) >> (32 - bits)
    w = WBits()
    w.b(0)        # no transform
    w.b(1)        # color cache present
    w.b(bits, 4)
    w.b(0)        # no meta
    gc = _green_tree_with(
        {77: 1, 256 + 24 + idx: 1}, w, alphabet=256 + 24 + (1 << bits)
    )

    def one_symbol(s):
        w.b(1)
        w.b(0)
        if s < 2:
            w.b(0)
            w.b(s, 1)
        else:
            w.b(1)
            w.b(s, 8)

    one_symbol(20)   # red
    one_symbol(30)   # blue
    one_symbol(255)  # alpha
    one_symbol(0)    # distance (unused)
    code, ln = gc[77]
    w.code(code, ln)          # literal
    code, ln = gc[256 + 24 + idx]
    w.code(code, ln)          # cache hit
    blob = vp8l_container(w, 2, 1)
    dec = decode_webp(blob)
    assert tuple(dec[0, 0]) == (20, 77, 30)
    assert tuple(dec[0, 1]) == (20, 77, 30)


def test_subtract_green_transform():
    rng = np.random.default_rng(11)
    h, wd = 5, 8
    px = rng.integers(0, 256, (h, wd, 3), dtype=np.uint8)
    # encode the TRANSFORMED channels: r' = r-g, b' = b-g (mod 256)
    pixels = [
        [
            (
                int((int(px[y, x, 0]) - int(px[y, x, 1])) % 256),
                int(px[y, x, 1]),
                int((int(px[y, x, 2]) - int(px[y, x, 1])) % 256),
            )
            for x in range(wd)
        ]
        for y in range(h)
    ]
    body = WBits()
    body.b(1)      # a transform follows
    body.b(2, 2)   # subtract-green
    lit = WBits()
    lit.b(0)  # no more transforms
    flat = [p for row in pixels for p in row]
    lit.b(0)  # no color cache
    lit.b(0)  # no meta prefix image
    gf, rf, bf = {}, {}, {}
    for r, g, b in flat:
        gf[g] = gf.get(g, 0) + 1
        rf[r] = rf.get(r, 0) + 1
        bf[b] = bf.get(b, 0) + 1

    def emit_tree(w2, freqs, alphabet):
        if len(freqs) == 1:
            s = next(iter(freqs))
            w2.b(1)
            w2.b(0)
            if s < 2:
                w2.b(0)
                w2.b(s, 1)
            else:
                w2.b(1)
                w2.b(s, 8)
            return {s: (0, 0)}
        ln = huffman_lengths(freqs)
        write_prefix(w2, ln, alphabet)
        return canonical_codes(ln)

    gc = emit_tree(lit, gf, 280)
    rc = emit_tree(lit, rf, 256)
    bc = emit_tree(lit, bf, 256)
    ac = emit_tree(lit, {255: len(flat)}, 256)
    emit_tree(lit, {0: 1}, 40)
    for r, g, b in flat:
        for codes, sym in ((gc, g), (rc, r), (bc, b), (ac, 255)):
            code, ln = codes[sym]
            lit.code(code, ln)
    # lit.bits begins with the required no-more-transforms 0 bit
    body.bits.extend(lit.bits)
    blob = vp8l_container(body, wd, h)
    dec = decode_webp(blob)
    assert np.array_equal(dec, px)


def test_rejects_lossy_and_garbage():
    with pytest.raises(ValueError, match="not a WebP"):
        decode_webp(b"RIFX" + b"\x00" * 20)
    lossy = (
        b"RIFF" + struct.pack("<I", 12) + b"WEBP" + b"VP8 "
        + struct.pack("<I", 0)
    )
    with pytest.raises(ValueError, match="VP8"):
        decode_webp(lossy)


def test_predictor_transform_mode_T():
    """Predictor transform, one block, mode 2 (= top pixel): the
    test runs the FORWARD predictor itself and the decoder must
    invert it exactly."""
    h, wd = 4, 4
    rng = np.random.default_rng(5)
    px = rng.integers(0, 256, (h, wd, 3), dtype=np.uint8)
    # forward: residual = pixel - prediction (mod 256), channels ARGB
    chans = np.zeros((h, wd, 4), dtype=np.int64)
    chans[:, :, 0] = 255
    chans[:, :, 1] = px[:, :, 0]
    chans[:, :, 2] = px[:, :, 1]
    chans[:, :, 3] = px[:, :, 2]
    resid = np.zeros_like(chans)
    for y in range(h):
        for x in range(wd):
            if x == 0 and y == 0:
                pred = np.array([255, 0, 0, 0])
            elif y == 0:
                pred = chans[y, x - 1]
            elif x == 0:
                pred = chans[y - 1, x]
            else:
                pred = chans[y - 1, x]  # mode 2 = T
            resid[y, x] = (chans[y, x] - pred) % 256
    body = WBits()
    body.b(1)       # transform present
    body.b(0, 2)    # predictor transform
    body.b(2, 3)    # size_bits = 2+2 = 4 -> 16-px blocks (one block)
    # sub-image (1x1): literal pixel with mode in green
    body.b(0)       # no cache in sub-image
    sub_px = [[(0, 2, 0)]]  # r=0, g=mode 2, b=0

    def emit_tree_into(w2, freqs, alphabet):
        if len(freqs) == 1:
            s = next(iter(freqs))
            w2.b(1)
            w2.b(0)
            if s < 2:
                w2.b(0)
                w2.b(s, 1)
            else:
                w2.b(1)
                w2.b(s, 8)
            return {s: (0, 0)}
        ln = huffman_lengths(freqs)
        write_prefix(w2, ln, alphabet)
        return canonical_codes(ln)

    sgc = emit_tree_into(body, {2: 1}, 280)
    src = emit_tree_into(body, {0: 1}, 256)
    sbc = emit_tree_into(body, {0: 1}, 256)
    sac = emit_tree_into(body, {255: 1}, 256)
    emit_tree_into(body, {0: 1}, 40)
    _ = sgc, src, sbc, sac  # all zero-bit simple codes
    body.b(0)       # no more transforms
    # main image: the residuals, literal-coded
    body.b(0)       # no cache
    body.b(0)       # no meta
    gf, rf, bf, af = {}, {}, {}, {}
    flat = [
        (int(resid[y, x, 1]), int(resid[y, x, 2]), int(resid[y, x, 3]),
         int(resid[y, x, 0]))
        for y in range(h)
        for x in range(wd)
    ]
    for r, g, b, a in flat:
        gf[g] = gf.get(g, 0) + 1
        rf[r] = rf.get(r, 0) + 1
        bf[b] = bf.get(b, 0) + 1
        af[a] = af.get(a, 0) + 1
    gc = emit_tree_into(body, gf, 280)
    rc = emit_tree_into(body, rf, 256)
    bc = emit_tree_into(body, bf, 256)
    ac = emit_tree_into(body, af, 256)
    emit_tree_into(body, {0: 1}, 40)
    for r, g, b, a in flat:
        for codes, sym in ((gc, g), (rc, r), (bc, b), (ac, a)):
            code, ln = codes[sym]
            body.code(code, ln)
    blob = vp8l_container(body, wd, h)
    dec = decode_webp(blob)
    assert np.array_equal(dec, px)


def test_palette_transform_with_bundling():
    """3-color palette: 2-bit bundled indices (4 per byte), palette
    stored as component deltas."""
    palette_rgb = [(250, 10, 30), (5, 200, 100), (40, 40, 255)]
    h, wd = 3, 6
    idx = [[(x + 2 * y) % 3 for x in range(wd)] for y in range(h)]
    body = WBits()
    body.b(1)       # transform present
    body.b(3, 2)    # color indexing
    body.b(2, 8)    # n_colors - 1
    # palette image (3x1): literal ARGB DELTAS vs previous entry
    deltas = []
    prev = (255, 0, 0, 0)  # a, r, g, b
    for r, g, b in palette_rgb:
        cur = (255, r, g, b)
        deltas.append(tuple((c - p) % 256 for c, p in zip(cur, prev)))
        prev = cur
    body.b(0)  # no cache in palette image

    def emit_tree_into(w2, freqs, alphabet):
        if len(freqs) == 1:
            s = next(iter(freqs))
            w2.b(1)
            w2.b(0)
            if s < 2:
                w2.b(0)
                w2.b(s, 1)
            else:
                w2.b(1)
                w2.b(s, 8)
            return {s: (0, 0)}
        ln = huffman_lengths(freqs)
        write_prefix(w2, ln, alphabet)
        return canonical_codes(ln)

    gf = {}
    rf = {}
    bf = {}
    af = {}
    for a, r, g, b in deltas:
        gf[g] = gf.get(g, 0) + 1
        rf[r] = rf.get(r, 0) + 1
        bf[b] = bf.get(b, 0) + 1
        af[a] = af.get(a, 0) + 1
    gc = emit_tree_into(body, gf, 280)
    rc = emit_tree_into(body, rf, 256)
    bc = emit_tree_into(body, bf, 256)
    ac = emit_tree_into(body, af, 256)
    emit_tree_into(body, {0: 1}, 40)
    for a, r, g, b in deltas:
        for codes, sym in ((gc, g), (rc, r), (bc, b), (ac, a)):
            code, ln = codes[sym]
            body.code(code, ln)
    body.b(0)  # no more transforms
    # main image: packed indices in green; packed width = ceil(6/4)=2
    packed_w = -(-wd // 4)
    packed_rows = []
    for y in range(h):
        row = []
        for bx in range(packed_w):
            byte = 0
            for k in range(4):
                x = bx * 4 + k
                if x < wd:
                    byte |= idx[y][x] << (2 * k)
            row.append(byte)
        packed_rows.append(row)
    body.b(0)  # no cache
    body.b(0)  # no meta
    pf = {}
    for row in packed_rows:
        for v in row:
            pf[v] = pf.get(v, 0) + 1
    pgc = emit_tree_into(body, pf, 280)
    prc = emit_tree_into(body, {0: 1}, 256)
    pbc = emit_tree_into(body, {0: 1}, 256)
    pac = emit_tree_into(body, {255: 1}, 256)
    emit_tree_into(body, {0: 1}, 40)
    _ = prc, pbc, pac
    for row in packed_rows:
        for v in row:
            code, ln = pgc[v]
            body.code(code, ln)
    blob = vp8l_container(body, wd, h)
    dec = decode_webp(blob)
    for y in range(h):
        for x in range(wd):
            assert tuple(dec[y, x]) == palette_rgb[idx[y][x]], (y, x)


def test_product_encoder_roundtrip_and_compression():
    from distcpplus_spark.operators.webp import encode_webp_lossless

    rng = np.random.default_rng(2)
    for h, wd in [(1, 1), (7, 13), (24, 31)]:
        px = rng.integers(0, 256, (h, wd, 3), dtype=np.uint8)
        assert np.array_equal(decode_webp(encode_webp_lossless(px)), px)
    solid = np.full((64, 64, 3), 123, dtype=np.uint8)
    assert len(encode_webp_lossless(solid)) < 100  # vs 12288 raw


def test_multimodal_features_and_resize_from_webp():
    from distcpplus_spark.operators import multimodal as mm
    from distcpplus_spark.operators.webp import encode_webp_lossless

    c = 150
    px = np.full((6, 10, 3), c, dtype=np.uint8)
    f = mm._decode_image(encode_webp_lossless(px))
    assert (f["width"], f["height"], f["channels"]) == (10, 6, 3)
    assert abs(f["mean_luma"] - round(c / 255.0, 6)) < 1e-9
    out = mm._resize_image(encode_webp_lossless(px), 5, 3)
    assert bytes(out[:4]) == b"RIFF" and bytes(out[8:12]) == b"WEBP"
    dec = decode_webp(bytes(out))
    assert dec.shape == (3, 5, 3)
    assert np.all(dec == c)


def test_meta_prefix_groups():
    """Two prefix-code groups selected by a meta image: an 8x1 image
    whose left half uses group 0 (solid red-ish) and right half
    group 1 (solid blue-ish) — group index rides (red<<8)|green of
    the meta pixel."""
    w = WBits()
    w.b(0)        # no transform
    w.b(0)        # no color cache
    w.b(1)        # meta prefix image present
    w.b(0, 3)     # meta_bits = 0+2 = 2 -> 4-px blocks -> meta 2x1
    # meta sub-image (2x1): literal pixels with green = group id
    def emit_tree_into(w2, freqs, alphabet):
        if len(freqs) == 1:
            s = next(iter(freqs))
            w2.b(1)
            w2.b(0)
            if s < 2:
                w2.b(0)
                w2.b(s, 1)
            else:
                w2.b(1)
                w2.b(s, 8)
            return {s: (0, 0)}
        ln = huffman_lengths(freqs)
        write_prefix(w2, ln, alphabet)
        return canonical_codes(ln)

    mgc = emit_tree_into(w, {0: 1, 1: 1}, 280)
    emit_tree_into(w, {0: 1}, 256)      # red = 0
    emit_tree_into(w, {0: 1}, 256)      # blue
    emit_tree_into(w, {255: 1}, 256)    # alpha
    emit_tree_into(w, {0: 1}, 40)       # distance
    for group in (0, 1):
        code, ln = mgc[group]
        w.code(code, ln)
    # two groups of main-image trees: group 0 paints (200,10,20),
    # group 1 paints (30,40,250)
    g0 = []
    for freqs, alpha in [({10: 1}, 280), ({200: 1}, 256), ({20: 1}, 256),
                         ({255: 1}, 256), ({0: 1}, 40)]:
        g0.append(emit_tree_into(w, freqs, alpha))
    g1 = []
    for freqs, alpha in [({40: 1}, 280), ({30: 1}, 256), ({250: 1}, 256),
                         ({255: 1}, 256), ({0: 1}, 40)]:
        g1.append(emit_tree_into(w, freqs, alpha))
    _ = g0, g1  # every tree is single-symbol: zero data bits needed
    blob = vp8l_container(w, 8, 1)
    dec = decode_webp(blob)
    for x in range(4):
        assert tuple(dec[0, x]) == (200, 10, 20), x
    for x in range(4, 8):
        assert tuple(dec[0, x]) == (30, 40, 250), x


def test_huffman_lengths_are_limited():
    """VP8L caps symbol code lengths at 15 (code-length code at 7);
    skewed histograms must trigger the package-merge fallback, and
    the limited code must stay Kraft-tight (decodable)."""
    from distcpplus_spark.operators.webp import _huffman_lengths

    fib = [1, 1]
    while len(fib) < 30:
        fib.append(fib[-1] + fib[-2])
    freqs = {i: f for i, f in enumerate(fib)}
    plain_deep = _huffman_lengths(freqs, limit=64)
    assert max(plain_deep.values()) > 15  # the histogram IS degenerate
    for limit in (15, 7):
        lens = _huffman_lengths(freqs, limit=limit)
        assert set(lens) == set(freqs)
        assert max(lens.values()) <= limit
        assert sum(2 ** (limit - ln) for ln in lens.values()) == 2 ** limit


@pytest.mark.parametrize("seed", [0, 1])
def test_skewed_histogram_roundtrip(seed):
    """The advisor's repro: a Fibonacci-skewed green histogram used
    to build depth-23 codes and an undecodable stream. Encode must
    now round-trip pixel-exact."""
    import numpy as np

    from distcpplus_spark.operators.webp import (
        decode_webp,
        encode_webp_lossless,
    )

    rng = np.random.default_rng(seed)
    fib = [1, 1]
    while len(fib) < 24:
        fib.append(fib[-1] + fib[-2])
    vals = np.repeat(
        np.arange(len(fib), dtype=np.uint8) * 9, fib
    )[:4096]
    rng.shuffle(vals)
    pad = np.zeros(64 * 64, dtype=np.uint8)
    pad[: len(vals)] = vals
    g = pad.reshape(64, 64)
    px = np.stack([np.zeros_like(g), g, np.zeros_like(g)], axis=-1)
    dec = decode_webp(encode_webp_lossless(px))
    assert np.array_equal(dec[:, :, :3], px)


def test_package_merge_property_random_histograms():
    """Property: for arbitrary frequency histograms, the limited
    lengths are within the cap, cover all symbols, satisfy Kraft
    equality (a complete, canonical-codable tree), and never beat
    the unconstrained Huffman cost."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from distcpplus_spark.operators.webp import (
        _huffman_lengths,
        _package_merge_lengths,
    )

    @settings(max_examples=200, deadline=None)
    @given(
        st.lists(
            st.integers(min_value=1, max_value=1 << 30),
            min_size=2,
            max_size=40,
        )
    )
    def check(freq_list):
        freqs = {i: f for i, f in enumerate(freq_list)}
        for limit in (15, 7):
            if len(freqs) > (1 << limit):
                continue
            lens = _huffman_lengths(freqs, limit=limit)
            assert set(lens) == set(freqs)
            assert max(lens.values()) <= limit
            assert sum(
                2 ** (limit - ln) for ln in lens.values()
            ) == 2 ** limit
            opt = _huffman_lengths(freqs, limit=64)
            cost_lim = sum(freqs[s] * lens[s] for s in freqs)
            cost_opt = sum(freqs[s] * opt[s] for s in freqs)
            assert cost_lim >= cost_opt
        # direct package-merge agrees with the dispatch wrapper when
        # the plain tree would overflow
        pm = _package_merge_lengths(freqs, 7)
        assert max(pm.values()) <= 7

    check()
