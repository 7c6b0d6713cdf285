"""Baseline JFIF (ITU-T T.81) codec in pure numpy — no native libs.

The container ships no codec library (PIL/libjpeg absent), so the
multimodal image path implements baseline sequential JPEG by hand the
same way BMP/PNG were: everything here derives from the public JPEG
spec (ITU-T T.81: marker syntax §B, Huffman entropy coding §C/§F,
Annex K reference quantization + Huffman tables) and standard
textbook DCT math. The reference engine has no JPEG analogue
(DefaultCopyFilesMapper.java:141-160 treats content as opaque bytes);
this closes the north-star training-data-pipeline gap flagged by the
round-5 review.

Supported: baseline DCT (SOF0), 8-bit, 1- or 3-component scans,
sampling factors that divide the max factor (4:4:4 / 4:2:2 / 4:2:0),
restart intervals, stuffed bytes. Progressive (SOF2) and arithmetic
coding raise ValueError so callers can fall back (``_decode_image``
routes those to the Pillow probe, then the stub).

Scale shape: this module is called per-row inside Arrow-batched
``mapInPandas`` (operators/multimodal.py) — pure-Python entropy
decode is the honest cost of a codec-less container and is confined
to executors; the distributed plan (binaryFile scan → mapInPandas →
features) is identical to what a libjpeg-backed decode would use, so
swapping in PIL when present changes per-row CPU only.
"""

from __future__ import annotations

import struct

import numpy as np

# --- Annex K reference tables (ITU-T T.81, public spec) ---

QUANT_LUMA = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.int32,
)

QUANT_CHROMA = np.array(
    [
        [17, 18, 24, 47, 99, 99, 99, 99],
        [18, 21, 26, 66, 99, 99, 99, 99],
        [24, 26, 56, 99, 99, 99, 99, 99],
        [47, 66, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
    ],
    dtype=np.int32,
)

# (bits-per-length[1..16], symbol values) — Annex K.3
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))

AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]

# zig-zag scan order: k-th entry is the row-major index of the k-th
# coefficient (T.81 Figure 5)
ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
]

# orthonormal 8-point DCT-II basis: F = M @ f @ M.T, f = M.T @ F @ M
_DCT_M = np.zeros((8, 8))
for _u in range(8):
    _c = (1.0 / np.sqrt(2.0)) if _u == 0 else 1.0
    for _x in range(8):
        _DCT_M[_u, _x] = 0.5 * _c * np.cos((2 * _x + 1) * _u * np.pi / 16.0)


def scaled_quant_tables(quality: int):
    """Annex-K tables scaled by the de-facto-standard IJG quality
    formula (public libjpeg behavior): scale=5000/q below 50 else
    200-2q; entry = clamp((base*scale+50)//100, 1, 255)."""
    q = min(max(int(quality), 1), 100)
    scale = 5000 // q if q < 50 else 200 - 2 * q
    tabs = []
    for base in (QUANT_LUMA, QUANT_CHROMA):
        t = (base * scale + 50) // 100
        tabs.append(np.clip(t, 1, 255).astype(np.int32))
    return tabs[0], tabs[1]


def _build_codes(bits, vals):
    """Canonical Huffman codes from a (BITS, HUFFVAL) spec →
    {symbol: (code, length)} (T.81 §C.2)."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _build_decode_map(bits, vals):
    """{(length, code): symbol} for bit-serial Huffman decode."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return out


class _BitWriter:
    """MSB-first bit accumulator with 0xFF byte stuffing (§B.1.1.5)."""

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.nbits -= 8
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)

    def pad_to_byte(self) -> None:
        if self.nbits:
            self.write(0x7F, 8 - self.nbits)  # pad with 1-bits


class _BitReader:
    """MSB-first bit reader over entropy-coded data: un-stuffs FF00,
    stops at markers, byte-aligns across restart boundaries."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        d = self.data
        if self.pos >= len(d):
            raise ValueError("truncated entropy data")
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:
                raise ValueError("hit restart marker mid-symbol")
            else:
                # real marker (EOI/next segment): spec allows decoder
                # to feed 1-bits past the data; surface as truncation
                raise ValueError("hit marker in entropy data")
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read_bits(self, n: int) -> int:
        while self.nbits < n:
            self._fill()
        v = (self.acc >> (self.nbits - n)) & ((1 << n) - 1)
        self.nbits -= n
        return v

    def decode_symbol(self, table) -> int:
        length = 0
        code = 0
        while length < 16:
            code = (code << 1) | self.read_bits(1)
            length += 1
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("bad Huffman code")

    def sync_restart(self) -> None:
        """Byte-align and consume an RSTn marker (§E.2.4)."""
        self.nbits = 0
        self.acc = 0
        d = self.data
        while self.pos + 1 < len(d):
            if d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1
        raise ValueError("missing restart marker")


def _bit_size(v: int) -> int:
    return int(abs(v)).bit_length()


# ---------------------------------------------------------------- encode


def encode_jpeg(
    px,
    quality: int = 90,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """Encode an HxWx3 uint8 RGB array (or HxW grayscale) as a
    baseline JFIF JPEG with Annex-K Huffman tables.

    ``subsampling``: "444" (no chroma subsampling) or "420" (2x2
    chroma average — the common photographic layout). Grayscale input
    emits a 1-component scan.
    """
    px = np.asarray(px, dtype=np.uint8)
    gray = px.ndim == 2
    h_img, w_img = px.shape[:2]
    if h_img == 0 or w_img == 0:
        raise ValueError("empty image")
    qy, qc = scaled_quant_tables(quality)

    if gray:
        ycc = [px.astype(np.float64) - 128.0]
        factors = [(1, 1)]
        quants = [qy]
    else:
        r = px[:, :, 0].astype(np.float64)
        g = px[:, :, 1].astype(np.float64)
        b = px[:, :, 2].astype(np.float64)
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 - 0.168735892 * r - 0.331264108 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418687589 * g - 0.081312411 * b
        if subsampling == "444":
            ycc = [y - 128.0, cb - 128.0, cr - 128.0]
            factors = [(1, 1), (1, 1), (1, 1)]
        elif subsampling == "420":
            # pad to even dims (edge replicate), then 2x2 box average
            he, we = (h_img + 1) & ~1, (w_img + 1) & ~1
            def _pad_even(p):
                return np.pad(p, ((0, he - h_img), (0, we - w_img)), "edge")
            cbe, cre = _pad_even(cb), _pad_even(cr)
            cb2 = cbe.reshape(he // 2, 2, we // 2, 2).mean(axis=(1, 3))
            cr2 = cre.reshape(he // 2, 2, we // 2, 2).mean(axis=(1, 3))
            ycc = [y - 128.0, cb2 - 128.0, cr2 - 128.0]
            factors = [(2, 2), (1, 1), (1, 1)]
        else:
            raise ValueError(f"unsupported subsampling {subsampling!r}")
        quants = [qy, qc, qc]

    hmax = max(f[0] for f in factors)
    vmax = max(f[1] for f in factors)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = (w_img + mcu_w - 1) // mcu_w
    mcus_y = (h_img + mcu_h - 1) // mcu_h

    # pad each component plane (edge replicate) to its MCU-grid size
    planes = []
    for plane, (fh, fv) in zip(ycc, factors):
        ph, pw = mcus_y * fv * 8, mcus_x * fh * 8
        planes.append(
            np.pad(
                plane,
                ((0, ph - plane.shape[0]), (0, pw - plane.shape[1])),
                "edge",
            )
        )

    dc_y = _build_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_y = _build_codes(AC_LUMA_BITS, AC_LUMA_VALS)
    dc_c = _build_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)
    ac_c = _build_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)
    huffs = [(dc_y, ac_y)] + [(dc_c, ac_c)] * (len(planes) - 1)

    w = _BitWriter()
    pred = [0] * len(planes)
    mcu_count = 0
    rst_idx = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                w.pad_to_byte()
                w.out.append(0xFF)
                w.out.append(0xD0 + rst_idx)
                rst_idx = (rst_idx + 1) % 8
                pred = [0] * len(planes)
            mcu_count += 1
            for ci, (plane, (fh, fv), q, (dct, act)) in enumerate(
                zip(planes, factors, quants, huffs)
            ):
                for by in range(fv):
                    for bx in range(fh):
                        y0 = (my * fv + by) * 8
                        x0 = (mx * fh + bx) * 8
                        block = plane[y0 : y0 + 8, x0 : x0 + 8]
                        coef = _DCT_M @ block @ _DCT_M.T
                        qz = np.round(coef / q).astype(np.int64)
                        zz = [int(qz.flat[ZIGZAG[k]]) for k in range(64)]
                        diff = zz[0] - pred[ci]
                        pred[ci] = zz[0]
                        size = _bit_size(diff)
                        code, length = dct[size]
                        w.write(code, length)
                        if size:
                            bits = diff if diff > 0 else diff + (1 << size) - 1
                            w.write(bits, size)
                        run = 0
                        for k in range(1, 64):
                            v = zz[k]
                            if v == 0:
                                run += 1
                                continue
                            while run > 15:
                                code, length = act[0xF0]  # ZRL
                                w.write(code, length)
                                run -= 16
                            size = _bit_size(v)
                            code, length = act[(run << 4) | size]
                            w.write(code, length)
                            bits = v if v > 0 else v + (1 << size) - 1
                            w.write(bits, size)
                            run = 0
                        if run:
                            code, length = act[0x00]  # EOB
                            w.write(code, length)
    w.pad_to_byte()

    # --- assemble the marker stream ---
    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(
        ">H5sBBBHHBB", 16, b"JFIF\x00", 1, 1, 0, 1, 1, 0, 0
    )  # APP0
    # DQT (both tables in one segment; 8-bit precision)
    zz_y = bytes(int(qy.flat[ZIGZAG[k]]) for k in range(64))
    zz_c = bytes(int(qc.flat[ZIGZAG[k]]) for k in range(64))
    if gray:
        out += b"\xff\xdb" + struct.pack(">HB", 2 + 65, 0x00) + zz_y
    else:
        out += (
            b"\xff\xdb"
            + struct.pack(">HB", 2 + 2 * 65, 0x00) + zz_y
            + struct.pack(">B", 0x01) + zz_c
        )
    # SOF0
    ncomp = 1 if gray else 3
    sof = struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h_img, w_img, ncomp)
    for ci in range(ncomp):
        fh, fv = factors[ci]
        qid = 0 if ci == 0 else 1
        sof += struct.pack(">BBB", ci + 1, (fh << 4) | fv, qid)
    out += b"\xff\xc0" + sof
    # DHT (all needed tables in one segment)
    def _dht(tc_th, bits, vals):
        return struct.pack(">B", tc_th) + bytes(bits) + bytes(vals)

    tables = _dht(0x00, DC_LUMA_BITS, DC_LUMA_VALS) + _dht(
        0x10, AC_LUMA_BITS, AC_LUMA_VALS
    )
    if not gray:
        tables += _dht(0x01, DC_CHROMA_BITS, DC_CHROMA_VALS) + _dht(
            0x11, AC_CHROMA_BITS, AC_CHROMA_VALS
        )
    out += b"\xff\xc4" + struct.pack(">H", 2 + len(tables)) + tables
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    # SOS
    sos = struct.pack(">HB", 6 + 2 * ncomp, ncomp)
    for ci in range(ncomp):
        sos += struct.pack(">BB", ci + 1, 0x00 if ci == 0 else 0x11)
    sos += struct.pack(">BBB", 0, 63, 0)
    out += b"\xff\xda" + sos
    out += w.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------- decode


def decode_jpeg(content: bytes):
    """Decode a baseline JFIF JPEG → HxWx3 uint8 RGB (HxW for a
    1-component scan). Raises ValueError on progressive/arithmetic/
    12-bit streams so callers can fall back."""
    if content is None or content[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    pos = 2
    quant = {}
    huff_dc = {}
    huff_ac = {}
    frame = None
    restart_interval = 0
    scan = None
    n = len(content)
    while pos + 4 <= n:
        if content[pos] != 0xFF:
            raise ValueError(f"bad marker alignment at {pos}")
        marker = content[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue  # standalone markers
        (seg_len,) = struct.unpack_from(">H", content, pos)
        body = content[pos + 2 : pos + seg_len]
        seg_end = pos + seg_len
        pos = seg_end
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(body):
                pq, tq = body[p] >> 4, body[p] & 0x0F
                p += 1
                if pq == 0:
                    vals = list(body[p : p + 64])
                    p += 64
                else:
                    vals = [
                        struct.unpack_from(">H", body, p + 2 * i)[0]
                        for i in range(64)
                    ]
                    p += 128
                t = np.zeros(64, dtype=np.int32)
                for k in range(64):
                    t[ZIGZAG[k]] = vals[k]
                quant[tq] = t.reshape(8, 8)
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(body):
                tc, th = body[p] >> 4, body[p] & 0x0F
                bits = list(body[p + 1 : p + 17])
                nvals = sum(bits)
                vals = list(body[p + 17 : p + 17 + nvals])
                p += 17 + nvals
                table = _build_decode_map(bits, vals)
                if tc == 0:
                    huff_dc[th] = table
                else:
                    huff_ac[th] = table
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            prec, h_img, w_img, ncomp = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise ValueError(f"unsupported precision {prec}")
            comps = []
            for ci in range(ncomp):
                cid, hv, tq = struct.unpack_from(">BBB", body, 6 + 3 * ci)
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq}
                )
            frame = {"h": h_img, "w": w_img, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError(f"unsupported SOF marker 0xFF{marker:02X}")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS — entropy data follows
            ns = body[0]
            sel = {}
            for i in range(ns):
                cs, tables = struct.unpack_from(">BB", body, 1 + 2 * i)
                sel[cs] = (tables >> 4, tables & 0x0F)
            scan = (sel, seg_end)
            break
        # APPn/COM/other: skipped via seg_len
    if frame is None or scan is None:
        raise ValueError("missing SOF/SOS")
    sel, data_pos = scan
    comps = frame["comps"]
    h_img, w_img = frame["h"], frame["w"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    for c in comps:
        if c["h"] <= 0 or c["v"] <= 0 or hmax % c["h"] or vmax % c["v"]:
            raise ValueError("unsupported sampling factors")
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = (w_img + mcu_w - 1) // mcu_w
    mcus_y = (h_img + mcu_h - 1) // mcu_h

    planes = [
        np.zeros((mcus_y * c["v"] * 8, mcus_x * c["h"] * 8), dtype=np.float64)
        for c in comps
    ]
    reader = _BitReader(content, data_pos)
    pred = [0] * len(comps)
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                reader.sync_restart()
                pred = [0] * len(comps)
            mcu_count += 1
            for ci, c in enumerate(comps):
                dct = huff_dc[sel[c["id"]][0]]
                act = huff_ac[sel[c["id"]][1]]
                q = quant[c["tq"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zz = np.zeros(64, dtype=np.int64)
                        size = reader.decode_symbol(dct)
                        if size:
                            v = reader.read_bits(size)
                            if v < (1 << (size - 1)):
                                v -= (1 << size) - 1
                        else:
                            v = 0
                        pred[ci] += v
                        zz[0] = pred[ci]
                        k = 1
                        while k < 64:
                            sym = reader.decode_symbol(act)
                            if sym == 0x00:  # EOB
                                break
                            if sym == 0xF0:  # ZRL
                                k += 16
                                continue
                            run, size = sym >> 4, sym & 0x0F
                            k += run
                            if k > 63:
                                raise ValueError("AC run past block end")
                            v = reader.read_bits(size)
                            if v < (1 << (size - 1)):
                                v -= (1 << size) - 1
                            zz[k] = v
                            k += 1
                        coef = np.zeros((8, 8))
                        for kk in range(64):
                            coef.flat[ZIGZAG[kk]] = zz[kk]
                        block = _DCT_M.T @ (coef * q) @ _DCT_M
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = block
    # upsample to full MCU-grid resolution, crop, color-convert
    full = []
    for plane, c in zip(planes, comps):
        rh, rw = vmax // c["v"], hmax // c["h"]
        if rh > 1 or rw > 1:
            plane = plane.repeat(rh, axis=0).repeat(rw, axis=1)
        full.append(plane[:h_img, :w_img] + 128.0)
    if len(full) == 1:
        return np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136286 * cb - 0.714136286 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
