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

Supported: baseline DCT (SOF0/1) and progressive DCT (SOF2, T.81
Annex G: spectral selection + successive approximation, DC/AC first
and refinement scans, EOB runs), 8-bit AND 12-bit precision (12-bit
decodes to uint16; ``encode_jpeg12_gray`` writes the
medical-imaging grayscale form with self-generated Huffman tables),
1- or 3-component frames, sampling factors that divide the max
factor (4:4:4 / 4:2:2 / 4:2:0), interleaved and single-component
scans, restart intervals, stuffed bytes. Arithmetic coding and
hierarchical raise ValueError so callers can fall back
(``_decode_image`` routes those to the Pillow probe, then the
stub). ``encode_jpeg_progressive`` writes a libjpeg-style scan
script so the decoder's progressive path can be driven end-to-end
without any native codec.

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


def _prepare_planes(px, quality: int, subsampling: str):
    """Shared front half of both encoders: RGB→YCbCr (or grayscale),
    chroma subsampling, MCU-grid padding. Returns (planes, factors,
    quants, h_img, w_img, gray, mcus_x, mcus_y)."""
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
    return planes, factors, quants, h_img, w_img, gray, mcus_x, mcus_y


def _quantize_components(planes, factors, quants):
    """DCT + quantize every 8x8 block of each padded plane, returning
    per-component int64 arrays [blocks_y, blocks_x, 64] in ZIGZAG
    order — the coefficient domain both encoders emit from."""
    out = []
    for plane, q in zip(planes, quants):
        bh, bw = plane.shape[0] // 8, plane.shape[1] // 8
        blocks = plane.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3)
        coef = np.einsum("ux,ijxy,vy->ijuv", _DCT_M, blocks, _DCT_M)
        qz = np.round(coef / q).astype(np.int64).reshape(bh, bw, 64)
        out.append(qz[:, :, ZIGZAG])
    return out


def _frame_headers(
    factors, quants, gray, h_img, w_img, sof_marker: int
) -> bytes:
    """SOI + APP0 + DQT + SOFn + DHT shared by both encoders."""
    qy, qc = quants[0], quants[-1]
    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(
        ">H5sBBBHHBB", 16, b"JFIF\x00", 1, 1, 0, 1, 1, 0, 0
    )  # APP0
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
    ncomp = 1 if gray else 3
    sof = struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h_img, w_img, ncomp)
    for ci in range(ncomp):
        fh, fv = factors[ci]
        qid = 0 if ci == 0 else 1
        sof += struct.pack(">BBB", ci + 1, (fh << 4) | fv, qid)
    out += bytes((0xFF, sof_marker)) + sof

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
    return bytes(out)


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
    (planes, factors, quants, h_img, w_img, gray, mcus_x, mcus_y
     ) = _prepare_planes(px, quality, subsampling)
    qy, qc = quants[0], quants[-1]

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
    ncomp = 1 if gray else 3
    out = bytearray(
        _frame_headers(factors, quants, gray, h_img, w_img, 0xC0)
    )
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


# ------------------------------------------------- progressive encode


def default_scan_script(gray: bool):
    """libjpeg-style progressive scan script (jcparam.c shape): DC
    first with one point-transform bit, AC bands coarse-to-fine, then
    DC and AC refinement passes down to full precision. Each entry is
    (component_indices, Ss, Se, Ah, Al)."""
    if gray:
        return [
            ((0,), 0, 0, 0, 1),
            ((0,), 1, 5, 0, 2),
            ((0,), 6, 63, 0, 2),
            ((0,), 1, 63, 2, 1),
            ((0,), 0, 0, 1, 0),
            ((0,), 1, 63, 1, 0),
        ]
    return [
        ((0, 1, 2), 0, 0, 0, 1),
        ((0,), 1, 5, 0, 2),
        ((2,), 1, 63, 0, 1),
        ((1,), 1, 63, 0, 1),
        ((0,), 6, 63, 0, 2),
        ((0,), 1, 63, 2, 1),
        ((0, 1, 2), 0, 0, 1, 0),
        ((2,), 1, 63, 1, 0),
        ((1,), 1, 63, 1, 0),
        ((0,), 1, 63, 1, 0),
    ]


def _comp_block_grid(h_img, w_img, fh, fv, hmax, vmax):
    """Non-interleaved block-grid dims for a component (T.81 A.2.2):
    ceil of the component's true sample dims over 8 — NOT the padded
    MCU grid."""
    cw = -(-(w_img * fh) // hmax)
    ch = -(-(h_img * fv) // vmax)
    return -(-ch // 8), -(-cw // 8)


def encode_jpeg_progressive(
    px,
    quality: int = 90,
    subsampling: str = "444",
    scans=None,
) -> bytes:
    """Encode as progressive JPEG (SOF2) with spectral selection +
    successive approximation per T.81 Annex G, using the same
    quantization pipeline as the baseline encoder — so a correct
    decoder reconstructs EXACTLY the pixels the baseline stream
    yields for the same quality/subsampling."""
    (planes, factors, quants, h_img, w_img, gray, mcus_x, mcus_y
     ) = _prepare_planes(px, quality, subsampling)
    comps = _quantize_components(planes, factors, quants)
    hmax = max(f[0] for f in factors)
    vmax = max(f[1] for f in factors)
    if scans is None:
        scans = default_scan_script(gray)

    dc_tabs = [_build_codes(DC_LUMA_BITS, DC_LUMA_VALS)] + [
        _build_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)
    ] * (len(comps) - 1)
    ac_tabs = [_build_codes(AC_LUMA_BITS, AC_LUMA_VALS)] + [
        _build_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)
    ] * (len(comps) - 1)

    out = bytearray(
        _frame_headers(factors, quants, gray, h_img, w_img, 0xC2)
    )
    for comp_ids, ss, se, ah, al in scans:
        body = _encode_scan(
            comps, comp_ids, ss, se, ah, al, factors, dc_tabs, ac_tabs,
            h_img, w_img, hmax, vmax, mcus_x, mcus_y,
        )
        sos = struct.pack(">HB", 6 + 2 * len(comp_ids), len(comp_ids))
        for ci in comp_ids:
            tdc = 0 if ci == 0 else 1
            sos += struct.pack(">BB", ci + 1, (tdc << 4) | tdc)
        sos += struct.pack(">BBB", ss, se, (ah << 4) | al)
        out += b"\xff\xda" + sos + body
    out += b"\xff\xd9"
    return bytes(out)


def _encode_scan(
    comps, comp_ids, ss, se, ah, al, factors, dc_tabs, ac_tabs,
    h_img, w_img, hmax, vmax, mcus_x, mcus_y,
):
    """Entropy-code one progressive scan (T.81 G.1.2): DC first /
    refine, AC first / refine with EOB-run accumulation and buffered
    correction bits (the Annex-G flowcharts re-derived, matching
    libjpeg's public jcphuff behavior)."""
    w = _BitWriter()
    if ss == 0:
        if se != 0:
            raise ValueError("DC scan must have Se=0")
        pred = {ci: 0 for ci in comp_ids}

        def emit_dc(ci, by, bx):
            dc = int(comps[ci][by, bx, 0])
            if ah == 0:
                v = dc >> al  # arithmetic shift: the DC point transform
                diff = v - pred[ci]
                pred[ci] = v
                size = _bit_size(diff)
                code, length = dc_tabs[ci][size]
                w.write(code, length)
                if size:
                    bits = diff if diff > 0 else diff + (1 << size) - 1
                    w.write(bits, size)
            else:
                w.write((dc >> al) & 1, 1)

        if len(comp_ids) == 1:
            # single-component scans are non-interleaved (A.2.2)
            ci = comp_ids[0]
            fh, fv = factors[ci]
            bh, bw = _comp_block_grid(h_img, w_img, fh, fv, hmax, vmax)
            for by in range(bh):
                for bx in range(bw):
                    emit_dc(ci, by, bx)
        else:
            for my in range(mcus_y):
                for mx in range(mcus_x):
                    for ci in comp_ids:
                        fh, fv = factors[ci]
                        for by in range(fv):
                            for bx in range(fh):
                                emit_dc(ci, my * fv + by, mx * fh + bx)
        w.pad_to_byte()
        return bytes(w.out)

    # ---- AC scan: single component, non-interleaved (G.1.1.1.1) ----
    # The Annex-K Huffman tables are the sequential-baseline set and
    # define no EOBn symbols beyond EOB0 (0x00), so this encoder ends
    # every end-of-band block with its own EOB0 instead of
    # accumulating cross-block EOB runs — slightly larger output but
    # a fully legal stream any progressive decoder (including the one
    # below, and libjpeg) reads; the DECODER still handles arbitrary
    # EOBn runs from real-world encoders.
    if len(comp_ids) != 1:
        raise ValueError("progressive AC scans are single-component")
    ci = comp_ids[0]
    fh, fv = factors[ci]
    bh, bw = _comp_block_grid(h_img, w_img, fh, fv, hmax, vmax)
    act = ac_tabs[ci]
    for by in range(bh):
        for bx in range(bw):
            blk = comps[ci][by, bx]
            if ah == 0:
                _emit_ac_first(w, act, blk, ss, se, al)
            else:
                _emit_ac_refine(w, act, blk, ss, se, al)
    w.pad_to_byte()
    return bytes(w.out)


def _emit_ac_first(w, act, blk, ss, se, al) -> None:
    run = 0
    for k in range(ss, se + 1):
        v = int(blk[k])
        if v >= 0:
            t = v >> al  # AC point transform truncates toward zero
            bits_src = t
        else:
            t = (-v) >> al
            bits_src = ~t  # one's complement carries the sign
        if t == 0:
            run += 1
            continue
        while run > 15:
            code, length = act[0xF0]
            w.write(code, length)
            run -= 16
        size = t.bit_length()
        code, length = act[(run << 4) | size]
        w.write(code, length)
        w.write(bits_src & ((1 << size) - 1), size)
        run = 0
    if run > 0:  # trailing zeros (or an all-zero band): EOB0
        code, length = act[0x00]
        w.write(code, length)


def _emit_ac_refine(w, act, blk, ss, se, al) -> None:
    absvals = [abs(int(blk[k])) >> al for k in range(ss, se + 1)]
    eob = ss - 1  # index of last NEWLY-significant coefficient
    for k in range(ss, se + 1):
        if absvals[k - ss] == 1:
            eob = k
    run = 0
    pending: list[int] = []  # correction bits since the last symbol
    for k in range(ss, se + 1):
        t = absvals[k - ss]
        if t == 0:
            run += 1
            continue
        # ZRLs are only needed up to the last new coefficient; runs
        # beyond it fold into the EOB
        while run > 15 and k <= eob:
            code, length = act[0xF0]
            w.write(code, length)
            run -= 16
            for b in pending:
                w.write(b, 1)
            pending = []
        if t > 1:  # history coefficient: just queue its next bit
            pending.append(t & 1)
            continue
        # newly-significant coefficient (magnitude exactly 1 here)
        code, length = act[(run << 4) | 1]
        w.write(code, length)
        run = 0
        w.write(1 if int(blk[k]) >= 0 else 0, 1)
        for b in pending:
            w.write(b, 1)
        pending = []
    if run > 0 or pending:
        code, length = act[0x00]  # EOB0 + this block's correction bits
        w.write(code, length)
        for b in pending:
            w.write(b, 1)


# ---------------------------------------------------------------- decode




def _next_marker(content: bytes, pos: int) -> int:
    """Advance past any entropy-data remainder to the next real
    marker (skipping stuffed FF00 and RSTn)."""
    n = len(content)
    while pos + 1 < n:
        if content[pos] == 0xFF:
            nxt = content[pos + 1]
            if nxt == 0x00 or 0xD0 <= nxt <= 0xD7:
                pos += 2
                continue
            if nxt == 0xFF:  # fill byte
                pos += 1
                continue
            return pos
        pos += 1
    return n


def _receive_extend(reader: "_BitReader", size: int) -> int:
    v = reader.read_bits(size)
    if v < (1 << (size - 1)):
        v -= (1 << size) - 1
    return v


def _decode_block_full(reader, blk, dct, act, pred, ci) -> None:
    """Sequential-baseline block decode (T.81 F.2): DC diff + AC
    run-length, written into the zigzag-order coefficient view."""
    size = reader.decode_symbol(dct)
    v = _receive_extend(reader, size) if size else 0
    pred[ci] += v
    blk[0] = pred[ci]
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
        blk[k] = _receive_extend(reader, size)
        k += 1


def _decode_ac_first(reader, blk, ss, se, al, act, eobrun) -> None:
    """Progressive AC first scan for one block (T.81 G.2, libjpeg
    decode_mcu_AC_first shape): run/size symbols place new
    coefficients at magnitude << Al; EOBn symbols start a run of
    end-of-band blocks."""
    if eobrun[0] > 0:
        eobrun[0] -= 1
        return
    k = ss
    while k <= se:
        sym = reader.decode_symbol(act)
        r, s = sym >> 4, sym & 0x0F
        if s:
            k += r
            if k > se:
                raise ValueError("AC run past band end")
            blk[k] = _receive_extend(reader, s) << al
            k += 1
        else:
            if r != 15:
                eobrun[0] = (1 << r) - 1  # this block joins the run
                if r:
                    eobrun[0] += reader.read_bits(r)
                return
            k += 16  # ZRL


def _decode_ac_refine(reader, blk, ss, se, al, act, eobrun) -> None:
    """Progressive AC refinement for one block (T.81 G.2 / figure
    G.7): newly-significant coefficients arrive as ±1<<Al; every
    already-nonzero coefficient consumes a correction bit — including
    inside EOB runs."""
    p1 = 1 << al
    m1 = -p1
    k = ss
    if eobrun[0] == 0:
        while k <= se:
            sym = reader.decode_symbol(act)
            r, s = sym >> 4, sym & 0x0F
            if s:
                # size is always 1 in a refinement scan
                v = p1 if reader.read_bits(1) else m1
            else:
                if r != 15:
                    eobrun[0] = 1 << r
                    if r:
                        eobrun[0] += reader.read_bits(r)
                    break  # rest of block handled by the EOB logic
                v = 0  # ZRL: skip 16 zero-history positions
            # advance over history coefficients (correction bit each)
            # and r zero-history positions
            while k <= se:
                c = int(blk[k])
                if c != 0:
                    if reader.read_bits(1) and (c & p1) == 0:
                        blk[k] = c + (p1 if c >= 0 else m1)
                else:
                    r -= 1
                    if r < 0:
                        break  # reached the target zero position
                k += 1
            if s and k <= se:
                blk[k] = v
            k += 1
    if eobrun[0] > 0:
        # correction bits for the remaining positions of this block
        while k <= se:
            c = int(blk[k])
            if c != 0:
                if reader.read_bits(1) and (c & p1) == 0:
                    blk[k] = c + (p1 if c >= 0 else m1)
            k += 1
        eobrun[0] -= 1


def _decode_scan(
    reader, comps, sel_order, coefs, frame, ss, se, ah, al,
    huff_dc, huff_ac, restart_interval, progressive,
):
    """Drive one scan's entropy decode over its MCU walk. sel_order
    is [(comp_index, dc_table_id, ac_table_id)] in scan order;
    interleaved iff it has more than one component (A.2.2-3)."""
    h_img, w_img = frame["h"], frame["w"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = (w_img + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (h_img + 8 * vmax - 1) // (8 * vmax)
    pred = [0] * len(comps)
    eobrun = [0]

    def do_block(ci, td, ta, by, bx):
        blk = coefs[ci][by, bx]
        if not progressive:
            _decode_block_full(
                reader, blk, huff_dc[td], huff_ac[ta], pred, ci
            )
        elif ss == 0 and ah == 0:  # DC first
            size = reader.decode_symbol(huff_dc[td])
            v = _receive_extend(reader, size) if size else 0
            pred[ci] += v
            blk[0] = pred[ci] << al
        elif ss == 0:  # DC refinement: one raw bit per block
            if reader.read_bits(1):
                blk[0] |= 1 << al
        elif ah == 0:
            _decode_ac_first(reader, blk, ss, se, al, huff_ac[ta], eobrun)
        else:
            _decode_ac_refine(reader, blk, ss, se, al, huff_ac[ta], eobrun)

    unit_count = 0

    def maybe_restart():
        nonlocal unit_count, pred
        if restart_interval and unit_count and (
            unit_count % restart_interval == 0
        ):
            reader.sync_restart()
            pred[:] = [0] * len(comps)
            eobrun[0] = 0
        unit_count += 1

    if len(sel_order) == 1:
        ci, td, ta = sel_order[0]
        c = comps[ci]
        bh, bw = _comp_block_grid(
            h_img, w_img, c["h"], c["v"], hmax, vmax
        )
        for by in range(bh):
            for bx in range(bw):
                maybe_restart()
                do_block(ci, td, ta, by, bx)
    else:
        for my in range(mcus_y):
            for mx in range(mcus_x):
                maybe_restart()
                for ci, td, ta in sel_order:
                    c = comps[ci]
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            do_block(
                                ci, td, ta,
                                my * c["v"] + by, mx * c["h"] + bx,
                            )


def decode_jpeg(content: bytes):
    """Decode a baseline (SOF0/1) or progressive (SOF2) JFIF JPEG →
    HxWx3 uint8 RGB (HxW for a 1-component frame). Raises ValueError
    on arithmetic/hierarchical/lossless/12-bit streams so callers can
    fall back."""
    if content is None or content[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    pos = 2
    quant = {}
    huff_dc = {}
    huff_ac = {}
    frame = None
    progressive = False
    restart_interval = 0
    coefs = None
    got_scan = False
    n = len(content)
    while pos + 2 <= n:
        if content[pos] != 0xFF:
            raise ValueError(f"bad marker alignment at {pos}")
        while pos + 1 < n and content[pos + 1] == 0xFF:
            pos += 1  # fill bytes
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
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 prog
            progressive = marker == 0xC2
            prec, h_img, w_img, ncomp = struct.unpack_from(">BHHB", body, 0)
            if prec not in (8, 12):
                raise ValueError(f"unsupported precision {prec}")
            comps = []
            for ci in range(ncomp):
                cid, hv, tq = struct.unpack_from(">BBB", body, 6 + 3 * ci)
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq}
                )
            frame = {"h": h_img, "w": w_img, "comps": comps,
                     "prec": prec}
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError(f"unsupported SOF marker 0xFF{marker:02X}")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            comps = frame["comps"]
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            for c in comps:
                if (c["h"] <= 0 or c["v"] <= 0 or hmax % c["h"]
                        or vmax % c["v"]):
                    raise ValueError("unsupported sampling factors")
            if coefs is None:
                mcus_x = (frame["w"] + 8 * hmax - 1) // (8 * hmax)
                mcus_y = (frame["h"] + 8 * vmax - 1) // (8 * vmax)
                coefs = [
                    np.zeros(
                        (mcus_y * c["v"], mcus_x * c["h"], 64),
                        dtype=np.int32,
                    )
                    for c in comps
                ]
            ns = body[0]
            id_to_idx = {c["id"]: i for i, c in enumerate(comps)}
            sel_order = []
            for i in range(ns):
                cs, tables = struct.unpack_from(">BB", body, 1 + 2 * i)
                sel_order.append(
                    (id_to_idx[cs], tables >> 4, tables & 0x0F)
                )
            ss = body[1 + 2 * ns]
            se = body[2 + 2 * ns]
            ahal = body[3 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0x0F
            if not progressive:
                ss, se, ah, al = 0, 63, 0, 0
            reader = _BitReader(content, seg_end)
            _decode_scan(
                reader, comps, sel_order, coefs, frame, ss, se, ah, al,
                huff_dc, huff_ac, restart_interval, progressive,
            )
            got_scan = True
            pos = _next_marker(content, reader.pos)
        # APPn/COM/other: skipped via seg_len
    if frame is None or not got_scan:
        raise ValueError("missing SOF/SOS")

    comps = frame["comps"]
    h_img, w_img = frame["h"], frame["w"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    # dequantize + IDCT, vectorized over all blocks of each component
    planes = []
    for c, zz in zip(comps, coefs):
        by, bx = zz.shape[0], zz.shape[1]
        nat = np.zeros_like(zz)
        nat[:, :, ZIGZAG] = zz
        blocks = nat.reshape(by, bx, 8, 8).astype(np.float64)
        blocks *= quant[c["tq"]]
        # f = M^T F M for every block
        spat = np.einsum("ux,ijuv,vy->ijxy", _DCT_M, blocks, _DCT_M)
        planes.append(
            spat.transpose(0, 2, 1, 3).reshape(by * 8, bx * 8)
        )
    # upsample to full MCU-grid resolution, crop, color-convert
    prec = frame.get("prec", 8)
    mid = float(1 << (prec - 1))
    vmax_px = float((1 << prec) - 1)
    dtype = np.uint8 if prec == 8 else np.uint16
    full = []
    for plane, c in zip(planes, comps):
        rh, rw = vmax // c["v"], hmax // c["h"]
        if rh > 1 or rw > 1:
            plane = plane.repeat(rh, axis=0).repeat(rw, axis=1)
        full.append(plane[:h_img, :w_img] + mid)
    if len(full) == 1:
        return np.clip(np.round(full[0]), 0, vmax_px).astype(dtype)
    y, cb, cr = full[0], full[1] - mid, full[2] - mid
    r = y + 1.402 * cr
    g = y - 0.344136286 * cb - 0.714136286 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, vmax_px).astype(dtype)


# ------------------------------------------- 12-bit grayscale encode

# Annex-K tables only cover 8-bit categories, so the 12-bit encoder
# carries its own flat canonical tables: DC categories 0..16 at five
# bits, AC (run, size 1..15) + EOB + ZRL at eight bits — legal DHT
# payloads any conforming decoder reads (sizes beyond T.81's 12-bit
# nominal maxima only occur for unit quant steps on full-range
# blocks; our decoder reads them fine).
DC12_BITS = [0, 0, 0, 0, 17, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
DC12_VALS = list(range(17))
AC12_BITS = [0, 0, 0, 0, 0, 0, 0, 242, 0, 0, 0, 0, 0, 0, 0, 0]
AC12_VALS = [0x00, 0xF0] + [
    (r << 4) | s for r in range(16) for s in range(1, 16)
]


def encode_jpeg12_gray(px, quality: int = 95) -> bytes:
    """Encode an HxW uint16 (0..4095) array as a 12-bit grayscale
    baseline JPEG — the medical/scientific imaging norm. Same DCT +
    quant pipeline as the 8-bit path with a 2048 level shift."""
    px = np.asarray(px)
    if px.ndim != 2:
        raise ValueError("12-bit encoder is grayscale-only")
    h_img, w_img = px.shape
    if h_img == 0 or w_img == 0:
        raise ValueError("empty image")
    qy, _ = scaled_quant_tables(quality)
    plane = px.astype(np.float64) - 2048.0
    bh, bw = -(-h_img // 8), -(-w_img // 8)
    plane = np.pad(
        plane, ((0, bh * 8 - h_img), (0, bw * 8 - w_img)), "edge"
    )
    dct = _build_codes(DC12_BITS, DC12_VALS)
    act = _build_codes(AC12_BITS, AC12_VALS)
    w = _BitWriter()
    pred = 0
    for by in range(bh):
        for bx in range(bw):
            block = plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
            coef = _DCT_M @ block @ _DCT_M.T
            qz = np.round(coef / qy).astype(np.int64)
            zz = [int(qz.flat[ZIGZAG[k]]) for k in range(64)]
            diff = zz[0] - pred
            pred = zz[0]
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
                    code, length = act[0xF0]
                    w.write(code, length)
                    run -= 16
                size = _bit_size(v)
                code, length = act[(run << 4) | size]
                w.write(code, length)
                bits = v if v > 0 else v + (1 << size) - 1
                w.write(bits, size)
                run = 0
            if run:
                code, length = act[0x00]
                w.write(code, length)
    w.pad_to_byte()

    out = bytearray(b"\xff\xd8")
    zz_q = bytes(int(qy.flat[ZIGZAG[k]]) for k in range(64))
    out += b"\xff\xdb" + struct.pack(">HB", 2 + 65, 0x00) + zz_q
    out += b"\xff\xc0" + struct.pack(
        ">HBHHBBBB", 11, 12, h_img, w_img, 1, 1, 0x11, 0
    )
    tables = (
        struct.pack(">B", 0x00) + bytes(DC12_BITS) + bytes(DC12_VALS)
        + struct.pack(">B", 0x10) + bytes(AC12_BITS) + bytes(AC12_VALS)
    )
    out += b"\xff\xc4" + struct.pack(">H", 2 + len(tables)) + tables
    out += b"\xff\xda" + struct.pack(">HBBBBBB", 8, 1, 1, 0x00, 0, 63, 0)
    out += w.out
    out += b"\xff\xd9"
    return bytes(out)
