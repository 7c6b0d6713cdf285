"""FLAC codec in pure Python/numpy — no native libs.

Everything here derives from the public FLAC specification (RFC
9639): STREAMINFO metadata, frame headers (UTF-8-coded frame index,
CRC-8), subframe types CONSTANT / VERBATIM / FIXED(0-4) / LPC,
rice-coded residual partitions (both 4- and 5-bit parameter
methods, escape partitions), stereo decorrelation (left/side,
right/side, mid/side), and frame CRC-16. The decoder covers 8/16/24
bit streams; the encoder writes 16-bit fixed-blocksize streams with
FIXED-order-2 subframes, a single rice partition, and per-frame
left/side stereo decorrelation when the side channel is cheaper —
a legal stream any FLAC decoder reads.

FLAC is lossless, so decode(encode(x)) == x EXACTLY — the strongest
round-trip contract any codec here offers — and the hand-assembled
spec fixtures in tests/test_flac.py pin the bit-level details
independently of the encoder.

Scale shape: like every codec in this engine, the entropy work runs
per-row inside Arrow-batched mapInPandas (operators/multimodal.py);
the distributed plan is identical to a libFLAC-backed pipeline.

The reference engine treats audio as opaque bytes
(DefaultCopyFilesMapper.java:141-160); this extends the
training-data-pipeline surface the same way the JPEG codec did.
"""

from __future__ import annotations

import struct


# ----------------------------------------------------------- CRCs

def _crc8(data: bytes) -> int:
    """CRC-8, polynomial x^8+x^2+x+1 (0x07), init 0 (RFC 9639)."""
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    """CRC-16, polynomial x^16+x^15+x^2+1 (0x8005), init 0."""
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = (
                ((crc << 1) ^ 0x8005) & 0xFFFF
                if crc & 0x8000
                else (crc << 1) & 0xFFFF
            )
    return crc


# ----------------------------------------------------- bit plumbing

class _BitReader:
    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.bytepos = pos
        self.bitpos = 0

    def read(self, n: int) -> int:
        v = 0
        while n > 0:
            if self.bytepos >= len(self.data):
                raise ValueError("truncated FLAC stream")
            avail = 8 - self.bitpos
            take = min(n, avail)
            byte = self.data[self.bytepos]
            v = (v << take) | (
                (byte >> (avail - take)) & ((1 << take) - 1)
            )
            self.bitpos += take
            if self.bitpos == 8:
                self.bitpos = 0
                self.bytepos += 1
            n -= take
        return v

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v & (1 << (n - 1)) else v

    def read_unary(self) -> int:
        """n zero bits terminated by a one bit → n."""
        n = 0
        while self.read(1) == 0:
            n += 1
        return n

    def align(self) -> None:
        if self.bitpos:
            self.bitpos = 0
            self.bytepos += 1


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, v: int, n: int) -> None:
        self.acc = (self.acc << n) | (v & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.out.append((self.acc >> (self.nbits - 8)) & 0xFF)
            self.nbits -= 8

    def write_unary(self, n: int) -> None:
        while n >= 32:
            self.write(0, 32)
            n -= 32
        self.write(1, n + 1)  # n zeros then a one

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)


def _utf8_number(n: int) -> bytes:
    """FLAC's extended-UTF-8 coding of frame/sample numbers."""
    if n < 0x80:
        return bytes((n,))
    out = []
    marks = [(0x7FF, 0xC0, 1), (0xFFFF, 0xE0, 2), (0x1FFFFF, 0xF0, 3),
             (0x3FFFFFF, 0xF8, 4), (0x7FFFFFFF, 0xFC, 5)]
    for lim, lead, cont in marks:
        if n <= lim:
            out.append(lead | (n >> (6 * cont)))
            for i in range(cont - 1, -1, -1):
                out.append(0x80 | ((n >> (6 * i)) & 0x3F))
            return bytes(out)
    raise ValueError("frame number too large")


def _read_utf8_number(r: _BitReader) -> int:
    b0 = r.read(8)
    if b0 < 0x80:
        return b0
    n_cont = 0
    mask = 0x40
    while b0 & mask:
        n_cont += 1
        mask >>= 1
    v = b0 & (mask - 1)
    for _ in range(n_cont):
        c = r.read(8)
        if c & 0xC0 != 0x80:
            raise ValueError("bad UTF-8 frame number")
        v = (v << 6) | (c & 0x3F)
    return v


_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}

_BLOCKSIZE_CODES = {192: 1, 576: 2, 1152: 3, 2304: 4, 4608: 5,
                    256: 8, 512: 9, 1024: 10, 2048: 11, 4096: 12,
                    8192: 13, 16384: 14, 32768: 15}


# ----------------------------------------------------------- decode

def decode_flac(content: bytes):
    """Decode a FLAC stream → (sample_rate, channels, bits, samples
    ndarray [n, channels] int32). Raises ValueError on non-FLAC or
    structurally bad streams (CRC-8 of every frame header is
    verified)."""
    import numpy as np

    if content[:4] != b"fLaC":
        raise ValueError("not a FLAC stream")
    pos = 4
    streaminfo = None
    while True:
        hdr = content[pos : pos + 4]
        if len(hdr) < 4:
            raise ValueError("truncated metadata")
        last = hdr[0] >> 7
        btype = hdr[0] & 0x7F
        (blen,) = struct.unpack(">I", b"\x00" + hdr[1:4])
        body = content[pos + 4 : pos + 4 + blen]
        pos += 4 + blen
        if btype == 0:  # STREAMINFO
            r = _BitReader(body)
            r.read(16)  # min block
            r.read(16)  # max block
            r.read(24)  # min frame
            r.read(24)  # max frame
            rate = r.read(20)
            channels = r.read(3) + 1
            bits = r.read(5) + 1
            total = r.read(36)
            streaminfo = (rate, channels, bits, total)
        if last:
            break
    if streaminfo is None:
        raise ValueError("missing STREAMINFO")
    rate, channels, bits, total = streaminfo

    chans_out = [[] for _ in range(channels)]
    n_decoded = 0
    while pos < len(content) and (total == 0 or n_decoded < total):
        frame_start = pos
        r = _BitReader(content, pos)
        sync = r.read(14)
        if sync != 0x3FFE:
            raise ValueError(f"bad frame sync at {pos}")
        r.read(1)  # reserved
        r.read(1)  # blocking strategy
        bs_code = r.read(4)
        sr_code = r.read(4)
        ch_code = r.read(4)
        ss_code = r.read(3)
        r.read(1)  # reserved
        _read_utf8_number(r)
        if bs_code == 0:
            raise ValueError("reserved block size code")
        elif bs_code == 1:
            block_size = 192
        elif 2 <= bs_code <= 5:
            block_size = 576 << (bs_code - 2)
        elif bs_code == 6:
            block_size = r.read(8) + 1
        elif bs_code == 7:
            block_size = r.read(16) + 1
        else:
            block_size = 256 << (bs_code - 8)
        if sr_code == 12:
            r.read(8)
        elif sr_code in (13, 14):
            r.read(16)
        # sample size per frame (0 = from streaminfo)
        ss_map = {0: bits, 1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}
        if ss_code == 3:
            raise ValueError("reserved sample size code")
        fbits = ss_map[ss_code]
        # CRC-8 covers everything from sync through the last header
        # byte (r is byte-aligned here: 4+4+4+3+1 bits = padding out)
        r.align()
        hdr_bytes = content[frame_start : r.bytepos]
        crc8 = r.read(8)
        if _crc8(hdr_bytes) != crc8:
            raise ValueError("frame header CRC mismatch")

        if ch_code <= 7:
            n_ch = ch_code + 1
            mode = "indep"
        elif ch_code == 8:
            n_ch, mode = 2, "left_side"
        elif ch_code == 9:
            n_ch, mode = 2, "right_side"
        elif ch_code == 10:
            n_ch, mode = 2, "mid_side"
        else:
            raise ValueError("reserved channel assignment")
        if mode == "indep" and n_ch != channels:
            raise ValueError("channel count mismatch")

        sub = []
        for ci in range(n_ch):
            sbits = fbits
            if (mode == "left_side" and ci == 1) or (
                mode == "right_side" and ci == 0
            ) or (mode == "mid_side" and ci == 1):
                sbits += 1  # the side channel carries one extra bit
            sub.append(_decode_subframe(r, block_size, sbits))
        r.align()
        r.read(16)  # frame CRC-16 (header CRC already validated)
        pos = r.bytepos

        a = [list(s) for s in sub]
        if mode == "left_side":
            left, side = a
            right = [left_i - s for left_i, s in zip(left, side)]
            a = [left, right]
        elif mode == "right_side":
            side, right = a
            left = [r_i + s for r_i, s in zip(right, side)]
            a = [left, right]
        elif mode == "mid_side":
            mid, side = a
            left, right = [], []
            for m, s in zip(mid, side):
                m2 = (m << 1) | (s & 1)
                left.append((m2 + s) >> 1)
                right.append((m2 - s) >> 1)
            a = [left, right]
        for ci in range(channels):
            chans_out[ci].extend(a[ci])
        n_decoded += block_size

    n = n_decoded if total == 0 else min(n_decoded, total)
    out = np.zeros((n, channels), dtype=np.int32)
    for ci in range(channels):
        out[:, ci] = chans_out[ci][:n]
    return rate, channels, bits, out


def _decode_subframe(r: _BitReader, block_size: int, sbits: int):
    if r.read(1) != 0:
        raise ValueError("bad subframe padding bit")
    stype = r.read(6)
    wasted = 0
    if r.read(1):
        wasted = r.read_unary() + 1
        sbits -= wasted
    if stype == 0:  # CONSTANT
        v = r.read_signed(sbits)
        out = [v] * block_size
    elif stype == 1:  # VERBATIM
        out = [r.read_signed(sbits) for _ in range(block_size)]
    elif 8 <= stype <= 12:  # FIXED, order = stype & 7
        order = stype & 7
        warm = [r.read_signed(sbits) for _ in range(order)]
        resid = _decode_residuals(r, block_size, order)
        out = list(warm)
        coefs = _FIXED_COEFS[order]
        for i in range(order, block_size):
            pred = sum(c * out[i - 1 - j] for j, c in enumerate(coefs))
            out.append(pred + resid[i - order])
    elif stype >= 32:  # LPC, order = (stype & 31) + 1
        order = (stype & 31) + 1
        warm = [r.read_signed(sbits) for _ in range(order)]
        precision = r.read(4) + 1
        if precision == 16:
            raise ValueError("invalid LPC precision")
        shift = r.read_signed(5)
        coefs = [r.read_signed(precision) for _ in range(order)]
        resid = _decode_residuals(r, block_size, order)
        out = list(warm)
        for i in range(order, block_size):
            acc = sum(c * out[i - 1 - j] for j, c in enumerate(coefs))
            out.append((acc >> shift) + resid[i - order])
    else:
        raise ValueError(f"reserved subframe type {stype}")
    if wasted:
        out = [v << wasted for v in out]
    return out


def _decode_residuals(r: _BitReader, block_size: int, order: int):
    method = r.read(2)
    if method not in (0, 1):
        raise ValueError("reserved residual method")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    po = r.read(4)
    nparts = 1 << po
    if block_size % nparts:
        raise ValueError("partition order does not divide block size")
    out = []
    for p in range(nparts):
        n = block_size // nparts - (order if p == 0 else 0)
        param = r.read(pbits)
        if param == escape:
            raw = r.read(5)
            for _ in range(n):
                out.append(r.read_signed(raw) if raw else 0)
        else:
            for _ in range(n):
                q = r.read_unary()
                v = (q << param) | r.read(param)
                out.append(-(v >> 1) - 1 if v & 1 else v >> 1)
    return out


# ----------------------------------------------------------- encode

def encode_flac(samples, rate: int, block_size: int = 4096) -> bytes:
    """Encode int16 samples [n, channels] as a FLAC stream: 16-bit,
    fixed blocksize, independent channels, FIXED-order-2 subframes
    (order 0/1 for tiny blocks) with one rice partition per subframe.
    Lossless by construction."""
    import numpy as np

    samples = np.asarray(samples, dtype=np.int64)
    if samples.ndim == 1:
        samples = samples[:, None]
    n, channels = samples.shape
    out = bytearray(b"fLaC")
    # STREAMINFO (marked last metadata block)
    si = _BitWriter()
    si.write(block_size, 16)
    si.write(block_size, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(rate, 20)
    si.write(channels - 1, 3)
    si.write(15, 5)  # 16-bit
    si.write(n, 36)
    si.align()
    body = bytes(si.out) + b"\x00" * 16  # md5 0 = unverified
    out += bytes((0x80,)) + struct.pack(">I", len(body))[1:] + body

    for fi, start in enumerate(range(0, n, block_size)):
        blk = samples[start : start + block_size]
        out += _encode_frame(blk, fi, rate, channels, block_size)
    return bytes(out)


def _encode_frame(blk, frame_idx, rate, channels, nominal_bs):
    bs = blk.shape[0]
    # stereo decorrelation: choose left/side when the side channel
    # (L-R) is cheaper than the right channel — the correlated-music
    # win; the decision metric is mean |second difference|, the same
    # quantity the FIXED-order-2 residual encodes
    use_left_side = False
    subs = None
    if channels == 2:
        left = [int(v) for v in blk[:, 0]]
        right = [int(v) for v in blk[:, 1]]
        side = [l - r for l, r in zip(left, right)]

        def cost(x):
            if len(x) < 3:
                return sum(abs(v) for v in x)
            return sum(
                abs(x[i] - 2 * x[i - 1] + x[i - 2])
                for i in range(2, len(x))
            )

        if cost(side) < cost(right):
            use_left_side = True
            subs = [(left, 16), (side, 17)]
    if subs is None:
        subs = [([int(v) for v in blk[:, ci]], 16)
                for ci in range(channels)]

    w = _BitWriter()
    w.write(0x3FFE, 14)
    w.write(0, 1)
    w.write(0, 1)  # fixed blocksize strategy
    code = _BLOCKSIZE_CODES.get(bs)
    if bs == nominal_bs and code is not None:
        bs_code, bs_extra = code, None
    elif bs <= 256:
        bs_code, bs_extra = 6, (bs - 1, 8)
    else:
        bs_code, bs_extra = 7, (bs - 1, 16)
    w.write(bs_code, 4)
    w.write(0, 4)  # sample rate from STREAMINFO
    if use_left_side:
        w.write(8, 4)  # left/side channel assignment
    else:
        w.write(channels - 1, 4)  # independent channels
    w.write(4, 3)  # 16-bit
    w.write(0, 1)
    for b in _utf8_number(frame_idx):
        w.write(b, 8)
    if bs_extra is not None:
        w.write(*bs_extra)
    w.align()
    hdr = bytes(w.out)
    hdr += bytes((_crc8(hdr),))

    body = _BitWriter()
    for sub, sbits in subs:
        _encode_subframe(body, sub, sbits)
    body.align()
    payload = hdr + bytes(body.out)
    return payload + struct.pack(">H", _crc16(payload))


def _encode_subframe(w: _BitWriter, x: list[int], sbits: int = 16) -> None:
    order = 2 if len(x) > 2 else (1 if len(x) == 2 else 0)
    if len(set(x)) == 1:
        w.write(0, 1)
        w.write(0, 6)  # CONSTANT
        w.write(0, 1)
        w.write(x[0], sbits)
        return
    w.write(0, 1)
    w.write(8 | order, 6)  # FIXED
    w.write(0, 1)  # no wasted bits
    for v in x[:order]:
        w.write(v, sbits)
    coefs = _FIXED_COEFS[order]
    resid = [
        x[i] - sum(c * x[i - 1 - j] for j, c in enumerate(coefs))
        for i in range(order, len(x))
    ]
    # one partition, 4-bit rice parameter chosen from mean magnitude
    w.write(0, 2)
    w.write(0, 4)
    mean = sum(abs(v) for v in resid) / max(1, len(resid))
    param = 0
    while (1 << param) < mean + 1 and param < 14:
        param += 1
    # escape to raw if rice would blow up (worst-case guard)
    zz = [(-v * 2 - 1) if v < 0 else v * 2 for v in resid]
    rice_bits = sum((v >> param) + 1 + param for v in zz)
    if rice_bits > 30 * max(1, len(resid)):
        w.write(15, 4)
        w.write(18, 5)
        for v in resid:
            w.write(v, 18)
        return
    w.write(param, 4)
    for v in zz:
        w.write_unary(v >> param)
        w.write(v & ((1 << param) - 1), param)
