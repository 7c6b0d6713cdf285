"""FLAC codec (operators/flac.py): hand-assembled spec fixtures
(verbatim, LPC, and every stereo-decorrelation mode) built with an
independent in-test bit writer + table-driven CRCs, the lossless
round-trip guarantee, rice/escape paths, and the multimodal audio
wiring."""

import struct

import numpy as np
import pytest

from distcpplus_spark.operators.flac import decode_flac, encode_flac


# independent table-driven CRCs (different construction from the
# product's bitwise loop)
def _crc8_table():
    tab = []
    for i in range(256):
        c = i
        for _ in range(8):
            c = ((c << 1) ^ 0x07) & 0xFF if c & 0x80 else (c << 1) & 0xFF
        tab.append(c)
    return tab


def _crc16_table():
    tab = []
    for i in range(256):
        c = i << 8
        for _ in range(8):
            c = ((c << 1) ^ 0x8005) & 0xFFFF if c & 0x8000 else (c << 1) & 0xFFFF
        tab.append(c)
    return tab


_T8, _T16 = _crc8_table(), _crc16_table()


def crc8(data):
    c = 0
    for b in data:
        c = _T8[c ^ b]
    return c


def crc16(data):
    c = 0
    for b in data:
        c = _T16[((c >> 8) ^ b) & 0xFF] ^ ((c << 8) & 0xFFFF)
    return c


class W:
    """Independent MSB-first bit writer for fixture assembly."""

    def __init__(self):
        self.bits = []

    def w(self, v, n):
        for i in range(n - 1, -1, -1):
            self.bits.append((v >> i) & 1)

    def unary(self, n):
        self.bits.extend([0] * n + [1])

    def bytes(self):
        while len(self.bits) % 8:
            self.bits.append(0)
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            b = 0
            for bit in self.bits[i : i + 8]:
                b = (b << 1) | bit
            out.append(b)
        return bytes(out)


def _streaminfo(rate, channels, bits, total, block):
    w = W()
    w.w(block, 16)
    w.w(block, 16)
    w.w(0, 24)
    w.w(0, 24)
    w.w(rate, 20)
    w.w(channels - 1, 3)
    w.w(bits - 1, 5)
    w.w(total, 36)
    body = w.bytes() + b"\x00" * 16
    return b"fLaC" + bytes((0x80,)) + struct.pack(">I", len(body))[1:] + body


def _frame_header(bs, ch_code, frame_idx=0):
    w = W()
    w.w(0x3FFE, 14)
    w.w(0, 1)
    w.w(0, 1)
    w.w(6, 4)          # 8-bit blocksize follows
    w.w(0, 4)          # rate from STREAMINFO
    w.w(ch_code, 4)
    w.w(4, 3)          # 16-bit
    w.w(0, 1)
    w.w(frame_idx, 8)  # UTF-8 single byte (idx < 0x80)
    w.w(bs - 1, 8)
    hdr = w.bytes()
    return hdr + bytes((crc8(hdr),))


def _verbatim_bits(w, samples, sbits):
    w.w(0, 1)
    w.w(1, 6)  # VERBATIM
    w.w(0, 1)
    for v in samples:
        w.w(v & ((1 << sbits) - 1), sbits)


def test_hand_assembled_verbatim_frame():
    samples = [100, -5, 32767, -32768]
    blob = _streaminfo(8000, 1, 16, 4, 4)
    hdr = _frame_header(4, ch_code=0)
    w = W()
    _verbatim_bits(w, samples, 16)
    payload = hdr + w.bytes()
    blob += payload + struct.pack(">H", crc16(payload))
    rate, ch, bits, out = decode_flac(blob)
    assert (rate, ch, bits) == (8000, 1, 16)
    assert list(out[:, 0]) == samples


def test_hand_assembled_lpc_subframe():
    """LPC order 1, precision 4, shift 2, coef 3:
    out[i] = ((3*out[i-1]) >> 2) + resid[i]; residuals rice param 2,
    all traced by hand through RFC 9639's subframe layout."""
    warm = [40]
    resid = [1, -2, 0, 3, -1]
    expect = list(warm)
    for r_ in resid:
        expect.append(((3 * expect[-1]) >> 2) + r_)
    blob = _streaminfo(8000, 1, 16, 6, 6)
    hdr = _frame_header(6, ch_code=0)
    w = W()
    w.w(0, 1)
    w.w(32 | (1 - 1), 6)  # LPC, order 1
    w.w(0, 1)
    w.w(warm[0], 16)
    w.w(4 - 1, 4)   # precision 4
    w.w(2, 5)       # shift 2
    w.w(3, 4)       # coefficient +3 in 4 bits
    w.w(0, 2)       # rice method 0
    w.w(0, 4)       # partition order 0
    w.w(2, 4)       # rice parameter 2
    for v in resid:
        zz = (-v * 2 - 1) if v < 0 else v * 2
        w.unary(zz >> 2)
        w.w(zz & 3, 2)
    payload = hdr + w.bytes()
    blob += payload + struct.pack(">H", crc16(payload))
    rate, ch, bits, out = decode_flac(blob)
    assert list(out[:, 0]) == expect


@pytest.mark.parametrize(
    "ch_code,mode",
    [(8, "left_side"), (9, "right_side"), (10, "mid_side")],
)
def test_hand_assembled_stereo_decorrelation(ch_code, mode):
    left = [100, 200, -50, 0]
    right = [40, -60, 10, 7]
    mid = [(l + r) >> 1 for l, r in zip(left, right)]
    side = [l - r for l, r in zip(left, right)]
    blob = _streaminfo(8000, 2, 16, 4, 4)
    hdr = _frame_header(4, ch_code=ch_code)
    w = W()
    if mode == "left_side":
        _verbatim_bits(w, left, 16)
        _verbatim_bits(w, side, 17)
    elif mode == "right_side":
        _verbatim_bits(w, side, 17)
        _verbatim_bits(w, right, 16)
    else:
        _verbatim_bits(w, mid, 16)
        _verbatim_bits(w, side, 17)
    payload = hdr + w.bytes()
    blob += payload + struct.pack(">H", crc16(payload))
    rate, ch, bits, out = decode_flac(blob)
    assert ch == 2
    assert list(out[:, 0]) == left
    assert list(out[:, 1]) == right


def test_lossless_roundtrip_exact():
    rng = np.random.default_rng(9)
    cases = [
        (np.round(
            9000 * np.sin(2 * np.pi * np.arange(5000) / 41)
        ).astype(np.int16).reshape(-1, 1), 16000),
        (rng.integers(-32768, 32767, (7000, 2)).astype(np.int16), 44100),
        (np.zeros((300, 1), dtype=np.int16), 8000),       # constant path
        (np.full((4096, 2), -123, dtype=np.int16), 8000),  # exact block
        (rng.integers(-5, 5, (1, 1)).astype(np.int16), 8000),
    ]
    for x, rate in cases:
        r, ch, bits, y = decode_flac(encode_flac(x, rate))
        assert (r, ch, bits) == (rate, x.shape[1], 16)
        assert np.array_equal(y, x.astype(np.int32)), x.shape


def test_frame_header_crc_is_verified():
    x = np.arange(100, dtype=np.int16).reshape(-1, 1)
    blob = bytearray(encode_flac(x, 8000))
    # STREAMINFO is 4 + 4 + 38 bytes; corrupt a frame header byte
    blob[4 + 4 + 38 + 2] ^= 0x01
    with pytest.raises(ValueError):
        decode_flac(bytes(blob))


def test_compresses_smooth_signals():
    x = np.round(
        12000 * np.sin(2 * np.pi * np.arange(16000) / 100)
    ).astype(np.int16).reshape(-1, 1)
    blob = encode_flac(x, 16000)
    assert len(blob) < 0.8 * x.nbytes  # genuinely smaller than PCM


def test_multimodal_audio_path_decodes_flac(spark):
    """FLAC rides the same feature/resample/spectrum extractors as
    WAV — including exact FFT tone detection."""
    from distcpplus_spark.operators.multimodal import (
        _parse_wav,
        _resample_audio,
        extract_audio_spectrum,
    )

    t = np.arange(8000)
    x = np.round(10000 * np.sin(2 * np.pi * 500 * t / 8000)).astype(
        np.int16
    ).reshape(-1, 1)
    blob = encode_flac(x, 8000)
    rate, ch, bits, y = _parse_wav(blob)
    assert (rate, ch, bits) == (8000, 1, 16)
    assert np.array_equal(y[:, 0], x[:, 0])
    out = _resample_audio(blob, 4000)
    assert out[:4] == b"RIFF"  # resample re-emits PCM WAV
    df = spark.createDataFrame([(1, blob)], "media_id BIGINT, content BINARY")
    row = extract_audio_spectrum(df).collect()[0]
    assert row["dominant_hz"] == 500
