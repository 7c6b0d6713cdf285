"""Real-codec multimodal tests: BMP/PNG/WAV bytes are crafted with
stdlib and decoded by the engine's own parsers — exact dimensions,
luminance, hashes, durations. No image/audio libraries involved."""

from __future__ import annotations

import struct
import zlib

import pytest


def make_bmp(pixels):
    """pixels: list of rows (top-down) of (r, g, b). Emits a bottom-up
    24-bit uncompressed BMP."""
    h = len(pixels)
    w = len(pixels[0])
    row_bytes = (w * 3 + 3) & ~3
    body = b""
    for row in reversed(pixels):  # bottom-up storage
        line = b"".join(bytes((b_, g, r)) for (r, g, b_) in row)
        body += line + b"\x00" * (row_bytes - len(line))
    header = struct.pack("<2sIHHI", b"BM", 54 + len(body), 0, 0, 54)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body),
                      2835, 2835, 0, 0)
    return header + dib + body


def make_png(pixels, filter_type=0):
    """pixels: rows (top-down) of (r, g, b); 8-bit RGB non-interlaced
    PNG with the given scanline filter on every row."""
    h, w = len(pixels), len(pixels[0])

    def chunk(ctype, body):
        return (
            struct.pack(">I", len(body)) + ctype + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = b""
    prev = [0] * (w * 3)
    for row in pixels:
        flat = [c for px in row for c in px]
        if filter_type == 0:
            raw += b"\x00" + bytes(flat)
        elif filter_type == 2:  # up filter
            raw += b"\x02" + bytes((v - p) & 0xFF for v, p in zip(flat, prev))
        prev = flat
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def make_wav(samples, rate, channels=1):
    """samples: list of int16 (interleaved if channels > 1)."""
    data = struct.pack(f"<{len(samples)}h", *samples)
    return struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(data), b"WAVE", b"fmt ", 16, 1, channels, rate,
        rate * channels * 2, channels * 2, 16, b"data", len(data),
    ) + data


def test_bmp_decode_exact():
    from distcpplus_spark.operators.multimodal import _decode_image

    # 2x2: white, black / red, blue
    px = [[(255, 255, 255), (0, 0, 0)], [(255, 0, 0), (0, 0, 255)]]
    f = _decode_image(make_bmp(px))
    assert (f["width"], f["height"], f["channels"]) == (2, 2, 3)
    # luma: (255 + 0 + 76.245 + 29.07) / 4 / 255
    expect = (255.0 + 0.0 + 0.299 * 255 + 0.114 * 255) / 4 / 255
    assert abs(f["mean_luma"] - expect) < 1e-4


def test_png_decode_matches_bmp():
    """The same pixels through the PNG path (including the 'up'
    filter reconstruction) must decode identically to the BMP path."""
    from distcpplus_spark.operators.multimodal import _decode_image

    rows = [
        [((x * 37) % 256, (y * 11) % 256, (x * y) % 256) for x in range(8)]
        for y in range(6)
    ]
    f_bmp = _decode_image(make_bmp(rows))
    f_png0 = _decode_image(make_png(rows, filter_type=0))
    f_png2 = _decode_image(make_png(rows, filter_type=2))
    assert f_bmp == f_png0 == f_png2
    assert (f_bmp["width"], f_bmp["height"]) == (8, 6)


def test_ahash_distinguishes_and_matches():
    from distcpplus_spark.operators.multimodal import _decode_image

    light = [[(200, 200, 200)] * 16 for _ in range(16)]
    # half dark, half light -> hash with both bit values
    split = [[(20, 20, 20)] * 8 + [(230, 230, 230)] * 8 for _ in range(16)]
    h_light = _decode_image(make_bmp(light))["phash"]
    h_split = _decode_image(make_bmp(split))["phash"]
    assert h_light != h_split
    # left 4 columns of each 8x8 grid dark (0), right light (1)
    assert h_split == int(("00001111" * 8), 2)


def test_wav_parse_and_features(spark):
    from distcpplus_spark.operators.multimodal import extract_audio_features

    # 1 second of a square wave at 8 kHz, full scale
    samples = [16384 if i % 2 == 0 else -16384 for i in range(8000)]
    wav = make_wav(samples, 8000)
    df = spark.createDataFrame(
        [(1, wav), (2, b"not audio")], "media_id LONG, content BINARY"
    )
    rows = {r["media_id"]: r for r in extract_audio_features(df).collect()}
    ok = rows[1]
    assert (ok["sample_rate"], ok["channels"], ok["n_samples"]) == (8000, 1, 8000)
    assert ok["duration_s"] == 1.0
    assert abs(ok["rms"] - 0.5) < 1e-3  # |16384|/32768 everywhere
    assert rows[2]["sample_rate"] is None  # undecodable -> NULL features


def test_wav_resample_real():
    from distcpplus_spark.operators.multimodal import _parse_wav, _resample_audio

    # 100 ms ramp at 48 kHz -> 16 kHz: 1/3 the samples, same duration
    n = 4800
    samples = [int(-16000 + 32000 * i / n) for i in range(n)]
    out = _resample_audio(make_wav(samples, 48000), 16000)
    rate, ch, bits, arr = _parse_wav(out)
    assert (rate, ch, bits) == (16000, 1, 16)
    assert abs(arr.shape[0] - 1600) <= 1
    # endpoints preserved by linear interpolation
    assert abs(int(arr[0, 0]) - samples[0]) <= 1
    assert abs(int(arr[-1, 0]) - samples[-1]) <= 16


def test_image_features_mixed_formats(spark):
    """A batch mixing real BMP, real PNG, codec-format (stub), and
    null rows flows through mapInPandas with per-row isolation."""
    from distcpplus_spark.operators.multimodal import extract_image_features

    px = [[(10, 20, 30)] * 4 for _ in range(4)]
    rows = [
        (1, bytearray(make_bmp(px))),
        (2, bytearray(make_png(px))),
        (3, bytearray(b"\xff\xd8\xff fake-jpeg bytes")),  # stub path
        (4, None),
    ]
    df = spark.createDataFrame(rows, "media_id LONG, content BINARY")
    got = {r["media_id"]: r for r in extract_image_features(df).collect()}
    assert got[1]["width"] == 4 and got[2]["width"] == 4
    assert got[1]["phash"] == got[2]["phash"]  # same pixels, same hash
    assert got[3]["width"] is not None  # stub still yields features
    assert got[4]["width"] is None  # error row -> NULLs


def test_real_resize_bmp_and_png_roundtrip(spark):
    """Resize decodes, nearest-neighbor samples, re-encodes in the
    same container — verified by decoding the output again."""
    from distcpplus_spark.operators.multimodal import (
        _decode_image,
        resize_images,
    )

    # 4x4 quadrant image: TL red, TR green, BL blue, BR white
    q = [
        [(255, 0, 0)] * 2 + [(0, 255, 0)] * 2,
        [(255, 0, 0)] * 2 + [(0, 255, 0)] * 2,
        [(0, 0, 255)] * 2 + [(255, 255, 255)] * 2,
        [(0, 0, 255)] * 2 + [(255, 255, 255)] * 2,
    ]
    df = spark.createDataFrame(
        [(1, bytearray(make_bmp(q))), (2, bytearray(make_png(q)))],
        "media_id LONG, content BINARY",
    )
    out = {
        r["media_id"]: bytes(r["content"])
        for r in resize_images(df, width=2, height=2).collect()
    }
    for mid, blob in out.items():
        f = _decode_image(blob)
        assert (f["width"], f["height"]) == (2, 2), mid
    # containers preserved
    assert out[1][:2] == b"BM"
    assert out[2][:8] == b"\x89PNG\r\n\x1a\n"
    # nearest-neighbor on a quadrant image keeps one pixel per quadrant:
    # decoded 2x2 luma = mean of the four quadrant colors' lumas
    exp_luma = (0.299 * 255 + 0.587 * 255 + 0.114 * 255 + 255.0) / 4 / 255
    got = _decode_image(out[1])
    assert abs(got["mean_luma"] - exp_luma) < 1e-4


def test_resize_upscale_and_codec_fallback(spark):
    from distcpplus_spark.operators.multimodal import (
        _decode_image,
        _resize_image,
    )

    px = [[(10, 20, 30)]]  # 1x1
    up = _resize_image(make_bmp(px), 8, 8)
    f = _decode_image(up)
    assert (f["width"], f["height"]) == (8, 8)
    # non-BMP/PNG bytes take the deterministic stub path, not an error
    blob = _resize_image(b"\xff\xd8\xffjpegish", 16, 16)
    assert isinstance(blob, (bytes, bytearray)) and len(blob) > 0


def test_image_ahash_neardup_recall(spark):
    """x17 end-to-end: banded ahash pairing finds most one-pixel
    variant pairs (same base pattern) and every reported pair is
    within the Hamming threshold. Bounds are loose by design — the
    property is 'banding recovers near-dups without all-pairs', not
    an exact pair list."""
    from distcpplus_spark.queries import load_all_queries

    qs, _ = load_all_queries()
    rows = qs["x17_image_ahash_neardup"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    same_group = [
        r for r in rows if r["media_a"] % 10 == r["media_b"] % 10
    ]
    # recall: most one-pixel variant pairs are recovered
    assert len(same_group) >= 0.8 * (10 * 8 * 7 // 2)
    # precision: cross-group (different base pattern) pairs stay a
    # small minority — if the band arithmetic collapsed (everything in
    # one bucket) or bit_count were wrong, cross-group pairs would
    # dominate the all-pairs set and this bound fails
    assert len(rows) - len(same_group) <= 0.25 * len(rows)


def test_codec_probe_upgrades_when_lib_appears(monkeypatch):
    """The JPEG path is stubbed only because the container has no
    codec libs: when a PIL-shaped module is importable the decode
    auto-upgrades. Verified with a fake so the plumbing (probe, open,
    convert, feature math) is tested without Pillow installed."""
    import numpy as np

    from distcpplus_spark.operators import multimodal as mm

    class FakeImg:
        def convert(self, mode):
            assert mode == "RGB"
            arr = np.zeros((4, 6, 3), dtype=np.uint8)
            arr[:, :, 0] = 255  # pure red
            return arr

    class FakePIL:
        @staticmethod
        def open(buf):
            assert buf.read(3) == b"\xff\xd8\xff"
            return FakeImg()

    monkeypatch.setattr(mm, "_PIL", FakePIL)
    jpeg_bytes = b"\xff\xd8\xff" + b"\x00" * 64
    f = mm._decode_image(jpeg_bytes)
    assert (f["width"], f["height"], f["channels"]) == (6, 4, 3)
    assert abs(f["mean_luma"] - 0.299) < 1e-6  # red-only luminance

    # and with the probe finding nothing, the stub still answers
    monkeypatch.setattr(mm, "_PIL", None)
    stub = mm._decode_image(jpeg_bytes)
    assert stub == mm._decode_image_stub(jpeg_bytes)


def test_audio_probe_upgrades_when_soundfile_appears(monkeypatch):
    """Same auto-upgrade contract for compressed audio via a fake
    soundfile module: non-RIFF bytes decode and resample for real when
    the lib exists, stub otherwise."""
    import numpy as np

    from distcpplus_spark.operators import multimodal as mm

    class FakeSF:
        @staticmethod
        def read(buf, dtype, always_2d):
            assert dtype == "int16" and always_2d
            t = np.arange(800)
            wave = (1000 * np.sin(2 * np.pi * t / 80)).astype(np.int16)
            return wave.reshape(-1, 1), 8000

    monkeypatch.setattr(mm, "_SOUNDFILE", FakeSF)
    ogg_bytes = b"OggS" + b"\x00" * 32
    out = mm._resample_audio(ogg_bytes, 4000)
    rate, ch, bits, samples = mm._parse_wav(out)
    assert (rate, ch, bits) == (4000, 1, 16)
    assert samples.shape[0] == 400  # 800 samples at half rate

    monkeypatch.setattr(mm, "_SOUNDFILE", None)
    assert mm._resample_audio(ogg_bytes, 4000) == mm._resample_audio_stub(
        ogg_bytes, 4000
    )


def make_paletted_png(indices, palette):
    """indices: rows (top-down) of palette indices; palette: list of
    (r, g, b). Color-type-3 PNG with a PLTE chunk."""
    h, w = len(indices), len(indices[0])

    def chunk(ctype, body):
        return (
            struct.pack(">I", len(body)) + ctype + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 3, 0, 0, 0)
    plte = b"".join(bytes(c) for c in palette)
    raw = b"".join(b"\x00" + bytes(row) for row in indices)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"PLTE", plte)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def test_paletted_png_decodes_through_plte():
    from distcpplus_spark.operators.multimodal import _decode_png

    palette = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (17, 34, 51)]
    indices = [[0, 1, 2, 3], [3, 2, 1, 0], [1, 1, 3, 3]]
    px = _decode_png(make_paletted_png(indices, palette))
    assert px.shape == (3, 4, 3)
    for y, row in enumerate(indices):
        for x, idx in enumerate(row):
            assert tuple(px[y, x]) == palette[idx], (y, x)


def test_paletted_png_without_plte_rejected():
    from distcpplus_spark.operators.multimodal import _decode_png

    blob = make_paletted_png([[0]], [(1, 2, 3)])
    # excise the PLTE chunk (length 3 + 12 framing bytes)
    i = blob.index(b"PLTE") - 4
    broken = blob[:i] + blob[i + 12 + 3 :]
    with pytest.raises(ValueError, match="PLTE"):
        _decode_png(broken)


def _make_companded_wav(codes, rate, audio_fmt):
    data = bytes(codes)
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(data), b"WAVE", b"fmt ", 16, audio_fmt, 1,
        rate, rate, 1, 8, b"data", len(data),
    )
    return hdr + data


def test_g711_ulaw_known_vectors():
    """ITU G.711 spec values: 0x00 -> -32124, 0x80 -> +32124,
    0xFF/0x7F -> 0."""
    from distcpplus_spark.operators.multimodal import _parse_wav

    rate, ch, bits, s = _parse_wav(
        _make_companded_wav([0x00, 0x80, 0xFF, 0x7F], 8000, 7)
    )
    assert (rate, ch, bits) == (8000, 1, 16)
    assert list(s[:, 0]) == [-32124, 32124, 0, 0]


def test_g711_alaw_known_vectors():
    """ITU G.711 spec values: 0x55 -> -8, 0xD5 -> +8, 0x2A -> -32256,
    0xAA -> +32256."""
    from distcpplus_spark.operators.multimodal import _parse_wav

    rate, ch, bits, s = _parse_wav(
        _make_companded_wav([0x55, 0xD5, 0x2A, 0xAA], 8000, 6)
    )
    assert bits == 16
    assert list(s[:, 0]) == [-8, 8, -32256, 32256]


def test_g711_monotone_decode():
    """Companded codes are sign-magnitude: decode must be monotone
    within each sign half — a table-construction sanity sweep over
    all 256 codes for both laws."""
    from distcpplus_spark.operators.multimodal import _g711_tables

    ulaw, alaw = _g711_tables()
    # u-law: 0x00..0x7F decode to descending negatives-to-zero,
    # 0x80..0xFF to descending positives-to-zero
    assert all(ulaw[i] <= ulaw[i + 1] for i in range(0x7F))
    assert all(ulaw[i] >= ulaw[i + 1] for i in range(0x80, 0xFF))
    assert ulaw.min() == -32124 and ulaw.max() == 32124
    assert alaw.min() == -32256 and alaw.max() == 32256


def test_resample_g711_wav_end_to_end():
    """A μ-law WAV flows through the real resample path (parse →
    decode to int16 → interpolate → PCM16 WAV out)."""
    from distcpplus_spark.operators.multimodal import (
        _parse_wav,
        _resample_audio,
    )

    codes = [0x00, 0x80] * 400  # alternating full-scale
    out = _resample_audio(_make_companded_wav(codes, 8000, 7), 4000)
    rate, ch, bits, s = _parse_wav(out)
    assert (rate, ch, bits) == (4000, 1, 16)
    assert abs(s.shape[0] - 400) <= 1


def make_interlaced_png(pixels):
    """Adam7-interlaced 8-bit RGB PNG built pass-by-pass (filter 0)
    from the spec's pass grids — independent of the decoder."""
    h, w = len(pixels), len(pixels[0])

    def chunk(ctype, body):
        return (
            struct.pack(">I", len(body)) + ctype + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 1)  # interlace=1
    raw = b""
    for x0, y0, xs, ys in (
        (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
        (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
    ):
        rows = range(y0, h, ys)
        cols = range(x0, w, xs)
        if not rows or not cols or len(list(rows)) == 0 or len(list(cols)) == 0:
            continue
        pass_rows = [
            [pixels[y][x] for x in cols] for y in rows
        ]
        if not pass_rows or not pass_rows[0]:
            continue
        for prow in pass_rows:
            raw += b"\x00" + bytes(c for px in prow for c in px)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def test_adam7_interlaced_png_decodes_exactly():
    from distcpplus_spark.operators.multimodal import _decode_png

    import numpy as np

    rng = np.random.default_rng(13)
    for h, w in [(16, 16), (13, 11), (3, 9), (1, 1), (2, 5)]:
        pixels = [
            [tuple(int(v) for v in rng.integers(0, 256, 3))
             for _ in range(w)]
            for _ in range(h)
        ]
        px = _decode_png(make_interlaced_png(pixels))
        assert px.shape == (h, w, 3)
        for y in range(h):
            for x in range(w):
                assert tuple(px[y, x]) == pixels[y][x], (h, w, y, x)


# ------------------------------------------------------------ IMA ADPCM


def _make_adpcm_wav(blocks, rate, channels, block_align):
    """Assemble a WAV with fmt tag 0x11 (IMA ADPCM) around raw block
    bytes built by the caller — the container shape is independent of
    the decoder under test."""
    data = b"".join(blocks)
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(data), b"WAVE", b"fmt ", 16, 0x11, channels,
        rate, rate * block_align // max(1, block_align), block_align, 4,
        b"data", len(data),
    )
    return hdr + data


def test_ima_adpcm_hand_computed_vector():
    """One mono block, nibbles [2,0,15,8,0,0,0,0], predictor 0, index
    0 — every output sample traced by hand through the IMA spec
    recurrence (step table [7,8,...], index table [-1,...,8])."""
    from distcpplus_spark.operators.multimodal import _parse_wav

    header = struct.pack("<hBB", 0, 0, 0)
    payload = bytes([0x02, 0x8F, 0x00, 0x00])  # low nibble first
    wav = _make_adpcm_wav([header + payload], 8000, 1, 8)
    rate, ch, bits, s = _parse_wav(wav)
    assert (rate, ch, bits) == (8000, 1, 16)
    assert list(s[:, 0]) == [0, 3, 3, -8, -10, -9, -8, -7, -6]


def _ima_reference_encode(samples, channels, block_align):
    """Independent in-test IMA ADPCM encoder (public spec quantizer).
    Returns (blocks, reconstructed) where `reconstructed` is the
    encoder's own decoded-state track — the spec guarantees a correct
    decoder reproduces it EXACTLY, which is the parity assert."""
    from distcpplus_spark.operators.multimodal import (
        _IMA_INDEX_TABLE,
        _IMA_STEP_TABLE,
    )

    spb = (block_align - 4 * channels) * 2 // channels + 1
    blocks = []
    recon = [[] for _ in range(channels)]
    n = len(samples[0])
    pos = 0
    while pos < n:
        pred = [int(samples[c][pos]) for c in range(channels)]
        index = [0] * channels if pos == 0 else index  # persist index
        blk = bytearray()
        for c in range(channels):
            blk += struct.pack("<hBB", pred[c], index[c], 0)
            recon[c].append(pred[c])
        nibs = [[] for _ in range(channels)]
        for k in range(1, spb):
            for c in range(channels):
                i = pos + k
                target = int(samples[c][i]) if i < n else 0
                step = _IMA_STEP_TABLE[index[c]]
                delta = target - pred[c]
                nib = 0
                if delta < 0:
                    nib = 8
                    delta = -delta
                if delta >= step:
                    nib |= 4
                    delta -= step
                if delta >= step >> 1:
                    nib |= 2
                    delta -= step >> 1
                if delta >= step >> 2:
                    nib |= 1
                diff = step >> 3
                if nib & 1:
                    diff += step >> 2
                if nib & 2:
                    diff += step >> 1
                if nib & 4:
                    diff += step
                p = pred[c] - diff if nib & 8 else pred[c] + diff
                pred[c] = max(-32768, min(32767, p))
                ix = index[c] + _IMA_INDEX_TABLE[nib]
                index[c] = max(0, min(88, ix))
                nibs[c].append(nib)
                if i < n:
                    recon[c].append(pred[c])
        # pack: 4-byte words alternating channels, low nibble first
        words_per_chan = len(nibs[0]) // 8
        for w in range(words_per_chan):
            for c in range(channels):
                grp = nibs[c][8 * w : 8 * w + 8]
                for j in range(0, 8, 2):
                    blk.append(grp[j] | (grp[j + 1] << 4))
        blocks.append(bytes(blk))
        pos += spb
    return blocks, recon


def test_ima_adpcm_decoder_matches_reference_encoder_state():
    """Spec property: the decoder must reproduce the encoder's
    internal reconstruction track bit-exactly (ADPCM is lossy vs the
    input, lossless vs the encoder state)."""
    import numpy as np

    from distcpplus_spark.operators.multimodal import _parse_wav

    t = np.arange(1200)
    sig = (9000 * np.sin(2 * np.pi * t / 37)).astype(np.int64)
    block_align = 4 + 32  # 65 samples/block, mono
    blocks, recon = _ima_reference_encode([sig], 1, block_align)
    rate, ch, bits, s = _parse_wav(
        _make_adpcm_wav(blocks, 16000, 1, block_align)
    )
    assert (rate, ch, bits) == (16000, 1, 16)
    got = list(s[:, 0])
    assert got[: len(recon[0])] == recon[0]


def test_ima_adpcm_stereo_interleave():
    """Stereo blocks alternate 4-byte nibble words per channel; the
    decoder must de-interleave and keep per-channel state separate."""
    import numpy as np

    from distcpplus_spark.operators.multimodal import _parse_wav

    t = np.arange(400)
    left = (5000 * np.sin(2 * np.pi * t / 23)).astype(np.int64)
    right = (7000 * np.cos(2 * np.pi * t / 41)).astype(np.int64)
    block_align = 8 + 64  # stereo: 65 samples/block/channel
    blocks, recon = _ima_reference_encode([left, right], 2, block_align)
    rate, ch, bits, s = _parse_wav(
        _make_adpcm_wav(blocks, 8000, 2, block_align)
    )
    assert ch == 2
    assert list(s[: len(recon[0]), 0]) == recon[0]
    assert list(s[: len(recon[1]), 1]) == recon[1]


def test_ima_adpcm_flows_through_resample():
    """An ADPCM WAV rides the real resample path end-to-end (parse →
    int16 → interpolate → PCM16 out), not the stub."""
    import numpy as np

    from distcpplus_spark.operators.multimodal import (
        _parse_wav,
        _resample_audio,
    )

    t = np.arange(800)
    sig = (12000 * np.sin(2 * np.pi * t / 50)).astype(np.int64)
    blocks, _ = _ima_reference_encode([sig], 1, 36)
    out = _resample_audio(_make_adpcm_wav(blocks, 16000, 1, 36), 8000)
    rate, ch, bits, s = _parse_wav(out)
    assert (rate, ch, bits) == (8000, 1, 16)
    assert s.shape[0] > 300


def test_audio_spectrum_exact_tones(spark):
    """FFT dominant-frequency detection: integer-bin tones over a
    full second have zero leakage, so dominant_hz is exact — incl.
    through the G.711 and ADPCM decode paths."""
    import numpy as np

    from distcpplus_spark.operators.multimodal import (
        _build_wav,
        extract_audio_spectrum,
    )

    t = np.arange(8000)

    def tone(hz, amp=12000):
        return np.round(amp * np.sin(2 * np.pi * hz * t / 8000.0)).astype(
            np.int16
        ).reshape(-1, 1)

    rows = [
        (1, _build_wav(tone(440), 8000)),
        (2, _build_wav(tone(1000), 8000)),
        (3, _build_wav(tone(3999), 8000)),  # just below Nyquist
        (4, b"\x00not-a-wav"),
    ]
    df = spark.createDataFrame(rows, "media_id BIGINT, content BINARY")
    got = {r["media_id"]: r for r in extract_audio_spectrum(df).collect()}
    assert got[1]["dominant_hz"] == 440
    assert got[2]["dominant_hz"] == 1000
    assert got[3]["dominant_hz"] == 3999
    assert got[1]["peak_share"] > 0.999
    assert got[4]["dominant_hz"] is None  # error contract: NULLs


def test_16bit_png_decodes_high_byte():
    """Depth-16 PNG (filters run on 2-byte units) folds to the 8-bit
    feature contract via the high byte; filter type 2 (up) included
    to prove the byte-level unfilter handles wide pixels."""
    import struct
    import zlib

    import numpy as np

    from distcpplus_spark.operators.multimodal import _decode_png

    def chunk(tag, body):
        c = struct.pack(">I", len(body)) + tag + body
        return c + struct.pack(
            ">I", zlib.crc32(tag + body) & 0xFFFFFFFF
        )

    rng = np.random.default_rng(7)
    h, w = 6, 4
    px16 = rng.integers(0, 65536, (h, w, 3), dtype=np.uint16)
    raw = b"\x00" + px16[0].astype(">u2").tobytes()
    for y in range(1, h):
        # filter 2 (up): stored = cur - prev per BYTE mod 256
        cur = np.frombuffer(px16[y].astype(">u2").tobytes(), np.uint8)
        prev = np.frombuffer(px16[y - 1].astype(">u2").tobytes(), np.uint8)
        raw += b"\x02" + ((cur.astype(int) - prev) % 256).astype(
            np.uint8
        ).tobytes()
    ihdr = struct.pack(">IIBBBBB", w, h, 16, 2, 0, 0, 0)
    blob = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    dec = _decode_png(blob)
    assert np.array_equal(dec, (px16 >> 8).astype(np.uint8))


def test_bmp_rle8_with_escapes():
    """Hand-built RLE8 BMP exercising runs, absolute mode, delta
    skips, EOL, and EOB — decoded indices map through the BGRA
    palette exactly."""
    import numpy as np

    from distcpplus_spark.operators.multimodal import _decode_bmp

    pal_rgb = [(250, 10, 20), (30, 240, 50), (60, 70, 250), (0, 0, 0)]
    w, h = 6, 3
    # target (top-down logical rows; stored bottom-up):
    # row0: 0 0 0 1 1 2 / row1: 2 3 0 0 0 0(delta-skipped stays 0)
    # row2: 1 1 1 1 1 1
    rle = bytearray()
    # stored first = bottom logical row (row2): run of 6 ones
    rle += bytes([6, 1, 0, 0])               # run + EOL
    # row1: absolute [2,3,0] (3 literals + pad byte), delta (1,0),
    # then EOL — absolute mode requires >=3 literals ((0,2) would
    # parse as the delta escape)
    rle += bytes([0, 3, 2, 3, 0, 0, 0, 2, 1, 0, 0, 0])
    # row0 (top): run 3x0, run 2x1, run 1x2, EOB
    rle += bytes([3, 0, 2, 1, 1, 2, 0, 1])
    import struct as _st

    hdr_size = 40
    pal_bytes = b"".join(
        bytes([b, g, r, 0]) for r, g, b in pal_rgb
    ) + b"\x00" * 4 * 252
    data_offset = 14 + hdr_size + len(pal_bytes)
    blob = (
        b"BM"
        + _st.pack("<IHHI", data_offset + len(rle), 0, 0, data_offset)
        + _st.pack(
            "<IiiHHIIiiII", hdr_size, w, h, 1, 8, 1, len(rle),
            0, 0, 256, 0,
        )
        + pal_bytes
        + bytes(rle)
    )
    px = _decode_bmp(blob)
    assert px.shape == (3, 6, 3)
    expect_rows = [
        [0, 0, 0, 1, 1, 2],
        [2, 3, 0, 0, 0, 0],
        [1, 1, 1, 1, 1, 1],
    ]
    for y in range(3):
        for x in range(6):
            assert tuple(px[y, x]) == pal_rgb[expect_rows[y][x]], (y, x)


def test_ico_with_png_and_bmp_payloads():
    import struct as _st

    import numpy as np

    from distcpplus_spark.operators.multimodal import (
        _decode_ico,
        _encode_bmp,
        _encode_png,
    )

    # PNG payload: 8x8 solid teal; a smaller BMP entry must lose the
    # largest-entry vote
    big = np.full((8, 8, 3), (10, 200, 180), dtype=np.uint8)
    small = np.full((4, 4, 3), (250, 0, 0), dtype=np.uint8)
    png_payload = bytes(_encode_png(big))
    # classic payload: strip the 14-byte file header, double height
    bmp_full = bytes(_encode_bmp(small))
    info = bytearray(bmp_full[14:])
    _st.pack_into("<i", info, 8, 8)  # doubled height (4 -> 8)
    # append an empty AND mask (4 rows x 4 bytes padded)
    classic_payload = bytes(info) + b"\x00" * 16

    def build(entries):
        out = bytearray(b"\x00\x00\x01\x00" + _st.pack("<H", len(entries)))
        data_off = 6 + 16 * len(entries)
        blobs = b""
        for w, h, payload in entries:
            out += bytes([w % 256, h % 256, 0, 0])
            out += _st.pack("<HH", 1, 32)
            out += _st.pack("<II", len(payload), data_off + len(blobs))
            blobs += payload
        return bytes(out) + blobs

    ico = build([(4, 4, classic_payload), (8, 8, png_payload)])
    px = _decode_ico(ico)
    assert px.shape == (8, 8, 3)
    assert tuple(px[0, 0]) == (10, 200, 180)

    ico2 = build([(4, 4, classic_payload)])
    px2 = _decode_ico(ico2)
    assert px2.shape == (4, 4, 3)
    assert tuple(px2[0, 0]) == (250, 0, 0)


def test_pnm_p5_p6_with_comments():
    import numpy as np

    from distcpplus_spark.operators.multimodal import (
        _decode_image,
        _decode_pnm,
    )

    rng = np.random.default_rng(3)
    g = rng.integers(0, 256, (5, 9), dtype=np.uint8)
    p5 = b"P5\n# a comment\n9 5\n255\n" + g.tobytes()
    assert np.array_equal(_decode_pnm(p5), g)
    c = rng.integers(0, 256, (4, 6, 3), dtype=np.uint8)
    p6 = b"P6 6 4 255\n" + c.tobytes()
    assert np.array_equal(_decode_pnm(p6), c)
    f = _decode_image(p6)
    assert (f["width"], f["height"], f["channels"]) == (6, 4, 3)


def test_tga_rle_and_uncompressed():
    import struct as _st

    import numpy as np

    from distcpplus_spark.operators.multimodal import (
        _decode_image,
        _decode_tga,
    )

    footer = b"\x00" * 8 + b"TRUEVISION-XFILE.\x00"
    # 2x2 uncompressed 24-bit, top-down: pixels BGR on disk
    pix = [(10, 20, 30), (40, 50, 60), (70, 80, 90), (200, 210, 220)]
    body = b"".join(bytes([b, g, r]) for r, g, b in pix)
    hdr = bytes([0, 0, 2]) + b"\x00" * 9 + _st.pack("<HH", 2, 2) + bytes(
        [24, 0x20]
    )
    px = _decode_tga(hdr + body + footer)
    assert px.shape == (2, 2, 3)
    assert tuple(px[0, 0]) == (10, 20, 30)
    assert tuple(px[1, 1]) == (200, 210, 220)
    # RLE type 10: run of 3 red + 1 raw blue, bottom-up (descriptor 0)
    rle = bytes([0x82]) + bytes([0, 0, 255]) + bytes([0x00]) + bytes(
        [255, 0, 0]
    )
    hdr10 = bytes([0, 0, 10]) + b"\x00" * 9 + _st.pack("<HH", 2, 2) + bytes(
        [24, 0]
    )
    px2 = _decode_tga(hdr10 + rle + footer)
    # bottom-up: stored row0 = bottom. red run fills (1,0),(1,1),(0,0)
    assert tuple(px2[1, 0]) == (255, 0, 0)
    assert tuple(px2[1, 1]) == (255, 0, 0)
    assert tuple(px2[0, 0]) == (255, 0, 0)
    assert tuple(px2[0, 1]) == (0, 0, 255)
    f = _decode_image(hdr + body + footer)
    assert (f["width"], f["height"]) == (2, 2)


def test_aiff_extended_float_rate_and_samples():
    import struct as _st

    import numpy as np

    from distcpplus_spark.operators.multimodal import _parse_wav

    # 44100 Hz as 80-bit extended: exp = 16383 + 15, mantissa
    # 44100 << (63 - 15)
    exp = 16383 + 15
    mant = 44100 << 48
    samples = np.array([100, -200, 3000, -32768], dtype=">i2")
    ssnd = b"\x00" * 8 + samples.tobytes()
    comm = _st.pack(">hIh", 1, 4, 16) + _st.pack(">HQ", exp, mant)
    body = (
        b"AIFF"
        + b"COMM" + _st.pack(">I", len(comm)) + comm
        + b"SSND" + _st.pack(">I", len(ssnd)) + ssnd
    )
    blob = b"FORM" + _st.pack(">I", len(body)) + body
    rate, ch, bits, s = _parse_wav(blob)
    assert (rate, ch, bits) == (44100, 1, 16)
    assert list(s[:, 0]) == [100, -200, 3000, -32768]


def test_malformed_media_takes_stub_fallback():
    """The advisor's repro: truncated WebP raised IndexError and
    corrupt PNG IDAT raised zlib.error, bypassing the documented
    stub fallback. Every decoder boundary now catches
    _DECODE_ERRORS, so malformed bytes must yield stub features /
    stub resize output, never an exception or NULL-degraded row."""
    import numpy as np

    from distcpplus_spark.operators.multimodal import (
        _decode_image,
        _decode_image_stub,
        _resize_image,
        _resize_image_stub,
    )
    from distcpplus_spark.operators.webp import encode_webp_lossless

    px = np.full((8, 8, 3), 77, dtype=np.uint8)
    good_webp = encode_webp_lossless(px)
    truncated_webp = good_webp[:18]  # valid RIFF/VP8L magic, cut body

    from distcpplus_spark.operators.multimodal import _encode_png

    good_png = _encode_png(px)
    corrupt_png = bytearray(good_png)
    corrupt_png[41] ^= 0xFF  # flip a byte inside the IDAT stream
    corrupt_png = bytes(corrupt_png)

    bad_bmp = b"BM" + b"\x00" * 12  # header shorter than any struct

    for blob in (truncated_webp, corrupt_png, bad_bmp):
        feats = _decode_image(blob)
        assert feats == _decode_image_stub(blob)
        out = _resize_image(blob, 4, 4)
        assert out == _resize_image_stub(blob, 4, 4)


def test_exif_roundtrip_and_edges():
    from distcpplus_spark.operators.multimodal import (
        build_exif_jpeg,
        parse_exif,
    )

    j = build_exif_jpeg(3, "A", "2020:12:31 23:59:59")
    assert parse_exif(j) == {
        "make": "A",
        "orientation": 3,
        "datetime": "2020:12:31 23:59:59",
    }
    # short ASCII (<= 4 bytes incl. NUL) stays inline — exercised by
    # the 1-char make above; no-EXIF and non-JPEG inputs yield {}
    assert parse_exif(b"\xff\xd8\xff\xd9") == {}
    assert parse_exif(b"not a jpeg") == {}
    # big-endian (MM) TIFF bodies parse too
    import struct

    make_b = b"MMcam\x00"
    ifd_off = 8
    entries = struct.pack(">HHIHH", 0x0112, 3, 1, 7, 0)
    tiff = (
        struct.pack(">2sHI", b"MM", 42, ifd_off)
        + struct.pack(">H", 1)
        + entries
        + struct.pack(">I", 0)
    )
    body = b"Exif\x00\x00" + tiff
    app1 = b"\xff\xe1" + struct.pack(">H", len(body) + 2) + body
    assert parse_exif(b"\xff\xd8" + app1 + b"\xff\xd9") == {
        "orientation": 7
    }
