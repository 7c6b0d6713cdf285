"""Property-based codec tests (hypothesis): random inputs through
encode→decode must reconstruct exactly (lossless formats) or within
quantization bounds (JPEG). Complements the fixed fixtures in
test_jpeg/test_gif/test_multimodal_codecs with adversarial shapes —
odd dimensions, extreme values, single pixels."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from distcpplus_spark.operators.jpeg import decode_jpeg, encode_jpeg
from distcpplus_spark.operators.multimodal import (
    _build_wav,
    _decode_bmp,
    _decode_png,
    _encode_bmp,
    _encode_png,
    _parse_wav,
)

dims = st.integers(min_value=1, max_value=40)


def _img(h, w, seed):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (h, w, 3), dtype=np.uint8)


@settings(max_examples=25, deadline=None)
@given(h=dims, w=dims, seed=st.integers(0, 2**31))
def test_bmp_roundtrip_exact(h, w, seed):
    px = _img(h, w, seed)
    assert np.array_equal(_decode_bmp(_encode_bmp(px)), px)


@settings(max_examples=25, deadline=None)
@given(h=dims, w=dims, seed=st.integers(0, 2**31))
def test_png_roundtrip_exact(h, w, seed):
    px = _img(h, w, seed)
    assert np.array_equal(_decode_png(_encode_png(px)), px)


@settings(max_examples=15, deadline=None)
@given(
    h=st.integers(1, 33),
    w=st.integers(1, 33),
    seed=st.integers(0, 2**31),
    quality=st.integers(80, 99),
    sub=st.sampled_from(["444", "420"]),
)
def test_jpeg_bounded_error_smooth(h, w, seed, quality, sub):
    """Smooth (blockwise-linear) content: decode error bounded by the
    quantization step budget. Random noise is NOT bounded this way —
    smoothness is part of the property."""
    rng = np.random.default_rng(seed)
    base = rng.integers(40, 216)
    yy, xx = np.mgrid[0:h, 0:w]
    grad = (base + yy * 2 + xx).astype(np.float64)
    px = np.clip(np.stack([grad, grad, grad], axis=2), 0, 255).astype(
        np.uint8
    )
    dec = decode_jpeg(encode_jpeg(px, quality=quality, subsampling=sub))
    assert dec.shape == px.shape
    err = np.abs(dec.astype(int) - px.astype(int))
    assert err.mean() < 6.0
    assert err.max() <= 48  # generous: worst 8x8 corner at q80


@settings(max_examples=25, deadline=None)
@given(h=dims, w=dims, seed=st.integers(0, 2**31), q=st.integers(99, 100))
def test_jpeg_solid_color_exact_property(h, w, seed, q):
    rng = np.random.default_rng(seed)
    c = int(rng.integers(0, 256))
    px = np.full((h, w, 3), c, dtype=np.uint8)
    dec = decode_jpeg(encode_jpeg(px, quality=q, subsampling="420"))
    assert np.array_equal(dec, px)


@settings(max_examples=25, deadline=None)
@given(
    n=st.integers(1, 3000),
    rate=st.sampled_from([8000, 16000, 44100]),
    ch=st.integers(1, 2),
    seed=st.integers(0, 2**31),
)
def test_wav_roundtrip_exact(n, rate, ch, seed):
    rng = np.random.default_rng(seed)
    samples = rng.integers(-32768, 32768, (n, ch)).astype(np.int16)
    r2, c2, b2, out = _parse_wav(_build_wav(samples, rate))
    assert (r2, c2, b2) == (rate, ch, 16)
    assert np.array_equal(out, samples)


@settings(max_examples=20, deadline=None)
@given(
    n_frames=st.integers(1, 20),
    fps=st.sampled_from([1, 5, 24, 30]),
    spc=st.integers(1, 5),
    seed=st.integers(0, 2**31),
)
def test_mp4_sample_table_roundtrip(n_frames, fps, spc, seed):
    from distcpplus_spark.operators.mp4 import build_mp4, parse_mp4

    rng = np.random.default_rng(seed)
    frames = [
        bytes(rng.integers(0, 256, int(rng.integers(1, 200)), dtype=np.uint8))
        for _ in range(n_frames)
    ]
    blob = build_mp4(frames, fps=fps, samples_per_chunk=spc)
    (track,) = parse_mp4(blob)
    assert len(track["samples"]) == n_frames
    for i, (off, size, dts, _) in enumerate(track["samples"]):
        assert blob[off : off + size] == frames[i]
        assert abs(dts - i * (1000 // fps) / 1000) < 1e-9


@settings(max_examples=20, deadline=None)
@given(
    h=st.integers(1, 24),
    w=st.integers(1, 24),
    npal=st.integers(2, 16),
    seed=st.integers(0, 2**31),
)
def test_gif_roundtrip_exact(h, w, npal, seed):
    from distcpplus_spark.operators.gif import decode_gif
    from tests.test_gif import _make_gif

    rng = np.random.default_rng(seed)
    palette = [tuple(int(v) for v in rng.integers(0, 256, 3))
               for _ in range(npal)]
    grid = rng.integers(0, npal, (h, w)).tolist()
    px = decode_gif(_make_gif(grid, palette))
    for y in range(h):
        for x in range(w):
            assert tuple(px[y, x]) == palette[grid[y][x]]


@settings(max_examples=25, deadline=None)
@given(
    n=st.integers(1, 500),
    codec=st.sampled_from(["null", "deflate"]),
    seed=st.integers(0, 2**31),
)
def test_avro_container_roundtrip(n, codec, seed):
    from distcpplus_spark.sources.avro_py import (
        read_container,
        write_container,
    )

    rng = np.random.default_rng(seed)
    schema = {
        "type": "record",
        "name": "r",
        "fields": [
            {"name": "id", "type": "long"},
            {"name": "s", "type": ["null", "string"]},
            {"name": "x", "type": "double"},
            {"name": "tags", "type": {"type": "array", "items": "long"}},
        ],
    }
    recs = [
        {
            "id": int(rng.integers(-(2**62), 2**62)),
            "s": None if rng.random() < 0.3 else f"s{int(rng.integers(1e9))}",
            "x": float(rng.normal()),
            "tags": [int(v) for v in rng.integers(-100, 100,
                                                  int(rng.integers(0, 5)))],
        }
        for _ in range(n)
    ]
    _, out = read_container(
        write_container(recs, schema, codec=codec, block_rows=64)
    )
    assert out == recs


@settings(max_examples=15, deadline=None)
@given(
    n=st.integers(1, 6000),
    ch=st.integers(1, 2),
    rate=st.sampled_from([8000, 16000, 44100]),
    seed=st.integers(0, 2**31),
    block=st.sampled_from([256, 1024, 4096]),
)
def test_flac_roundtrip_lossless(n, ch, rate, seed, block):
    from distcpplus_spark.operators.flac import decode_flac, encode_flac

    rng = np.random.default_rng(seed)
    x = rng.integers(-32768, 32767, (n, ch)).astype(np.int16)
    r, c, bits, y = decode_flac(encode_flac(x, rate, block_size=block))
    assert (r, c, bits) == (rate, ch, 16)
    assert np.array_equal(y, x.astype(np.int32))


@settings(max_examples=20, deadline=None)
@given(h=dims, w=dims, seed=st.integers(0, 2**31))
def test_webp_lossless_roundtrip(h, w, seed):
    from distcpplus_spark.operators.webp import (
        decode_webp,
        encode_webp_lossless,
    )

    px = _img(h, w, seed)
    assert np.array_equal(decode_webp(encode_webp_lossless(px)), px)


@settings(max_examples=12, deadline=None)
@given(
    h=st.integers(1, 33),
    w=st.integers(1, 33),
    seed=st.integers(0, 2**31),
    quality=st.integers(80, 99),
    sub=st.sampled_from(["444", "420"]),
)
def test_progressive_equals_baseline_property(h, w, seed, quality, sub):
    from distcpplus_spark.operators.jpeg import encode_jpeg_progressive

    px = _img(h, w, seed)
    base = decode_jpeg(encode_jpeg(px, quality=quality, subsampling=sub))
    prog = decode_jpeg(
        encode_jpeg_progressive(px, quality=quality, subsampling=sub)
    )
    assert np.array_equal(base, prog)


@settings(max_examples=15, deadline=None)
@given(
    n=st.integers(1, 3000),
    ch=st.integers(1, 2),
    seed=st.integers(0, 2**31),
)
def test_adpcm_decoder_tracks_encoder_state(n, ch, seed):
    import struct as _struct

    from distcpplus_spark.operators.multimodal import _parse_wav
    from tests.test_multimodal_codecs import (
        _ima_reference_encode,
        _make_adpcm_wav,
    )

    rng = np.random.default_rng(seed)
    sig = [rng.integers(-30000, 30000, n).astype(np.int64)
           for _ in range(ch)]
    block_align = 4 * ch + 32 * ch
    blocks, recon = _ima_reference_encode(sig, ch, block_align)
    if not blocks:
        return
    _, got_ch, _, s = _parse_wav(
        _make_adpcm_wav(blocks, 8000, ch, block_align)
    )
    assert got_ch == ch
    for c in range(ch):
        assert list(s[: len(recon[c]), c]) == recon[c]


@settings(max_examples=20, deadline=None)
@given(
    n=st.integers(0, 4000),
    seed=st.integers(0, 2**31),
    low_entropy=st.booleans(),
)
def test_tiff_lzw_roundtrip_property(n, seed, low_entropy):
    from distcpplus_spark.operators.tiff import _lzw_decode_tiff
    from tests.test_tiff import _tiff_lzw_encode

    rng = np.random.default_rng(seed)
    if low_entropy:
        data = bytes(rng.integers(0, 4, n, dtype=np.uint8))
    else:
        data = bytes(rng.integers(0, 256, n, dtype=np.uint8))
    assert _lzw_decode_tiff(_tiff_lzw_encode(data), n) == data
