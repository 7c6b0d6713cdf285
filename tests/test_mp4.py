"""ISO-BMFF parser (operators/mp4.py): byte-exact sample recovery,
stsc/stss walks, time-based and keyframe sampling, the multimodal
wiring, and a hand-assembled fixture independent of the builder."""

import struct

import pytest

from distcpplus_spark.operators.mp4 import (
    build_mp4,
    extract_frame_samples,
    parse_mp4,
)


def _frames(n):
    return [f"frame-{i}-".encode() * (3 + i % 4) for i in range(n)]


def test_samples_recovered_byte_exact():
    frames = _frames(24)
    blob = build_mp4(frames, fps=5, samples_per_chunk=2, sync_every=4)
    (track,) = parse_mp4(blob)
    assert track["handler"] == "vide"
    assert track["timescale"] == 1000
    assert abs(track["duration_s"] - 24 / 5) < 1e-9
    assert len(track["samples"]) == 24
    for i, (off, size, dts, sync) in enumerate(track["samples"]):
        assert blob[off : off + size] == frames[i]
        assert abs(dts - i / 5.0) < 1e-9
        assert sync == (i % 4 == 0)


def test_multi_sample_chunks_walk():
    """3-per-chunk layout with a trailing partial chunk exercises the
    stsc run expansion."""
    frames = _frames(10)
    blob = build_mp4(frames, fps=2, samples_per_chunk=3)
    (track,) = parse_mp4(blob)
    assert [blob[o : o + s] for o, s, _, _ in track["samples"]] == frames


def test_time_sampling_every_second():
    blob = build_mp4(_frames(24), fps=5)
    got = extract_frame_samples(blob, every_n_seconds=1.0)
    assert [g[0] for g in got] == [0, 5, 10, 15, 20]
    assert [round(g[1], 3) for g in got] == [0.0, 1.0, 2.0, 3.0, 4.0]


def test_keyframe_sampling_snaps_to_sync():
    blob = build_mp4(_frames(24), fps=5, sync_every=4)
    got = extract_frame_samples(blob, every_n_seconds=1.0, keyframes_only=True)
    assert got and all(g[0] % 4 == 0 for g in got)


def test_max_frames_cap():
    blob = build_mp4(_frames(40), fps=5)
    got = extract_frame_samples(blob, every_n_seconds=0.0, max_frames=7)
    assert len(got) == 7


def test_rejects_non_bmff_and_fragmented():
    with pytest.raises(ValueError):
        parse_mp4(b"\x00" * 64)
    with pytest.raises(ValueError):
        parse_mp4(b"RIFF" + b"\x00" * 64)  # WAV magic, not BMFF


def test_hand_assembled_minimal_fixture():
    """A tiny MP4 assembled box-by-box in this test (independent of
    build_mp4): one 4-byte sample at a hand-computed mdat offset.
    The parser must return exactly that byte range and a 0.0 dts."""

    def box(fourcc, body):
        return struct.pack(">I", 8 + len(body)) + fourcc + body

    def full(fourcc, ver, flags, body):
        return box(fourcc, struct.pack(">I", (ver << 24) | flags) + body)

    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isom")
    payload = b"ABCD"
    mdat = box(b"mdat", payload)
    sample_off = len(ftyp) + 8  # ftyp + mdat header
    stts = full(b"stts", 0, 0, struct.pack(">III", 1, 1, 100))
    stsz = full(b"stsz", 0, 0, struct.pack(">III", 0, 1, 4))
    stsc = full(b"stsc", 0, 0, struct.pack(">IIII", 1, 1, 1, 1))
    stco = full(b"stco", 0, 0, struct.pack(">II", 1, sample_off))
    stsd = full(b"stsd", 0, 0, struct.pack(">I", 0))
    stbl = box(b"stbl", stsd + stts + stsc + stsz + stco)
    minf = box(b"minf", stbl)
    hdlr = full(b"hdlr", 0, 0, struct.pack(">I", 0) + b"vide" + b"\x00" * 13)
    mdhd = full(
        b"mdhd", 0, 0, struct.pack(">IIIIHH", 0, 0, 100, 100, 0x55C4, 0)
    )
    mdia = box(b"mdia", mdhd + hdlr + minf)
    trak = box(b"trak", mdia)  # tkhd omitted — parser tolerates
    mvhd = full(
        b"mvhd", 0, 0,
        struct.pack(">IIII", 0, 0, 100, 100) + b"\x00" * 80
        + struct.pack(">I", 2),
    )
    moov = box(b"moov", mvhd + trak)
    blob = ftyp + mdat + moov
    (track,) = parse_mp4(blob)
    assert track["samples"] == [(sample_off, 4, 0.0, True)]
    assert blob[sample_off : sample_off + 4] == b"ABCD"


def test_spark_video_sampling_real_and_stub(spark):
    """sample_video_frames: MP4 rows get real container-derived
    frames with pts; opaque bytes keep the stub contract (pts NULL)."""
    from distcpplus_spark.operators.multimodal import sample_video_frames

    blob = build_mp4(_frames(12), fps=4)
    rows = [
        (1, bytearray(blob)),
        (2, bytearray(b"\x00" * 5000)),  # stub path
        (3, None),
    ]
    df = spark.createDataFrame(rows, "media_id LONG, content BINARY")
    out = sample_video_frames(df, every_n_seconds=1.0).collect()
    by_id = {}
    for r in out:
        by_id.setdefault(r["media_id"], []).append(r)
    # real path: samples 0,4,8 at 4 fps
    real = sorted((r["frame_idx"], r["pts_s"]) for r in by_id[1])
    assert real == [(0, 0.0), (4, 1.0), (8, 2.0)]
    frames = _frames(12)
    for r in by_id[1]:
        assert bytes(r["frame"]) == frames[r["frame_idx"]]
    # stub rows keep NULL pts
    assert all(r["pts_s"] is None for r in by_id[2])
    assert 3 not in by_id


def test_mjpeg_frames_decode_to_exact_pixels(spark):
    """extract_video_frame_features: JPEG payloads decode with the
    engine's own codec; non-JPEG payloads keep NULL features but
    real pts."""
    import numpy as np

    from distcpplus_spark.operators.jpeg import encode_jpeg
    from distcpplus_spark.operators.mp4 import build_mp4
    from distcpplus_spark.operators.multimodal import (
        extract_video_frame_features,
    )

    grays = [0, 85, 170, 255]
    jpeg_frames = [
        encode_jpeg(np.full((8, 8, 3), g, dtype=np.uint8), quality=99)
        for g in grays
    ]
    raw_frames = [b"h264-nal-" + bytes([i]) * 20 for i in range(4)]
    df = spark.createDataFrame(
        [(1, build_mp4(jpeg_frames, fps=1)),
         (2, build_mp4(raw_frames, fps=1))],
        "media_id BIGINT, content BINARY",
    )
    rows = extract_video_frame_features(df, every_n_seconds=1.0).collect()
    got = {(r["media_id"], r["frame_idx"]): r for r in rows}
    for i, g in enumerate(grays):
        r = got[(1, i)]
        assert (r["width"], r["height"]) == (8, 8)
        assert abs(r["mean_luma"] - round(g / 255.0, 6)) < 1e-9
        assert r["pts_s"] == float(i)
    for i in range(4):
        r = got[(2, i)]
        assert r["width"] is None and r["mean_luma"] is None
        assert r["pts_s"] == float(i)


def test_animated_gif_as_video_source(spark):
    """extract_video_frame_features treats animated GIFs as video:
    composited frames with pts from the GCE delays, sampled at the
    requested cadence."""
    import struct as _st

    from distcpplus_spark.operators.multimodal import (
        extract_video_frame_features,
    )
    from tests.test_gif import _lzw_encode

    grays = [40, 120, 220]
    # header + logical screen, no global palette
    blob = b"GIF89a" + _st.pack("<HHBBB", 4, 4, 0, 0, 0)
    for g in grays:
        blob += bytes([0x21, 0xF9, 4, 0, 50, 0, 0, 0])  # GCE: 0.5 s
        local_pal = bytes([g, g, g, 0, 0, 0, 0, 0, 0, 0, 0, 0])
        data = _lzw_encode(2, [0] * 16)
        img = (
            _st.pack("<BHHHHB", 0x2C, 0, 0, 4, 4, 0x81)  # local, 4 col
            + local_pal
            + b"\x02"
        )
        for j in range(0, len(data), 255):
            chunk = data[j : j + 255]
            img += bytes((len(chunk),)) + chunk
        img += b"\x00"
        blob += img
    blob += b"\x3b"
    df = spark.createDataFrame(
        [(1, bytes(blob))], "media_id BIGINT, content BINARY"
    )
    rows = sorted(
        extract_video_frame_features(df, every_n_seconds=0.5).collect(),
        key=lambda r: r["frame_idx"],
    )
    assert len(rows) == 3
    for r, g in zip(rows, grays):
        assert (r["width"], r["height"]) == (4, 4)
        assert abs(r["mean_luma"] - round(g / 255.0, 6)) < 1e-6
    assert [r["pts_s"] for r in rows] == [0.0, 0.5, 1.0]
