"""ISO-BMFF (MP4) container parsing in pure Python — real frame
sampling without a codec library.

Everything here derives from the public ISO/IEC 14496-12 base media
file format spec: box framing (32-bit size + fourcc, largesize,
size-0-to-EOF), the moov/trak/mdia/minf/stbl hierarchy, and the
sample tables (stts decode deltas, stsz sizes, stsc sample→chunk
runs, stco/co64 chunk offsets, stss sync samples). That is enough to
recover every sample's exact byte range, decode timestamp, and
keyframe flag — i.e. real frame *sampling*. Decoding the codec
payload inside a sample (H.264 etc.) still needs a native decoder
the container lacks; that single step remains stubbed, exactly like
progressive JPEG (operators/jpeg.py handles baseline).

Scale shape: called per-row inside Arrow-batched mapInPandas
(multimodal.sample_video_frames) — the sample-table walk touches
only table bytes (KBs even for hour-long movies), and emitted frame
rows are bounded by the caller's cap so one giant video can't blow
up an executor batch.

The reference engine has no container-awareness at all
(DefaultCopyFilesMapper.java:141-160 copies opaque bytes); this is
part of the extended training-data surface.
"""

from __future__ import annotations

import struct

_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl", b"dinf", b"edts"}


def iter_boxes(data: bytes, start: int, end: int):
    """Yield (fourcc, body_start, body_end) for each box in
    [start, end) — 64-bit largesize and size-0 (to EOF) included."""
    pos = start
    while pos + 8 <= end:
        (size,) = struct.unpack_from(">I", data, pos)
        fourcc = data[pos + 4 : pos + 8]
        body = pos + 8
        if size == 1:
            (size,) = struct.unpack_from(">Q", data, pos + 8)
            body = pos + 16
        elif size == 0:
            size = end - pos
        if size < 8 or pos + size > end:
            raise ValueError(f"bad box size {size} at {pos}")
        yield fourcc, body, pos + size
        pos += size


def _find(data, start, end, fourcc):
    for fc, b, e in iter_boxes(data, start, end):
        if fc == fourcc:
            return b, e
    return None


def _full_box(data, pos):
    """FullBox header: returns (version, flags, body_pos)."""
    (vf,) = struct.unpack_from(">I", data, pos)
    return vf >> 24, vf & 0xFFFFFF, pos + 4


def parse_mp4(content: bytes) -> list[dict]:
    """Parse the container → one dict per track:
    {track_id, handler, timescale, duration_s,
     samples: [(offset, size, dts_s, is_sync), ...]}.
    Raises ValueError for non-BMFF bytes or missing sample tables
    (e.g. fragmented MP4 with moof-resident samples)."""
    if len(content) < 12:
        raise ValueError("too short for BMFF")
    # first box must be a known brand carrier or at least well-formed
    if content[4:8] not in (b"ftyp", b"styp", b"moov", b"free", b"skip",
                            b"mdat", b"wide"):
        raise ValueError("not an ISO-BMFF stream")
    moov = _find(content, 0, len(content), b"moov")
    if moov is None:
        raise ValueError("no moov box")
    tracks = []
    for fc, tb, te in iter_boxes(content, moov[0], moov[1]):
        if fc != b"trak":
            continue
        tracks.append(_parse_trak(content, tb, te))
    if not tracks:
        raise ValueError("no tracks")
    return tracks


def _parse_trak(data: bytes, start: int, end: int) -> dict:
    track_id = None
    tkhd = _find(data, start, end, b"tkhd")
    if tkhd:
        ver, _, p = _full_box(data, tkhd[0])
        # creation+modification times are 4 or 8 bytes each by version
        p += 16 if ver == 1 else 8
        (track_id,) = struct.unpack_from(">I", data, p)
    mdia = _find(data, start, end, b"mdia")
    if mdia is None:
        raise ValueError("trak without mdia")
    mdhd = _find(data, mdia[0], mdia[1], b"mdhd")
    if mdhd is None:
        raise ValueError("mdia without mdhd")
    ver, _, p = _full_box(data, mdhd[0])
    if ver == 1:
        timescale, duration = struct.unpack_from(">IQ", data, p + 16)
    else:
        timescale, duration = struct.unpack_from(">II", data, p + 8)
    handler = b"????"
    hdlr = _find(data, mdia[0], mdia[1], b"hdlr")
    if hdlr:
        _, _, p = _full_box(data, hdlr[0])
        handler = data[p + 4 : p + 8]
    minf = _find(data, mdia[0], mdia[1], b"minf")
    stbl = _find(data, minf[0], minf[1], b"stbl") if minf else None
    if stbl is None:
        raise ValueError("track without stbl")
    samples = _parse_sample_tables(data, stbl[0], stbl[1], timescale)
    return {
        "track_id": track_id,
        "handler": handler.decode("latin-1"),
        "timescale": timescale,
        "duration_s": duration / timescale if timescale else 0.0,
        "samples": samples,
    }


def _parse_sample_tables(data, start, end, timescale):
    """Join stts+stsz+stsc+stco(+stss) into per-sample
    (offset, size, dts_s, is_sync) tuples — the core table walk."""
    boxes = {fc: (b, e) for fc, b, e in iter_boxes(data, start, end)}
    for need in (b"stts", b"stsz", b"stsc"):
        if need not in boxes:
            raise ValueError(f"missing {need.decode()} (fragmented file?)")
    if b"stco" not in boxes and b"co64" not in boxes:
        raise ValueError("missing stco/co64")

    # stts: decode-time deltas
    _, _, p = _full_box(data, boxes[b"stts"][0])
    (n_ent,) = struct.unpack_from(">I", data, p)
    dts = []
    t = 0
    q = p + 4
    for _ in range(n_ent):
        cnt, delta = struct.unpack_from(">II", data, q)
        q += 8
        for _ in range(cnt):
            dts.append(t)
            t += delta

    # stsz: sizes
    _, _, p = _full_box(data, boxes[b"stsz"][0])
    uniform, n_samples = struct.unpack_from(">II", data, p)
    if uniform:
        sizes = [uniform] * n_samples
    else:
        sizes = list(
            struct.unpack_from(f">{n_samples}I", data, p + 8)
        )

    # stco / co64: chunk offsets
    if b"stco" in boxes:
        _, _, p = _full_box(data, boxes[b"stco"][0])
        (n_chunks,) = struct.unpack_from(">I", data, p)
        chunk_offsets = list(struct.unpack_from(f">{n_chunks}I", data, p + 4))
    else:
        _, _, p = _full_box(data, boxes[b"co64"][0])
        (n_chunks,) = struct.unpack_from(">I", data, p)
        chunk_offsets = list(struct.unpack_from(f">{n_chunks}Q", data, p + 4))

    # stsc: sample→chunk runs → samples-per-chunk per chunk index
    _, _, p = _full_box(data, boxes[b"stsc"][0])
    (n_ent,) = struct.unpack_from(">I", data, p)
    runs = []
    q = p + 4
    for _ in range(n_ent):
        first, per, _sdi = struct.unpack_from(">III", data, q)
        q += 12
        runs.append((first, per))
    per_chunk = []
    for ci in range(1, n_chunks + 1):
        per = 0
        for first, cnt in runs:
            if ci >= first:
                per = cnt
            else:
                break
        per_chunk.append(per)

    # stss: sync samples (1-based); absent → every sample is sync
    sync = None
    if b"stss" in boxes:
        _, _, p = _full_box(data, boxes[b"stss"][0])
        (n_ent,) = struct.unpack_from(">I", data, p)
        sync = set(struct.unpack_from(f">{n_ent}I", data, p + 4))

    samples = []
    si = 0
    for ci, coff in enumerate(chunk_offsets):
        off = coff
        for _ in range(per_chunk[ci]):
            if si >= n_samples:
                break
            samples.append(
                (
                    off,
                    sizes[si],
                    dts[si] / timescale if timescale else 0.0,
                    (si + 1) in sync if sync is not None else True,
                )
            )
            off += sizes[si]
            si += 1
    if si != n_samples:
        raise ValueError(
            f"sample walk covered {si} of {n_samples} samples"
        )
    return samples


def extract_frame_samples(
    content: bytes,
    every_n_seconds: float = 1.0,
    keyframes_only: bool = False,
    max_frames: int = 32,
) -> list[tuple[int, float, bytes]]:
    """Real frame sampling from a progressive MP4: pick the video
    track, walk its sample table, and emit (sample_idx, pts_s,
    sample_bytes) for one sample per ``every_n_seconds`` of decode
    time (the first sample at-or-after each target instant; with
    ``keyframes_only`` targets snap forward to sync samples). The
    bytes are the EXACT encoded sample payload cut from mdat —
    decoding them to pixels is the one step that still needs a codec
    lib."""
    tracks = parse_mp4(content)
    video = [t for t in tracks if t["handler"] == "vide"] or tracks
    samples = video[0]["samples"]
    out = []
    next_target = 0.0
    for idx, (off, size, dts_s, is_sync) in enumerate(samples):
        if len(out) >= max_frames:
            break
        if dts_s + 1e-9 < next_target:
            continue
        if keyframes_only and not is_sync:
            continue
        out.append((idx, dts_s, content[off : off + size]))
        next_target = dts_s + every_n_seconds
    return out


# ------------------------------------------------------------ fixture


def build_mp4(
    frames: list[bytes],
    fps: int = 5,
    timescale: int = 1000,
    samples_per_chunk: int = 2,
    sync_every: int = 4,
) -> bytes:
    """Assemble a minimal but structurally valid progressive MP4
    (ftyp + mdat + moov with full sample tables) carrying ``frames``
    as the video samples. Multi-sample chunks exercise the stsc walk;
    every ``sync_every``-th sample is marked sync in stss. Used by
    tests and oracle queries the way _encode_bmp/_build_wav are:
    deterministic fixtures the parser must invert exactly."""
    if not frames:
        raise ValueError("need at least one frame")
    delta = timescale // fps

    def box(fourcc: bytes, body: bytes) -> bytes:
        return struct.pack(">I", 8 + len(body)) + fourcc + body

    def full(fourcc: bytes, ver: int, flags: int, body: bytes) -> bytes:
        return box(fourcc, struct.pack(">I", (ver << 24) | flags) + body)

    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2")
    mdat_payload = b"".join(frames)
    mdat = box(b"mdat", mdat_payload)
    # chunk offsets are absolute file offsets into mdat's payload;
    # moov is written AFTER mdat so offsets don't depend on moov size
    base = len(ftyp) + 8
    offsets = []
    acc = 0
    for i, f in enumerate(frames):
        if i % samples_per_chunk == 0:
            offsets.append(base + acc)
        acc += len(f)

    n = len(frames)
    duration = n * delta
    stts = full(b"stts", 0, 0, struct.pack(">III", 1, n, delta))
    stsz = full(
        b"stsz", 0, 0,
        struct.pack(">II", 0, n) + b"".join(
            struct.pack(">I", len(f)) for f in frames
        ),
    )
    stsc = full(
        b"stsc", 0, 0, struct.pack(">IIII", 1, 1, samples_per_chunk, 1)
    )
    stco = full(
        b"stco", 0, 0,
        struct.pack(">I", len(offsets)) + b"".join(
            struct.pack(">I", o) for o in offsets
        ),
    )
    syncs = [i + 1 for i in range(n) if i % sync_every == 0]
    stss = full(
        b"stss", 0, 0,
        struct.pack(">I", len(syncs)) + b"".join(
            struct.pack(">I", s) for s in syncs
        ),
    )
    # minimal avc1 visual sample entry (86 bytes): parser-agnostic
    entry = (
        struct.pack(">I", 86) + b"avc1" + b"\x00" * 6 + struct.pack(">H", 1)
        + b"\x00" * 16 + struct.pack(">HH", 64, 64)
        + struct.pack(">II", 0x00480000, 0x00480000) + b"\x00" * 4
        + struct.pack(">H", 1) + b"\x00" * 32
        + struct.pack(">Hh", 24, -1)
    )
    stsd = full(b"stsd", 0, 0, struct.pack(">I", 1) + entry)
    stbl = box(b"stbl", stsd + stts + stsc + stsz + stco + stss)
    url = full(b"url ", 0, 1, b"")
    dref = full(b"dref", 0, 0, struct.pack(">I", 1) + url)
    dinf = box(b"dinf", dref)
    vmhd = full(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
    minf = box(b"minf", vmhd + dinf + stbl)
    hdlr = full(
        b"hdlr", 0, 0,
        struct.pack(">I", 0) + b"vide" + b"\x00" * 12 + b"VideoHandler\x00",
    )
    mdhd = full(
        b"mdhd", 0, 0,
        struct.pack(">IIIIHH", 0, 0, timescale, duration, 0x55C4, 0),
    )
    mdia = box(b"mdia", mdhd + hdlr + minf)
    tkhd = full(
        b"tkhd", 0, 7,
        struct.pack(">IIII", 0, 0, 1, 0)
        + struct.pack(">I", duration) + b"\x00" * 8
        + struct.pack(">HHHH", 0, 0, 0, 0)
        + struct.pack(
            ">9I", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000
        )
        + struct.pack(">II", 64 << 16, 64 << 16),
    )
    trak = box(b"trak", tkhd + mdia)
    mvhd = full(
        b"mvhd", 0, 0,
        struct.pack(">IIII", 0, 0, timescale, duration)
        + struct.pack(">IHH", 0x00010000, 0x0100, 0) + b"\x00" * 8
        + struct.pack(
            ">9I", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000
        )
        + b"\x00" * 24 + struct.pack(">I", 2),
    )
    moov = box(b"moov", mvhd + trak)
    return ftyp + mdat + moov
