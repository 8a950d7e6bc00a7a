"""Minimal ISO BMFF (MP4) demuxer — pure struct parsing, no codec.

Closes the container HALF of the video stub honestly: the sample
tables of a progressive (non-fragmented) MP4 fully describe every
sample's byte range and timestamp (ISO/IEC 14496-12, public spec), so
frame sampling — "give me every Nth video sample as a blob" — needs
no codec at all. DECODING those samples (H.264/H.265 NAL units) still
requires a real video codec and stays NotImplementedError in
datapipe.multimodal.

Supported: ftyp/moov/trak/mdia/minf/stbl hierarchy, stsd (fourcc
only), stts, stsc, stsz/stz2-less files, stco + co64, 32/64-bit box
sizes, version 0/1 mdhd. Fragmented MP4 (moof) raises
NotImplementedError.

No reference analog (`/root/reference` io is text/avro/rubix only);
new surface for the multimodal pipeline.
"""

from __future__ import annotations

import struct
from typing import Iterator


class Mp4Error(ValueError):
    pass


def _boxes(raw: bytes, start: int, end: int) -> Iterator[tuple[bytes, int, int]]:
    """Yield (fourcc, payload_start, payload_end) for each box in
    [start, end)."""
    pos = start
    while pos + 8 <= end:
        size, fourcc = struct.unpack_from(">I4s", raw, pos)
        header = 8
        if size == 1:
            if pos + 16 > end:
                raise Mp4Error("truncated largesize box header")
            size = struct.unpack_from(">Q", raw, pos + 8)[0]
            header = 16
        elif size == 0:  # box extends to end of enclosing scope
            size = end - pos
        if size < header or pos + size > end:
            raise Mp4Error(f"box {fourcc!r} overruns its container")
        yield fourcc, pos + header, pos + size
        pos += size


def _find(raw: bytes, start: int, end: int, fourcc: bytes) -> list[tuple[int, int]]:
    return [(s, e) for f, s, e in _boxes(raw, start, end) if f == fourcc]


def _full_box(raw: bytes, start: int) -> tuple[int, int]:
    """(version, body_start) of a full box: skips version+flags."""
    return raw[start], start + 4


def _parse_track(raw: bytes, trak_s: int, trak_e: int) -> dict | None:
    mdia = _find(raw, trak_s, trak_e, b"mdia")
    if not mdia:
        return None
    mdia_s, mdia_e = mdia[0]
    handler = None
    timescale = None
    stbl_span = None
    for f, s, e in _boxes(raw, mdia_s, mdia_e):
        if f == b"mdhd":
            ver, b = _full_box(raw, s)
            timescale = struct.unpack_from(">I", raw, b + (16 if ver == 1 else 8))[0]
        elif f == b"hdlr":
            _, b = _full_box(raw, s)
            handler = raw[b + 4 : b + 8]
        elif f == b"minf":
            stbl = _find(raw, s, e, b"stbl")
            if stbl:
                stbl_span = stbl[0]
    if stbl_span is None:
        return None
    stbl_s, stbl_e = stbl_span
    codec = None
    stts: list[tuple[int, int]] = []
    stsc: list[tuple[int, int]] = []
    sizes: list[int] | None = None
    uniform_size = 0
    offsets: list[int] = []
    for f, s, e in _boxes(raw, stbl_s, stbl_e):
        _, b = _full_box(raw, s)
        if f == b"stsd":
            n = struct.unpack_from(">I", raw, b)[0]
            if n >= 1:
                codec = raw[b + 8 : b + 12].decode("latin1")
        elif f == b"stts":
            (n,) = struct.unpack_from(">I", raw, b)
            stts = [struct.unpack_from(">II", raw, b + 4 + 8 * i) for i in range(n)]
        elif f == b"stsc":
            (n,) = struct.unpack_from(">I", raw, b)
            stsc = [
                struct.unpack_from(">II", raw, b + 4 + 12 * i) for i in range(n)
            ]  # (first_chunk, samples_per_chunk); sample_desc_idx ignored
        elif f == b"stsz":
            uniform_size, n = struct.unpack_from(">II", raw, b)
            if uniform_size == 0:
                sizes = list(
                    struct.unpack_from(f">{n}I", raw, b + 8)
                ) if n else []
        elif f == b"stco":
            (n,) = struct.unpack_from(">I", raw, b)
            offsets = list(struct.unpack_from(f">{n}I", raw, b + 4)) if n else []
        elif f == b"co64":
            (n,) = struct.unpack_from(">I", raw, b)
            offsets = list(struct.unpack_from(f">{n}Q", raw, b + 4)) if n else []
    n_samples = len(sizes) if sizes is not None else sum(c for c, _ in stts)
    if sizes is None:
        sizes = [uniform_size] * n_samples
    # expand stsc: samples-per-chunk for each chunk (1-based first_chunk)
    samples: list[tuple[int, int, float]] = []  # (offset, size, dts_sec)
    deltas: list[int] = []
    for count, delta in stts:
        deltas.extend([delta] * count)
    ts = float(timescale or 1)
    si = 0
    dts = 0
    for ci, chunk_off in enumerate(offsets):
        spc = 0
        for first_chunk, samples_per_chunk in stsc:
            if first_chunk <= ci + 1:
                spc = samples_per_chunk
            else:
                break
        off = chunk_off
        for _ in range(spc):
            if si >= len(sizes):
                break
            samples.append((off, sizes[si], dts / ts))
            off += sizes[si]
            dts += deltas[si] if si < len(deltas) else 0
            si += 1
    return {
        "handler": (handler or b"????").decode("latin1"),
        "codec": codec,
        "timescale": timescale,
        "samples": samples,
    }


def demux_mp4(raw: bytes) -> list[dict]:
    """Parse a progressive MP4's sample tables. Returns one dict per
    track: {handler, codec, timescale, samples: [(offset, size,
    dts_sec), ...]} with offsets into ``raw``. Raises Mp4Error for
    malformed files, NotImplementedError for fragmented (moof) MP4."""
    if len(raw) < 12:
        raise Mp4Error("too short for an MP4")
    top = list(_boxes(raw, 0, len(raw)))
    types = [f for f, _, _ in top]
    if b"ftyp" not in types or b"moov" not in types:
        raise Mp4Error("not a progressive MP4 (missing ftyp/moov)")
    if b"moof" in types:
        raise NotImplementedError("fragmented MP4 (moof) unsupported")
    moov_s, moov_e = next((s, e) for f, s, e in top if f == b"moov")
    tracks = []
    for f, s, e in _boxes(raw, moov_s, moov_e):
        if f == b"trak":
            t = _parse_track(raw, s, e)
            if t is not None:
                tracks.append(t)
    if not tracks:
        raise Mp4Error("moov contains no usable trak")
    return tracks


def video_samples(
    raw: bytes, every_nth: int = 1
) -> list[tuple[int, bytes, float]]:
    """Every ``every_nth``-th sample of the first video ('vide')
    track: [(sample_idx, sample_bytes, dts_sec), ...]. The bytes are
    the still-encoded access units (decoding needs a codec)."""
    tracks = demux_mp4(raw)
    vide = next((t for t in tracks if t["handler"] == "vide"), None)
    if vide is None:
        raise Mp4Error("no video track")
    out = []
    for i, (off, size, t) in enumerate(vide["samples"]):
        if i % max(every_nth, 1):
            continue
        if off + size > len(raw):
            raise Mp4Error(f"sample {i} byte range exceeds file")
        out.append((i, raw[off : off + size], t))
    return out

# --- MJPEG-in-MP4 muxer ------------------------------------------------------
# Writer counterpart of demux_mp4 for the one video codec this repo
# decodes natively (the pure-spec JPEG codec): each sample is a whole
# JPEG bitstream, sample entry fourcc 'jpeg' (ISO/IEC 14496-12 visual
# sample entry). With this both container families — RIFF/AVI and ISO
# BMFF/MP4 — round-trip to real pixels without any codec library.


def _box(fourcc: bytes, payload: bytes) -> bytes:
    return struct.pack(">I4s", 8 + len(payload), fourcc) + payload


def _full(fourcc: bytes, version: int, flags: int, body: bytes) -> bytes:
    return _box(fourcc, struct.pack(">B3s", version, flags.to_bytes(3, "big")) + body)


def encode_mjpeg_mp4(
    jpeg_frames: list[bytes],
    width: int,
    height: int,
    fps: int = 5,
    timescale: int = 1000,
) -> bytes:
    """Mux already-encoded JPEG bitstreams into a minimal progressive
    MP4 (ftyp + mdat + moov; one 'vide' track, sample entry 'jpeg',
    one chunk per sample, absolute stco offsets). The output parses
    with demux_mp4/video_samples sample-for-sample and decodes with
    decode_video_frames' MJPEG-in-MP4 path."""
    if not jpeg_frames:
        raise Mp4Error("no frames to mux")
    for f in jpeg_frames:
        if f[:2] != b"\xff\xd8":
            raise Mp4Error("frame is not a JPEG bitstream (missing SOI)")
    n = len(jpeg_frames)
    delta = max(timescale // max(fps, 1), 1)
    duration = n * delta

    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2")
    mdat_payload = b"".join(jpeg_frames)
    # absolute sample offsets: ftyp, then mdat header (8), then frames
    base = len(ftyp) + 8
    offsets = []
    off = base
    for f in jpeg_frames:
        offsets.append(off)
        off += len(f)
    mdat = _box(b"mdat", mdat_payload)

    # stbl leaves
    entry = (
        struct.pack(">I4s", 86, b"jpeg")
        + b"\x00" * 6 + struct.pack(">H", 1)          # reserved + data_ref_idx
        + b"\x00" * 16                                  # pre_defined/reserved
        + struct.pack(">HH", width, height)
        + struct.pack(">II", 0x480000, 0x480000)        # 72 dpi
        + b"\x00" * 4 + struct.pack(">H", 1)            # reserved + frame_count
        + b"\x0bMotion JPEG" + b"\x00" * 20             # compressorname (32)
        + struct.pack(">Hh", 24, -1)                    # depth, pre_defined
    )
    stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1) + entry)
    stts = _full(b"stts", 0, 0, struct.pack(">III", 1, n, delta))
    stsc = _full(b"stsc", 0, 0, struct.pack(">IIII", 1, 1, 1, 1))
    stsz = _full(
        b"stsz", 0, 0,
        struct.pack(">II", 0, n) + struct.pack(f">{n}I", *map(len, jpeg_frames)),
    )
    stco = _full(b"stco", 0, 0, struct.pack(">I", n) + struct.pack(f">{n}I", *offsets))
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)

    url = _full(b"url ", 0, 1, b"")
    dref = _full(b"dref", 0, 0, struct.pack(">I", 1) + url)
    dinf = _box(b"dinf", dref)
    vmhd = _full(b"vmhd", 0, 1, b"\x00" * 8)
    minf = _box(b"minf", vmhd + dinf + stbl)

    hdlr = _full(b"hdlr", 0, 0, b"\x00" * 4 + b"vide" + b"\x00" * 12 + b"mjpeg\x00")
    mdhd = _full(
        b"mdhd", 0, 0,
        struct.pack(">IIII", 0, 0, timescale, duration) + struct.pack(">HH", 0x55C4, 0),
    )
    mdia = _box(b"mdia", mdhd + hdlr + minf)

    tkhd = _full(
        b"tkhd", 0, 7,
        struct.pack(">IIII", 0, 0, 1, 0)                # times, track_id, reserved
        + struct.pack(">I", duration) + b"\x00" * 8
        + struct.pack(">hhhh", 0, 0, 0, 0)              # layer/group/volume/res
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + struct.pack(">II", width << 16, height << 16),
    )
    trak = _box(b"trak", tkhd + mdia)

    mvhd = _full(
        b"mvhd", 0, 0,
        struct.pack(">IIII", 0, 0, timescale, duration)
        + struct.pack(">IH2s", 0x00010000, 0x0100, b"\x00\x00") + b"\x00" * 8
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + b"\x00" * 24 + struct.pack(">I", 2),          # pre_defined + next_track
    )
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov
