"""Pure-spec RIFF/AVI container parsing + MJPEG frame extraction —
REAL video pixel decode for the one video codec that needs no codec
library: Motion-JPEG frames are baseline JPEG images, and
datapipe.jpeg decodes those natively. Modern codecs (H.264/H.265/AV1)
stay honestly out of environment scope (multimodal.sample_frames
raises for them).

Format per the public RIFF and AVI specifications (Microsoft
"AVI RIFF File Reference"): a RIFF('AVI ') file is a chunk tree —
LIST('hdrl') holding 'avih' (MainAVIHeader: frame period, counts,
dimensions) and per-stream LIST('strl') with 'strh'/'strf'; frame
data lives in LIST('movi') as '##dc'/'##db' chunks, word-aligned.
``encode_mjpeg_avi`` writes the same structure (round-trip tested
against this parser AND re-read frame-for-frame through the JPEG
codec).
"""

from __future__ import annotations

import struct


class AviError(ValueError):
    """Malformed RIFF/AVI input (data error, not a missing codec)."""


def _chunks(raw: bytes, start: int, end: int):
    """Iterate (fourcc, data_start, data_end) over a chunk sequence;
    chunks are word-aligned per RIFF."""
    pos = start
    while pos + 8 <= end:
        fcc = raw[pos : pos + 4]
        (size,) = struct.unpack_from("<I", raw, pos + 4)
        data_s = pos + 8
        data_e = data_s + size
        if data_e > end:
            raise AviError("chunk overruns its parent")
        yield fcc, data_s, data_e
        pos = data_e + (size & 1)  # pad byte on odd sizes


def _parse_avi_impl(raw: bytes) -> dict:
    """Parse an AVI: header metadata + the MJPEG video frames.

    Returns {width, height, us_per_frame, n_frames, handler,
    frames: [bytes, ...]} where each frame is the raw JPEG bitstream
    of a '##dc'/'##db' chunk of the first video stream. Raises
    AviError for malformed RIFF; NotImplementedError for video
    handlers other than MJPG (a real codec would be needed).
    """
    if len(raw) < 12 or raw[:4] != b"RIFF" or raw[8:12] != b"AVI ":
        raise AviError("not a RIFF/AVI file")
    (riff_size,) = struct.unpack_from("<I", raw, 4)
    end = min(len(raw), 8 + riff_size)

    meta: dict = {"frames": []}
    stream_no = 0
    video_stream: int | None = None

    def walk(s: int, e: int) -> None:
        nonlocal stream_no, video_stream
        for fcc, ds, de in _chunks(raw, s, e):
            if fcc == b"LIST":
                walk(ds + 4, de)  # skip the list type fourcc
            elif fcc == b"avih":
                (uspf,) = struct.unpack_from("<I", raw, ds)
                (total,) = struct.unpack_from("<I", raw, ds + 16)
                w, h = struct.unpack_from("<II", raw, ds + 32)
                meta.update(
                    us_per_frame=uspf, n_frames=total, width=w, height=h
                )
            elif fcc == b"strh":
                fcc_type = raw[ds : ds + 4]
                handler = raw[ds + 4 : ds + 8]
                if fcc_type == b"vids":
                    if handler not in (b"MJPG", b"mjpg"):
                        raise NotImplementedError(
                            f"AVI video handler {handler!r} needs a real "
                            "codec; MJPG decodes natively via datapipe.jpeg"
                        )
                    video_stream = stream_no
                    meta["handler"] = handler.decode("ascii", "replace")
                stream_no += 1
            elif len(fcc) == 4 and fcc[2:4] in (b"dc", b"db"):
                try:
                    sn = int(fcc[:2])
                except ValueError:
                    continue
                if video_stream is not None and sn == video_stream:
                    meta["frames"].append(raw[ds:de])

    walk(12, end)
    if video_stream is None:
        raise AviError("no video stream in AVI")
    return meta


def encode_mjpeg_avi(
    frames: list[bytes], width: int, height: int, fps: int = 10
) -> bytes:
    """Write a minimal spec-correct MJPEG AVI from encoded JPEG
    frames: RIFF('AVI ') / LIST('hdrl'){avih, LIST('strl'){strh,
    strf}} / LIST('movi'){00dc...}."""

    def chunk(fcc: bytes, data: bytes) -> bytes:
        pad = b"\x00" if len(data) & 1 else b""
        return fcc + struct.pack("<I", len(data)) + data + pad

    def lst(four: bytes, data: bytes) -> bytes:
        return chunk(b"LIST", four + data)

    uspf = 1_000_000 // fps
    avih = struct.pack(
        "<14I",
        uspf, 0, 0, 0x10, len(frames), 0, 1, 0, width, height, 0, 0, 0, 0
    )
    strh = (
        b"vids" + b"MJPG"
        + struct.pack("<10I", 0, 0, 0, 1, fps, 0, len(frames), 0, 0, 0)
        + struct.pack("<4H", 0, 0, width, height)
    )
    # BITMAPINFOHEADER for MJPG
    strf = struct.pack(
        "<IiiHH4sIiiII", 40, width, height, 1, 24, b"MJPG",
        width * height * 3, 0, 0, 0, 0
    )
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + lst(
        b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)
    ))
    movi = lst(b"movi", b"".join(chunk(b"00dc", f) for f in frames))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def parse_avi(raw: bytes):
    """Typed-error boundary: any low-level struct/index failure from a
    truncated or corrupt byte stream surfaces as AviError (the parser's
    documented data-error class), never a raw struct.error."""
    import struct as _struct

    try:
        return _parse_avi_impl(raw)
    except (_struct.error, IndexError) as e:
        raise AviError(f"truncated or corrupt input: {e}") from e
