"""Pure-spec MPEG audio (MP3) FRAME PARSER — metadata without decode.

Implements the public MPEG-1/2/2.5 audio frame-header layout (ISO/IEC
11172-3 / 13818-3): sync walk, bitrate/samplerate tables, frame-length
arithmetic, ID3v2 skip, and Xing/Info VBR-header detection. This gives
the metadata a 100 TB audio-curation pass actually needs — duration,
rate, channel mode, CBR/VBR, frame count — while SAMPLE DECODE stays
honestly out of scope (the polyphase filterbank + Huffman tables are
codec-library work; see multimodal.decode_audio's NotImplementedError
path).

No reference analog (the reference's io/ is text/avro/rubix only);
north-star surface like the other pure-spec codecs (jpeg/png/flac).
"""

from __future__ import annotations


class Mp3Error(ValueError):
    """Malformed/unsupported MPEG audio stream (data error, not a bug)."""


#: bitrate kbps tables[version_key][layer] indexed by the 4-bit field;
#: 0 = free-format (unsupported here), None = invalid
_BITRATES = {
    # MPEG-1
    (1, 1): [0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448],
    (1, 2): [0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384],
    (1, 3): [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320],
    # MPEG-2 / 2.5
    (2, 1): [0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256],
    (2, 2): [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
    (2, 3): [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
}

_SAMPLE_RATES = {1: [44100, 48000, 32000], 2: [22050, 24000, 16000], 25: [11025, 12000, 8000]}

#: samples per frame by (version_key, layer)
_SPF = {
    (1, 1): 384, (1, 2): 1152, (1, 3): 1152,
    (2, 1): 384, (2, 2): 1152, (2, 3): 576,
}


def _id3v2_size(raw: bytes) -> int:
    """Bytes to skip for a leading ID3v2 tag (0 if none)."""
    if len(raw) >= 10 and raw[:3] == b"ID3":
        if any(b & 0x80 for b in raw[6:10]):
            raise Mp3Error("ID3v2 size bytes not syncsafe")
        size = (raw[6] << 21) | (raw[7] << 14) | (raw[8] << 7) | raw[9]
        return 10 + size + (10 if raw[5] & 0x10 else 0)  # footer flag
    return 0


def _parse_header(b: bytes):
    """(version_key, ver25, layer, bitrate_kbps, sample_rate, padding,
    channels) from a 4-byte frame header, or None if not a sync."""
    if len(b) < 4 or b[0] != 0xFF or (b[1] & 0xE0) != 0xE0:
        return None
    ver_bits = (b[1] >> 3) & 0x3
    if ver_bits == 1:
        return None  # reserved
    ver25 = ver_bits == 0
    vkey = 1 if ver_bits == 3 else 2
    layer = {1: 3, 2: 2, 3: 1}.get((b[1] >> 1) & 0x3)
    if layer is None:
        return None
    br_idx = (b[2] >> 4) & 0xF
    sr_idx = (b[2] >> 2) & 0x3
    if br_idx in (0, 15) or sr_idx == 3:
        return None  # free-format / invalid
    bitrate = _BITRATES[(vkey, layer)][br_idx]
    srates = _SAMPLE_RATES[25 if ver25 else vkey]
    sample_rate = srates[sr_idx]
    padding = (b[2] >> 1) & 0x1
    mode = (b[3] >> 6) & 0x3
    channels = 1 if mode == 3 else 2
    return vkey, ver25, layer, bitrate, sample_rate, padding, channels


def _frame_len(vkey: int, layer: int, bitrate_kbps: int, sample_rate: int, padding: int) -> int:
    bps = bitrate_kbps * 1000
    if layer == 1:
        return (12 * bps // sample_rate + padding) * 4
    if layer in (2, 3) and vkey == 1 or layer == 2:
        return 144 * bps // sample_rate + padding
    # MPEG-2/2.5 layer III
    return 72 * bps // sample_rate + padding


def parse_mp3(raw: bytes) -> dict:
    """Walk every frame of an MPEG audio stream; return its metadata.

    Output keys: version ('1'/'2'/'2.5'), layer, sample_rate,
    n_channels, n_frames, n_samples, duration_sec, bitrate_kbps
    (average, exact for CBR), is_vbr, has_xing, id3v2_bytes.

    Raises :class:`Mp3Error` on no-sync, mid-stream desync, or
    truncated final frames — malformed DATA, distinct from bugs.
    """
    skip = _id3v2_size(raw)
    pos = skip
    if pos >= len(raw):
        raise Mp3Error("no audio data after ID3v2 tag")
    first = None
    n_frames = 0
    n_samples = 0
    bit_sum = 0
    bitrates = set()
    has_xing = False
    while pos < len(raw):
        if len(raw) - pos < 4:
            raise Mp3Error(f"truncated header at byte {pos}")
        h = _parse_header(raw[pos : pos + 4])
        if h is None:
            raise Mp3Error(f"lost frame sync at byte {pos}")
        vkey, ver25, layer, br, sr, pad, nch = h
        if first is None:
            first = h
        elif (vkey, ver25, layer, sr) != (first[0], first[1], first[2], first[4]):
            raise Mp3Error(f"stream parameters changed at byte {pos}")
        flen = _frame_len(vkey, layer, br, sr, pad)
        if flen < 4 or pos + flen > len(raw):
            raise Mp3Error(f"truncated frame at byte {pos}")
        if n_frames == 0 and layer == 3:
            # Xing/Info header sits after the side info of frame 0
            side = (17 if nch == 1 else 32) if vkey == 1 else (9 if nch == 1 else 17)
            tag = raw[pos + 4 + side : pos + 4 + side + 4]
            has_xing = tag in (b"Xing", b"Info")
        n_frames += 1
        n_samples += _SPF[(vkey, layer)]
        bit_sum += br
        bitrates.add(br)
        pos += flen
    vkey, ver25, layer, _, sr, _, nch = first
    return {
        "version": "2.5" if ver25 else str(vkey),
        "layer": layer,
        "sample_rate": sr,
        "n_channels": nch,
        "n_frames": n_frames,
        "n_samples": n_samples,
        "duration_sec": n_samples / sr,
        "bitrate_kbps": bit_sum / n_frames,
        "is_vbr": len(bitrates) > 1,
        "has_xing": has_xing,
        "id3v2_bytes": skip,
    }


def build_cbr_mp3(
    n_frames: int,
    bitrate_kbps: int = 128,
    sample_rate: int = 44100,
    mono: bool = False,
    id3: bytes | None = None,
) -> bytes:
    """Fixture builder: a syntactically valid CBR MPEG-1 Layer III
    stream of silent (zero-payload) frames — header arithmetic only,
    enough to exercise the parser without a codec."""
    br_idx = _BITRATES[(1, 3)].index(bitrate_kbps)
    sr_idx = _SAMPLE_RATES[1].index(sample_rate)
    out = bytearray()
    if id3 is not None:
        size = len(id3)
        out += b"ID3" + bytes([4, 0, 0]) + bytes(
            [(size >> 21) & 0x7F, (size >> 14) & 0x7F, (size >> 7) & 0x7F, size & 0x7F]
        ) + id3
    for _ in range(n_frames):
        b1 = 0xFF
        b2 = 0xE0 | (3 << 3) | (1 << 1) | 1  # MPEG-1, layer III, no CRC
        b3 = (br_idx << 4) | (sr_idx << 2)
        b4 = (3 << 6) if mono else 0  # mono / stereo mode
        flen = _frame_len(1, 3, bitrate_kbps, sample_rate, 0)
        out += bytes([b1, b2, b3, b4]) + b"\x00" * (flen - 4)
    return bytes(out)
