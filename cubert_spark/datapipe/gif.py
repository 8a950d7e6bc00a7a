"""Pure-spec GIF codec (GIF87a/GIF89a, public W3C/CompuServe spec):
LZW-compressed palette images decoded with stdlib+numpy only — the
fourth real image format beside BMP/JPEG/PNG (datapipe.multimodal
dispatches on the signature). Animated GIFs decode as a frame LIST
(full-frame composition for the common disposal cases: each frame is
drawn over the previous canvas at its offset), which also makes GIF
the second real video-ish tier beside MJPEG AVI.

``encode_gif`` writes a valid single- or multi-frame file using the
spec's clear-code idiom (emit a CLEAR whenever the dictionary would
force a width grow — legal LZW, no compression ratio, bit-exact
round-trips against this decoder and any conforming reader).
"""

from __future__ import annotations

import struct

import numpy as np


class GifError(ValueError):
    """Malformed GIF input (data error, not a missing codec)."""


def _lzw_decode(data: bytes, min_code: int, n_pixels: int) -> np.ndarray:
    clear = 1 << min_code
    end = clear + 1
    out = np.empty(n_pixels, dtype=np.uint8)
    n_out = 0

    # bit reader: LSB-first across the concatenated sub-block bytes
    acc = 0
    nbits = 0
    pos = 0
    width = min_code + 1
    dict_codes: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    prev: bytes | None = None

    while n_out < n_pixels:
        while nbits < width:
            if pos >= len(data):
                raise GifError("LZW stream exhausted")
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width

        if code == clear:
            dict_codes = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            entry = dict_codes[code]
        elif code < len(dict_codes):
            entry = dict_codes[code]
            dict_codes.append(prev + entry[:1])
        elif code == len(dict_codes):
            entry = prev + prev[:1]
            dict_codes.append(entry)
        else:
            raise GifError("invalid LZW code")
        take = min(len(entry), n_pixels - n_out)
        out[n_out : n_out + take] = np.frombuffer(entry[:take], dtype=np.uint8)
        n_out += take
        prev = entry
        if len(dict_codes) == (1 << width) and width < 12:
            width += 1
    if n_out < n_pixels:
        raise GifError("LZW stream short of pixels")
    return out


def _sub_blocks(raw: bytes, pos: int) -> tuple[bytes, int]:
    chunks = []
    while True:
        if pos >= len(raw):
            raise GifError("unterminated sub-blocks")
        n = raw[pos]
        pos += 1
        if n == 0:
            break
        chunks.append(raw[pos : pos + n])
        pos += n
    return b"".join(chunks), pos


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _decode_gif_impl(raw: bytes) -> list[np.ndarray]:
    """Decode every frame to an (h, w, 3) RGB uint8 array on the
    logical-screen canvas (frames composited over the previous one at
    their offsets — the draw-over disposal common case). Raises
    GifError for malformed input."""
    if raw[:6] not in (b"GIF87a", b"GIF89a"):
        raise GifError("not a GIF file")
    sw, sh, flags, _bg, _ar = struct.unpack_from("<HHBBB", raw, 6)
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 7)
        gct = np.frombuffer(raw, np.uint8, 3 * n, pos).reshape(n, 3)
        pos += 3 * n

    canvas = np.zeros((sh, sw, 3), dtype=np.uint8)
    frames: list[np.ndarray] = []
    transparent: int | None = None

    while pos < len(raw):
        b = raw[pos]
        pos += 1
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension
            label = raw[pos]
            pos += 1
            if label == 0xF9 and raw[pos] >= 4:  # graphic control
                gflags = raw[pos + 1]
                tindex = raw[pos + 4]
                transparent = tindex if gflags & 1 else None
            _, pos = _sub_blocks(raw, pos)
            continue
        if b != 0x2C:
            raise GifError(f"unexpected block 0x{b:02x}")
        x, y, w, h, iflags = struct.unpack_from("<HHHHB", raw, pos)
        pos += 9
        ct = gct
        if iflags & 0x80:
            n = 2 << (iflags & 7)
            ct = np.frombuffer(raw, np.uint8, 3 * n, pos).reshape(n, 3)
            pos += 3 * n
        if ct is None:
            raise GifError("no color table")
        min_code = raw[pos]
        pos += 1
        data, pos = _sub_blocks(raw, pos)
        idx = _lzw_decode(data, min_code, w * h)
        if (iflags & 0x40) != 0:  # interlaced: reorder rows
            rows = idx.reshape(h, w)
            out_rows = np.empty_like(rows)
            src = 0
            for start, step in _INTERLACE_PASSES:
                for r in range(start, h, step):
                    out_rows[r] = rows[src]
                    src += 1
            idx = out_rows.reshape(-1)
        if idx.max(initial=0) >= len(ct):
            raise GifError("palette index out of range")
        rgb = ct[idx.reshape(h, w)]
        region = canvas[y : y + h, x : x + w]
        if transparent is not None:
            mask = idx.reshape(h, w) != transparent
            region[mask] = rgb[mask]
        else:
            region[:, :] = rgb
        frames.append(canvas.copy())
        # GIF89a: a Graphic Control Extension applies only to the
        # FIRST rendering block after it — reset so a frame with no
        # GCE of its own doesn't inherit the previous transparency
        transparent = None
    if not frames:
        raise GifError("no image data in GIF")
    return frames


def _lzw_encode_flat(indices: np.ndarray, min_code: int) -> bytes:
    """Spec-valid LZW with the fixed-width clear idiom: emit CLEAR
    whenever the next code would widen the field, then each pixel as
    a literal code. No compression; bit-exact under any decoder."""
    clear = 1 << min_code
    end = clear + 1
    width = min_code + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    # after CLEAR the dict holds end+1 codes; each literal adds one —
    # reset before the width would have to grow
    budget = (1 << width) - (end + 1) - 1
    for v in indices:
        if budget == 0:
            emit(clear)
            budget = (1 << width) - (end + 1) - 1
        emit(int(v))
        budget -= 1
    emit(end)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def encode_gif(frames: list[np.ndarray]) -> bytes:
    """Encode (h, w, 3) RGB uint8 frames as a GIF89a with one global
    color table built from the distinct colors (<= 256 required)."""
    if not frames:
        raise ValueError("no frames")
    h, w = frames[0].shape[:2]
    flat = np.concatenate([f.reshape(-1, 3) for f in frames])
    colors, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(colors) > 256:
        raise ValueError("encode_gif: more than 256 distinct colors")
    bits = max(1, int(len(colors) - 1).bit_length())
    n_ct = 1 << bits
    ct = np.zeros((n_ct, 3), dtype=np.uint8)
    ct[: len(colors)] = colors

    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (bits - 1), 0, 0)
    out += ct.tobytes()
    min_code = max(2, bits)
    off = 0
    for f in frames:
        if f.shape[:2] != (h, w):
            raise ValueError("all frames must share dimensions")
        n = h * w
        idx = inverse[off : off + n].astype(np.uint8)
        off += n
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
        out.append(min_code)
        data = _lzw_encode_flat(idx, min_code)
        for i in range(0, len(data), 255):
            chunk = data[i : i + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out += b"\x3b"
    return bytes(out)


def decode_gif(raw: bytes):
    """Typed-error boundary: any low-level struct/index failure from a
    truncated or corrupt byte stream surfaces as GifError (the parser's
    documented data-error class), never a raw struct.error."""
    import struct as _struct

    try:
        return _decode_gif_impl(raw)
    except (_struct.error, IndexError) as e:
        raise GifError(f"truncated or corrupt input: {e}") from e
