"""Pure-Python/numpy PNG codec (RFC 2083 / ISO 15948, public spec).

Closes the next environment-closable rich-media stub after baseline
JPEG: stdlib ``zlib`` handles the DEFLATE stream, numpy handles
unfiltering, so 8- and 16-bit PNGs (grayscale, truecolor, palette,
and the alpha variants), interlaced (Adam7) or not, decode with no
codec library. Sub-byte depths (1/2/4-bit) raise an honest
NotImplementedError, matching the multimodal module's policy for
unsupported variants.

``encode_png`` emits valid non-interlaced 8-bit files and cycles the
row filter (None/Sub/Up/Average/Paeth) so round-trip tests exercise
every unfilter path, not just filter 0.

Scale shape: like datapipe.jpeg this runs inside Arrow-batched
``mapInPandas`` kernels (datapipe.multimodal.decode_images) — one
Python call per blob; the filter recurrences are per-row loops over
numpy int16 rows (unavoidable sequential dependency, same as libpng).

No reference analog: the reference's io layer is text/avro/rubix only
(src/main/java/com/linkedin/cubert/io/); new surface for the
multimodal pipeline.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIGNATURE = b"\x89PNG\r\n\x1a\n"

#: channels per pixel for each PNG color type
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


class PngError(ValueError):
    pass


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _unfilter(rows: np.ndarray, filters: np.ndarray, bpp: int) -> np.ndarray:
    """Reverse per-row filtering. ``rows`` is (h, stride) uint8 of raw
    filtered bytes, ``filters`` the per-row filter type. Up/None rows
    vectorize; Sub/Average/Paeth carry an intra-row byte recurrence."""
    h, stride = rows.shape
    out = np.zeros((h, stride), np.int16)
    for y in range(h):
        f = int(filters[y])
        cur = rows[y].astype(np.int16)
        prev = out[y - 1] if y else np.zeros(stride, np.int16)
        if f == 0:  # None
            out[y] = cur
        elif f == 2:  # Up
            out[y] = (cur + prev) & 0xFF
        elif f == 1:  # Sub
            row = cur
            for x in range(bpp, stride):
                row[x] = (row[x] + row[x - bpp]) & 0xFF
            out[y] = row
        elif f == 3:  # Average
            row = cur
            for x in range(stride):
                left = row[x - bpp] if x >= bpp else 0
                row[x] = (row[x] + ((left + prev[x]) >> 1)) & 0xFF
            out[y] = row
        elif f == 4:  # Paeth
            row = cur
            for x in range(stride):
                a = row[x - bpp] if x >= bpp else 0
                b = prev[x]
                c = prev[x - bpp] if x >= bpp else 0
                row[x] = (row[x] + _paeth(int(a), int(b), int(c))) & 0xFF
            out[y] = row
        else:
            raise PngError(f"invalid filter type {f} on row {y}")
    return out.astype(np.uint8)


#: Adam7 pass geometry: (row_start, col_start, row_step, col_step)
_ADAM7 = [
    (0, 0, 8, 8), (0, 4, 8, 8), (4, 0, 8, 4), (0, 2, 4, 4),
    (2, 0, 4, 2), (0, 1, 2, 2), (1, 0, 2, 1),
]


def decode_png(raw: bytes) -> np.ndarray:
    """Decode an 8- or 16-bit PNG (interlaced or not) to (h, w, 3) RGB
    uint8 (grayscale replicates to 3 channels; alpha is dropped;
    16-bit samples take their high byte). Raises PngError for
    malformed input, NotImplementedError for sub-byte depths."""
    if len(raw) < 8 or raw[:8] != _SIGNATURE:
        raise PngError("not a PNG (missing signature)")
    pos = 8
    ihdr = None
    plte = None
    idat = bytearray()
    seen_iend = False
    while pos + 8 <= len(raw):
        clen, ctype = struct.unpack_from(">I4s", raw, pos)
        pos += 8
        if pos + clen + 4 > len(raw):
            raise PngError(f"truncated {ctype!r} chunk")
        data = raw[pos : pos + clen]
        pos += clen + 4  # skip CRC (integrity left to the transport)
        if ctype == b"IHDR":
            if len(data) != 13:
                raise PngError("bad IHDR length")
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"PLTE":
            if len(data) % 3:
                raise PngError("bad PLTE length")
            plte = np.frombuffer(data, np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            seen_iend = True
            break
        # ancillary chunks (tRNS, gAMA, tEXt, ...) are skipped
    if ihdr is None:
        raise PngError("missing IHDR")
    if not idat or not seen_iend:
        raise PngError("missing IDAT/IEND")
    w, h, depth, color_type, compression, filter_method, interlace = ihdr
    if w == 0 or h == 0:
        raise PngError("zero-dimension image")
    if compression != 0 or filter_method != 0:
        raise PngError("unknown compression/filter method")
    if interlace not in (0, 1):
        raise PngError(f"invalid interlace method {interlace}")
    if color_type not in _CHANNELS:
        raise PngError(f"invalid color type {color_type}")
    if depth not in (8, 16):
        raise NotImplementedError(
            f"only 8/16-bit depths supported (got {depth})"
        )
    if depth == 16 and color_type == 3:
        raise PngError("16-bit palette images are invalid PNG")
    channels = _CHANNELS[color_type]
    sample_bytes = depth // 8
    bpp = channels * sample_bytes
    try:
        plain = zlib.decompress(bytes(idat))
    except zlib.error as e:
        raise PngError(f"corrupt IDAT stream: {e}") from None

    def _grid(bw: int, bh: int, data: bytes) -> np.ndarray:
        """Unfilter one (sub)image of bw x bh pixels; returns
        (bh, bw, channels) uint8 (16-bit samples -> high byte)."""
        stride = bw * bpp
        lines = np.frombuffer(data, np.uint8).reshape(bh, stride + 1)
        px = _unfilter(lines[:, 1:], lines[:, 0], bpp)
        if sample_bytes == 2:
            # network byte order: the high byte of each sample leads
            px = px.reshape(bh, bw, channels, 2)[..., 0]
        return px.reshape(bh, bw, channels)

    if interlace == 0:
        expected = h * (w * bpp + 1)
        if len(plain) != expected:
            raise PngError(
                f"decompressed size {len(plain)} != expected {expected}"
            )
        px = _grid(w, h, plain)
    else:  # Adam7: seven independently-filtered sub-images
        px = np.zeros((h, w, channels), np.uint8)
        off = 0
        for r0, c0, rs, cs in _ADAM7:
            pw = -(-(w - c0) // cs) if w > c0 else 0
            ph = -(-(h - r0) // rs) if h > r0 else 0
            if pw == 0 or ph == 0:
                continue
            need = ph * (pw * bpp + 1)
            if off + need > len(plain):
                raise PngError("truncated interlaced pixel data")
            px[r0::rs, c0::cs] = _grid(pw, ph, plain[off : off + need])
            off += need
        if off != len(plain):
            raise PngError("trailing bytes after final Adam7 pass")
    if color_type == 3:
        if plte is None:
            raise PngError("palette image missing PLTE")
        idx = px[..., 0]
        if int(idx.max(initial=0)) >= len(plte):
            raise PngError("palette index out of range")
        return plte[idx]
    if color_type == 0:
        return np.repeat(px, 3, axis=2)
    if color_type == 4:
        return np.repeat(px[..., :1], 3, axis=2)
    return px[..., :3]  # 2 (RGB) and 6 (RGBA, alpha dropped)


def encode_png(
    img: np.ndarray, palette: bool = False, interlace: bool = False
) -> bytes:
    """Encode (h, w, 3) RGB or (h, w) grayscale uint8 as an 8-bit
    PNG. Row filters cycle through None/Sub/Up/Average/Paeth so
    decoders exercise every unfilter path. ``palette=True`` emits a
    color-type-3 file (the image must use <= 256 distinct colors);
    ``interlace=True`` emits Adam7 (each pass filtered independently,
    filter cycling per pass row)."""
    img = np.asarray(img, np.uint8)
    gray = img.ndim == 2
    h, w = img.shape[:2]
    if palette:
        if gray:
            raise ValueError("palette=True needs an RGB image")
        flat = img.reshape(-1, 3)
        colors, inverse = np.unique(flat, axis=0, return_inverse=True)
        if len(colors) > 256:
            raise ValueError(f"{len(colors)} colors exceed palette capacity")
        data = inverse.astype(np.uint8).reshape(h, w, 1)
        color_type, channels = 3, 1
    elif gray:
        data = img.reshape(h, w, 1)
        color_type, channels = 0, 1
    else:
        data = img
        color_type, channels = 2, 3
    bpp = channels

    def _filter_subimage(sub: np.ndarray) -> bytearray:
        """Forward-filter one (ph, pw*channels) uint8 sub-image with
        the cycling row filter; returns filter-byte-prefixed lines."""
        ph, stride = sub.shape
        rows = sub.astype(np.int16)
        lines = bytearray()
        prev = np.zeros(stride, np.int16)
        for y in range(ph):
            f = y % 5
            cur = rows[y]
            left = (
                np.concatenate([np.zeros(bpp, np.int16), cur[:-bpp]])
                if stride > bpp
                else np.zeros_like(cur)
            )
            if f == 0:
                enc = cur
            elif f == 1:
                enc = (cur - left) & 0xFF
            elif f == 2:
                enc = (cur - prev) & 0xFF
            elif f == 3:
                enc = (cur - ((left + prev) >> 1)) & 0xFF
            else:
                prev_left = (
                    np.concatenate([np.zeros(bpp, np.int16), prev[:-bpp]])
                    if stride > bpp
                    else np.zeros_like(cur)
                )
                pred = np.array(
                    [_paeth(int(a), int(b), int(c)) for a, b, c in zip(left, prev, prev_left)],
                    np.int16,
                )
                enc = (cur - pred) & 0xFF
            lines.append(f)
            lines += enc.astype(np.uint8).tobytes()
            prev = cur
        return lines

    out_lines = bytearray()
    if interlace:
        for r0, c0, rs, cs in _ADAM7:
            sub = data[r0::rs, c0::cs]
            if sub.shape[0] and sub.shape[1]:
                out_lines += _filter_subimage(
                    sub.reshape(sub.shape[0], sub.shape[1] * channels)
                )
    else:
        out_lines = _filter_subimage(data.reshape(h, w * channels))

    def chunk(ctype: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload))
            + ctype
            + payload
            + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF)
        )

    out = bytearray(_SIGNATURE)
    out += chunk(
        b"IHDR",
        struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 1 if interlace else 0),
    )
    if palette:
        out += chunk(b"PLTE", colors.astype(np.uint8).tobytes())
    out += chunk(b"IDAT", zlib.compress(bytes(out_lines), 6))
    out += chunk(b"IEND", b"")
    return bytes(out)
