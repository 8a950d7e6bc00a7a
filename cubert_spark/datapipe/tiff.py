"""Pure-spec baseline TIFF (public TIFF 6.0 spec): uncompressed
strip-based RGB/grayscale decode + a matching writer — the fifth real
image format (BMP/JPEG/PNG/GIF/TIFF) behind
multimodal._decode_any_image's signature dispatch. Compressed TIFFs
(LZW/JPEG/deflate variants) raise NotImplementedError; malformed
files raise the TiffError data-error class.
"""

from __future__ import annotations

import struct

import numpy as np


class TiffError(ValueError):
    """Malformed TIFF input (data error, not a missing codec)."""


_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}


def _read_ifd(raw: bytes, off: int, bo: str) -> dict[int, list[int]]:
    if off + 2 > len(raw):
        raise TiffError("truncated IFD")
    (n,) = struct.unpack_from(bo + "H", raw, off)
    tags: dict[int, list[int]] = {}
    for i in range(n):
        e = off + 2 + 12 * i
        tag, typ, cnt = struct.unpack_from(bo + "HHI", raw, e)
        if typ not in _TYPE_SIZES:
            continue
        size = _TYPE_SIZES[typ] * cnt
        if size <= 4:
            data_off = e + 8
        else:
            (data_off,) = struct.unpack_from(bo + "I", raw, e + 8)
        if data_off + size > len(raw):
            raise TiffError(f"tag {tag} data out of range")
        fmt = {1: "B", 2: "B", 3: "H", 4: "I", 5: "II"}[typ]
        if typ == 5:  # rational: numerator only is enough here
            vals = [
                struct.unpack_from(bo + "II", raw, data_off + 8 * j)[0]
                for j in range(cnt)
            ]
        else:
            vals = list(
                struct.unpack_from(bo + fmt * cnt, raw, data_off)
            )
        tags[tag] = vals
    return tags


def _decode_tiff_impl(raw: bytes) -> np.ndarray:
    """Decode an uncompressed strip-based TIFF to (h, w, 3) RGB or
    (h, w) grayscale uint8 (8 bits/sample; both byte orders)."""
    if len(raw) < 8 or raw[:2] not in (b"II", b"MM"):
        raise TiffError("not a TIFF file")
    bo = "<" if raw[:2] == b"II" else ">"
    magic, ifd_off = struct.unpack_from(bo + "HI", raw, 2)
    if magic != 42:
        raise TiffError("bad TIFF magic")
    t = _read_ifd(raw, ifd_off, bo)

    def one(tag: int, default=None):
        v = t.get(tag)
        if v is None:
            if default is None:
                raise TiffError(f"missing required tag {tag}")
            return default
        return v[0]

    w = one(256)
    h = one(257)
    compression = one(259, 1)
    if compression != 1:
        raise NotImplementedError(
            f"TIFF compression {compression} needs a codec; only "
            "uncompressed (1) decodes natively"
        )
    # PhotometricInterpretation (tag 262): 0 = WhiteIsZero (grayscale,
    # inverted), 1 = BlackIsZero, 2 = RGB. Palette-color (3) and
    # beyond need a color map / extra channels — reject rather than
    # silently decode palette indices as gray.
    photometric = one(262, 1)
    if photometric not in (0, 1, 2):
        raise NotImplementedError(
            f"TIFF photometric {photometric} unsupported (baseline "
            "grayscale/RGB only; palette-color needs tag 320 lookup)"
        )
    spp = one(277, 1)
    bits = t.get(258, [8] * spp)
    if any(b != 8 for b in bits):
        raise NotImplementedError("only 8 bits/sample TIFF supported")
    if spp not in (1, 3):
        raise NotImplementedError(f"{spp}-sample TIFF unsupported")
    offsets = t.get(273)
    counts = t.get(279)
    if not offsets or not counts or len(offsets) != len(counts):
        raise TiffError("missing strip offsets/counts")
    rows_per_strip = one(278, h)

    data = bytearray()
    for o, c in zip(offsets, counts):
        if o + c > len(raw):
            raise TiffError("strip out of range")
        data += raw[o : o + c]
    need = w * h * spp
    if len(data) < need:
        raise TiffError("strip data short of pixels")
    arr = np.frombuffer(bytes(data[:need]), dtype=np.uint8)
    _ = rows_per_strip
    if photometric == 0:  # min-is-white: invert to the BlackIsZero convention
        arr = 255 - arr
    if spp == 1:
        return arr.reshape(h, w)
    return arr.reshape(h, w, 3)


def encode_tiff(img: np.ndarray) -> bytes:
    """Write an uncompressed little-endian TIFF from (h, w[, 3])
    uint8 — one strip, the minimal tag set readers require."""
    gray = img.ndim == 2
    h, w = img.shape[:2]
    spp = 1 if gray else 3
    pixels = img.tobytes()
    # header + IFD after pixel data
    pix_off = 8
    ifd_off = pix_off + len(pixels)
    ntags = 8
    out = bytearray()
    out += b"II" + struct.pack("<HI", 42, ifd_off)
    out += pixels

    entries = []

    def tag(tid: int, typ: int, cnt: int, val: int) -> None:
        entries.append(struct.pack("<HHII", tid, typ, cnt, val))

    # BitsPerSample for RGB needs 3 SHORTs -> stash after the IFD
    extra_off = ifd_off + 2 + 12 * ntags + 4
    tag(256, 3, 1, w)
    tag(257, 3, 1, h)
    if gray:
        tag(258, 3, 1, 8)
    else:
        tag(258, 3, 3, extra_off)
    tag(259, 3, 1, 1)                    # uncompressed
    tag(262, 3, 1, 1 if gray else 2)     # photometric: gray/RGB
    tag(273, 4, 1, pix_off)              # strip offset
    tag(277, 3, 1, spp)
    tag(279, 4, 1, len(pixels))
    out += struct.pack("<H", ntags) + b"".join(entries) + struct.pack("<I", 0)
    if not gray:
        out += struct.pack("<HHH", 8, 8, 8)
    return bytes(out)


def decode_tiff(raw: bytes):
    """Typed-error boundary: any low-level struct/index failure from a
    truncated or corrupt byte stream surfaces as TiffError (the parser's
    documented data-error class), never a raw struct.error."""
    import struct as _struct

    try:
        return _decode_tiff_impl(raw)
    except (_struct.error, IndexError) as e:
        raise TiffError(f"truncated or corrupt input: {e}") from e


# --- Netpbm (PGM P5 / PPM P6) -------------------------------------------------
# Co-located here with the other header-simple raster codecs.

def decode_netpbm(raw: bytes) -> np.ndarray:
    """Binary Netpbm (public spec): P5 grayscale / P6 RGB, 8-bit
    maxval. Whitespace/comment-tolerant header per the spec."""
    if raw[:2] not in (b"P5", b"P6"):
        raise TiffError("not a binary Netpbm (P5/P6) file")
    rgb = raw[:2] == b"P6"
    pos = 2
    vals: list[int] = []
    while len(vals) < 3:
        if pos >= len(raw):
            raise TiffError("truncated Netpbm header")
        c = raw[pos : pos + 1]
        if c == b"#":
            while pos < len(raw) and raw[pos : pos + 1] != b"\n":
                pos += 1
        elif c.isspace():
            pos += 1
        else:
            start = pos
            while pos < len(raw) and not raw[pos : pos + 1].isspace():
                pos += 1
            try:
                vals.append(int(raw[start:pos]))
            except ValueError as e:
                raise TiffError("bad Netpbm header token") from e
    w, h, maxval = vals
    if maxval != 255:
        raise NotImplementedError("only 8-bit Netpbm supported")
    pos += 1  # the single whitespace after maxval
    spp = 3 if rgb else 1
    need = w * h * spp
    if len(raw) - pos < need:
        raise TiffError("Netpbm pixel data short")
    arr = np.frombuffer(raw, np.uint8, need, pos)
    return arr.reshape(h, w, 3) if rgb else arr.reshape(h, w)


def encode_netpbm(img: np.ndarray) -> bytes:
    """Write binary P5 (gray) / P6 (RGB) from uint8 arrays."""
    gray = img.ndim == 2
    h, w = img.shape[:2]
    head = (b"P5" if gray else b"P6") + f"\n{w} {h}\n255\n".encode()
    return head + img.tobytes()
