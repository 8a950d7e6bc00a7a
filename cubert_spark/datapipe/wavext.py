"""Compressed-WAV codecs the stdlib ``wave`` module rejects, decoded
from the public specs: G.711 mu-law (ITU-T G.711, format tag 0x0007),
G.711 A-law (tag 0x0006), and IMA/DVI ADPCM (IMA 'Recommended
Practices for Enhancing Digital Audio Compatibility', tag 0x0011).
Telephony and legacy game audio ship in these containers constantly —
a corpus pipeline that only reads PCM WAV drops them on the floor.

Pure numpy; encoders included so round-trip tests need no fixtures.
Reference provenance: the reference engine has no media decode at all
(/root/reference/src/main/java/com/linkedin/cubert/io/ is
text/avro/rubix only) — this is north-star surface for the multimodal
column story, same tier as datapipe.jpeg/png/flac.
"""

from __future__ import annotations

import struct

import numpy as np

WAVE_FORMAT_PCM = 0x0001
WAVE_FORMAT_ALAW = 0x0006
WAVE_FORMAT_MULAW = 0x0007
WAVE_FORMAT_IMA_ADPCM = 0x0011


class WavExtError(ValueError):
    """Malformed RIFF/WAVE container or unsupported format tag."""


def _parse_riff(raw: bytes) -> tuple[dict, bytes]:
    if len(raw) < 12 or raw[:4] != b"RIFF" or raw[8:12] != b"WAVE":
        raise WavExtError("not a RIFF/WAVE file")
    fmt = None
    data = None
    fact_n = None
    pos = 12
    while pos + 8 <= len(raw):
        cid = raw[pos : pos + 4]
        (sz,) = struct.unpack_from("<I", raw, pos + 4)
        body = raw[pos + 8 : pos + 8 + sz]
        if cid == b"fact" and len(body) >= 4:
            (fact_n,) = struct.unpack_from("<I", body, 0)
        elif cid == b"fmt ":
            if len(body) < 16:
                raise WavExtError("fmt chunk too short")
            tag, nch, sr, _br, balign, bits = struct.unpack_from("<HHIIHH", body, 0)
            fmt = {
                "tag": tag, "nch": nch, "sr": sr,
                "block_align": balign, "bits": bits,
            }
            if tag == WAVE_FORMAT_IMA_ADPCM and len(body) >= 20:
                (fmt["samples_per_block"],) = struct.unpack_from("<H", body, 18)
        elif cid == b"data":
            data = body
        pos += 8 + sz + (sz & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise WavExtError("missing fmt or data chunk")
    if fact_n is not None:
        fmt["fact_samples"] = fact_n
    return fmt, data


def mulaw_decode(codes: np.ndarray) -> np.ndarray:
    """u-law byte -> int16 linear (G.711 table formula)."""
    u = (~codes.astype(np.uint8)).astype(np.int64)
    sign = u & 0x80
    exp = (u >> 4) & 0x07
    mant = u & 0x0F
    x = (((mant << 1) + 33) << exp) - 33
    x = x << 2  # 14-bit -> 16-bit range
    return np.where(sign != 0, -x, x).astype(np.int16)


def mulaw_encode(pcm: np.ndarray) -> np.ndarray:
    """int16 linear -> u-law byte (round-trips through mulaw_decode)."""
    x = pcm.astype(np.int64) >> 2  # 16-bit -> 14-bit magnitude domain
    sign = np.where(x < 0, 0x80, 0)
    x = np.abs(x)
    x = np.minimum(x + 33, 0x1FFF)
    exp = (np.floor(np.log2(x)) - 5).clip(0, 7).astype(np.int64)
    mant = (x >> (exp + 1)) & 0x0F
    return (~(sign | (exp << 4) | mant)).astype(np.uint8)


def alaw_decode(codes: np.ndarray) -> np.ndarray:
    """A-law byte -> int16 linear (G.711)."""
    a = codes.astype(np.int64) ^ 0x55
    sign = a & 0x80
    exp = (a >> 4) & 0x07
    mant = a & 0x0F
    x = np.where(exp == 0, (mant << 1) + 1, ((mant << 1) + 33) << (exp - 1))
    x = x << 3  # 13-bit -> 16-bit range
    return np.where(sign != 0, -x, x).astype(np.int16)


def alaw_encode(pcm: np.ndarray) -> np.ndarray:
    x = pcm.astype(np.int64) >> 3
    sign = np.where(x < 0, 0x80, 0)
    x = np.abs(x).clip(0, 0xFFF)
    exp = np.where(x < 32, 0, (np.floor(np.log2(np.maximum(x, 1))) - 4).clip(0, 7)).astype(np.int64)
    mant = np.where(exp == 0, x >> 1, (x >> exp) & 0x0F)
    return ((sign | (exp << 4) | mant) ^ 0x55).astype(np.uint8)


_IMA_STEPS = np.array([
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
], dtype=np.int64)
_IMA_INDEX_ADJ = np.array([-1, -1, -1, -1, 2, 4, 6, 8], dtype=np.int64)


def _ima_decode_nibbles(nibbles: np.ndarray, predictor: int, index: int) -> np.ndarray:
    out = np.empty(len(nibbles), dtype=np.int16)
    pred = int(predictor)
    idx = int(index)
    for k, nib in enumerate(nibbles):
        step = int(_IMA_STEPS[idx])
        diff = step >> 3
        if nib & 1:
            diff += step >> 2
        if nib & 2:
            diff += step >> 1
        if nib & 4:
            diff += step
        pred = pred - diff if nib & 8 else pred + diff
        pred = max(-32768, min(32767, pred))
        idx = max(0, min(88, idx + int(_IMA_INDEX_ADJ[nib & 7])))
        out[k] = pred
    return out


def _ima_encode_samples(pcm: np.ndarray, predictor: int, index: int) -> tuple[np.ndarray, int, int]:
    nibs = np.empty(len(pcm), dtype=np.uint8)
    pred = int(predictor)
    idx = int(index)
    for k, s in enumerate(pcm.astype(np.int64)):
        step = int(_IMA_STEPS[idx])
        delta = int(s) - pred
        nib = 8 if delta < 0 else 0
        delta = abs(delta)
        diff = step >> 3
        if delta >= step:
            nib |= 4
            delta -= step
            diff += step
        if delta >= step >> 1:
            nib |= 2
            delta -= step >> 1
            diff += step >> 1
        if delta >= step >> 2:
            nib |= 1
            diff += step >> 2
        pred = pred - diff if nib & 8 else pred + diff
        pred = max(-32768, min(32767, pred))
        idx = max(0, min(88, idx + int(_IMA_INDEX_ADJ[nib & 7])))
        nibs[k] = nib
    return nibs, pred, idx


def decode_wav_ext(raw: bytes) -> tuple[np.ndarray, int, int]:
    """Decode a mu-law / A-law / IMA-ADPCM (or plain PCM16/8) WAV.

    Returns (samples int16 array of shape (n, nch), sample_rate, nch).
    Raises WavExtError for containers/tags outside that set.
    """
    fmt, data = _parse_riff(raw)
    tag, nch, sr = fmt["tag"], fmt["nch"], fmt["sr"]
    if nch < 1:
        raise WavExtError("zero channels")
    if tag == WAVE_FORMAT_MULAW or tag == WAVE_FORMAT_ALAW:
        codes = np.frombuffer(data, dtype=np.uint8)
        dec = mulaw_decode if tag == WAVE_FORMAT_MULAW else alaw_decode
        x = dec(codes)
        x = x[: len(x) - len(x) % nch]
        return x.reshape(-1, nch), sr, nch
    if tag == WAVE_FORMAT_PCM:
        if fmt["bits"] == 16:
            x = np.frombuffer(data, dtype="<i2")
        elif fmt["bits"] == 8:
            x = ((np.frombuffer(data, np.uint8).astype(np.int64) - 128) << 8).astype(np.int16)
        else:
            raise WavExtError(f"unsupported PCM bit depth {fmt['bits']}")
        x = x[: len(x) - len(x) % nch]
        return x.reshape(-1, nch), sr, nch
    if tag != WAVE_FORMAT_IMA_ADPCM:
        raise WavExtError(f"unsupported WAVE format tag 0x{tag:04x}")

    balign = fmt["block_align"]
    if balign < 4 * nch:
        raise WavExtError("IMA block_align too small")
    spb = fmt.get("samples_per_block", ((balign - 4 * nch) * 2) // nch + 1)
    chans: list[list[np.ndarray]] = [[] for _ in range(nch)]
    for off in range(0, len(data) - (len(data) % balign), balign):
        block = data[off : off + balign]
        preds = []
        idxs = []
        for c in range(nch):
            p, i = struct.unpack_from("<hBx", block, 4 * c)
            if i > 88:
                raise WavExtError("IMA step index out of range")
            preds.append(p)
            idxs.append(i)
        body = np.frombuffer(block, np.uint8, offset=4 * nch)
        nib_lo = body & 0x0F
        nib_hi = body >> 4
        nibs = np.empty(len(body) * 2, dtype=np.uint8)
        nibs[0::2] = nib_lo
        nibs[1::2] = nib_hi
        # nibble stream interleaves channels in 4-byte (8-nibble) words
        per_chan = [[] for _ in range(nch)]
        for w in range(0, len(nibs), 8 * nch):
            for c in range(nch):
                per_chan[c].append(nibs[w + 8 * c : w + 8 * (c + 1)])
        for c in range(nch):
            cn = np.concatenate(per_chan[c]) if per_chan[c] else np.empty(0, np.uint8)
            cn = cn[: spb - 1]
            dec = _ima_decode_nibbles(cn, preds[c], idxs[c])
            chans[c].append(np.concatenate(([np.int16(preds[c])], dec)))
    if not chans[0]:
        return np.empty((0, nch), np.int16), sr, nch
    per = [np.concatenate(c) for c in chans]
    n = min(len(p) for p in per)
    if "fact_samples" in fmt:  # trims final-block padding
        n = min(n, fmt["fact_samples"])
    return np.stack([p[:n] for p in per], axis=1), sr, nch


def encode_wav_ext(
    pcm: np.ndarray, sr: int, tag: int, samples_per_block: int = 505
) -> bytes:
    """Encode int16 samples (shape (n, nch)) as a mu-law / A-law /
    IMA-ADPCM WAV — the test-fixture generator for decode_wav_ext."""
    if pcm.ndim == 1:
        pcm = pcm[:, None]
    n, nch = pcm.shape
    if tag in (WAVE_FORMAT_MULAW, WAVE_FORMAT_ALAW):
        enc = mulaw_encode if tag == WAVE_FORMAT_MULAW else alaw_encode
        data = enc(pcm.reshape(-1)).tobytes()
        balign, bits = nch, 8
        extra = b""
    elif tag == WAVE_FORMAT_IMA_ADPCM:
        if (samples_per_block - 1) % 8:
            raise WavExtError("samples_per_block - 1 must be a multiple of 8")
        balign = 4 * nch + ((samples_per_block - 1) // 8) * 4 * nch
        bits = 4
        blocks = []
        pred = [0] * nch
        idx = [0] * nch
        for start in range(0, n, samples_per_block):
            seg = pcm[start : start + samples_per_block]
            hdr = b""
            chan_nibs = []
            for c in range(nch):
                pred[c] = int(seg[0, c])
                hdr += struct.pack("<hBx", pred[c], idx[c])
                nibs, pred[c], idx[c] = _ima_encode_samples(seg[1:, c], pred[c], idx[c])
                pad = (-len(nibs)) % ((balign - 4 * nch) * 2 // nch)
                chan_nibs.append(np.concatenate([nibs, np.zeros(pad, np.uint8)]))
            # interleave channels in 8-nibble words
            words = []
            for w in range(0, len(chan_nibs[0]), 8):
                for c in range(nch):
                    words.append(chan_nibs[c][w : w + 8])
            nall = np.concatenate(words) if words else np.empty(0, np.uint8)
            body = (nall[0::2] | (nall[1::2] << 4)).astype(np.uint8).tobytes()
            blocks.append(hdr + body)
        data = b"".join(blocks)
        extra = struct.pack("<HH", 2, samples_per_block)
    else:
        raise WavExtError(f"encode: unsupported tag 0x{tag:04x}")
    byte_rate = sr * balign
    fmt_body = struct.pack("<HHIIHH", tag, nch, sr, byte_rate, balign, bits) + extra
    chunks = b"fmt " + struct.pack("<I", len(fmt_body)) + fmt_body
    if len(fmt_body) & 1:
        chunks += b"\x00"
    chunks += b"fact" + struct.pack("<II", 4, n)
    chunks += b"data" + struct.pack("<I", len(data)) + data
    if len(data) & 1:
        chunks += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks
