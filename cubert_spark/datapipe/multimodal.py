"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

Decode support is honest about the environment: WAV and FLAC audio
decode for REAL (stdlib ``wave``; pure-Python datapipe.flac), as do
uncompressed 24-bit BMP images (pure struct/numpy parsing),
sequential AND progressive JPEG (datapipe.jpeg), 8/16-bit PNG
including Adam7 interlacing (datapipe.png); progressive-MP4 frame
sampling demuxes via datapipe.mp4, MJPEG AVI and animated GIF decode
to REAL pixels, and GIF/TIFF/Netpbm join the image dispatch. Formats
that need external codecs (MP3/AAC, H.264+ video decode) are
stubbed — NotImplementedError, or
a deterministic fake (``fake=True``) so the Spark-side plumbing
(schema, Arrow batch shape, partitioning) is fully testable either
way. The mapInPandas pipelines, batch sizing and output schemas are
what would run at scale once richer codecs are dropped in.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Output schema of decode_images: fixed metadata + feature vector.
IMAGE_META_SCHEMA = (
    "id long, byte_len int, sha256 string, width int, height int, feature array<float>"
)


def attach_blob_metadata(df: DataFrame, blob_col: str, id_col: str) -> DataFrame:
    """Typed metadata for an opaque binary column — JVM-side only
    (length, content hash); the cheap pass that runs before any
    Python decode at scale."""
    b = F.col(blob_col)
    return df.select(
        F.col(id_col),
        F.length(b).cast("int").alias("byte_len"),
        F.sha2(b, 256).alias("sha256"),
    )


def text_as_blob(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Test adapter: UTF-8 encode a text column into a binary column so
    the multimodal plumbing is exercisable on the documents table."""
    return df.select(
        F.col(id_col).alias("id"), F.encode(F.col(text_col), "UTF-8").alias("blob")
    )


def decode_bmp(raw: bytes):
    """Decode an uncompressed 24-bit BMP to an (h, w, 3) RGB uint8
    array — pure struct/numpy, no codec library. Raises ValueError for
    anything else (JPEG/PNG need a real codec)."""
    import struct

    import numpy as np

    if len(raw) < 54 or raw[:2] != b"BM":
        raise ValueError("not a BMP file")
    pixel_off = struct.unpack_from("<I", raw, 10)[0]
    w, h = struct.unpack_from("<ii", raw, 18)
    bpp = struct.unpack_from("<H", raw, 28)[0]
    comp = struct.unpack_from("<I", raw, 30)[0]
    if bpp != 24 or comp != 0:
        raise ValueError(f"only 24-bit uncompressed BMP supported (bpp={bpp})")
    bottom_up = h > 0
    h = abs(h)
    row_size = ((w * 3 + 3) // 4) * 4
    if pixel_off + row_size * h > len(raw):
        raise ValueError("truncated BMP pixel data")
    px = np.frombuffer(raw, np.uint8, row_size * h, pixel_off)
    arr = px.reshape(h, row_size)[:, : w * 3].reshape(h, w, 3)
    if bottom_up:
        arr = arr[::-1]
    return arr[..., ::-1]  # BGR -> RGB


def _resize_nearest(arr, w: int, h: int):
    import numpy as np

    sh, sw = arr.shape[:2]
    yi = (np.arange(h) * sh // h).clip(0, sh - 1)
    xi = (np.arange(w) * sw // w).clip(0, sw - 1)
    return arr[yi][:, xi]


def _resize_bilinear(arr, w: int, h: int):
    """Bilinear resample (align-corners=False convention, float64
    lerp, round-half-up back to uint8) — deterministic numpy only."""
    import numpy as np

    sh, sw = arr.shape[:2]
    fy = (np.arange(h) + 0.5) * sh / h - 0.5
    fx = (np.arange(w) + 0.5) * sw / w - 0.5
    y0 = np.clip(np.floor(fy).astype(int), 0, sh - 1)
    x0 = np.clip(np.floor(fx).astype(int), 0, sw - 1)
    y1 = np.clip(y0 + 1, 0, sh - 1)
    x1 = np.clip(x0 + 1, 0, sw - 1)
    wy = np.clip(fy - y0, 0.0, 1.0)[:, None, None]
    wx = np.clip(fx - x0, 0.0, 1.0)[None, :, None]
    a = arr.astype("float64")
    top = a[y0][:, x0] * (1 - wx) + a[y0][:, x1] * wx
    bot = a[y1][:, x0] * (1 - wx) + a[y1][:, x1] * wx
    out = top * (1 - wy) + bot * wy
    return np.floor(out + 0.5).clip(0, 255).astype("uint8")


def _decode_any_image(raw: bytes):
    """Format-dispatch to the pure-spec decoders (BMP / sequential +
    progressive JPEG / 8- & 16-bit PNG incl. Adam7 / GIF first frame /
    baseline TIFF / binary Netpbm); anything else is a missing codec
    (NotImplementedError), while a corrupt payload of a recognized
    format is a DATA error (ValueError)."""
    if raw[:2] == b"\xff\xd8":
        from cubert_spark.datapipe.jpeg import decode_jpeg

        return decode_jpeg(raw)
    if raw[:8] == b"\x89PNG\r\n\x1a\n":
        from cubert_spark.datapipe.png import decode_png

        return decode_png(raw)
    if raw[:6] in (b"GIF87a", b"GIF89a"):
        from cubert_spark.datapipe.gif import decode_gif

        return decode_gif(raw)[0]  # first frame for the image contract
    if raw[:2] in (b"P5", b"P6"):
        from cubert_spark.datapipe.tiff import decode_netpbm

        img = decode_netpbm(raw)
        if img.ndim == 2:
            img = img[:, :, None].repeat(3, axis=2)
        return img
    if raw[:2] in (b"II", b"MM") and len(raw) >= 4 and raw[2:4] in (
        b"\x2a\x00", b"\x00\x2a"
    ):
        from cubert_spark.datapipe.tiff import decode_tiff

        img = decode_tiff(raw)
        if img.ndim == 2:  # grayscale -> 3-channel for the contract
            img = img[:, :, None].repeat(3, axis=2)
        return img
    try:
        return decode_bmp(raw)
    except ValueError as e:
        if "not a BMP" not in str(e):
            # a real BMP with corrupt payload is a DATA error, not a
            # missing codec
            raise
        raise NotImplementedError(
            f"no codec for this image format ({e}); BMP, "
            "baseline JPEG and 8-bit PNG decode natively, "
            "others need a decoder plugged into decode_images"
        ) from e


def decode_images(
    df: DataFrame,
    blob_col: str = "blob",
    id_col: str = "id",
    target_size: tuple[int, int] = (32, 32),
    fake: bool = False,
    method: str = "nearest",
) -> DataFrame:
    """Decode + resize + feature-extract an image blob column.
    ``method``: "nearest" (default) or "bilinear" (float64 lerp,
    deterministic; the resize a training-data pipeline actually
    wants — nearest aliases badly on downscale).

    Arrow-batched mapInPandas: each batch decodes ``len(batch)`` blobs
    without per-row Python dispatch. The real path decodes six
    formats, all pure numpy/stdlib: uncompressed 24-bit BMP,
    sequential AND progressive JPEG, 8/16-bit PNG incl. Adam7, GIF
    (first frame), baseline TIFF (both byte orders), and binary
    Netpbm P5/P6 (see datapipe.jpeg/png/gif/tiff). Reports SOURCE
    dimensions, resizes to ``target_size``, features = mean
    R/G/B/gray in [0,1]; formats outside that set raise
    NotImplementedError until a codec is plugged in. ``fake=True``
    keeps the deterministic stand-in (dimensions = target, features
    from the digest).
    """
    import hashlib

    import pandas as pd

    w, h = target_size

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for i, blob in zip(pdf[id_col], pdf[blob_col]):
                if blob is None or pd.isna(i):
                    continue  # null blob/id rows are skipped, not fatal
                raw = bytes(blob)
                digest = hashlib.sha256(raw).hexdigest()
                if fake:
                    rows.append(
                        {
                            "id": int(i),
                            "byte_len": len(raw),
                            "sha256": digest,
                            "width": w,
                            "height": h,
                            "feature": [
                                float(int(digest[j * 8 : j * 8 + 8], 16) % 1000) / 1000.0
                                for j in range(4)
                            ],
                        }
                    )
                    continue
                img = _decode_any_image(raw)
                rs = _resize_bilinear if method == "bilinear" else _resize_nearest
                small = rs(img, w, h).astype("float64") / 255.0
                means = small.mean(axis=(0, 1))
                rows.append(
                    {
                        "id": int(i),
                        "byte_len": len(raw),
                        "sha256": digest,
                        "width": int(img.shape[1]),
                        "height": int(img.shape[0]),
                        "feature": [
                            float(means[0]), float(means[1]), float(means[2]),
                            float(means.mean()),
                        ],
                    }
                )
            yield pd.DataFrame(rows)

    return df.select(F.col(id_col), F.col(blob_col)).mapInPandas(
        kernel, schema=IMAGE_META_SCHEMA
    )


#: Output schema of decode_audio.
AUDIO_META_SCHEMA = (
    "id long, byte_len int, sha256 string, sample_rate int, n_channels int, "
    "n_samples int, duration_sec double, rms double, envelope array<float>"
)


def decode_audio(
    df: DataFrame,
    blob_col: str = "blob",
    id_col: str = "id",
    n_bands: int = 8,
    fake: bool = False,
) -> DataFrame:
    """Decode a WAV or FLAC audio blob column for REAL (stdlib
    ``wave``; pure-Python FLAC — datapipe.flac): sample rate, channel
    count, duration, RMS level, and an ``n_bands``-segment
    mean-|amplitude| envelope (all amplitudes normalized to [-1, 1]).
    Multi-channel audio is mixed to mono for the features. Other
    formats raise NotImplementedError (MP3/AAC need a real codec);
    ``fake=True`` derives deterministic values from the digest for
    plumbing tests."""
    import hashlib
    import io
    import wave

    import numpy as np
    import pandas as pd

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for i, blob in zip(pdf[id_col], pdf[blob_col]):
                if blob is None or pd.isna(i):
                    continue  # null blob/id rows are skipped, not fatal
                raw = bytes(blob)
                digest = hashlib.sha256(raw).hexdigest()
                if fake:
                    rows.append(
                        {
                            "id": int(i), "byte_len": len(raw),
                            "sha256": digest, "sample_rate": 16000,
                            "n_channels": 1, "n_samples": len(raw),
                            "duration_sec": len(raw) / 16000.0,
                            "rms": float(int(digest[:8], 16) % 1000) / 1000.0,
                            "envelope": [
                                float(int(digest[j * 4 : j * 4 + 4], 16) % 1000)
                                / 1000.0
                                for j in range(n_bands)
                            ],
                        }
                    )
                    continue
                if raw[:4] == b"fLaC":
                    from cubert_spark.datapipe.flac import decode_flac

                    smp, sr, fdepth = decode_flac(raw)
                    nch = smp.shape[1]
                    x = smp.astype("float64") / float(1 << (fdepth - 1))
                    if nch > 1:
                        x = x.mean(axis=1)
                    else:
                        x = x[:, 0]
                else:
                    try:
                        with wave.open(io.BytesIO(raw)) as wf:
                            sr = wf.getframerate()
                            nch = wf.getnchannels()
                            width = wf.getsampwidth()
                            n = wf.getnframes()
                            frames = wf.readframes(n)
                    except Exception as e:  # noqa: BLE001 - not plain PCM
                        # compressed-WAV fallback: G.711 mu/A-law and
                        # IMA ADPCM (datapipe.wavext) before giving up
                        try:
                            from cubert_spark.datapipe.wavext import decode_wav_ext

                            smp, sr, nch = decode_wav_ext(raw)
                        except Exception:
                            raise NotImplementedError(
                                f"no codec for this audio format ({e}); WAV "
                                "(PCM/mu-law/A-law/IMA-ADPCM) and FLAC decode "
                                "natively, others need a decoder plugged "
                                "into decode_audio"
                            ) from e
                        x = smp.astype("float64") / 32768.0
                        x = x.mean(axis=1) if nch > 1 else x[:, 0]
                        frames = None
                    if frames is not None:  # plain-PCM path
                        # a truncated final frame decodes as far as it
                        # goes (trim to whole frames), not a job failure
                        frame_bytes = width * nch
                        if frame_bytes and len(frames) % frame_bytes:
                            frames = frames[: len(frames) - len(frames) % frame_bytes]
                        if width == 2:
                            x = np.frombuffer(frames, "<i2").astype("float64") / 32768.0
                        elif width == 1:
                            x = (np.frombuffer(frames, "u1").astype("float64") - 128.0) / 128.0
                        else:
                            raise NotImplementedError(
                                f"unsupported WAV sample width {width}"
                            )
                        if nch > 1:
                            x = x.reshape(-1, nch).mean(axis=1)
                rms = float(np.sqrt(np.mean(x * x))) if len(x) else 0.0
                env = []
                if len(x):
                    for seg in np.array_split(np.abs(x), n_bands):
                        env.append(float(seg.mean()) if len(seg) else 0.0)
                else:
                    env = [0.0] * n_bands
                rows.append(
                    {
                        "id": int(i), "byte_len": len(raw), "sha256": digest,
                        "sample_rate": int(sr), "n_channels": int(nch),
                        "n_samples": int(len(x)),
                        "duration_sec": len(x) / sr if sr else 0.0,
                        "rms": rms, "envelope": env,
                    }
                )
            yield pd.DataFrame(rows)

    return df.select(F.col(id_col), F.col(blob_col)).mapInPandas(
        kernel, schema=AUDIO_META_SCHEMA
    )


def sample_frames(
    df: DataFrame,
    blob_col: str = "blob",
    id_col: str = "id",
    every_nth: int = 10,
    fake: bool = False,
) -> DataFrame:
    """Frame sampling for video blobs: one output row per sampled
    sample (id, frame_idx, frame_blob, time_sec). The real path
    demuxes progressive MP4 containers (pure sample-table parsing —
    datapipe.mp4) and emits every Nth video sample's byte range with
    its decode timestamp; the frame bytes remain ENCODED access units
    (H.264/H.265 decode needs a codec and is out of environment
    scope). Non-MP4 containers raise NotImplementedError. Fake mode
    slices the blob deterministically for plumbing tests."""
    import pandas as pd

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        from cubert_spark.datapipe.mp4 import video_samples

        for pdf in batches:
            rows = []
            for i, blob in zip(pdf[id_col], pdf[blob_col]):
                raw = bytes(blob)
                if fake:
                    n_frames = max(1, len(raw) // max(every_nth, 1))
                    for fi in range(0, n_frames, every_nth):
                        rows.append(
                            {
                                "id": int(i), "frame_idx": fi,
                                "frame_blob": raw[fi : fi + every_nth],
                                "time_sec": float(fi),
                            }
                        )
                    continue
                # container sniff first (mirrors the image-signature
                # checks): anything that isn't ISO BMFF or RIFF/AVI is
                # a missing-demuxer case; Mp4Error/AviError past this
                # point is CORRUPT DATA and fails the task honestly.
                if raw[:4] == b"RIFF" and raw[8:12] == b"AVI ":
                    from cubert_spark.datapipe.avi import parse_avi

                    meta = parse_avi(raw)
                    spf = meta.get("us_per_frame", 0) / 1e6
                    for fi in range(0, len(meta["frames"]), every_nth):
                        rows.append(
                            {
                                "id": int(i), "frame_idx": fi,
                                "frame_blob": meta["frames"][fi],
                                "time_sec": fi * spf,
                            }
                        )
                    continue
                if raw[4:8] != b"ftyp":
                    raise NotImplementedError(
                        "no demuxer for this container; progressive MP4 "
                        "and MJPEG AVI demux natively (datapipe.mp4/avi), "
                        "others need a demuxer plugged into sample_frames"
                    )
                frames = video_samples(raw, every_nth)
                for fi, fblob, t in frames:
                    rows.append(
                        {
                            "id": int(i), "frame_idx": int(fi),
                            "frame_blob": fblob, "time_sec": float(t),
                        }
                    )
            yield pd.DataFrame(rows)

    return df.select(F.col(id_col), F.col(blob_col)).mapInPandas(
        kernel, schema="id long, frame_idx int, frame_blob binary, time_sec double"
    )


MP3_META_SCHEMA = (
    "id long, byte_len int, version string, layer int, sample_rate int, "
    "n_channels int, n_frames int, duration_sec double, bitrate_kbps double, "
    "is_vbr boolean, has_xing boolean"
)


def mp3_meta(df: DataFrame, blob_col: str = "blob", id_col: str = "id") -> DataFrame:
    """MPEG-audio metadata WITHOUT decode (datapipe.mp3): the frame
    walker yields duration / rate / channel mode / CBR-vs-VBR / frame
    count — the fields an audio-curation pass filters on — while
    sample decode stays honestly stubbed (codec-library work; see
    decode_audio). Arrow-batched mapInPandas; Mp3Error on malformed
    streams fails the task as a data error."""
    import pandas as pd

    from cubert_spark.datapipe.mp3 import parse_mp3

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for i, blob in zip(pdf[id_col], pdf[blob_col]):
                if blob is None or pd.isna(i):
                    continue
                raw = bytes(blob)
                m = parse_mp3(raw)
                rows.append(
                    {
                        "id": int(i), "byte_len": len(raw),
                        "version": m["version"], "layer": m["layer"],
                        "sample_rate": m["sample_rate"],
                        "n_channels": m["n_channels"],
                        "n_frames": m["n_frames"],
                        "duration_sec": m["duration_sec"],
                        "bitrate_kbps": m["bitrate_kbps"],
                        "is_vbr": m["is_vbr"], "has_xing": m["has_xing"],
                    }
                )
            yield pd.DataFrame(rows)

    return df.select(F.col(id_col), F.col(blob_col)).mapInPandas(
        kernel, schema=MP3_META_SCHEMA
    )


AUDIO_SPECTRAL_SCHEMA = (
    "id long, sr int, n_used int, centroid_hz double, "
    "bandwidth_hz double, dominant_hz double"
)


def audio_spectral(
    df: DataFrame,
    blob_col: str = "blob",
    id_col: str = "id",
    n_fft: int = 2048,
) -> DataFrame:
    """FFT-based spectral features from WAV blobs — the
    feature-extract tier above decode_audio's time-domain RMS/envelope:
    magnitude rFFT over the first ``n_fft`` mono samples (zero-padded),
    then spectral centroid (magnitude-weighted mean frequency),
    bandwidth (weighted std around the centroid), and the dominant
    bin's frequency. PCM16 WAV only (the decode subset documented at
    decode_audio); other formats fail the task as data errors.

    Arrow-batched mapInPandas, numpy rFFT per clip — one O(n log n)
    kernel per row, no shuffle. Deterministic for a fixed numpy build
    (pytest model-checks exact equality against the same reference
    computation and pins a 440 Hz sine's dominant bin)."""
    import pandas as pd

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import io
        import wave

        import numpy as np

        for pdf in batches:
            rows = []
            for i, blob in zip(pdf[id_col], pdf[blob_col]):
                if blob is None or pd.isna(i):
                    continue
                with wave.open(io.BytesIO(bytes(blob))) as w:
                    if w.getsampwidth() != 2:
                        raise ValueError("audio_spectral: PCM16 WAV only")
                    sr = w.getframerate()
                    nch = w.getnchannels()
                    n = min(w.getnframes(), n_fft)
                    x = np.frombuffer(
                        w.readframes(n), dtype="<i2"
                    ).astype(np.float64) / 32768.0
                    if nch > 1:
                        x = x.reshape(-1, nch).mean(axis=1)
                mag = np.abs(np.fft.rfft(x, n=n_fft))
                freqs = np.fft.rfftfreq(n_fft, d=1.0 / sr)
                tot = float(mag.sum())
                if tot > 0.0:
                    cen = float((mag * freqs).sum() / tot)
                    bw = float(
                        np.sqrt((mag * (freqs - cen) ** 2).sum() / tot)
                    )
                    dom = float(freqs[int(np.argmax(mag))])
                else:
                    cen = bw = dom = 0.0
                rows.append(
                    {
                        "id": int(i), "sr": int(sr), "n_used": int(len(x)),
                        "centroid_hz": cen, "bandwidth_hz": bw,
                        "dominant_hz": dom,
                    }
                )
            yield pd.DataFrame(rows)

    return df.select(F.col(id_col), F.col(blob_col)).mapInPandas(
        kernel, schema=AUDIO_SPECTRAL_SCHEMA
    )


PHASH_SCHEMA = "id long, phash bigint, width int, height int"


def image_phash(
    df: DataFrame,
    blob_col: str = "blob",
    id_col: str = "id",
) -> DataFrame:
    """64-bit perceptual hash (classic DCT pHash, public algorithm):
    decode -> grayscale -> nearest-resize to 32x32 -> 2-D DCT-II
    (exact 32x32 basis matmuls, no FFT library) -> the low-frequency
    8x8 block (skipping DC) -> bit i = coefficient > median. Images
    that LOOK the same hash within a few bits, so image near-dup
    detection becomes the same pipeline as text simhash: group by
    hash for exact perceptual dups, band the 64 bits for
    hamming-tolerant candidate pairs.

    Arrow-batched mapInPandas over the pure-spec decoders; numpy
    double DCT is deterministic for a fixed build (pytest pins
    identical-image equality and small hamming distance under noise,
    vs large distance for unrelated images)."""
    import pandas as pd

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np

        n = 32
        # DCT-II basis: D[k, i] = c_k cos(pi (2i+1) k / (2N))
        i = np.arange(n)
        k = np.arange(n)[:, None]
        D = np.cos(np.pi * (2 * i + 1) * k / (2 * n))
        D[0] *= 1.0 / np.sqrt(2.0)
        D *= np.sqrt(2.0 / n)

        for pdf in batches:
            rows = []
            for rid, blob in zip(pdf[id_col], pdf[blob_col]):
                if blob is None or pd.isna(rid):
                    continue
                img = _decode_any_image(bytes(blob))
                gray = (
                    _resize_nearest(img, n, n).astype("float64").mean(axis=2)
                )
                coef = D @ gray @ D.T
                block = coef[:8, :8].flatten()[1:]  # drop DC
                med = float(np.median(block))
                bits = 0
                for j, v in enumerate(block):
                    if v > med:
                        bits |= 1 << j
                # 63 payload bits; bit 63 stays 0 so the bigint is
                # non-negative in every engine
                rows.append(
                    {
                        "id": int(rid), "phash": int(bits),
                        "width": int(img.shape[1]),
                        "height": int(img.shape[0]),
                    }
                )
            yield pd.DataFrame(rows)

    return df.select(F.col(id_col), F.col(blob_col)).mapInPandas(
        kernel, schema=PHASH_SCHEMA
    )


VIDEO_FRAME_FEATURES_SCHEMA = (
    "id long, frame_idx int, time_sec double, width int, height int, "
    "feature array<float>"
)


def decode_video_frames(
    df: DataFrame,
    blob_col: str = "blob",
    id_col: str = "id",
    every_nth: int = 1,
    target_size: tuple[int, int] = (32, 32),
) -> DataFrame:
    """REAL video pixel decode for MJPEG blobs in BOTH container
    families: MJPEG AVI (datapipe.avi) and MJPEG-in-MP4 (datapipe.mp4,
    sample entry 'jpeg') demux natively, each sampled frame's JPEG
    bitstream decodes with the pure-spec codec (datapipe.jpeg), then
    resize + per-frame features (mean R/G/B/gray — the same feature
    contract as decode_images). Produces PIXELS without any codec
    library; H.264+ samples still raise the honest
    NotImplementedError.

    Arrow-batched mapInPandas; per-frame cost is one JPEG decode +
    one resize — the pipeline shape that scales out per blob row."""
    import pandas as pd

    w, h = target_size

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        from cubert_spark.datapipe.avi import parse_avi
        from cubert_spark.datapipe.gif import decode_gif
        from cubert_spark.datapipe.jpeg import decode_jpeg

        for pdf in batches:
            rows = []
            for i, blob in zip(pdf[id_col], pdf[blob_col]):
                if blob is None or pd.isna(i):
                    continue
                raw = bytes(blob)
                if raw[:6] in (b"GIF87a", b"GIF89a"):
                    # animated GIF: already-composited RGB frames
                    gframes = decode_gif(raw)
                    frame_src = [(fi, gframes[fi], 0.0) for fi in
                                 range(0, len(gframes), every_nth)]
                elif raw[4:8] == b"ftyp":
                    # MJPEG-in-MP4 (sample entry 'jpeg', each sample a
                    # whole JPEG bitstream) decodes natively via the
                    # demuxer + pure-spec JPEG codec; anything else in
                    # an MP4 is H.264+ access units -> honest reject
                    from cubert_spark.datapipe.mp4 import video_samples

                    samples = video_samples(raw, every_nth)
                    if not all(sb[:2] == b"\xff\xd8" for _, sb, _ in samples):
                        raise NotImplementedError(
                            "MP4 video samples are not JPEG bitstreams "
                            "(H.264+ needs a real codec); MJPEG-in-MP4, "
                            "MJPEG-AVI and GIF decode to pixels natively; "
                            "use sample_frames for the demuxed "
                            "(still-encoded) units"
                        )
                    frame_src = [
                        (fi, decode_jpeg(sb), t) for fi, sb, t in samples
                    ]
                else:
                    meta = parse_avi(raw)
                    spf = meta.get("us_per_frame", 0) / 1e6
                    frame_src = [
                        (fi, None, fi * spf)
                        for fi in range(0, len(meta["frames"]), every_nth)
                    ]
                for fi, pre, t in frame_src:
                    img = pre if pre is not None else decode_jpeg(
                        meta["frames"][fi]
                    )
                    if img.ndim == 2:
                        img = img[:, :, None].repeat(3, axis=2)
                    small = (
                        _resize_nearest(img, w, h).astype("float64") / 255.0
                    )
                    means = small.mean(axis=(0, 1))
                    rows.append(
                        {
                            "id": int(i), "frame_idx": fi,
                            "time_sec": t,
                            "width": int(img.shape[1]),
                            "height": int(img.shape[0]),
                            "feature": [
                                float(means[0]), float(means[1]),
                                float(means[2]), float(means.mean()),
                            ],
                        }
                    )
            yield pd.DataFrame(rows)

    return df.select(F.col(id_col), F.col(blob_col)).mapInPandas(
        kernel, schema=VIDEO_FRAME_FEATURES_SCHEMA
    )


def phash_neardup_pairs(
    df: DataFrame,
    blob_col: str = "blob",
    id_col: str = "id",
    max_hamming: int = 10,
    n_bands: int = 4,
) -> DataFrame:
    """Image near-duplicate pairs — the visual analog of text
    minhash-LSH, end to end: decode -> :func:`image_phash` -> band the
    64-bit hash into ``n_bands`` 16-bit keys -> candidate self-join on
    (band_idx, band_key) -> exact hamming verify <= ``max_hamming``.
    Recall contract, precisely: the pigeonhole guarantee covers only
    hamming <= n_bands - 1 (two hashes that differ in fewer bits than
    there are bands MUST share an intact band); with the defaults
    (n_bands=4, max_hamming=10) pairs at distance 4..10 are found only
    PROBABILISTICALLY — a pair whose differing bits straddle all four
    bands is missed. That is the standard LSH trade; for guaranteed
    recall up to d, set n_bands >= d + 1 (more bands = more candidate
    join volume, same never-all-pairs shape).

    Output: (id_a, id_b, hamming) with id_a < id_b. Everything after
    the per-blob decode is JVM expressions (band extraction, join,
    bit_count) — the Python cost is exactly one pHash per image."""
    ph = image_phash(df, blob_col, id_col).select("id", "phash")
    bands = ph.select(
        "id",
        "phash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_idx"),
                        F.expr(f"(phash >> {16 * b}) & 65535").alias("band_key"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bk"),
    ).select("id", "phash", "bk.band_idx", "bk.band_key")
    a = bands.select(
        F.col("id").alias("id_a"), F.col("phash").alias("__pa"),
        "band_idx", "band_key",
    )
    b = bands.select(
        F.col("id").alias("id_b"), F.col("phash").alias("__pb"),
        "band_idx", "band_key",
    )
    return (
        a.join(b, ["band_idx", "band_key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "__pa", "__pb")
        .distinct()
        .withColumn("hamming", F.expr("bit_count(__pa ^ __pb)"))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
