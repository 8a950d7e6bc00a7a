"""Property-based round-trip tests for the pure-Python media codecs
(datapipe.png / flac / jpeg). The lossless codecs must be bit-exact on
ARBITRARY inputs; JPEG's progressive and multi-scan encodings must be
pixel-identical to the baseline encoding of the same image (identical
quantized coefficients by construction). Hypothesis shrinks any
counterexample to a minimal failing image/signal."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st


@st.composite
def _images(draw, max_side=24, channels=3):
    h = draw(st.integers(1, max_side))
    w = draw(st.integers(1, max_side))
    seed = draw(st.integers(0, 2**31 - 1))
    rng = np.random.default_rng(seed)
    shape = (h, w, channels) if channels else (h, w)
    return rng.integers(0, 256, shape, dtype=np.uint8)


@given(_images())
@settings(max_examples=30, deadline=None)
def test_png_rgb_roundtrip_property(img):
    from cubert_spark.datapipe import png

    assert (png.decode_png(png.encode_png(img)) == img).all()
    assert (png.decode_png(png.encode_png(img, interlace=True)) == img).all()


@given(_images(channels=0))
@settings(max_examples=20, deadline=None)
def test_png_gray_roundtrip_property(img):
    from cubert_spark.datapipe import png

    out = png.decode_png(png.encode_png(img))
    assert (out[..., 0] == img).all() and (out[..., 2] == img).all()


@given(
    st.integers(1, 6000),
    st.integers(1, 2),
    st.integers(0, 2**31 - 1),
    st.sampled_from(["fixed", "lpc"]),
    st.integers(0, 4),
)
@settings(max_examples=25, deadline=None)
def test_flac_roundtrip_property(n, nch, seed, subframe, shift):
    from cubert_spark.datapipe import flac

    rng = np.random.default_rng(seed)
    x = rng.integers(-2000, 2000, (n, nch)) << shift
    dec, sr, depth = flac.decode_flac(flac.encode_flac(x, 8000, 16, subframe=subframe))
    assert (dec == x).all() and (sr, depth) == (8000, 16)


@given(st.integers(0, 2**31 - 1), st.integers(2, 2), st.integers(0, 2**31 - 1))
@settings(max_examples=15, deadline=None)
def test_flac_stereo_modes_property(seed, nch, mode_seed):
    from cubert_spark.datapipe import flac

    rng = np.random.default_rng(seed)
    n = int(rng.integers(1, 5000))
    x = rng.integers(-20000, 20000, (n, 2))
    mode = ["left_side", "right_side", "mid_side"][mode_seed % 3]
    dec, _, _ = flac.decode_flac(flac.encode_flac(x, 8000, 16, stereo_mode=mode))
    assert (dec == x).all(), mode


@given(_images(max_side=20))
@settings(max_examples=12, deadline=None)
def test_jpeg_progressive_identity_property(img):
    from cubert_spark.datapipe import jpeg

    base = jpeg.decode_jpeg(jpeg.encode_baseline_jpeg(img))
    prog = jpeg.decode_jpeg(jpeg.encode_progressive_jpeg(img))
    multi = jpeg.decode_jpeg(jpeg.encode_baseline_jpeg(img, scan_per_component=True))
    assert (base == prog).all()
    assert (base == multi).all()


@given(
    seed=st.integers(0, 10_000),
    nch=st.integers(1, 2),
    tag_i=st.integers(0, 2),
)
@settings(max_examples=25, deadline=None)
def test_wavext_container_roundtrip_property(seed, nch, tag_i):
    """Any int16 signal survives the mu-law/A-law/IMA WAV container
    with exact sample count and bounded quantization error; G.711
    decode∘encode is a fixpoint."""
    import numpy as np

    from cubert_spark.datapipe import wavext as wx

    rng = np.random.default_rng(seed)
    n = int(rng.integers(1, 3000))
    pcm = rng.integers(-32768, 32768, (n, nch)).astype(np.int16)
    tag = [wx.WAVE_FORMAT_MULAW, wx.WAVE_FORMAT_ALAW, wx.WAVE_FORMAT_IMA_ADPCM][tag_i]
    out, sr, ch = wx.decode_wav_ext(wx.encode_wav_ext(pcm, 8000, tag))
    assert (sr, ch) == (8000, nch)
    assert out.shape == pcm.shape
    if tag == wx.WAVE_FORMAT_MULAW:
        # largest mu-law step is 8031->8191 region: bounded error
        assert np.abs(out.astype(int) - pcm.astype(int)).max() <= 1024
        codes = wx.mulaw_encode(pcm.reshape(-1))
        assert np.array_equal(wx.mulaw_encode(wx.mulaw_decode(codes)), codes)
    elif tag == wx.WAVE_FORMAT_ALAW:
        assert np.abs(out.astype(int) - pcm.astype(int)).max() <= 1024


@given(st.binary(min_size=0, max_size=200), st.integers(0, 3))
@settings(max_examples=120, deadline=None)
def test_new_parsers_fail_typed_on_garbage(data, which):
    """GIF/TIFF/AVI parsers reject arbitrary bytes with their typed
    error classes (or NotImplementedError for recognized-but-
    unsupported) — never IndexError/struct.error/KeyError."""
    from cubert_spark.datapipe.avi import AviError, parse_avi
    from cubert_spark.datapipe.gif import GifError, decode_gif
    from cubert_spark.datapipe.tiff import TiffError, decode_tiff

    # bias some inputs toward valid magics so parsing goes deeper
    prefixes = [b"", b"GIF89a", b"II\x2a\x00", b"RIFF\xff\x00\x00\x00AVI "]
    raw = prefixes[which] + data
    for fn, err in ((decode_gif, GifError), (decode_tiff, TiffError), (parse_avi, AviError)):
        try:
            fn(raw)
        except (err, NotImplementedError, ValueError):
            pass  # typed rejection (ValueError parents the err classes)


@given(st.integers(1, 60))
@settings(max_examples=40, deadline=None)
def test_new_codecs_truncation_is_typed(cut):
    """Truncating VALID gif/tiff/avi files at any byte raises the
    typed error (or decodes a shorter-but-valid prefix) — no raw
    struct/index crashes from the guts of the parsers."""
    import numpy as np

    from cubert_spark.datapipe.avi import AviError, encode_mjpeg_avi, parse_avi
    from cubert_spark.datapipe.gif import GifError, decode_gif, encode_gif
    from cubert_spark.datapipe.tiff import TiffError, decode_tiff, encode_tiff

    img = np.arange(48, dtype=np.uint8).reshape(4, 4, 3)
    files = [
        (encode_gif([img]), GifError, decode_gif),
        (encode_tiff(img), TiffError, decode_tiff),
        (encode_mjpeg_avi([b"\xff\xd8fake"], 4, 4), AviError, parse_avi),
    ]
    for raw, err, fn in files:
        trunc = raw[: max(0, len(raw) - cut)]
        try:
            fn(trunc)
        except (err, NotImplementedError, ValueError):
            pass


@given(st.binary(min_size=0, max_size=150), st.integers(0, 4))
@settings(max_examples=100, deadline=None)
def test_media_parsers_fail_typed_on_garbage(data, which):
    """jpeg/png/flac/mp3/mp4 parsers reject arbitrary bytes with
    ValueError-family or NotImplementedError — never raw
    struct/index/key errors (the same boundary contract as
    gif/tiff/avi)."""
    from cubert_spark.datapipe import flac, jpeg, mp3, mp4, png

    prefixes = [b"", b"\xff\xd8", b"\x89PNG\r\n\x1a\n", b"fLaC",
                b"\x00\x00\x00\x18ftypisom"]
    raw = prefixes[which] + data
    for fn in (jpeg.decode_jpeg, png.decode_png, flac.decode_flac,
               mp3.parse_mp3, mp4.demux_mp4):
        try:
            fn(raw)
        except (ValueError, NotImplementedError):
            pass


@given(st.integers(1, 80))
@settings(max_examples=50, deadline=None)
def test_media_codecs_truncation_is_typed(cut):
    """Truncating valid jpeg/png/flac files at any byte raises the
    ValueError family, never a raw struct/index crash."""
    import numpy as np

    from cubert_spark.datapipe import flac, jpeg, png

    img = np.arange(48, dtype=np.uint8).reshape(4, 4, 3)
    sine = (np.sin(np.arange(400) / 5) * 1000).astype("<i2")
    files = [
        (jpeg.encode_baseline_jpeg(img), jpeg.decode_jpeg),
        (png.encode_png(img), png.decode_png),
        (flac.encode_flac(sine, 8000, 16), flac.decode_flac),
    ]
    for raw, fn in files:
        trunc = raw[: max(0, len(raw) - cut)]
        try:
            fn(trunc)
        except (ValueError, NotImplementedError):
            pass
