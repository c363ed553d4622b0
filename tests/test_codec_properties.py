"""Property-based tests (hypothesis) for the pure-Python media codecs
(operators/multimodal + operators/jpeg).  No Spark session needed —
these pound the byte-level encode/decode kernels with arbitrary
shapes and contents far beyond the example tests:

- lossless codecs (PPM / PNG / BMP / WAV / Y4M) must round-trip
  BIT-EXACTLY for every input;
- JPEG (lossy) must preserve shape, bound the error on flat images by
  quantization, and its decoder must reject corrupted magics;
- dHash must be invariant under exact re-encoding across codecs.
"""

import numpy as np
from hypothesis import given, settings, strategies as st

from sparkplans.operators import jpeg, multimodal as mm

# keep images small: each example runs a full encode+decode
dims = st.tuples(
    st.integers(min_value=1, max_value=24),   # h
    st.integers(min_value=1, max_value=24),   # w
)


def _rand_img(h, w, c, seed):
    return (
        np.random.default_rng(seed)
        .integers(0, 256, size=(h, w, c))
        .astype("uint8")
    )


@settings(max_examples=40, deadline=None)
@given(dims, st.integers(0, 2**32 - 1))
def test_ppm_roundtrip_property(hw, seed):
    img = _rand_img(*hw, 3, seed)
    assert (mm.decode_ppm(mm.encode_ppm(img)) == img).all()


@settings(max_examples=40, deadline=None)
@given(dims, st.booleans(), st.integers(0, 2**32 - 1))
def test_png_roundtrip_property(hw, rgba, seed):
    img = _rand_img(*hw, 4 if rgba else 3, seed)
    assert (mm.decode_png(mm.encode_png(img)) == img).all()


@settings(max_examples=40, deadline=None)
@given(dims, st.integers(0, 2**32 - 1))
def test_bmp_roundtrip_property(hw, seed):
    # every width hits a different 4-byte row padding case
    img = _rand_img(*hw, 3, seed)
    assert (mm.decode_bmp(mm.encode_bmp(img)) == img).all()


@settings(max_examples=40, deadline=None)
@given(
    st.integers(min_value=1, max_value=500),
    st.integers(min_value=1, max_value=2),
    st.sampled_from([8000, 16000, 44100]),
    st.integers(0, 2**32 - 1),
)
def test_wav_roundtrip_property(n, ch, rate, seed):
    pcm = (
        np.random.default_rng(seed)
        .integers(-32768, 32768, size=(n, ch))
        .astype("<i2")
    )
    dec, got_rate = mm.decode_wav(mm.encode_wav(pcm, rate))
    assert got_rate == rate and (dec == pcm).all()


@settings(max_examples=25, deadline=None)
@given(
    st.integers(min_value=0, max_value=6),
    st.tuples(
        st.integers(min_value=1, max_value=12),
        st.integers(min_value=1, max_value=12),
    ),
    st.integers(0, 2**32 - 1),
)
def test_y4m_roundtrip_property(n_frames, hw, seed):
    h, w = hw
    frames = (
        np.random.default_rng(seed)
        .integers(0, 256, size=(n_frames, h, w, 3))
        .astype("uint8")
    )
    dec, fps = mm.decode_y4m(mm.encode_y4m(frames, 25, 1))
    assert fps == 25.0
    assert dec.shape == frames.shape and (dec == frames).all()


@settings(max_examples=15, deadline=None)
@given(
    st.tuples(
        st.integers(min_value=1, max_value=20),
        st.integers(min_value=1, max_value=20),
    ),
    st.integers(min_value=0, max_value=255),
)
def test_jpeg_flat_image_error_bounded(hw, level):
    """A flat image's reconstruction error is bounded by DC
    quantization (±2 at q=85) for EVERY size and gray level —
    exercises odd dimensions, edge padding, and chroma handling."""
    img = np.full((*hw, 3), level, dtype=np.uint8)
    dec = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=85))
    assert dec.shape == img.shape
    assert np.abs(dec.astype(int) - int(level)).max() <= 2


@settings(max_examples=20, deadline=None)
@given(dims, st.integers(0, 2**32 - 1))
def test_dhash_invariant_under_lossless_reencode(hw, seed):
    """The perceptual hash is a function of the pixels, not the
    container: PPM, PNG, and BMP encodings of the same image hash
    identically through decode_image."""
    h, w = hw
    if h < 8 or w < 9:  # dhash needs at least its grid
        h, w = h + 8, w + 9
    img = _rand_img(h, w, 3, seed)
    hashes = {
        mm.dhash_array(mm.decode_image(enc(img)))
        for enc in (mm.encode_ppm, mm.encode_png, mm.encode_bmp)
    }
    assert len(hashes) == 1


@settings(max_examples=30, deadline=None)
@given(st.binary(min_size=0, max_size=64))
def test_decoders_reject_garbage(data):
    """Arbitrary non-magic bytes never decode to an image/clip: every
    decoder raises ValueError instead of mis-parsing."""
    from sparkplans.operators import gif

    for dec in (mm.decode_ppm, mm.decode_png, mm.decode_bmp,
                mm.decode_wav, mm.decode_y4m, jpeg.decode_jpeg,
                gif.decode_gif, mm.decode_image):
        magic_ok = (
            data[:2] in (b"P6", b"BM", b"\xff\xd8")
            or data[:4] in (b"RIFF", b"GIF8")
            or data[:8] == mm._PNG_SIG
            or data[:9] == b"YUV4MPEG2"
        )
        if magic_ok:
            continue  # a truncated-but-magic payload may raise anything
        accepted = False
        try:
            dec(data)
            accepted = True
        except Exception:
            pass
        assert not accepted, f"{dec.__name__} accepted garbage"


@settings(max_examples=30, deadline=None)
@given(
    st.tuples(
        st.integers(min_value=1, max_value=16),
        st.integers(min_value=1, max_value=16),
    ),
    st.sampled_from([1, 2, 3, 4]),
    st.integers(0, 2**32 - 1),
)
def test_png_all_color_types_roundtrip(hw, channels, seed):
    """PNG round-trips for every 8-bit color type: grayscale (0),
    gray+alpha (4), RGB (2), RGBA (6)."""
    img = _rand_img(*hw, channels, seed)
    dec = mm.decode_png(mm.encode_png(img))
    assert dec.shape == img.shape and (dec == img).all()


@settings(max_examples=30, deadline=None)
@given(dims, st.sampled_from([1, 2, 3, 4]), st.integers(0, 2**32 - 1))
def test_png_adam7_interlaced_roundtrip(hw, channels, seed):
    """Adam7-interlaced PNGs round-trip bit-exactly for every size
    (all seven pass geometries, including empty passes on tiny
    images) and decode identically to the non-interlaced encoding."""
    img = _rand_img(*hw, channels, seed)
    dec = mm.decode_png(mm.encode_png(img, interlace=True))
    assert dec.shape == img.shape and (dec == img).all()
    assert (mm.decode_png(mm.encode_png(img)) == dec).all()


@settings(max_examples=25, deadline=None)
@given(
    st.tuples(
        st.integers(min_value=1, max_value=16),
        st.integers(min_value=1, max_value=16),
    ),
    st.integers(min_value=1, max_value=3),
    st.booleans(),
    st.integers(0, 2**32 - 1),
)
def test_gif_roundtrip_property(hw, n_frames, interlace, seed):
    """GIF round-trips exactly (palette <=256 colors by construction)
    for every size, frame count, and interlace mode."""
    from sparkplans.operators import gif

    rng = np.random.default_rng(seed)
    cols = rng.integers(0, 256, size=(32, 3)).astype("uint8")
    frames = cols[rng.integers(0, 32, size=(n_frames, *hw))]
    dec, _ = gif.decode_gif(gif.encode_gif(frames, interlace=interlace))
    assert dec.shape == frames.shape and (dec == frames).all()
