"""Property-based codec checks (hypothesis): the stdlib PNG/BMP codecs
must round-trip EXACTLY for arbitrary pixel content and dimensions, and
the JPEG flat-gray quality-100 exactness (the q109 oracle property)
must hold for every gray level and non-aligned size — not just the
fixture values the unit tests chose."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from gpi_etl_spark.operators.jpeg import decode_jpeg, encode_jpeg
from gpi_etl_spark.operators.multimodal import (
    decode_bmp,
    decode_png,
    encode_bmp,
    encode_png,
)


def _pixels(h: int, w: int, seed: int) -> np.ndarray:
    return np.random.RandomState(seed).randint(
        0, 256, size=(h, w, 3), dtype=np.uint8
    )


@given(h=st.integers(1, 16), w=st.integers(1, 16), seed=st.integers(0, 10**6))
@settings(max_examples=30, deadline=None)
def test_png_roundtrip_exact(h, w, seed):
    px = _pixels(h, w, seed)
    d = decode_png(encode_png(px))
    assert (d["width"], d["height"]) == (w, h)
    assert (d["pixels"] == px).all()


@given(h=st.integers(1, 20), w=st.integers(1, 20), seed=st.integers(0, 10**6),
       depth16=st.booleans())
@settings(max_examples=30, deadline=None)
def test_png_adam7_roundtrip_exact(h, w, seed, depth16):
    """Adam7 pass extraction/scatter is exact for every canvas size
    (incl. sizes where entire passes are empty), at both bit depths."""
    px = _pixels(h, w, seed)
    src = px.astype(np.uint16) * 257 if depth16 else px
    d = decode_png(encode_png(src, interlace=True))
    assert (d["pixels"] == px).all()


@given(h=st.integers(1, 16), w=st.integers(1, 16), seed=st.integers(0, 10**6))
@settings(max_examples=30, deadline=None)
def test_png_16bit_quantizes_round_div257(h, w, seed):
    raw = np.random.RandomState(seed).randint(
        0, 65536, size=(h, w, 3)).astype(np.uint16)
    d = decode_png(encode_png(raw))
    assert (d["pixels"] == np.round(raw / 257.0).astype(np.uint8)).all()


@given(h=st.integers(1, 16), w=st.integers(1, 16), seed=st.integers(0, 10**6))
@settings(max_examples=30, deadline=None)
def test_gif_roundtrip_when_palette_fits(h, w, seed):
    px = _pixels(h, w, seed)
    from gpi_etl_spark.operators.multimodal import decode_gif, encode_gif

    n_colors = len(np.unique(px.reshape(-1, 3), axis=0))
    if n_colors > 256:
        return
    d = decode_gif(encode_gif(px))
    assert (d["width"], d["height"]) == (w, h)
    assert (d["pixels"] == px).all()


@given(h=st.integers(1, 16), w=st.integers(1, 16), seed=st.integers(0, 10**6))
@settings(max_examples=30, deadline=None)
def test_bmp_roundtrip_exact(h, w, seed):
    px = _pixels(h, w, seed)
    d = decode_bmp(encode_bmp(px))
    assert (d["width"], d["height"]) == (w, h)
    assert (d["pixels"] == px).all()


@given(h=st.integers(1, 24), w=st.integers(1, 24), v=st.integers(0, 255))
@settings(max_examples=30, deadline=None)
def test_jpeg_flat_gray_q100_exact(h, w, v):
    d = decode_jpeg(encode_jpeg(np.full((h, w), v, np.uint8), quality=100))
    assert (d["width"], d["height"]) == (w, h)
    assert (d["pixels"] == v).all()


@given(h=st.integers(8, 24), w=st.integers(8, 24), seed=st.integers(0, 10**6))
@settings(max_examples=15, deadline=None)
def test_jpeg_q100_bounded_error(h, w, seed):
    px = _pixels(h, w, seed)
    d = decode_jpeg(encode_jpeg(px, quality=100))
    err = np.abs(d["pixels"].astype(int) - px.astype(int))
    assert err.max() <= 3  # only DCT + color-transform rounding at q100
