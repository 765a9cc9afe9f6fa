"""Baseline JPEG codec (operators/jpeg.py): from-scratch T.81 encode +
decode, no PIL. Round-trip checks are calibrated to what the format
guarantees: flat gray at quality 100 is EXACT (DC-only blocks, all-ones
quant table), arbitrary content at quality 100 is within DCT/color
rounding, and the quality ladder degrades monotonically.
"""

from __future__ import annotations

import numpy as np
import pytest

from gpi_etl_spark.operators.jpeg import decode_jpeg, encode_jpeg


def test_flat_gray_q100_exact():
    g = np.full((10, 13), 77, dtype=np.uint8)
    d = decode_jpeg(encode_jpeg(g, quality=100))
    assert (d["width"], d["height"]) == (13, 10)
    assert (d["pixels"] == 77).all()
    assert d["feature"] == [77.0, 77.0, 77.0, 0.0]


def test_flat_gray_q100_exact_many_values():
    # exactness must hold for every gray level, any non-multiple-of-8 dims
    for v in (0, 1, 19, 127, 128, 200, 255):
        d = decode_jpeg(encode_jpeg(np.full((9, 17), v, np.uint8), quality=100))
        assert (d["pixels"] == v).all(), f"gray {v} not exact"


def test_q100_near_lossless_random():
    rng = np.random.RandomState(11)
    px = rng.randint(0, 256, size=(16, 16, 3), dtype=np.uint8)
    d = decode_jpeg(encode_jpeg(px, quality=100))
    err = np.abs(d["pixels"].astype(int) - px.astype(int))
    # only DCT rounding + color-transform rounding survive at q100
    assert err.max() <= 3
    g = rng.randint(0, 256, size=(16, 16), dtype=np.uint8)
    dg = decode_jpeg(encode_jpeg(g, quality=100))
    assert np.abs(dg["pixels"][:, :, 0].astype(int) - g.astype(int)).max() <= 1


def test_quality_ladder_monotone():
    rng = np.random.RandomState(7)
    px = rng.randint(0, 256, size=(24, 24, 3), dtype=np.uint8)
    errs = []
    for q in (100, 90, 60, 30):
        d = decode_jpeg(encode_jpeg(px, quality=q))
        errs.append(float(np.abs(d["pixels"].astype(float) - px).mean()))
    assert errs == sorted(errs)
    assert errs[0] < 1.0


def test_gradient_and_partial_blocks():
    # linear gradients are low-frequency: high quality keeps them tight,
    # including edge blocks that needed padding (21x13 is not 8-aligned)
    grad = np.clip(
        np.add.outer(np.arange(21) * 3, np.arange(13) * 5) + 10, 0, 255
    ).astype(np.uint8)
    d = decode_jpeg(encode_jpeg(grad, quality=95))
    err = np.abs(d["pixels"][:, :, 0].astype(int) - grad.astype(int))
    assert err.max() <= 4


def test_unsupported_variants_raise():
    g = np.full((8, 8), 50, dtype=np.uint8)
    payload = bytearray(encode_jpeg(g))
    # corrupt SOF0 marker into SOF2 (progressive)
    idx = bytes(payload).find(b"\xff\xc0")
    payload[idx + 1] = 0xC2
    with pytest.raises(NotImplementedError, match="baseline"):
        decode_jpeg(bytes(payload))
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"not a jpeg")


def test_dispatch_and_resize_through_media_ops():
    from gpi_etl_spark.operators.multimodal import (
        _resize_payload,
        decode_bmp,
        decode_media,
    )

    g = np.full((16, 16), 90, dtype=np.uint8)
    payload = encode_jpeg(g, quality=100)
    d = decode_media(payload)
    assert d["format"] == "jpeg" and d["feature"][0] == 90.0
    out = _resize_payload(payload, 4, 4, deterministic_fake=False)
    db = decode_bmp(out)
    assert (db["pixels"] == 90).all()


def test_truncated_payload_raises_value_error():
    g = np.full((32, 32), 50, dtype=np.uint8)
    payload = encode_jpeg(g)
    with pytest.raises(ValueError, match="truncated|marker"):
        decode_jpeg(payload[: len(payload) // 2])
