"""Perceptual dHash: brightness invariance, edit sensitivity, and
exact banded Hamming retrieval."""

from __future__ import annotations

import numpy as np


def _media(spark, imgs):
    import pandas as pd

    from gpi_etl_spark.operators.multimodal import encode_bmp

    rows = [(mid, bytearray(encode_bmp(px))) for mid, px in imgs]
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["media_id", "payload"]),
        schema="media_id long, payload binary",
    )


def _gradient(base, w=16, h=12):
    idx = np.arange(w * h, dtype=np.int64).reshape(h, w)
    return np.stack(
        [(base + idx + ch) % 256 for ch in range(3)], axis=2
    ).astype(np.uint8)


def test_dhash_brightness_invariant(spark):
    """A uniform brightness shift preserves every adjacent-pixel
    comparison, so the hash is IDENTICAL — the point of dHash."""
    from gpi_etl_spark.operators.multimodal import dhash_images

    media = _media(
        spark, [(1, _gradient(10)), (2, _gradient(40))]
    )
    got = {r.media_id: r.dhash for r in dhash_images(media).collect()}
    assert got[1] == got[2]
    assert 0 <= got[1] < 2**56


def test_dhash_differs_on_content_change(spark):
    from gpi_etl_spark.operators.multimodal import dhash_images

    a = _gradient(10)
    b = a.copy()
    b[:, :8, :] = 255 - b[:, :8, :]  # invert left half
    media = _media(spark, [(1, a), (2, b)])
    got = {r.media_id: r.dhash for r in dhash_images(media).collect()}
    assert got[1] != got[2]


def test_dhash_matches_python_mirror(spark):
    """The Spark mapInPandas hash equals a from-first-principles
    NumPy computation of the same 7x9 integer-gray recipe."""
    from gpi_etl_spark.operators.multimodal import dhash_images

    px = _gradient(33, w=9, h=7)
    media = _media(spark, [(5, px)])
    got = dhash_images(media).collect()[0].dhash
    g = px.astype(np.int64).sum(axis=2) // 3  # 7x9 grid == image dims
    bits = (g[:, :-1] < g[:, 1:]).astype(np.int64).flatten()
    want = int((bits << np.arange(56, dtype=np.int64)).sum())
    assert got == want


def test_banded_retrieval_equals_all_pairs(spark):
    """Banding must find EXACTLY the pairs a quadratic Hamming scan
    finds (pigeonhole guarantee for max_dist < bands)."""
    from itertools import combinations

    from gpi_etl_spark.operators.multimodal import dhash_near_dups

    rng = np.random.default_rng(7)
    hashes = [int(x) for x in rng.integers(0, 2**56, size=30)]
    # plant two near pairs
    hashes[1] = hashes[0] ^ 0b101        # hamming 2
    hashes[2] = hashes[0] ^ (0b111 << 20)  # hamming 3
    df = spark.createDataFrame(
        list(enumerate(hashes)), "media_id long, dhash long"
    )
    got = {
        (r.id_a, r.id_b): r.hamming
        for r in dhash_near_dups(df, max_dist=6).collect()
    }
    want = {}
    for (i, a), (j, b) in combinations(enumerate(hashes), 2):
        d = bin(a ^ b).count("1")
        if d <= 6:
            want[(min(i, j), max(i, j))] = d
    assert got == want
    assert (0, 1) in got and got[(0, 1)] == 2


def test_dhash_string_media_ids(spark):
    """dHash must pass the id through with its input type (UUID-style
    string keys — round-5 review find: schema hardcoded to long)."""
    import pandas as pd

    from gpi_etl_spark.operators.multimodal import dhash_images, encode_bmp

    px = _gradient(5)
    media = spark.createDataFrame(
        pd.DataFrame(
            [("img-aaa", bytearray(encode_bmp(px))),
             ("img-bbb", bytearray(encode_bmp(px)))],
            columns=["media_id", "payload"],
        ),
        schema="media_id string, payload binary",
    )
    got = {r.media_id: r.dhash for r in dhash_images(media).collect()}
    assert set(got) == {"img-aaa", "img-bbb"}
    assert got["img-aaa"] == got["img-bbb"]
