"""Connectors (injected fetchers, no network) + multimodal plumbing."""

import io
import zipfile

import pytest
from pyspark.sql import functions as F

from gpi_etl_spark.operators.multimodal import (
    attach_binary_meta,
    extract_features,
    resize_images,
)
from gpi_etl_spark.sources.connectors import http_csv, paginated, zipped_member
from gpi_etl_spark.sources.fixed_width import parse_fixed_width


def test_parse_fixed_width_with_skip(spark):
    lines = spark.createDataFrame(
        [("header junk",), ("04JAN2026 25.1",), ("11JAN2026 26.2",)], "value string"
    )
    out = parse_fixed_width(lines, [10, 5], ["week", "sst"], skip_rows=1)
    rows = [(r.week, r.sst) for r in out.collect()]
    assert rows == [("04JAN2026", "25.1"), ("11JAN2026", "26.2")]


def test_http_csv_with_injected_fetch(spark):
    payload = b"Date,Close,Junk\n2024-01-01,10.5,x\n2024-01-02,11.0,y\n"
    df = http_csv(spark, "http://example/feed.csv", fetch=lambda url: payload,
                  columns=["Date", "Close"])
    assert df.columns == ["Date", "Close"]
    assert df.count() == 2


def test_zipped_member():
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("report.xls", b"xlsbytes")
        zf.writestr("readme.txt", b"no")
    assert zipped_member(buf.getvalue(), ".xls") == b"xlsbytes"


def test_paginated_loop():
    pages = {None: ([{"a": 1}], "t1"), "t1": ([{"a": 2}], None)}
    rows = paginated(lambda tok: pages[tok])
    assert rows == [{"a": 1}, {"a": 2}]


def _media(spark):
    rows = [(1, b"abc123", ("image", "png", 2, 2, None, None)),
            (2, b"zzzzzz", ("audio", "wav", None, None, 1000, 8000))]
    return spark.createDataFrame(
        rows,
        "media_id long, payload binary, "
        "meta struct<media_type:string,format:string,width:int,height:int,"
        "duration_ms:bigint,sample_rate:int>",
    )


def test_attach_binary_meta(spark):
    out = attach_binary_meta(_media(spark))
    r = out.filter(F.col("media_id") == 1).first()
    assert r.n_bytes == 6
    assert len(r.payload_sha256) == 64


def test_extract_features_deterministic_fake(spark):
    # fake path is explicit opt-in (strict decode is the default)
    out1 = extract_features(
        _media(spark), deterministic_fake=True
    ).orderBy("media_id").collect()
    out2 = extract_features(
        _media(spark), deterministic_fake=True
    ).orderBy("media_id").collect()
    assert [r.feature for r in out1] == [r.feature for r in out2]
    assert all(len(r.feature) == 4 for r in out1)
    assert out1[0].n_bytes == 6


def test_unsupported_formats_raise_by_default(spark):
    # non-decodable payloads defer the raise to the executor step; strict
    # mode is now the DEFAULT (no deterministic_fake flag needed)
    strict = resize_images(_media(spark), 64, 64)
    with pytest.raises(Exception, match="NotImplementedError|PIL"):
        strict.collect()
    strict2 = extract_features(_media(spark))
    with pytest.raises(Exception, match="NotImplementedError|codec"):
        strict2.collect()


def _wav_bytes(amp=8192, half=4, n=1600, rate=8000):
    import io as _io
    import wave as _wave

    import numpy as np

    block = np.r_[np.full(half, amp), np.full(half, -amp)]
    sig = np.tile(block, n // (2 * half) + 1)[:n].astype("<i2")
    buf = _io.BytesIO()
    with _wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(sig.tobytes())
    return buf.getvalue()


def test_decode_wav_real():
    from gpi_etl_spark.operators.multimodal import decode_wav

    d = decode_wav(_wav_bytes())
    assert d["sample_rate"] == 8000
    assert d["duration_ms"] == 200
    rms, peak, zcr, mean = d["feature"]
    assert abs(rms - 8192 / 32768) < 1e-12
    assert abs(peak - 8192 / 32768) < 1e-12
    assert abs(zcr - (1599 // 4) / 1599) < 1e-12
    assert abs(mean) < 1e-12


def test_decode_bmp_ppm_roundtrip():
    import numpy as np

    from gpi_etl_spark.operators.multimodal import (
        decode_bmp,
        decode_ppm,
        encode_bmp,
    )

    px = np.arange(5 * 4 * 3, dtype=np.uint8).reshape(5, 4, 3)
    d = decode_bmp(encode_bmp(px))
    assert (d["width"], d["height"]) == (4, 5)
    assert (d["pixels"] == px).all()
    assert d["feature"][0] == px[:, :, 0].mean()
    ppm = b"P6\n# comment\n4 5\n255\n" + px.tobytes()
    d2 = decode_ppm(ppm)
    assert (d2["pixels"] == px).all()


def test_decode_ppm_16bit_raises():
    from gpi_etl_spark.operators.multimodal import decode_ppm

    payload = b"P6\n2 2\n65535\n" + b"\x00" * 24
    with pytest.raises(NotImplementedError, match="maxval"):
        decode_ppm(payload)


def _png_filtered(px, filt):
    """PNG-encode (h, w, 3) pixels with one filter type on every row —
    forward-applies the filter so decode must invert it."""
    import struct as _struct
    import zlib as _zlib

    import numpy as np

    h, w = px.shape[:2]
    bpp = 3
    stride = w * bpp
    prev = np.zeros(stride, dtype=np.int32)
    raw = bytearray()
    for r in range(h):
        line = px[r].reshape(-1).astype(np.int32)
        if filt == 0:
            enc = line
        elif filt == 1:  # Sub
            a = np.concatenate([np.zeros(bpp, np.int32), line[:-bpp]])
            enc = (line - a) % 256
        elif filt == 2:  # Up
            enc = (line - prev) % 256
        elif filt == 3:  # Average
            a = np.concatenate([np.zeros(bpp, np.int32), line[:-bpp]])
            enc = (line - ((a + prev) >> 1)) % 256
        else:  # Paeth
            a = np.concatenate([np.zeros(bpp, np.int32), line[:-bpp]])
            c = np.concatenate([np.zeros(bpp, np.int32), prev[:-bpp]])
            p = a + prev - c
            pa, pb, pc = np.abs(p - a), np.abs(p - prev), np.abs(p - c)
            pred = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, prev, c))
            enc = (line - pred) % 256
        raw += bytes([filt]) + enc.astype(np.uint8).tobytes()
        prev = line

    def chunk(typ, data):
        return (_struct.pack(">I", len(data)) + typ + data
                + _struct.pack(">I", _zlib.crc32(typ + data) & 0xFFFFFFFF))

    ihdr = _struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", _zlib.compress(bytes(raw))) + chunk(b"IEND", b""))


def test_decode_png_roundtrip_and_filters():
    import numpy as np

    from gpi_etl_spark.operators.multimodal import decode_png, encode_png

    rng = np.random.RandomState(7)
    px = rng.randint(0, 256, size=(6, 5, 3), dtype=np.uint8)
    d = decode_png(encode_png(px))
    assert (d["width"], d["height"]) == (5, 6)
    assert (d["pixels"] == px).all()
    for filt in (1, 2, 3, 4):
        d2 = decode_png(_png_filtered(px, filt))
        assert (d2["pixels"] == px).all(), f"filter {filt} unfilter mismatch"


def test_decode_png_matches_bmp_twin():
    import numpy as np

    from gpi_etl_spark.operators.multimodal import (
        decode_bmp,
        decode_png,
        encode_bmp,
        encode_png,
    )

    px = np.arange(7 * 3 * 3, dtype=np.uint8).reshape(7, 3, 3)
    dp = decode_png(encode_png(px))
    db = decode_bmp(encode_bmp(px))
    assert dp["feature"] == db["feature"]
    assert (dp["pixels"] == db["pixels"]).all()


def test_decode_png_gray_and_unsupported():
    import struct as _struct
    import zlib as _zlib

    import numpy as np

    from gpi_etl_spark.operators.multimodal import decode_png

    def chunk(typ, data):
        return (_struct.pack(">I", len(data)) + typ + data
                + _struct.pack(">I", _zlib.crc32(typ + data) & 0xFFFFFFFF))

    # 2x2 grayscale (color type 0): channels replicate to RGB
    g = np.array([[0, 64], [128, 255]], dtype=np.uint8)
    raw = b"".join(b"\x00" + g[r].tobytes() for r in range(2))
    payload = (b"\x89PNG\r\n\x1a\n"
               + chunk(b"IHDR", _struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0))
               + chunk(b"IDAT", _zlib.compress(raw)) + chunk(b"IEND", b""))
    d = decode_png(payload)
    assert (d["pixels"][:, :, 0] == g).all()
    assert (d["pixels"][:, :, 1] == g).all()

    # 16-bit and Adam7-interlaced now decode for real
    from gpi_etl_spark.operators.multimodal import encode_png

    px = (np.arange(9 * 10 * 3, dtype=np.uint16) % 256).astype(
        np.uint8).reshape(9, 10, 3)
    d16 = decode_png(encode_png(px.astype(np.uint16) * 257))
    assert (d16["pixels"] == px).all()
    dint = decode_png(encode_png(px, interlace=True))
    assert (dint["pixels"] == px).all()
    d16i = decode_png(encode_png(px.astype(np.uint16) * 257, interlace=True))
    assert (d16i["pixels"] == px).all()
    # arbitrary 16-bit samples quantize via round(v/257)
    v = np.array([[[0, 1, 256], [257, 65535, 32768]]], dtype=np.uint16)
    assert (decode_png(encode_png(v))["pixels"]
            == np.round(v / 257.0).astype(np.uint8)).all()
    # sub-byte depths still strict-raise
    p4 = (b"\x89PNG\r\n\x1a\n"
          + chunk(b"IHDR", _struct.pack(">IIBBBBB", 2, 2, 4, 0, 0, 0, 0))
          + chunk(b"IDAT", _zlib.compress(b"\x00" * 6)) + chunk(b"IEND", b""))
    with pytest.raises(NotImplementedError, match="4-bit"):
        decode_png(p4)


def test_resize_png_real(spark):
    import numpy as np

    from gpi_etl_spark.operators.multimodal import (
        decode_bmp,
        encode_png,
    )

    px = np.arange(8 * 8 * 3, dtype=np.uint8).reshape(8, 8, 3)
    df = spark.createDataFrame(
        [(1, encode_png(px), {"media_type": "image", "format": "png",
                              "width": 8, "height": 8,
                              "duration_ms": None, "sample_rate": None})],
        _media(spark).schema,
    )
    out = resize_images(df, 4, 2).collect()
    d = decode_bmp(bytes(out[0].payload))
    rows = (np.arange(2) * 8 // 2)
    cols = (np.arange(4) * 8 // 4)
    assert (d["pixels"] == px[rows][:, cols]).all()


def test_extract_features_real_wav(spark):
    df = spark.createDataFrame(
        [(1, _wav_bytes(), "audio")],
        "media_id long, payload binary, media_type string",
    )
    out = extract_features(
        df, media_type_col="media_type", deterministic_fake=False
    ).collect()
    assert len(out) == 1
    assert abs(out[0].feature[0] - 0.25) < 1e-12  # real RMS, not a fake


def test_resize_bmp_real(spark):
    import numpy as np

    from gpi_etl_spark.operators.multimodal import decode_bmp, encode_bmp

    px = np.arange(8 * 8 * 3, dtype=np.uint8).reshape(8, 8, 3)
    df = spark.createDataFrame(
        [(1, encode_bmp(px), {"media_type": "image", "format": "bmp",
                              "width": 8, "height": 8,
                              "duration_ms": None, "sample_rate": None})],
        _media(spark).schema,
    )
    out = resize_images(df, 4, 2, deterministic_fake=False).collect()
    d = decode_bmp(bytes(out[0].payload))
    assert (d["width"], d["height"]) == (4, 2)
    # nearest-neighbor: resampled pixels come from the source grid
    rows = (np.arange(2) * 8 // 2)
    cols = (np.arange(4) * 8 // 4)
    assert (d["pixels"] == px[rows][:, cols]).all()
    assert out[0].meta.width == 4 and out[0].meta.height == 2


def test_resize_plumbing_rewrites_payload_and_dims(spark):
    out = resize_images(
        _media(spark), 8, 4, deterministic_fake=True
    ).orderBy("media_id").collect()
    assert len(out) == 2
    for r in out:
        assert len(r.payload) == 8 * 4
        assert r.meta.width == 8 and r.meta.height == 4
    # deterministic: same input, same fake payload
    again = resize_images(
        _media(spark), 8, 4, deterministic_fake=True
    ).orderBy("media_id").collect()
    assert [bytes(r.payload) for r in out] == [bytes(r.payload) for r in again]


def test_sample_video_frames_fans_out_on_duration(spark):
    from gpi_etl_spark.operators.multimodal import sample_video_frames

    # media 2 has duration 1000 ms → frames at 0, 250, 500, 750
    out = sample_video_frames(_media(spark), every_ms=250).collect()
    by_id = {}
    for r in out:
        by_id.setdefault(r.media_id, []).append(r)
    assert 1 not in by_id  # image: no duration → no frames
    frames = sorted(by_id[2], key=lambda r: r.frame_idx)
    assert [f.ts_ms for f in frames] == [0, 250, 500, 750]
    assert [f.frame_idx for f in frames] == [0, 1, 2, 3]
    assert len({f.frame_hash for f in frames}) == 4  # per-ts distinct hashes


_CPI_HTML = """
<html><body>
<table>
  <tr><th>Year</th><th>Jan</th><th>Feb</th><th colspan="2">H1</th></tr>
  <tr><td>2023</td><td>6.4</td><td>6.0</td><td>a</td><td>b</td></tr>
  <tr><td>2024</td><td>3.1</td><td>–</td><td>c</td><td>d</td></tr>
</table>
</body></html>
"""

_WASDE_INDEX_HTML = """
<html><body>
<a href="/release/wasde-0824.xls" data-release-date="2024-08-12">Aug</a>
<a href="/other/notes.pdf" data-release-date="2024-08-01">notes</a>
<a href="/release/wasde-0724.xls" data-release-date="2024-07-12">Jul</a>
</body></html>
"""


def test_html_table_scan(spark):
    from gpi_etl_spark.sources.connectors import html_table

    df = html_table(spark, "http://x/cpi", fetch=lambda u: _CPI_HTML.encode())
    assert df.columns == ["Year", "Jan", "Feb", "H1", "H1_1"]
    rows = {r.Year: r.Feb for r in df.collect()}
    assert rows == {"2023": "6.0", "2024": "–"}  # sentinel survives to cleaning


def test_discover_links_latest_release(spark):
    from gpi_etl_spark.sources.connectors import discover_links

    links = discover_links(
        _WASDE_INDEX_HTML, href_contains=".xls", attr="data-release-date"
    )
    assert links[0] == ("/release/wasde-0824.xls", "2024-08-12")
    assert len(links) == 2


def test_html_table_omitted_close_tags(spark):
    """HTML5-valid markup with omitted </td>/</tr> must not lose cells."""
    from gpi_etl_spark.sources.connectors import html_table

    html = b"<table><tr><th>Year<th>Jan<tr><td>2023<td>6.4<tr><td>2024<td>3.1</table>"
    df = html_table(spark, "http://x", fetch=lambda u: html)
    assert df.columns == ["Year", "Jan"]
    assert {tuple(r) for r in df.collect()} == {("2023", "6.4"), ("2024", "3.1")}


def test_html_table_header_only_returns_empty(spark):
    from gpi_etl_spark.sources.connectors import html_table

    html = b"<table><tr><th>A</th><th>B</th></tr></table>"
    df = html_table(spark, "http://x", fetch=lambda u: html)
    assert df.columns == ["A", "B"] and df.count() == 0
