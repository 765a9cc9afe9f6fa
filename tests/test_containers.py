"""Container metadata probes: MP4 box walk, MP3 frame scan, and the
header-only multi-format probe (operators/containers.py)."""

import io
import struct
import wave

import numpy as np
import pytest

from gpi_etl_spark.operators.containers import (
    build_mp3,
    build_mp4,
    parse_mp3_meta,
    parse_mp4_meta,
    probe_media_meta,
    probe_payload,
)
from gpi_etl_spark.operators.multimodal import encode_bmp, encode_gif, encode_png


# ---------------------------------------------------------------------------
# MP4
# ---------------------------------------------------------------------------

def test_mp4_roundtrip_meta():
    m = parse_mp4_meta(build_mp4(1920, 1080, 12_000, 30, codec="hev1",
                                 brand="mp42"))
    assert m["width"] == 1920 and m["height"] == 1080
    assert m["duration_ms"] == 12_000
    assert m["n_frames"] == 360
    assert m["fps"] == pytest.approx(30.0)
    assert m["codec"] == "hev1" and m["brand"] == "mp42"
    assert m["media_type"] == "video" and m["n_tracks"] == 1


def test_mp4_largesize_box():
    """A 64-bit largesize mdat parses (streaming-recorder layout)."""
    base = build_mp4(64, 48, 1000, 10)
    large = base + struct.pack(">I", 1) + b"mdat" + struct.pack(">Q", 16)
    m = parse_mp4_meta(large)
    assert m["width"] == 64 and m["duration_ms"] == 1000


def test_mp4_truncated_box_raises():
    bad = build_mp4(64, 48, 1000, 10)[:40] + struct.pack(">I", 10 ** 6) + b"moov"
    with pytest.raises(ValueError, match="bad box size"):
        parse_mp4_meta(bad)


# ---------------------------------------------------------------------------
# MP3
# ---------------------------------------------------------------------------

def test_mp3_cbr_scan():
    m = parse_mp3_meta(build_mp3(38, kbps=192, rate=44100))
    assert m["n_frames"] == 38
    assert m["bitrate_kbps"] == 192
    assert m["sample_rate"] == 44100
    # 38 frames * 1152 samples at 44.1 kHz
    assert m["duration_ms"] == 38 * 1152 * 1000 // 44100
    assert m["vbr"] is False


def test_mp3_id3_skip():
    m = parse_mp3_meta(build_mp3(10, kbps=128, rate=32000, id3_bytes=300))
    assert m["n_frames"] == 10 and m["sample_rate"] == 32000


def test_mp3_vbr_flag():
    a = build_mp3(5, kbps=128)
    b = build_mp3(5, kbps=320)
    m = parse_mp3_meta(a + b)
    assert m["n_frames"] == 10 and m["vbr"] is True
    assert m["bitrate_kbps"] == (128 * 5 + 320 * 5) // 10


def test_mp3_garbage_raises():
    with pytest.raises(ValueError, match="no valid layer-III"):
        parse_mp3_meta(b"\x00\x01\x02" * 50)


# ---------------------------------------------------------------------------
# Header-only probe: every format, no pixel/sample read
# ---------------------------------------------------------------------------

def _wav_bytes(n=800, rate=8000):
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(np.zeros(n, "<i2").tobytes())
    return buf.getvalue()


def test_probe_dispatch_all_formats():
    px = np.arange(24, dtype=np.uint8).reshape(2, 4, 3)
    cases = {
        "bmp": encode_bmp(px), "png": encode_png(px), "gif": encode_gif(px),
        "ppm": b"P6\n4 2\n255\n" + px.tobytes(),
        "wav": _wav_bytes(), "mp3": build_mp3(3),
        "mp4": build_mp4(320, 240, 2000, 25),
    }
    for fmt, payload in cases.items():
        got = probe_payload(payload)
        assert got["format"] == fmt, fmt
    img = probe_payload(cases["gif"])
    assert (img["width"], img["height"]) == (4, 2)
    wavm = probe_payload(cases["wav"])
    assert wavm["duration_ms"] == 100 and wavm["n_frames"] == 800
    assert probe_payload(b"")["format"] is None
    assert probe_payload(b"\x00" * 64)["format"] is None


def test_probe_is_lenient_on_corrupt_payloads():
    """A payload matching a magic prefix but failing its parse must
    yield a sniffed-format row with null metadata, never raise — one
    corrupt object cannot kill the probe stage over a raw lake."""
    cases = {
        b"\xff": None,                      # lone 0xFF, not even a sync
        b"GIF89a": "gif",                   # magic only, truncated LSD
        b"\x89PNG\r\n\x1a\n": "png",        # signature only, no IHDR
        b"ID3 this is not really an mp3": "mp3",
        b"P6 garbage": "ppm",
        b"BM\x01": "bmp",
        b"\x00\x00\x00\x0cftypWRNG": "mp4",  # ftyp magic, bogus boxes
        b"RIFF\x00\x00\x00\x00WAVE": "wav",  # no fmt/data chunks
    }
    for payload, fmt in cases.items():
        got = probe_payload(payload)  # must not raise
        assert got["format"] == fmt, (payload, got)
        if fmt not in ("wav",):  # wav with no chunks legitimately has
            assert got["width"] is None  # nothing beyond the sniff
            assert got["duration_ms"] is None


def test_probe_jpeg_skips_fill_bytes():
    """T.81 B.1.1.2: any number of 0xFF fill bytes may precede a
    marker; the dim scan must not treat a fill byte as a marker."""
    from gpi_etl_spark.operators.jpeg import encode_jpeg

    j = bytearray(encode_jpeg(np.full((17, 23), 99, np.uint8), quality=90))
    sof = j.index(b"\xff\xc0")
    j[sof:sof] = b"\xff"  # one fill byte immediately before SOF0
    m = probe_payload(bytes(j))
    assert (m["width"], m["height"]) == (23, 17)


def test_probe_jpeg_dims_without_decode():
    from gpi_etl_spark.operators.jpeg import encode_jpeg

    j = encode_jpeg(np.full((17, 23), 99, np.uint8), quality=90)
    m = probe_payload(j)
    assert (m["format"], m["width"], m["height"]) == ("jpeg", 23, 17)
    assert m["codec"] == "jpeg-baseline"


def test_probe_media_meta_distributed(spark):
    """The ONE-mapInPandas probe over a mixed lake: metadata lands typed,
    payload bytes never reach the driver."""
    rows = [
        (1, build_mp4(640, 360, 4000, 24)),
        (2, build_mp3(20, kbps=128)),
        (3, _wav_bytes(1600)),
        (4, encode_png(np.zeros((5, 6, 3), np.uint8))),
        (5, None),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    out = {r["media_id"]: r.asDict()
           for r in probe_media_meta(df.repartition(3)).collect()}
    assert out[1]["format"] == "mp4" and out[1]["width"] == 640
    assert out[1]["n_frames"] == 96
    assert out[2]["format"] == "mp3" and out[2]["bitrate_kbps"] == 128
    assert out[3]["format"] == "wav" and out[3]["duration_ms"] == 200
    assert out[4]["format"] == "png" and out[4]["height"] == 5
    assert out[5]["format"] is None and out[5]["n_bytes"] == 0
    # plan: a single mapInPandas over the scan, no extra exchange
    plan = probe_media_meta(df)._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan
