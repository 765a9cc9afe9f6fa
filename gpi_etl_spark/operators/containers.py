"""Container-format metadata probes: MP4 (ISO BMFF) and MP3, plus a
cheap header-only probe across every format the engine knows.

The reference treats binary media as opaque blob payloads
(`HTGPIWASDE/__init__.py:86-91` uploads raw workbook bytes; S12 pulls
model binaries back). A training-data lake needs one step more: typed
metadata (duration, dims, codec, bitrate) WITHOUT paying for a full
sample decode. These parsers read only container structure —
O(header)/O(frame-headers), never O(pixels) — so the probe pass over
100 TB of media touches a few KB per object and the expensive decode
(:mod:`gpi_etl_spark.operators.multimodal`) runs only on rows the
metadata filter keeps.

Everything here is from-scratch stdlib ``struct`` over public specs:
ISO/IEC 14496-12 (BMFF box grammar: ftyp/moov/mvhd/trak/tkhd/mdia/
mdhd/hdlr/stbl/stsd/stts) and the MPEG-1/2 audio frame header layout
(ISO/IEC 11172-3 / 13818-3). Sample DATA decode for MP4/MP3 stays
honestly out of scope (needs ffmpeg-class codecs); the container
*structure* does not.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# MP4 / ISO base media file format
# ---------------------------------------------------------------------------

#: boxes whose payload is a plain concatenation of child boxes
_MP4_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl"}


def _mp4_boxes(buf: bytes, start: int, end: int):
    """Yield (type, payload_start, payload_end) for the boxes in
    buf[start:end] (one nesting level; 64-bit largesize supported)."""
    pos = start
    while pos + 8 <= end:
        size = struct.unpack_from(">I", buf, pos)[0]
        typ = buf[pos + 4: pos + 8]
        body = pos + 8
        if size == 1:  # 64-bit largesize follows the type
            if body + 8 > end:
                raise ValueError("MP4: truncated largesize box")
            size = struct.unpack_from(">Q", buf, body)[0]
            body += 8
        elif size == 0:  # box extends to end of enclosing scope
            size = end - pos
        if size < body - pos or pos + size > end:
            raise ValueError(f"MP4: bad box size {size} for {typ!r}")
        yield typ, body, pos + size
        pos += size


def _mp4_versioned(buf: bytes, pos: int, v0_fmt: str, v1_fmt: str) -> tuple:
    """Read a version(1)+flags(3) full-box body in its v0 or v1 layout."""
    version = buf[pos]
    fmt = v1_fmt if version else v0_fmt
    return struct.unpack_from(fmt, buf, pos + 4)


def parse_mp4_meta(payload: bytes) -> dict:
    """ISO BMFF container metadata without decoding any sample data.

    Returns major brand, movie duration (mvhd), per-track info reduced
    to: presentation dims, codec fourcc (first stsd entry), frame count
    and fps (stts sample table vs mdhd media timescale) of the FIRST
    vide track — the primary track in common layouts — plus the track
    count.
    """
    meta: dict = {
        "media_type": "video", "format": "mp4", "brand": None,
        "width": None, "height": None, "duration_ms": None,
        "sample_rate": None, "bitrate_kbps": None, "n_frames": None,
        "codec": None, "n_tracks": 0, "fps": None,
    }
    has_video = False
    has_audio = False
    for typ, b0, b1 in _mp4_boxes(payload, 0, len(payload)):
        if typ == b"ftyp":
            meta["brand"] = payload[b0: b0 + 4].decode("ascii", "replace")
        elif typ == b"moov":
            for t2, c0, c1 in _mp4_boxes(payload, b0, b1):
                if t2 == b"mvhd":
                    ts, dur = _mp4_versioned(
                        payload, c0, ">IIIi", ">QQIq")[2:4]
                    if ts:
                        meta["duration_ms"] = int(dur) * 1000 // int(ts)
                elif t2 == b"trak":
                    meta["n_tracks"] += 1
                    tk = _parse_trak(payload, c0, c1)
                    if tk["handler"] == "vide":
                        has_video = True
                        if meta["width"] is None:
                            meta.update(
                                width=tk["width"], height=tk["height"],
                                codec=tk["codec"], n_frames=tk["n_samples"],
                                fps=tk["fps"],
                            )
                    elif tk["handler"] == "soun":
                        has_audio = True
                        if meta["sample_rate"] is None:
                            meta["sample_rate"] = tk["timescale"]
    if not has_video:
        meta["media_type"] = "audio" if has_audio else "video"
    return meta


def _parse_trak(buf: bytes, start: int, end: int) -> dict:
    tk = {"handler": None, "width": None, "height": None, "codec": None,
          "n_samples": None, "fps": None, "timescale": None}
    media_dur = None
    for typ, b0, b1 in _mp4_boxes(buf, start, end):
        if typ == b"tkhd":
            # v0: ctime,mtime,track_id,rsvd,duration ... then layer..matrix,
            # width/height as 16.16 fixed at the tail of the 84/96-byte body
            version = buf[b0]
            tail = b0 + 4 + (32 if version else 20) + 8 + 8 + 36
            w, h = struct.unpack_from(">II", buf, tail)
            tk["width"], tk["height"] = w >> 16, h >> 16
        elif typ == b"mdia":
            for t2, c0, c1 in _mp4_boxes(buf, b0, b1):
                if t2 == b"mdhd":
                    ts, dur = _mp4_versioned(buf, c0, ">IIIi", ">QQIq")[2:4]
                    tk["timescale"], media_dur = int(ts), int(dur)
                elif t2 == b"hdlr":
                    tk["handler"] = buf[c0 + 8: c0 + 12].decode(
                        "ascii", "replace")
                elif t2 == b"minf":
                    _parse_minf(buf, c0, c1, tk)
    if tk["n_samples"] and tk["timescale"] and media_dur:
        tk["fps"] = tk["n_samples"] * tk["timescale"] / media_dur
    return tk


def _parse_minf(buf: bytes, start: int, end: int, tk: dict) -> None:
    for typ, b0, b1 in _mp4_boxes(buf, start, end):
        if typ != b"stbl":
            continue
        for t2, c0, c1 in _mp4_boxes(buf, b0, b1):
            if t2 == b"stsd":
                n = struct.unpack_from(">I", buf, c0 + 4)[0]
                if n:
                    tk["codec"] = buf[c0 + 12: c0 + 16].decode(
                        "ascii", "replace")
            elif t2 == b"stts":
                n = struct.unpack_from(">I", buf, c0 + 4)[0]
                total = 0
                for i in range(n):
                    cnt = struct.unpack_from(">I", buf, c0 + 8 + 8 * i)[0]
                    total += cnt
                tk["n_samples"] = total


def build_mp4(width: int, height: int, duration_ms: int, fps: int,
              codec: str = "avc1", brand: str = "isom") -> bytes:
    """Minimal-but-valid BMFF fixture: ftyp + moov(mvhd + one vide trak
    with tkhd/mdhd/hdlr/stbl{stsd,stts}) + empty mdat. Timescales: movie
    1000, media 1000·fps so every sample delta is exactly 1000."""

    def box(typ: bytes, *payload: bytes) -> bytes:
        body = b"".join(payload)
        return struct.pack(">I", 8 + len(body)) + typ + body

    n_samples = duration_ms * fps // 1000
    media_ts = 1000 * fps
    mvhd = box(b"mvhd", struct.pack(">B3xIIIi", 0, 0, 0, 1000, duration_ms)
               + b"\x00" * 80)
    tkhd = box(b"tkhd", struct.pack(">B3xIIIxxxxi", 0, 0, 0, 1, duration_ms)
               + b"\x00" * 16 + b"\x00" * 36
               + struct.pack(">II", width << 16, height << 16))
    mdhd = box(b"mdhd", struct.pack(">B3xIIIiHH", 0, 0, 0, media_ts,
                                    duration_ms * fps, 0x55C4, 0))
    hdlr = box(b"hdlr", struct.pack(">B3xI", 0, 0) + b"vide"
               + b"\x00" * 12 + b"v\x00")
    stsd = box(b"stsd", struct.pack(">B3xI", 0, 1)
               + box(codec.encode("ascii"), b"\x00" * 8))
    stts = box(b"stts", struct.pack(">B3xIII", 0, 1, n_samples, media_ts // fps))
    stbl = box(b"stbl", stsd, stts)
    minf = box(b"minf", stbl)
    mdia = box(b"mdia", mdhd, hdlr, minf)
    trak = box(b"trak", tkhd, mdia)
    return (box(b"ftyp", brand.encode("ascii") + struct.pack(">I", 0)
                + brand.encode("ascii"))
            + box(b"moov", mvhd, trak) + box(b"mdat"))


# ---------------------------------------------------------------------------
# MP3 (MPEG-1/2 audio layer III) frame-header scan
# ---------------------------------------------------------------------------

#: kbps by bitrate index; [MPEG-version][index], index 0 = free, 15 = bad
_MP3_BITRATE = {
    1: (0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320),
    2: (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
}
_MP3_RATE = {1: (44100, 48000, 32000), 2: (22050, 24000, 16000),
             25: (11025, 12000, 8000)}
#: samples per layer-III frame
_MP3_SPF = {1: 1152, 2: 576, 25: 576}


def _mp3_frame(buf: bytes, pos: int):
    """Parse one layer-III frame header at pos → (frame_len, version,
    bitrate_kbps, sample_rate, samples) or None if not a valid sync."""
    if pos + 4 > len(buf) or buf[pos] != 0xFF or (buf[pos + 1] & 0xE0) != 0xE0:
        return None
    b1, b2 = buf[pos + 1], buf[pos + 2]
    version = {0: 25, 2: 2, 3: 1}.get((b1 >> 3) & 3)
    layer = (b1 >> 1) & 3
    if version is None or layer != 1:  # layer bits 01 = Layer III
        return None
    br_idx, sr_idx = (b2 >> 4) & 0xF, (b2 >> 2) & 3
    if br_idx in (0, 15) or sr_idx == 3:
        return None
    kbps = _MP3_BITRATE[1 if version == 1 else 2][br_idx]
    rate = _MP3_RATE[version][sr_idx]
    padding = (b2 >> 1) & 1
    spf = _MP3_SPF[version]
    frame_len = spf * kbps * 1000 // 8 // rate + padding
    return frame_len, version, kbps, rate, spf


def parse_mp3_meta(payload: bytes) -> dict:
    """Frame-header walk: skips a leading ID3v2 tag (syncsafe size),
    finds the first layer-III sync, then steps frame to frame summing
    samples and bitrate. No side-info or Huffman decode — duration,
    mean bitrate and CBR/VBR flag come from headers alone."""
    pos = 0
    if payload[:3] == b"ID3" and len(payload) >= 10:
        sz = 0
        for b in payload[6:10]:  # syncsafe: 7 bits per byte
            sz = (sz << 7) | (b & 0x7F)
        pos = 10 + sz
    first = None
    while pos + 4 <= len(payload):
        first = _mp3_frame(payload, pos)
        if first is not None:
            break
        pos += 1
    if first is None:
        raise ValueError("MP3: no valid layer-III frame sync found")
    n_frames = 0
    samples = 0
    kbps_sum = 0
    kbps_set: set[int] = set()
    rate = first[3]
    while pos + 4 <= len(payload):
        fr = _mp3_frame(payload, pos)
        if fr is None:
            break
        frame_len, _version, kbps, rate, spf = fr
        n_frames += 1
        samples += spf
        kbps_sum += kbps
        kbps_set.add(kbps)
        pos += frame_len
    is_vbr = len(kbps_set) > 1 or b"Xing" in payload[:4096]
    return {
        "media_type": "audio", "format": "mp3",
        "width": None, "height": None,
        "duration_ms": samples * 1000 // rate if rate else 0,
        "sample_rate": rate, "n_frames": n_frames,
        "bitrate_kbps": kbps_sum // n_frames if n_frames else None,
        "vbr": is_vbr, "codec": None,
    }


def build_mp3(n_frames: int, kbps: int = 128, rate: int = 44100,
              id3_bytes: int = 0) -> bytes:
    """CBR MPEG-1 Layer III fixture: optional ID3v2 shell + n_frames
    valid frame headers with zero-filled bodies (zeros contain no false
    sync)."""
    br_idx = _MP3_BITRATE[1].index(kbps)
    sr_idx = _MP3_RATE[1].index(rate)
    hdr = bytes([0xFF, 0xFB, (br_idx << 4) | (sr_idx << 2), 0x00])
    frame_len = 1152 * kbps * 1000 // 8 // rate
    frame = hdr + b"\x00" * (frame_len - 4)
    out = b""
    if id3_bytes:
        out = (b"ID3\x03\x00\x00"
               + bytes((id3_bytes >> s) & 0x7F for s in (21, 14, 7, 0))
               + b"\x00" * id3_bytes)
    return out + frame * n_frames


# ---------------------------------------------------------------------------
# Header-only probe across every known format
# ---------------------------------------------------------------------------

PROBE_SCHEMA = (
    "media_id long, n_bytes long, format string, media_type string, "
    "width int, height int, duration_ms bigint, sample_rate int, "
    "bitrate_kbps int, n_frames bigint, codec string"
)

_PROBE_KEYS = frozenset(
    ("format", "media_type", "width", "height", "duration_ms",
     "sample_rate", "bitrate_kbps", "n_frames", "codec"))
_EMPTY = {k: None for k in _PROBE_KEYS}


#: magic-byte sniff order: (format, media_type, parser)
def _sniff(payload: bytes) -> tuple[str, str] | None:
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav", "audio"
    if payload[:2] == b"BM":
        return "bmp", "image"
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        return "png", "image"
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        return "gif", "image"
    if payload[:2] == b"P6":
        return "ppm", "image"
    if payload[:3] == b"\xff\xd8\xff":
        return "jpeg", "image"
    if len(payload) >= 12 and payload[4:8] == b"ftyp":
        return "mp4", "video"
    if payload[:3] == b"ID3" or (
        len(payload) >= 2 and payload[0] == 0xFF
        and (payload[1] & 0xE0) == 0xE0
        and _mp3_frame(payload, 0) is not None
    ):
        return "mp3", "audio"
    return None


def probe_payload(payload: bytes) -> dict:
    """Dispatch on magic bytes to a header-only metadata parse. Unlike
    :func:`multimodal.decode_media` this NEVER touches sample/pixel
    data — a WAV probe reads the fmt/data chunk sizes, an image probe
    reads dims from the header, MP4/MP3 walk container structure.

    Lenient by contract: this is the first pass over a raw lake, so a
    payload that matches a magic prefix but fails its parse (truncated
    object, wrong container behind the magic) yields a row with the
    sniffed ``format``/``media_type`` and null metadata — one corrupt
    object must not kill the probe stage. Unknown magic → all-null."""
    out = dict(_EMPTY)
    if not payload:
        return out
    sniffed = _sniff(payload)
    if sniffed is None:
        return out
    fmt, mtype = sniffed
    out.update(format=fmt, media_type=mtype)
    try:
        if fmt == "wav":
            return _probe_wav(payload)
        if fmt == "bmp":
            w, h = struct.unpack_from("<ii", payload, 18)
            out.update(width=w, height=abs(h))
        elif fmt == "png":
            w, h = struct.unpack_from(">II", payload, 16)
            out.update(width=w, height=h)
        elif fmt == "gif":
            w, h = struct.unpack_from("<HH", payload, 6)
            out.update(width=w, height=h)
        elif fmt == "ppm":
            from gpi_etl_spark.operators.multimodal import _ppm_header

            w, h, _maxval, _pos = _ppm_header(payload)
            out.update(width=w, height=h)
        elif fmt == "jpeg":
            return _probe_jpeg(payload)
        elif fmt == "mp4":
            out.update({k: v for k, v in parse_mp4_meta(payload).items()
                        if k in _PROBE_KEYS})
        else:  # mp3
            out.update({k: v for k, v in parse_mp3_meta(payload).items()
                        if k in _PROBE_KEYS})
    except Exception:
        # sniffed format stands; metadata stays null for a bad parse
        return {**dict(_EMPTY), "format": fmt, "media_type": mtype}
    return out


def _probe_wav(payload: bytes) -> dict:
    out = dict(_EMPTY)
    out.update(format="wav", media_type="audio")
    pos = 12
    rate = block = None
    while pos + 8 <= len(payload):
        cid = payload[pos: pos + 4]
        sz = struct.unpack_from("<I", payload, pos + 4)[0]
        if cid == b"fmt ":
            _fmt, _ch, rate, byte_rate, block = struct.unpack_from(
                "<HHIIH", payload, pos + 8)
            out.update(sample_rate=rate,
                       bitrate_kbps=byte_rate * 8 // 1000)
        elif cid == b"data" and rate and block:
            out.update(n_frames=sz // block,
                       duration_ms=sz // block * 1000 // rate)
        pos += 8 + sz + (sz & 1)  # chunks are word-aligned
    return out


def _probe_jpeg(payload: bytes) -> dict:
    """Marker walk to the first SOFn for dims — no entropy decode."""
    out = dict(_EMPTY)
    out.update(format="jpeg", media_type="image")
    pos = 2
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            pos += 1
            continue
        marker = payload[pos + 1]
        if marker == 0xFF:  # fill byte before a marker (T.81 B.1.1.2)
            pos += 1
            continue
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        ln = struct.unpack_from(">H", payload, pos + 2)[0]
        if marker in (0xC0, 0xC1, 0xC2, 0xC3):  # SOF0-3
            h, w = struct.unpack_from(">HH", payload, pos + 5)
            out.update(width=w, height=h,
                       codec="jpeg-progressive" if marker == 0xC2
                       else "jpeg-baseline")
            return out
        if marker == 0xDA:  # SOS: dims must precede scan data
            break
        pos += 2 + ln
    return out


def probe_media_meta(df: DataFrame, payload_col: str = "payload",
                     id_col: str = "media_id",
                     keep_payload: bool = False) -> DataFrame:
    """ONE ``mapInPandas`` over the payload column → typed metadata
    rows. This is the cheap first pass of a media curation pipeline:
    downstream filters (dims too small, duration too short, wrong
    codec) run on these columns and only survivors reach the full
    decode — at 100 TB the probe reads container headers while the
    decode fleet sees a fraction of the bytes.

    ``keep_payload=True`` carries the payload column through the probe
    output, so a probe → filter → decode pipeline is ONE pass over the
    bytes instead of a metadata self-join that would rescan (or, for a
    synthesized lake, recompute) the payload side."""
    src = df.select(F.col(id_col).alias("media_id"),
                    F.col(payload_col).alias("payload"))
    schema = PROBE_SCHEMA + (", payload binary" if keep_payload else "")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                meta = probe_payload(p)
                meta["media_id"] = mid
                meta["n_bytes"] = len(p) if p is not None else 0
                if keep_payload:
                    meta["payload"] = p
                rows.append(meta)
            yield pd.DataFrame(rows)

    return src.mapInPandas(run, schema=schema)
