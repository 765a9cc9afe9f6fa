"""Multimodal columns: opaque binary payloads + typed metadata.

North-star operator family (BASELINE.json). The design treats media as
``binary`` columns with a metadata struct; all Spark-side plumbing
(schema, partition sizing, Arrow batch shape) is real and tested.

Codecs: formats decodable with the stdlib are decoded FOR REAL —
**WAV** (PCM, via ``wave`` + numpy: sample rate, duration, RMS/peak/
zero-crossing features), **BMP** (24-bit uncompressed, pure ``struct``:
dimensions + per-channel means), **PPM** (P6), **PNG** (``zlib``
inflate + per-row unfiltering: 8-bit gray/RGB/palette/alpha, filters
0-4), **GIF** (from-scratch LZW incl. interlace + clear-code resets)
and **baseline JPEG** (:mod:`gpi_etl_spark.operators.jpeg`: T.81
Huffman + IDCT, 4:4:4/grayscale). MP4/MP3 get real *container*
metadata (:mod:`gpi_etl_spark.operators.containers`) — sample decode
for those needs ffmpeg-class codecs. Formats that need external codec
libraries (progressive/subsampled JPEG, MP3/MP4 samples — PIL/librosa/
PyAV are not in this container) either raise ``NotImplementedError``
(strict,
the default) or produce a deterministic fake (explicit opt-in for
plumbing tests), clearly flagged; a deployment drops its decoder into
:func:`decode_media`'s dispatch table.

Scale notes: media rows are orders of magnitude wider than text rows —
``spark.sql.files.maxPartitionBytes`` and explicit ``repartition`` by
content-size budget keep Arrow batches bounded; `mapInPandas` streams
batches so no executor ever holds a partition of raw video in memory
at once.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: metadata struct carried beside every media payload
MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("format", T.StringType(), True),       # png|wav|mp4|...
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
    ]
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("meta", MEDIA_META_SCHEMA, True),
    ]
)

#: feature is double, not float: real-codec stats (RMS, channel means)
#: are oracle-checked at 6 dp, and a float32 round-trip can perturb the
#: 6th decimal on boundary values
_FEATURE_SCHEMA = "media_id long, n_bytes long, payload_hash string, feature array<double>"


def attach_binary_meta(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Cheap metadata computable without decoding: byte length + sha."""
    return df.withColumn("n_bytes", F.octet_length(payload_col)).withColumn(
        "payload_sha256", F.sha2(F.col(payload_col), 256)
    )


# ---------------------------------------------------------------------------
# Real stdlib codecs (WAV / BMP / PPM)
# ---------------------------------------------------------------------------

def decode_wav(payload: bytes) -> dict:
    """PCM WAV → metadata + audio features, stdlib ``wave`` + numpy.

    Features (on samples normalized to [-1, 1], first channel):
    ``[rms, peak, zcr, mean]`` — the cheap corpus-quality signals an
    audio curation pass filters on (silence, clipping, DC offset).
    """
    with wave.open(io.BytesIO(payload), "rb") as w:
        rate = w.getframerate()
        n_ch = w.getnchannels()
        width = w.getsampwidth()
        n = w.getnframes()
        raw = w.readframes(n)
    if width == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif width == 1:  # 8-bit WAV is unsigned
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    else:
        raise NotImplementedError(f"{8 * width}-bit PCM not supported")
    if n_ch > 1:
        x = x[::n_ch]  # first channel
    if len(x) == 0:
        feats = [0.0, 0.0, 0.0, 0.0]
    else:
        crossings = int(np.count_nonzero(np.signbit(x[1:]) != np.signbit(x[:-1])))
        feats = [
            float(np.sqrt(np.mean(x * x))),
            float(np.max(np.abs(x))),
            crossings / (len(x) - 1) if len(x) > 1 else 0.0,
            float(np.mean(x)),
        ]
    return {
        "media_type": "audio", "format": "wav", "sample_rate": rate,
        "duration_ms": int(n * 1000 // rate) if rate else 0,
        "width": None, "height": None, "feature": feats,
    }


def decode_bmp(payload: bytes) -> dict:
    """24-bit uncompressed BMP → dims + per-channel means, pure struct.

    Rows are stored bottom-up, padded to 4-byte boundaries, pixels BGR.
    Returns ``feature = [mean_r, mean_g, mean_b, std_gray]`` on the
    0-255 scale.
    """
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    off = struct.unpack_from("<I", payload, 10)[0]
    w, h = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    comp = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or comp != 0:
        raise NotImplementedError(f"only 24-bit uncompressed BMP (got {bpp}bpp)")
    top_down = h < 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    px = np.zeros((h, w, 3), dtype=np.uint8)
    for r in range(h):
        line = payload[off + r * stride: off + r * stride + w * 3]
        row = np.frombuffer(line, dtype=np.uint8).reshape(w, 3)
        px[r if top_down else h - 1 - r] = row[:, ::-1]  # BGR → RGB
    gray = px.astype(np.float64).mean(axis=2)
    return {
        "media_type": "image", "format": "bmp", "width": w, "height": h,
        "duration_ms": None, "sample_rate": None,
        "feature": [
            float(px[:, :, 0].mean()), float(px[:, :, 1].mean()),
            float(px[:, :, 2].mean()), float(gray.std()),
        ],
        "pixels": px,
    }


def _ppm_header(payload: bytes) -> tuple[int, int, int, int]:
    """Parse the P6 header → (width, height, maxval, pixel_offset)."""
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    fields: list[int] = []
    pos = 2
    while len(fields) < 3:
        while pos < len(payload) and payload[pos: pos + 1].isspace():
            pos += 1
        if payload[pos: pos + 1] == b"#":  # comment to EOL
            pos = payload.index(b"\n", pos) + 1
            continue
        end = pos
        while end < len(payload) and not payload[end: end + 1].isspace():
            end += 1
        fields.append(int(payload[pos:end]))
        pos = end
    pos += 1  # single whitespace after maxval
    return fields[0], fields[1], fields[2], pos


def decode_ppm(payload: bytes) -> dict:
    """Binary PPM (P6) → dims + per-channel means."""
    w, h, _maxval, pos = _ppm_header(payload)
    if _maxval > 255:
        # maxval > 255 means two bytes per sample ([netpbm] P6); reading it
        # as uint8 would silently misparse — strict-raise like the BMP guard
        raise NotImplementedError(
            f"PPM maxval {_maxval} > 255 (16-bit samples) not supported"
        )
    px = (
        np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=pos)
        .reshape(h, w, 3)
        .copy()
    )
    gray = px.astype(np.float64).mean(axis=2)
    return {
        "media_type": "image", "format": "ppm", "width": w, "height": h,
        "duration_ms": None, "sample_rate": None,
        "feature": [
            float(px[:, :, 0].mean()), float(px[:, :, 1].mean()),
            float(px[:, :, 2].mean()), float(gray.std()),
        ],
        "pixels": px,
    }


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
#: samples per pixel by PNG color type ([PNG] 11.2.2)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


#: Adam7 pass grid: (x0, y0, dx, dy) per pass ([PNG] 8.2)
_ADAM7 = ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))


def _png_unfilter(raw: bytes, off: int, h: int, stride: int,
                  bpp: int) -> tuple["np.ndarray", int]:
    """Unfilter h scanlines of `stride` bytes starting at raw[off]
    (filter types 0-4); returns the byte matrix and the new offset."""
    if len(raw) - off < h * (stride + 1):
        raise ValueError("PNG: truncated image data")
    out = np.empty((h, stride), dtype=np.uint8)
    prev = bytearray(stride)
    for r in range(h):
        ft = raw[off]
        line = bytearray(raw[off + 1: off + 1 + stride])
        off += 1 + stride
        if ft == 1:  # Sub
            for i in range(bpp, stride):
                line[i] = (line[i] + line[i - bpp]) & 0xFF
        elif ft == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ft == 3:  # Average
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                b = prev[i]
                cc = prev[i - bpp] if i >= bpp else 0
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                line[i] = (line[i] + (a if pa <= pb and pa <= pc
                                      else b if pb <= pc else cc)) & 0xFF
        elif ft != 0:
            raise ValueError(f"bad PNG filter type {ft}")
        out[r] = np.frombuffer(bytes(line), dtype=np.uint8)
        prev = line
    return out, off


def decode_png(payload: bytes) -> dict:
    """PNG → dims + per-channel means, stdlib ``zlib`` + numpy.

    Real decode: chunk walk (IHDR/PLTE/IDAT), one inflate, then per-row
    unfiltering of filter types 0-4 (None/Sub/Up/Average/Paeth).
    Supported: 8- and 16-bit depth, color types 0 (gray), 2 (RGB),
    3 (palette), 4 (gray+alpha), 6 (RGBA), both progressive orders
    (sequential and Adam7 interlace — each of the 7 passes is its own
    filtered sub-image, scattered onto the canvas). Alpha is dropped,
    gray replicated, and 16-bit samples quantized to 8 bits
    (round(v/257)), so the output ``feature`` matches a BMP/PPM twin of
    the same pixels. Bit depths 1/2/4 strict-raise.
    """
    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    ihdr = b""
    plte = b""
    idat: list[bytes] = []
    pos = 8
    while pos + 8 <= len(payload):
        ln = struct.unpack_from(">I", payload, pos)[0]
        typ = payload[pos + 4: pos + 8]
        data = payload[pos + 8: pos + 8 + ln]
        pos += 12 + ln  # data + 4-byte CRC
        if typ == b"IHDR":
            ihdr = data
        elif typ == b"PLTE":
            plte = data
        elif typ == b"IDAT":
            idat.append(data)
        elif typ == b"IEND":
            break
    w, h, depth, ctype, _comp, _filt, interlace = struct.unpack(">IIBBBBB", ihdr)
    if depth not in (8, 16):
        raise NotImplementedError(
            f"{depth}-bit PNG not supported (8/16-bit only)")
    if ctype not in _PNG_CHANNELS:
        raise ValueError(f"bad PNG color type {ctype}")
    if depth == 16 and ctype == 3:
        raise ValueError("PNG: 16-bit palette images are not legal")
    ch = _PNG_CHANNELS[ctype]
    sb = depth // 8  # bytes per sample
    bpp = ch * sb  # filter distance = bytes per pixel
    raw = zlib.decompress(b"".join(idat))
    if not interlace:
        mat, _ = _png_unfilter(raw, 0, h, w * bpp, bpp)
    else:  # Adam7: 7 independently-filtered sub-images
        mat = np.zeros((h, w * bpp), dtype=np.uint8)
        off = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue
            sub, off = _png_unfilter(raw, off, ph, pw * bpp, bpp)
            canvas = mat.reshape(h, w, bpp)
            canvas[y0::dy, x0::dx, :] = sub.reshape(ph, pw, bpp)
    if depth == 16:
        wide = mat.reshape(h, w, ch, sb).astype(np.uint16)
        samples = (wide[..., 0] << 8) | wide[..., 1]
        # quantize to the 8-bit feature scale: 65535 → 255 exactly
        arr = np.round(samples / 257.0).astype(np.uint8)
    else:
        arr = mat.reshape(h, w, ch)
    if ctype == 3:
        pal = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
        px = pal[arr[:, :, 0]]
    elif ctype == 0:
        px = np.repeat(arr, 3, axis=2)
    elif ctype == 4:
        px = np.repeat(arr[:, :, :1], 3, axis=2)
    else:  # 2 (RGB) or 6 (RGBA, alpha dropped)
        px = arr[:, :, :3]
    px = np.ascontiguousarray(px)
    gray = px.astype(np.float64).mean(axis=2)
    return {
        "media_type": "image", "format": "png", "width": int(w), "height": int(h),
        "duration_ms": None, "sample_rate": None,
        "feature": [
            float(px[:, :, 0].mean()), float(px[:, :, 1].mean()),
            float(px[:, :, 2].mean()), float(gray.std()),
        ],
        "pixels": px,
    }


def encode_png(px: "np.ndarray", interlace: bool = False) -> bytes:
    """RGB array (h, w, 3) → truecolor PNG bytes; round-trips through
    :func:`decode_png`. uint8 input → 8-bit; uint16 input → 16-bit
    (big-endian samples). ``interlace=True`` writes Adam7 order (each
    pass its own filter-0 sub-image)."""
    h, w = px.shape[:2]
    depth = 16 if px.dtype == np.uint16 else 8

    def rows_bytes(img: "np.ndarray") -> bytes:
        if depth == 16:
            img = img.astype(">u2")
        return b"".join(b"\x00" + img[r].tobytes() for r in range(img.shape[0]))

    if not interlace:
        raw = rows_bytes(px)
    else:
        parts = []
        for x0, y0, dx, dy in _ADAM7:
            sub = px[y0::dy, x0::dx]
            if sub.shape[0] and sub.shape[1]:
                parts.append(rows_bytes(sub))
        raw = b"".join(parts)

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, depth, 2, 0, 0, 1 if interlace else 0)
    return (_PNG_SIG + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw))
            + chunk(b"IEND", b""))


def decode_gif(payload: bytes) -> dict:
    """GIF87a/89a → dims + per-channel means, from-scratch LZW.

    Real decode of the FIRST image block: logical-screen descriptor,
    global/local color table, GIF-variant LZW (LSB-first bit stream,
    clear/EOI codes, 12-bit cap) and 4-pass deinterlace. Animated GIFs
    decode their first frame (full-canvas frames only; a sub-rectangle
    first frame strict-raises rather than guessing the canvas fill).
    """
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    sw, sh = struct.unpack_from("<HH", payload, 6)
    packed = payload[10]
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 7)
        gct = np.frombuffer(payload, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3
    while pos < len(payload):
        block = payload[pos]
        if block == 0x21:  # extension: label byte + sub-blocks
            pos += 2
            while pos < len(payload) and payload[pos]:
                pos += 1 + payload[pos]
            if pos >= len(payload):
                raise ValueError("GIF: truncated extension block")
            pos += 1
        elif block == 0x2C:  # image descriptor
            left, top, w, h = struct.unpack_from("<HHHH", payload, pos + 1)
            ip = payload[pos + 9]
            pos += 10
            pal = gct
            if ip & 0x80:
                n = 2 << (ip & 7)
                pal = np.frombuffer(payload, np.uint8, n * 3, pos).reshape(n, 3)
                pos += n * 3
            if pal is None:
                raise ValueError("GIF: no color table for image")
            if (left, top, w, h) != (0, 0, sw, sh):
                raise NotImplementedError(
                    "GIF sub-rectangle first frame not supported")
            if pos >= len(payload):
                raise ValueError("GIF: truncated image block")
            min_code = payload[pos]
            pos += 1
            data = bytearray()
            while pos < len(payload) and payload[pos]:
                ln = payload[pos]
                data += payload[pos + 1: pos + 1 + ln]
                pos += 1 + ln
            if pos >= len(payload):
                raise ValueError("GIF: truncated image data")
            idx = _gif_lzw_decode(bytes(data), min_code, w * h)
            rows = np.asarray(idx, dtype=np.int32).reshape(h, w)
            if ip & 0x40:  # 4-pass interlace
                order = np.concatenate([
                    np.arange(0, h, 8), np.arange(4, h, 8),
                    np.arange(2, h, 4), np.arange(1, h, 2)])
                out = np.empty_like(rows)
                out[order] = rows
                rows = out
            px = pal[rows]
            gray = px.astype(np.float64).mean(axis=2)
            return {
                "media_type": "image", "format": "gif",
                "width": int(w), "height": int(h),
                "duration_ms": None, "sample_rate": None,
                "feature": [
                    float(px[:, :, 0].mean()), float(px[:, :, 1].mean()),
                    float(px[:, :, 2].mean()), float(gray.std()),
                ],
                "pixels": px,
            }
        elif block == 0x3B:
            break
        else:
            raise ValueError(f"GIF: unknown block 0x{block:02x}")
    raise ValueError("GIF: no image block found")


def _gif_lzw_decode(data: bytes, min_code: int, n_px: int) -> list[int]:
    """GIF LZW: LSB-first variable-width codes, CLEAR=2^min, EOI=CLEAR+1,
    table capped at 4096 entries ([GIF89a] appendix F)."""
    clear = 1 << min_code
    eoi = clear + 1
    table: list[bytes] = []
    code_size = min_code + 1
    prev: bytes | None = None
    out = bytearray()
    acc = nbits = 0
    pos = 0

    def reset() -> None:
        nonlocal table, code_size, prev
        table = [bytes([i]) for i in range(clear)] + [b"", b""]
        code_size = min_code + 1
        prev = None

    reset()
    while len(out) < n_px:
        while nbits < code_size:
            if pos >= len(data):
                raise ValueError("GIF: LZW stream truncated")
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << code_size) - 1)
        acc >>= code_size
        nbits -= code_size
        if code == clear:
            reset()
            continue
        if code == eoi:
            break
        if code < len(table) and code != eoi:
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]
        else:
            raise ValueError(f"GIF: bad LZW code {code}")
        out += entry
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            if len(table) == (1 << code_size) and code_size < 12:
                code_size += 1
        prev = entry
    if len(out) < n_px:
        raise ValueError("GIF: LZW output short of pixel count")
    return list(out[:n_px])


def encode_gif(px: "np.ndarray") -> bytes:
    """RGB uint8 array (h, w, 3) → GIF89a bytes (≤256 distinct colors).

    The LZW stream emits a CLEAR code before every pixel so the decoder
    table never grows — bulky but spec-valid, and it exercises the
    clear-code reset path of any decoder reading the fixture.
    """
    h, w = px.shape[:2]
    flat = px.reshape(-1, 3)
    pal, inv = np.unique(flat, axis=0, return_inverse=True)
    if len(pal) > 256:
        raise ValueError(f"GIF fixture: {len(pal)} colors > 256")
    min_code = max(2, int(len(pal) - 1).bit_length())
    clear, eoi = 1 << min_code, (1 << min_code) + 1
    code_size = min_code + 1
    acc = nbits = 0
    stream = bytearray()
    for code in [clear] + [c for i in inv for c in (int(i), clear)][:-1] + [eoi]:
        acc |= code << nbits
        nbits += code_size
        while nbits >= 8:
            stream.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        stream.append(acc & 0xFF)
    n_pal = 1 << min_code  # palette block is a power of two
    table = pal.tobytes() + b"\x00" * 3 * (n_pal - len(pal))
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0xF0 | (min_code - 1), 0, 0)
    out += table
    out += b"\x2C" + struct.pack("<HHHHB", 0, 0, w, h, 0)
    out.append(min_code)
    for i in range(0, len(stream), 255):
        chunk = stream[i: i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3B"
    return bytes(out)


def encode_bmp(px: "np.ndarray") -> bytes:
    """RGB uint8 array (h, w, 3) → 24-bit uncompressed BMP bytes."""
    h, w = px.shape[:2]
    stride = (w * 3 + 3) & ~3
    body = bytearray()
    for r in range(h - 1, -1, -1):  # bottom-up
        line = px[r, :, ::-1].tobytes()  # RGB → BGR
        body += line + b"\x00" * (stride - len(line))
    off = 14 + 40
    header = b"BM" + struct.pack("<IHHI", off + len(body), 0, 0, off)
    header += struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    return bytes(header + body)


def decode_media(payload: bytes, deterministic_fake: bool = False) -> dict:
    """Dispatch on magic bytes to a real stdlib codec; unknown formats
    raise (strict) or produce the flagged deterministic fake."""
    if payload:
        if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
            return decode_wav(payload)
        if payload[:2] == b"BM":
            return decode_bmp(payload)
        if payload[:2] == b"P6":
            return decode_ppm(payload)
        if payload[:8] == _PNG_SIG:
            return decode_png(payload)
        if payload[:6] in (b"GIF87a", b"GIF89a"):
            return decode_gif(payload)
        if payload[:3] == b"\xff\xd8\xff":
            from gpi_etl_spark.operators.jpeg import decode_jpeg

            return decode_jpeg(payload)
    if not deterministic_fake:
        raise NotImplementedError(
            "payload is not WAV/BMP/PPM/PNG/GIF/baseline-JPEG; decoding "
            "other formats needs codec libraries not present in this "
            "environment (PIL/librosa/PyAV)."
        )
    return {"feature": _fake_feature(payload)}


def _fake_feature(payload: bytes | None) -> list[float]:
    """Deterministic pseudo-feature for formats with no stdlib codec —
    keeps the distributed plumbing testable end-to-end; clearly NOT a
    decode."""
    if payload is None:
        return [0.0, 0.0, 0.0, 0.0]
    n = len(payload)
    head = sum(payload[:16]) if n else 0
    tail = sum(payload[-16:]) if n else 0
    return [float(n), float(head % 997), float(tail % 997), float((head * 31 + tail) % 9973)]


def extract_features(
    df: DataFrame,
    payload_col: str = "payload",
    media_type_col: str = "meta.media_type",
    id_col: str = "media_id",
    batch_rows: int = 64,
    deterministic_fake: bool = False,
) -> DataFrame:
    """Per-payload feature extraction via ``mapInPandas``.

    Arrow streams bounded batches into Python; each batch maps to
    (id, n_bytes, hash, feature-vector) rows. ``batch_rows`` caps the
    Arrow batch so wide payloads don't blow the Python heap — for real
    media set ``spark.sql.execution.arrow.maxRecordsPerBatch`` to match.
    """
    src = df.select(
        F.col(id_col).alias("media_id"),
        F.col(payload_col).alias("payload"),
        F.col(media_type_col).alias("media_type"),
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            for start in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[start : start + batch_rows]
                feats = [
                    decode_media(p, deterministic_fake)["feature"]
                    for p in chunk["payload"]
                ]
                yield pd.DataFrame(
                    {
                        "media_id": chunk["media_id"].values,
                        "n_bytes": [len(p) if p is not None else 0 for p in chunk["payload"]],
                        "payload_hash": [
                            hashlib.sha256(p if p is not None else b"").hexdigest()
                            for p in chunk["payload"]
                        ],
                        "feature": feats,
                    }
                )

    return src.mapInPandas(run, schema=_FEATURE_SCHEMA)


_RESIZE_SCHEMA = (
    "media_id long, payload binary, "
    "meta struct<media_type:string,format:string,width:int,height:int,"
    "duration_ms:bigint,sample_rate:int>"
)


def _resize_payload(payload: bytes, width: int, height: int,
                    deterministic_fake: bool) -> bytes:
    """REAL nearest-neighbor resample for any payload
    :func:`decode_media` can decode to pixels (BMP/PPM/PNG/baseline
    JPEG; decode → index-map → re-encode as BMP). One dispatch table:
    adding a codec to decode_media makes it resizable here for free.
    Formats without a codec need PIL: raise (strict) or emit the
    flagged deterministic fake whose length scales with target area so
    batch-size accounting stays realistic."""
    d = None
    if payload:
        try:
            d = decode_media(payload)
        except NotImplementedError:
            d = None
    if d is not None and d.get("pixels") is not None:
        px = d["pixels"]
        rows = (np.arange(height) * d["height"] // height).astype(np.int64)
        cols = (np.arange(width) * d["width"] // width).astype(np.int64)
        return encode_bmp(px[rows][:, cols])
    if not deterministic_fake:
        raise NotImplementedError(
            "payload is not a decodable image (BMP/PPM/PNG/GIF/baseline "
            "JPEG); resizing other formats requires PIL (not in this "
            "container)."
        )
    if payload is None:
        return b""
    seed = (payload[:8] or b"\0") * ((width * height) // max(len(payload[:8]), 1) + 1)
    return bytes(seed[: width * height])


def resize_images(
    df: DataFrame,
    width: int,
    height: int,
    deterministic_fake: bool = False,
) -> DataFrame:
    """Image resize with the REAL distributed plumbing (mapInPandas,
    1:1 rows, payload replaced, meta dims rewritten); BMP/PPM payloads
    resample for real, other formats per ``deterministic_fake`` (see
    :func:`_resize_payload`). Output schema equals the media schema, so
    resize composes with any downstream media op."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            out["payload"] = [
                _resize_payload(p, width, height, deterministic_fake)
                for p in out["payload"]
            ]
            out["meta"] = [
                None if m is None else {**m, "width": width, "height": height}
                for m in out["meta"]
            ]
            yield out

    return df.select("media_id", "payload", "meta").mapInPandas(
        run, schema=_RESIZE_SCHEMA
    )


_FRAME_SCHEMA = "media_id long, frame_idx int, ts_ms bigint, frame_hash string"


def sample_video_frames(
    df: DataFrame,
    every_ms: int,
    deterministic_fake: bool = True,
) -> DataFrame:
    """Frame sampling: ONE media row fans out to one row per sampled
    timestamp (the one-to-many mapInPandas shape — a Python UDTF in
    effect). The frame *grid* comes from real metadata
    (``meta.duration_ms``); only the pixel decode is stubbed (real
    impl: PyAV seek + decode per grid point). Emitting per-frame rows
    rather than arrays keeps each output row narrow, so Spark can
    repartition frames independently of their source videos — at scale
    a 2-hour video fans out to thousands of rows that downstream
    feature extraction processes in parallel."""
    import hashlib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, tss, hashes = [], [], [], []
            for mid, payload, meta in zip(
                pdf["media_id"], pdf["payload"], pdf["meta"]
            ):
                dur = (meta or {}).get("duration_ms") or 0
                for k, ts in enumerate(range(0, int(dur), every_ms)):
                    if not deterministic_fake:
                        raise NotImplementedError(
                            "video frame decode requires PyAV/ffmpeg "
                            "(not in this container)."
                        )
                    frame_key = (payload or b"") + ts.to_bytes(8, "big")
                    ids.append(mid)
                    idxs.append(k)
                    tss.append(ts)
                    hashes.append(hashlib.sha256(frame_key).hexdigest())
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "ts_ms": tss,
                 "frame_hash": hashes}
            )

    return df.select("media_id", "payload", "meta").mapInPandas(
        run, schema=_FRAME_SCHEMA
    )


def dhash_images(
    media: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
) -> DataFrame:
    """56-bit difference hash (dHash) per image: decode → integer-gray
    → 7×9 nearest-neighbor grid → row-adjacent comparisons → one
    BIGINT fingerprint. The perceptual near-dup key for image corpora:
    brightness/contrast shifts preserve adjacent-pixel ORDER, so
    shifted duplicates collapse to the SAME hash, while content edits
    flip only the bits whose neighborhood changed.

    Deliberate deviations from the classic 8×9/64-bit recipe, both for
    engine parity: 7 rows × 8 comparisons = 56 bits keeps the hash in
    the POSITIVE int64 range (bit 63 would overflow DuckDB's checked
    ``<<`` and flip Spark's sign), and gray is integer ``(R+G+B)//3``
    (no luma floats — the whole pipeline stays in exact integer math,
    so the fingerprint is bit-reproducible on any engine).

    Runs as one Arrow-batched mapInPandas over the payload bytes
    (same envelope as extract_features: pixels never leave the
    executor). Returns ``(id_col, dhash)``.
    """
    rows_g, cols_g = 7, 9
    # id passes through with its INPUT type (long doc keys, string
    # UUIDs, …) — hardcoding long would make Arrow reject string ids
    id_type = media.schema[id_col].dataType.simpleString()

    def batch(it):
        for pdf in it:
            out = []
            for p in pdf[payload_col]:
                d = decode_media(bytes(p))
                px = d["pixels"]
                h, w = int(d["height"]), int(d["width"])
                rr = np.arange(rows_g) * h // rows_g
                cc = np.arange(cols_g) * w // cols_g
                g = px[rr][:, cc].astype(np.int64).sum(axis=2) // 3
                bits = (g[:, :-1] < g[:, 1:]).astype(np.int64).flatten()
                shifts = np.arange(rows_g * (cols_g - 1), dtype=np.int64)
                out.append(int((bits << shifts).sum()))
            yield pd.DataFrame(
                {id_col: pdf[id_col].values, "dhash": out}
            )

    return media.select(id_col, payload_col).mapInPandas(
        batch, schema=f"{id_col} {id_type}, dhash long"
    )


def dhash_near_dups(
    hashed: DataFrame,
    max_dist: int = 6,
    id_col: str = "media_id",
) -> DataFrame:
    """Image near-dup pairs by Hamming distance over 56-bit dHashes,
    WITHOUT an all-pairs product: band each hash into 7 × 8-bit bands
    and equi-join on (band index, band value) — by pigeonhole, any two
    hashes within ``max_dist`` ≤ 6 agree on at least one of 7 bands,
    so banding finds EXACTLY the pairs a quadratic scan would (this is
    exact retrieval, not approximate, for max_dist < bands). Shuffle ∝
    hashes × 7, candidate verification is one ``bit_count(a XOR b)``
    per collision. Returns ``(id_a, id_b, hamming)``.
    """
    if max_dist >= 7:
        raise ValueError(
            "max_dist must be < 7 bands for exact banded retrieval"
        )
    bands = F.array(
        *[
            F.struct(
                F.lit(k).alias("k"),
                F.shiftright(F.col("dhash"), 8 * k)
                .bitwiseAND(F.lit(255))
                .alias("v"),
            )
            for k in range(7)
        ]
    )
    banded = hashed.select(
        F.col(id_col), F.col("dhash"), F.explode(bands).alias("b")
    ).select(id_col, "dhash", F.col("b.k").alias("bk"), F.col("b.v").alias("bv"))
    a = banded.select(
        F.col(id_col).alias("id_a"), F.col("dhash").alias("_ha"),
        "bk", "bv",
    )
    b = banded.select(
        F.col(id_col).alias("id_b"), F.col("dhash").alias("_hb"),
        "bk", "bv",
    )
    ham = F.bit_count(
        F.col("_ha").bitwiseXOR(F.col("_hb"))
    ).alias("hamming")
    return (
        a.join(b, ["bk", "bv"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "_ha", "_hb")
        .distinct()
        .select("id_a", "id_b", ham)
        .filter(F.col("hamming") <= max_dist)
    )
