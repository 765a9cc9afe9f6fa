"""GIF codec (operators/multimodal.py): from-scratch LZW decode
against fixtures from BOTH the repo encoder (clear-code-per-pixel
stream) and an independent table-growing LZW compressor written here —
so the dictionary-growth / code-width-bump path is exercised, not just
the reset path the fixture encoder uses."""

import struct

import numpy as np
import pytest

from gpi_etl_spark.operators.multimodal import (
    decode_bmp,
    decode_gif,
    decode_media,
    encode_bmp,
    encode_gif,
)


def _lzw_compress(indices, min_code):
    """Table-growing GIF LZW compressor. Greedy longest-match emission;
    per-code bit widths come from simulating the decoder's table growth
    (width of code k = decoder state after processing code k-1), which
    is the normative timing."""
    clear, eoi = 1 << min_code, (1 << min_code) + 1
    table = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    out_codes = [clear]
    run = b""
    for i in indices:
        nxt = run + bytes([int(i)])
        if nxt in table:
            run = nxt
            continue
        out_codes.append(table[run])
        table[nxt] = next_code
        next_code += 1
        run = bytes([int(i)])
    out_codes.append(table[run])
    out_codes.append(eoi)
    # decoder simulation for widths
    widths = []
    code_size = min_code + 1
    table_len = clear + 2
    first = True
    for c in out_codes:
        widths.append(code_size)
        if c == clear:
            code_size = min_code + 1
            table_len = clear + 2
            first = True
        elif c == eoi:
            break
        elif first:
            first = False
        else:
            if table_len < 4096:
                table_len += 1
                if table_len == (1 << code_size) and code_size < 12:
                    code_size += 1
    acc = nbits = 0
    stream = bytearray()
    for code, wd in zip(out_codes, widths):
        acc |= code << nbits
        nbits += wd
        while nbits >= 8:
            stream.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        stream.append(acc & 0xFF)
    return bytes(stream)


def _wrap_gif(w, h, pal, stream, min_code, interlace=False):
    n_pal = max(2, 1 << (int(len(pal) - 1).bit_length()))
    table = pal.tobytes() + b"\x00" * 3 * (n_pal - len(pal))
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (n_pal.bit_length() - 2), 0, 0)
    out += table
    out += b"\x2C" + struct.pack("<HHHHB", 0, 0, w, h,
                                 0x40 if interlace else 0)
    out.append(min_code)
    for i in range(0, len(stream), 255):
        chunk = stream[i: i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3B"
    return bytes(out)


def test_roundtrip_matches_bmp_twin():
    rng = np.random.RandomState(11)
    for h, w in [(1, 1), (3, 5), (9, 13), (31, 2)]:
        px = rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
        g = decode_gif(encode_gif(px))
        assert (g["pixels"] == px).all()
        assert g["feature"] == decode_bmp(encode_bmp(px))["feature"]


def test_growing_table_lzw_stream():
    """Independent compressor: repetitive content grows the table far
    past the first width bump."""
    rng = np.random.RandomState(3)
    idx = np.tile(rng.randint(0, 4, 37), 40)  # 1480 px, heavy repetition
    pal = np.array([[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255]],
                   np.uint8)
    stream = _lzw_compress(idx, min_code=2)
    gif = _wrap_gif(37 * 40 // 8, 8, pal, stream, 2)
    d = decode_gif(gif)
    assert (d["pixels"].reshape(-1, 3) == pal[idx]).all()


def test_interlaced_decode():
    rng = np.random.RandomState(5)
    h, w = 13, 4
    idx = rng.randint(0, 8, (h, w))
    pal = np.arange(24, dtype=np.uint8).reshape(8, 3) * 9
    order = np.concatenate([np.arange(0, h, 8), np.arange(4, h, 8),
                            np.arange(2, h, 4), np.arange(1, h, 2)])
    stream = _lzw_compress(idx[order].ravel(), min_code=3)
    d = decode_gif(_wrap_gif(w, h, pal, stream, 3, interlace=True))
    assert (d["pixels"] == pal[idx]).all()


def test_subrectangle_frame_raises():
    px = np.zeros((4, 4, 3), np.uint8)
    g = bytearray(encode_gif(px))
    # image descriptor starts after 6+7 header + 3*4-entry... locate 0x2C
    pos = g.index(0x2C, 13)
    g[pos + 1: pos + 3] = struct.pack("<H", 1)  # left = 1 → sub-rect
    with pytest.raises(NotImplementedError, match="sub-rectangle"):
        decode_gif(bytes(g))


def test_dispatch_and_resize():
    from gpi_etl_spark.operators.multimodal import _resize_payload

    px = (np.arange(6 * 8 * 3, dtype=np.uint16) % 256).astype(
        np.uint8).reshape(6, 8, 3)
    g = encode_gif(px)
    assert decode_media(g)["format"] == "gif"
    out = decode_bmp(_resize_payload(g, 4, 3, deterministic_fake=False))
    rows = (np.arange(3) * 6 // 3)
    cols = (np.arange(4) * 8 // 4)
    assert (out["pixels"] == px[rows][:, cols]).all()


def test_truncated_stream_raises():
    px = np.full((8, 8, 3), 77, np.uint8)
    g = encode_gif(px)
    with pytest.raises(ValueError):
        decode_gif(g[: len(g) // 2])
