"""Minimal BIFF8 ``.xls`` writer for fixtures — stdlib ``struct`` only.

Builds just enough of [MS-CFB] + [MS-XLS] to exercise the reader in
``gpi_etl_spark/sources/xls.py``: a v3 compound file (one FAT sector,
one directory sector, mini-stream when the workbook stream is under the
4096-byte cutoff, regular FAT chain otherwise) wrapping a workbook
globals substream (DATEMODE, FORMAT, XF table, SST with optional
CONTINUE splits, BOUNDSHEET directory) plus one worksheet substream per
sheet (NUMBER / RK / MULRK / LABELSST / LABEL / FORMULA / BOOLERR).
"""

from __future__ import annotations

import struct

FREE = 0xFFFFFFFF
END = 0xFFFFFFFE
FATSECT = 0xFFFFFFFD


def _rec(op: int, data: bytes) -> bytes:
    return struct.pack("<HH", op, len(data)) + data


def _bof(substream: int) -> bytes:
    return _rec(0x0809, struct.pack("<HHHHII", 0x0600, substream, 0x0DBB, 0x07CC, 0, 0))


def _short_str(s: str) -> bytes:
    return bytes([len(s), 0]) + s.encode("latin-1")


def _ustr(s: str) -> bytes:
    return struct.pack("<HB", len(s), 0) + s.encode("latin-1")


def _xf(ifmt: int) -> bytes:
    return _rec(0x00E0, struct.pack("<HHH", 0, ifmt, 0x0001) + b"\x00" * 14)


def _rk_int(n: int) -> int:
    return ((n & 0x3FFFFFFF) << 2) | 0x02


def _rk_float(v: float) -> int:
    bits = struct.unpack("<Q", struct.pack("<d", v))[0]
    if bits & 0x3FFFFFFFF:
        raise ValueError(f"{v} not RK-float representable")
    return (bits >> 32) & 0xFFFFFFFC


def _sst(strings: list[str], split_at: int | None = None) -> bytes:
    """SST record; if ``split_at`` is given, the LAST string's char
    array is split at that many chars into a CONTINUE record (with the
    spec's restated grbit byte)."""
    body = struct.pack("<II", len(strings), len(strings))
    for s in strings[:-1] if split_at is not None else strings:
        body += _ustr(s)
    if split_at is None:
        return _rec(0x00FC, body)
    last = strings[-1]
    body += struct.pack("<HB", len(last), 0) + last[:split_at].encode("latin-1")
    cont = b"\x00" + last[split_at:].encode("latin-1")  # grbit restated
    return _rec(0x00FC, body) + _rec(0x003C, cont)


def build_workbook_stream(
    sheets: dict[str, list[tuple[int, int, bytes]]],
    strings: list[str],
    custom_formats: dict[int, str] | None = None,
    datemode: int = 0,
    sst_split_at: int | None = None,
) -> bytes:
    """``sheets`` maps name → list of raw cell records (already packed);
    the helper functions below build individual cell records."""
    fmts = b"".join(
        _rec(0x041E, struct.pack("<H", idx) + _ustr(f))
        for idx, f in (custom_formats or {}).items()
    )
    # XF table: 0-15 style XFs (general), 16 = builtin date (ifmt 14),
    # 17 = general cell XF, 18 = first custom format if provided
    xfs = b"".join(_xf(0) for _ in range(16)) + _xf(14) + _xf(0)
    for idx in (custom_formats or {}):
        xfs += _xf(idx)

    sheet_streams = []
    for recs in sheets.values():
        body = _bof(0x0010)
        for r in recs:
            body += r
        body += _rec(0x000A, b"")
        sheet_streams.append(body)

    # globals, with BOUNDSHEET offsets patched after sizing
    def globals_blob(offsets: list[int]) -> bytes:
        out = _bof(0x0005)
        out += _rec(0x0022, struct.pack("<H", datemode))
        out += fmts + xfs
        for (name, _), off in zip(sheets.items(), offsets):
            out += _rec(0x0085, struct.pack("<IBB", off, 0, 0) + _short_str(name))
        out += _sst(strings, sst_split_at)
        out += _rec(0x000A, b"")
        return out

    size = len(globals_blob([0] * len(sheets)))
    offsets = []
    pos = size
    for ss in sheet_streams:
        offsets.append(pos)
        pos += len(ss)
    return globals_blob(offsets) + b"".join(sheet_streams)


# cell-record builders (xf 17 = general, 16 = builtin date) ---------------

def number(r: int, c: int, v: float, xf: int = 17) -> bytes:
    return _rec(0x0203, struct.pack("<HHHd", r, c, xf, v))


def rk_int(r: int, c: int, n: int, xf: int = 17) -> bytes:
    return _rec(0x027E, struct.pack("<HHHI", r, c, xf, _rk_int(n)))


def rk_float(r: int, c: int, v: float, xf: int = 17) -> bytes:
    return _rec(0x027E, struct.pack("<HHHI", r, c, xf, _rk_float(v)))


def mulrk(r: int, c0: int, ints: list[int], xf: int = 17) -> bytes:
    body = struct.pack("<HH", r, c0)
    for n in ints:
        body += struct.pack("<HI", xf, _rk_int(n))
    body += struct.pack("<H", c0 + len(ints) - 1)
    return _rec(0x00BD, body)


def label_sst(r: int, c: int, isst: int, xf: int = 17) -> bytes:
    return _rec(0x00FD, struct.pack("<HHHI", r, c, xf, isst))


def label(r: int, c: int, s: str, xf: int = 17) -> bytes:
    return _rec(0x0204, struct.pack("<HHH", r, c, xf) + _ustr(s))


def formula_num(r: int, c: int, v: float, xf: int = 17) -> bytes:
    body = struct.pack("<HHHd", r, c, xf, v)
    body += struct.pack("<HIH", 0, 0, 0)  # flags, chn, empty rgce
    return _rec(0x0006, body)


def formula_str(r: int, c: int, s: str, xf: int = 17) -> bytes:
    """FORMULA with a cached string result + its trailing STRING record."""
    res = bytes([0, 0, 0, 0, 0, 0, 0xFF, 0xFF])
    body = struct.pack("<HHH", r, c, xf) + res + struct.pack("<HIH", 0, 0, 0)
    return _rec(0x0006, body) + _rec(0x0207, _ustr(s))


def formula_bool(r: int, c: int, b: bool, xf: int = 17) -> bytes:
    res = bytes([1, 0, 1 if b else 0, 0, 0, 0, 0xFF, 0xFF])
    body = struct.pack("<HHH", r, c, xf) + res + struct.pack("<HIH", 0, 0, 0)
    return _rec(0x0006, body)


def formula_empty_str(r: int, c: int, xf: int = 17) -> bytes:
    res = bytes([3, 0, 0, 0, 0, 0, 0xFF, 0xFF])
    body = struct.pack("<HHH", r, c, xf) + res + struct.pack("<HIH", 0, 0, 0)
    return _rec(0x0006, body)


def merged_cells(ranges: list[tuple[int, int, int, int]]) -> bytes:
    """MERGEDCELLS (0x00E5): list of (row_first, row_last, col_first,
    col_last) inclusive Ref8 ranges."""
    body = struct.pack("<H", len(ranges))
    for rf, rl, cf, cl in ranges:
        body += struct.pack("<HHHH", rf, rl, cf, cl)
    return _rec(0x00E5, body)


def boolerr(r: int, c: int, b: bool, xf: int = 17) -> bytes:
    return _rec(0x0205, struct.pack("<HHHBB", r, c, xf, 1 if b else 0, 0))


# CFB container ------------------------------------------------------------

def _dir_entry(
    name: str, etype: int, start: int, size: int, child: int = FREE
) -> bytes:
    raw = name.encode("utf-16-le")
    e = raw + b"\x00" * (64 - len(raw))
    e += struct.pack("<HBB", len(raw) + 2 if name else 0, etype, 1)
    e += struct.pack("<III", FREE, FREE, child)
    e += b"\x00" * 16  # clsid
    e += struct.pack("<I", 0)  # state
    e += b"\x00" * 16  # timestamps
    e += struct.pack("<IQ", start, size)
    return e[:128]


def _pad(b: bytes, m: int) -> bytes:
    return b + b"\x00" * (-len(b) % m)


def build_cfb(
    stream: bytes, stream_name: str = "Workbook", ssz: int = 512
) -> bytes:
    """Wrap one stream in a compound file. Streams under the 4096
    cutoff go through the mini-stream/mini-FAT path; larger ones chain
    regular sectors. ``ssz=4096`` builds a version-4 file (4096-byte
    sectors, sector n at byte (n+1)*4096) — requires a stream ≥ 4096
    bytes since the reader routes smaller streams via the mini-FAT."""
    if ssz == 4096:
        return _build_cfb_v4(stream, stream_name)
    use_mini = len(stream) < 4096
    if use_mini:
        mini = _pad(stream, 64)
        n_mini = len(mini) // 64
        minifat = [i + 1 for i in range(n_mini)]
        minifat[n_mini - 1] = END
        minifat += [FREE] * (128 - len(minifat))
        mini_sects = _pad(mini, 512)
        n_ms = len(mini_sects) // 512
        # sectors: 0=FAT, 1=directory, 2=miniFAT, 3..=mini stream
        fat = [FATSECT, END, END]
        for i in range(n_ms):
            fat.append(3 + i + 1 if i < n_ms - 1 else END)
        root = _dir_entry("Root Entry", 5, 3, len(mini), child=1)
        wb = _dir_entry(stream_name, 2, 0, len(stream))
        minifat_start, n_minifat = 2, 1
        data_sectors = struct.pack("<128I", *minifat) + mini_sects
    else:
        body = _pad(stream, 512)
        n_s = len(body) // 512
        # sectors: 0=FAT, 1=directory, 2..=stream
        fat = [FATSECT, END]
        for i in range(n_s):
            fat.append(2 + i + 1 if i < n_s - 1 else END)
        root = _dir_entry("Root Entry", 5, END, 0, child=1)
        wb = _dir_entry(stream_name, 2, 2, len(stream))
        minifat_start, n_minifat = END, 0
        data_sectors = body

    fat += [FREE] * (128 - len(fat))
    directory = root + wb + _dir_entry("", 0, FREE, 0) * 2

    header = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1" + b"\x00" * 16
    header += struct.pack("<HHHHH", 0x3E, 0x0003, 0xFFFE, 9, 6)
    header += b"\x00" * 6
    header += struct.pack("<IIII", 0, 1, 1, 0)  # ndir, nfat, dir_start, trans
    header += struct.pack("<III", 4096, minifat_start, n_minifat)
    header += struct.pack("<II", END, 0)  # difat start/count
    header += struct.pack("<109I", *([0] + [FREE] * 108))
    assert len(header) == 512

    return header + struct.pack("<128I", *fat) + directory + data_sectors


def _build_cfb_v4(stream: bytes, stream_name: str = "Workbook") -> bytes:
    """Version-4 compound file: 4096-byte sectors, 512-byte header padded
    to one full sector, regular FAT chain only (no mini stream)."""
    assert len(stream) >= 4096, "v4 fixture needs a stream past the mini cutoff"
    ssz = 4096
    body = _pad(stream, ssz)
    n_s = len(body) // ssz
    # sectors: 0=FAT, 1=directory, 2..=stream
    fat = [FATSECT, END]
    for i in range(n_s):
        fat.append(2 + i + 1 if i < n_s - 1 else END)
    fat += [FREE] * (ssz // 4 - len(fat))
    root = _dir_entry("Root Entry", 5, END, 0, child=1)
    wb = _dir_entry(stream_name, 2, 2, len(stream))
    directory = _pad(root + wb + _dir_entry("", 0, FREE, 0) * 2, ssz)

    header = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1" + b"\x00" * 16
    header += struct.pack("<HHHHH", 0x3E, 0x0004, 0xFFFE, 12, 6)
    header += b"\x00" * 6
    header += struct.pack("<IIII", 1, 1, 1, 0)  # ndir, nfat, dir_start, trans
    header += struct.pack("<III", 4096, END, 0)  # mini cutoff, minifat
    header += struct.pack("<II", END, 0)  # difat start/count
    header += struct.pack("<109I", *([0] + [FREE] * 108))
    assert len(header) == 512
    header = _pad(header, ssz)  # v4: header padded to a full sector

    return header + _pad(struct.pack(f"<{ssz // 4}I", *fat), ssz) + directory + body


def build_xls(
    sheets: dict[str, list[tuple[int, int, bytes]]],
    strings: list[str],
    ssz: int = 512,
    **kw,
) -> bytes:
    return build_cfb(build_workbook_stream(sheets, strings, **kw), ssz=ssz)
