"""WARC (Web ARChive) scan — the container format of web-crawl corpora.

A 100 TB text pipeline's raw input is usually WARC: Common Crawl alone
publishes ~100 TB/month of ``.warc.gz``. This module parses the PUBLIC
ISO 28500 format with the stdlib only:

* records are ``WARC/1.x`` header blocks (``Key: Value`` lines, blank
  line) followed by exactly ``Content-Length`` payload bytes and a
  ``\\r\\n\\r\\n`` separator;
* ``response`` records carry an HTTP response in the payload — status
  line + headers split from the body at the first blank line;
* ``.warc.gz`` files are a CONCATENATION of per-record gzip members
  (the spec's random-access convention): decompression loops
  ``zlib.decompressobj`` over members rather than stopping at the
  first stream end.

Like :mod:`gpi_etl_spark.sources.excel_lake`, parsing is a pure
bytes→records function distributed with one ``mapInPandas`` — each
archive parses on the executor that holds its bytes, payloads never
reach the driver, and the output rows are narrow (id, type, url,
status, body) so downstream text extraction repartitions freely.
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator

from pyspark.sql import DataFrame

_GZ_MAGIC = b"\x1f\x8b"


def _gunzip_members(payload: bytes) -> bytes:
    """Decompress a concatenation of gzip members (the .warc.gz
    layout); plain input passes through."""
    if payload[:2] != _GZ_MAGIC:
        return payload
    out = bytearray()
    data = payload
    while data[:2] == _GZ_MAGIC:
        d = zlib.decompressobj(wbits=31)
        out += d.decompress(data)
        out += d.flush()
        data = d.unused_data
    return bytes(out)


def parse_warc(payload: bytes) -> list[dict]:
    """One WARC archive (plain or .gz) → record dicts with keys
    ``record_type, url, content_type, http_status, headers, body``.

    Non-response records (warcinfo, request, metadata) come back with
    ``http_status=None`` and the raw payload as ``body`` so callers can
    filter on ``record_type``; response records split the HTTP envelope
    and return only the entity body.
    """
    data = _gunzip_members(payload)
    records: list[dict] = []
    pos = 0
    n = len(data)
    while pos < n:
        # skip inter-record blank lines
        while data[pos: pos + 2] in (b"\r\n",) or data[pos: pos + 1] == b"\n":
            pos += 2 if data[pos: pos + 2] == b"\r\n" else 1
        if pos >= n:
            break
        if not data[pos: pos + 5].startswith(b"WARC/"):
            raise ValueError(f"expected WARC version line at byte {pos}")
        head_end = data.index(b"\r\n\r\n", pos)
        head = data[pos: head_end].decode("utf-8", "replace")
        headers: dict[str, str] = {}
        for line in head.split("\r\n")[1:]:
            if ":" in line:
                k, v = line.split(":", 1)
                headers[k.strip().lower()] = v.strip()
        length = int(headers.get("content-length", "0"))
        body_start = head_end + 4
        body = data[body_start: body_start + length]
        pos = body_start + length

        rtype = headers.get("warc-type", "")
        rec = {
            "record_type": rtype,
            "url": headers.get("warc-target-uri"),
            "content_type": headers.get("content-type"),
            "http_status": None,
            "headers": headers,
            "body": body,
        }
        if rtype == "response" and body[:5] in (b"HTTP/",):
            split = body.find(b"\r\n\r\n")
            if split >= 0:
                envelope = body[:split].decode("latin-1")
                lines = envelope.split("\r\n")
                try:
                    rec["http_status"] = int(lines[0].split()[1])
                except (IndexError, ValueError):
                    pass
                for line in lines[1:]:
                    if line.lower().startswith("content-type:"):
                        rec["content_type"] = line.split(":", 1)[1].strip()
                rec["body"] = body[split + 4:]
        records.append(rec)
    return records


def warc_lake_records(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "archive_id",
    record_types: tuple[str, ...] = ("response",),
) -> DataFrame:
    """DataFrame of WARC archive payload rows → record rows,
    distributed via one ``mapInPandas`` (same shape as
    :func:`gpi_etl_spark.sources.excel_lake.excel_lake_cells`).

    Output: ``(id_col, record_type, url, content_type, http_status,
    body)`` — body is the HTTP entity body for response records. Filter
    is applied executor-side so non-matching records never enter the
    Arrow stream.
    """
    import pandas as pd

    id_type = dict(df.dtypes)[id_col]
    schema = (
        f"{id_col} {id_type}, record_type string, url string, "
        "content_type string, http_status int, body binary"
    )
    src = df.select(id_col, payload_col)
    want = set(record_types)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, types, urls, ctypes, stats, bodies = [], [], [], [], [], []
            for aid, payload in zip(pdf[id_col], pdf[payload_col]):
                if payload is None:
                    continue
                for rec in parse_warc(bytes(payload)):
                    if want and rec["record_type"] not in want:
                        continue
                    ids.append(aid)
                    types.append(rec["record_type"])
                    urls.append(rec["url"])
                    ctypes.append(rec["content_type"])
                    stats.append(rec["http_status"])
                    bodies.append(rec["body"])
            yield pd.DataFrame(
                {id_col: ids, "record_type": types, "url": urls,
                 "content_type": ctypes, "http_status": stats,
                 "body": bodies}
            )

    return src.mapInPandas(run, schema=schema)


def build_warc(records: list[dict], gzip_members: bool = False) -> bytes:
    """Assemble a WARC archive from record dicts (fixture/test helper —
    the inverse of :func:`parse_warc`). Each dict: ``record_type``,
    optional ``url``, and either a raw ``body`` or ``html`` (which is
    wrapped in an HTTP 200 response envelope). ``gzip_members=True``
    writes the spec's one-gzip-member-per-record .warc.gz layout."""
    import gzip as _gzip

    out = bytearray()
    for i, rec in enumerate(records):
        if "html" in rec:
            http = (
                b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
                + rec["html"].encode("utf-8")
            )
            body = http
            rtype = rec.get("record_type", "response")
        else:
            body = rec["body"]
            rtype = rec.get("record_type", "resource")
        head = [
            "WARC/1.0",
            f"WARC-Type: {rtype}",
            f"WARC-Record-ID: <urn:uuid:{i:032x}>",
            "WARC-Date: 2026-01-01T00:00:00Z",
        ]
        if rec.get("url"):
            head.append(f"WARC-Target-URI: {rec['url']}")
        if rtype == "response":
            head.append("Content-Type: application/http; msgtype=response")
        head.append(f"Content-Length: {len(body)}")
        record = (
            "\r\n".join(head).encode("utf-8") + b"\r\n\r\n" + body + b"\r\n\r\n"
        )
        if gzip_members:
            out += _gzip.compress(record)
        else:
            out += record
    return bytes(out)
